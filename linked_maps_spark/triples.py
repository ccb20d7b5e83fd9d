"""RDF triple materialization — Spark redesign of generate_graph.py.

The reference builds an rdflib graph in memory, one node/edge at a time
(generate_graph.py:33-82), and serializes Turtle.  Here the triple set is a
DataFrame derived from the ``segments``/``relations`` lake tables with
``select`` / ``explode`` / ``union`` — no driver-side loops — and the sink is
an N-Triples text write (Turtle prefixing is cosmetic; SURVEY.md §2.1 S9).

Determinism fix: the reference stamps ``dcterms:created`` with
``datetime.today()`` (generate_graph.py:48) — nondeterministic across
replays.  The engine derives it from the node's commit label instead, keeping
the triple set a pure function of the WAL.

Vocabulary (generate_graph.py:10-13):
    lmg:     https://linked-maps.isi.edu/resource/
    geo:     http://www.opengis.net/ont/geosparql#
    dcterms: http://purl.org/dc/terms/
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

LMG = "https://linked-maps.isi.edu/resource/"
GEO = "http://www.opengis.net/ont/geosparql#"
DCTERMS = "http://purl.org/dc/terms/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

TRIPLE_SCHEMA = "s string, p string, o string, o_dt string"


def _feature_uri(gid):
    return F.concat(F.lit(LMG), gid)


def _geometry_uri(gid, name):
    # IRI pattern lmg:<gid>_sc_<name.lower()> — generate_graph.py:41
    return F.concat(F.lit(LMG), gid, F.lit("_sc_"), F.lower(name))


def year_to_datetime(col):
    """'1962' → '1962-01-01T00:00:00' (generate_graph.py:52-54)."""
    return F.concat(col, F.lit("-01-01T00:00:00"))


def segment_triples(segments: DataFrame) -> DataFrame:
    """Per-segment triples (generate_graph.py:33-62)."""
    feat = _feature_uri(F.col("gid"))
    geom = _geometry_uri(F.col("gid"), F.col("name"))
    base = segments.select("gid", "name", "wkt", "editions", "commit_created")

    t_feature = base.select(
        feat.alias("s"), F.lit(RDF_TYPE).alias("p"),
        F.lit(GEO + "Feature").alias("o"), F.lit(None).cast("string").alias("o_dt"),
    )
    t_geometry = base.select(
        geom.alias("s"), F.lit(RDF_TYPE).alias("p"),
        F.lit(GEO + "Geometry").alias("o"), F.lit(None).cast("string").alias("o_dt"),
    )
    t_has_geom = base.select(
        feat.alias("s"), F.lit(GEO + "hasGeometry").alias("p"),
        geom.alias("o"), F.lit(None).cast("string").alias("o_dt"),
    )
    # deterministic created timestamp from the creating commit's year
    t_created = base.select(
        feat.alias("s"), F.lit(DCTERMS + "created").alias("p"),
        year_to_datetime(F.substring("commit_created", 1, 4)).alias("o"),
        F.lit("http://www.w3.org/2001/XMLSchema#dateTime").alias("o_dt"),
    )
    # one dcterms:date per (transitively inherited) edition year —
    # explode covers generate_graph.py:52-54 AND the creation-ordered
    # propagation of generate_graph.py:73-75 (see fold.py docstring)
    t_dates = base.select(feat.alias("s"), F.explode("editions").alias("year")).select(
        "s", F.lit(DCTERMS + "date").alias("p"),
        year_to_datetime(F.col("year")).alias("o"),
        F.lit("http://www.w3.org/2001/XMLSchema#dateTime").alias("o_dt"),
    )
    t_wkt = base.select(
        geom.alias("s"), F.lit(GEO + "asWKT").alias("p"),
        F.col("wkt").alias("o"), F.lit(GEO + "wktLiteral").alias("o_dt"),
    )
    return t_feature.unionByName(t_geometry).unionByName(t_has_geom).unionByName(
        t_created
    ).unionByName(t_dates).unionByName(t_wkt)


def relation_triples(relations: DataFrame) -> DataFrame:
    """sfContains + symmetric sfWithin (generate_graph.py:70-71)."""
    contains = relations.select(
        _feature_uri(F.col("parent_gid")).alias("s"),
        F.lit(GEO + "sfContains").alias("p"),
        _feature_uri(F.col("child_gid")).alias("o"),
        F.lit(None).cast("string").alias("o_dt"),
    )
    within = relations.select(
        _feature_uri(F.col("child_gid")).alias("s"),
        F.lit(GEO + "sfWithin").alias("p"),
        _feature_uri(F.col("parent_gid")).alias("o"),
        F.lit(None).cast("string").alias("o_dt"),
    )
    return contains.unionByName(within)


def osm_triples(osm_links: DataFrame) -> DataFrame:
    """sfOverlaps per linked OSM URI (generate_graph.py:77-82)."""
    return osm_links.select(
        _feature_uri(F.col("gid")).alias("s"),
        F.lit(GEO + "sfOverlaps").alias("p"),
        F.explode("osm_uris").alias("o"),
    ).withColumn("o_dt", F.lit(None).cast("string"))


def build_triples(
    segments: DataFrame, relations: DataFrame, osm_links: DataFrame | None = None
) -> DataFrame:
    t = segment_triples(segments).unionByName(relation_triples(relations))
    if osm_links is not None:
        t = t.unionByName(osm_triples(osm_links))
    return t


def propagate_editions_fixpoint(segments: DataFrame, relations: DataFrame) -> DataFrame:
    """J3 as an iterative Spark join: derive each node's transitive edition
    set purely relationally (SURVEY.md §2.3 J3), independent of the fold's
    creation-time propagation — used to cross-check the ``editions`` column.

    dates(n) = own_years(n) ∪ ⋃_{p parent of n} dates(p); DAG depth is
    bounded by the number of editions, so the loop terminates quickly.
    Returns (gid, edition) pairs.
    """
    own = segments.select(
        "gid",
        F.when(
            ~F.col("name").contains("_"), F.array(F.substring("name", 1, 4))
        ).otherwise(F.array().cast("array<string>")).alias("years"),
    ).select("gid", F.explode("years").alias("edition"))

    acc = own
    edges = relations.select("parent_gid", "child_gid")
    while True:
        step = (
            acc.join(edges, acc.gid == edges.parent_gid)
            .select(F.col("child_gid").alias("gid"), "edition")
        )
        new = step.join(acc, on=["gid", "edition"], how="left_anti").distinct()
        if new.isEmpty():
            return acc
        acc = acc.unionByName(new).distinct().localCheckpoint()


def to_ntriples(triples: DataFrame):
    """Formatting select for the text sink (S9): one N-Triples line per row."""
    is_uri = F.col("o").startswith("http")
    obj = (
        F.when(F.col("o_dt").isNotNull(),
               F.concat(F.lit('"'), F.col("o"), F.lit('"^^<'), F.col("o_dt"), F.lit(">")))
        .when(is_uri, F.concat(F.lit("<"), F.col("o"), F.lit(">")))
        .otherwise(F.concat(F.lit('"'), F.col("o"), F.lit('"')))
    )
    return triples.select(
        F.concat(F.lit("<"), F.col("s"), F.lit("> <"), F.col("p"), F.lit("> "),
                 obj, F.lit(" .")).alias("value")
    )


def write_ntriples(triples: DataFrame, path: str) -> None:
    to_ntriples(triples).write.mode("overwrite").text(path)


# Turtle prefixing (generate_graph.py:121 serializes Turtle; the reference's
# bundled golden file data/railroads/ca/linked_maps.railroads.ca.ttl uses
# these prefixes)
_TURTLE_PREFIXES = [
    ("lmg:", LMG),
    ("geo:", GEO),
    ("dcterms:", DCTERMS),
    ("rdf:", "http://www.w3.org/1999/02/22-rdf-syntax-ns#"),
    ("xsd:", "http://www.w3.org/2001/XMLSchema#"),
]


def _curie(col):
    """Compress a URI column to a CURIE where a prefix matches, else <uri>."""
    expr = F.concat(F.lit("<"), col, F.lit(">"))
    for short, long in reversed(_TURTLE_PREFIXES):
        expr = F.when(
            col.startswith(long),
            F.concat(F.lit(short), F.substring(col, len(long) + 1, 4096)),
        ).otherwise(expr)
    return expr


def to_turtle(triples: DataFrame) -> DataFrame:
    """Turtle body lines with prefixed names (S9 parity with
    generate_graph.py:121's Turtle serialization; one triple per line —
    subject grouping is a cosmetic Turtle feature, not required syntax)."""
    is_uri = F.col("o").startswith("http")
    obj = (
        F.when(
            F.col("o_dt").isNotNull(),
            F.concat(F.lit('"'), F.col("o"), F.lit('"^^'), _curie(F.col("o_dt"))),
        )
        .when(is_uri, _curie(F.col("o")))
        .otherwise(F.concat(F.lit('"'), F.col("o"), F.lit('"')))
    )
    return triples.select(
        F.concat(
            _curie(F.col("s")), F.lit(" "), _curie(F.col("p")), F.lit(" "),
            obj, F.lit(" ."),
        ).alias("value")
    )


def write_turtle(triples: DataFrame, path: str) -> None:
    """Single-file Turtle export: @prefix header then body.  The header must
    precede every use, so this coalesces to one file — Turtle export is a
    report-sized boundary artifact, not a data-plane sink (use
    :func:`write_ntriples` for bulk graph export)."""
    spark = triples.sparkSession
    header = spark.createDataFrame(
        [(f"@prefix {s} <{l}> .",) for s, l in _TURTLE_PREFIXES], "value string"
    ).coalesce(1)
    # coalesce AFTER the union keeps partition order (header, then body) and
    # produces one part file
    header.unionAll(to_turtle(triples).coalesce(1)).coalesce(1).write.mode(
        "overwrite"
    ).text(path)
