"""JSON-Lines interchange files — the reference's boundary format (S4–S7).

The reference exports three JL files per run (main.py:50-83,158-160 via a
server-side COPY at postgis_sqls.py:140-146) and stages 2/3 read them back
(generate_graph.py:28-31,102-118; linked_maps_to_osm.py:186-196).  Schemas
reproduced exactly:

    *.geom.jl  {gid, wkt}
    *.seg.jl   {gid, name, gen_time, years}   (years = [name[:4]] iff no '_')
    *.rel.jl   {parent_gid, child_gid}
    *.osm.jl   {gid, osm_uris}

Determinism note: the reference's ``gen_time`` is a wall-clock measurement
(segment.py:50) — nondeterministic; the engine exports 0.0 so files are a
pure function of the WAL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

GEOM_JL_SCHEMA = "gid string, wkt string"
SEG_JL_SCHEMA = "gid string, name string, gen_time double, years array<string>"
REL_JL_SCHEMA = "parent_gid string, child_gid string"
OSM_JL_SCHEMA = "gid string, osm_uris array<string>"


def geom_jl(segments: DataFrame) -> DataFrame:
    return segments.select("gid", "wkt")


def seg_jl(segments: DataFrame) -> DataFrame:
    # years from the name rule only (main.py:66-67) — NOT the propagated set
    return segments.select(
        "gid",
        "name",
        F.lit(0.0).alias("gen_time"),
        F.when(
            ~F.col("name").contains("_"), F.array(F.substring("name", 1, 4))
        ).otherwise(F.array().cast("array<string>")).alias("years"),
    )


def rel_jl(relations: DataFrame) -> DataFrame:
    return relations.select("parent_gid", "child_gid")


def osm_jl(osm_links: DataFrame) -> DataFrame:
    """linked_maps_to_osm.py:239-253 export: {gid, osm_uris}."""
    return osm_links.select("gid", "osm_uris")


def export_jl(
    segments: DataFrame,
    relations: DataFrame,
    out_prefix: str,
    osm_links: DataFrame | None = None,
) -> None:
    """main.py:158-160: <prefix>.geom.jl / .seg.jl / .rel.jl directories,
    plus .osm.jl when a link table is supplied (linked_maps_to_osm.py:248)."""
    geom_jl(segments).write.mode("overwrite").json(out_prefix + ".geom.jl")
    seg_jl(segments).write.mode("overwrite").json(out_prefix + ".seg.jl")
    rel_jl(relations).write.mode("overwrite").json(out_prefix + ".rel.jl")
    if osm_links is not None:
        osm_jl(osm_links).write.mode("overwrite").json(out_prefix + ".osm.jl")


def read_jl(spark: SparkSession, out_prefix: str, with_osm: bool = False):
    """S7 readers with explicit schemas (never infer at scale)."""
    out = (
        spark.read.schema(GEOM_JL_SCHEMA).json(out_prefix + ".geom.jl"),
        spark.read.schema(SEG_JL_SCHEMA).json(out_prefix + ".seg.jl"),
        spark.read.schema(REL_JL_SCHEMA).json(out_prefix + ".rel.jl"),
    )
    if with_osm:
        return (*out, spark.read.schema(OSM_JL_SCHEMA).json(out_prefix + ".osm.jl"))
    return out
