"""Similarity search over embedding columns (array<float>).

* :func:`cosine_topk` — brute-force cosine top-k: the correctness baseline.
  Dot products run JVM-side via ``zip_with``/``aggregate`` in float64 with a
  sequential left fold — bit-compatible with DuckDB's ``list_dot_product``
  over ``DOUBLE[]``.
* :func:`ann_lsh_topk` — the scale path: random-hyperplane LSH buckets
  (hyperplane components derived from the portable hash → deterministic, no
  RNG state), candidates restricted to same-bucket pairs.  At 100 TB the
  bucket join replaces the O(N·Q) cross product with O(candidates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import h32


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def with_norm(df: DataFrame, vec: str = "embedding") -> DataFrame:
    v = _as_double(F.col(vec))
    return df.withColumn("_v", v).withColumn("_norm", F.sqrt(_dot(F.col("_v"), F.col("_v"))))


def cosine_topk(
    embeddings: DataFrame, n_queries: int = 5, k: int = 5
) -> DataFrame:
    """Top-k cosine neighbors for the first ``n_queries`` vec_ids.

    Join is query-side broadcast (queries are tiny); ranking window has a
    unique (sim desc, vec_id asc) tie-break."""
    base = with_norm(embeddings).select("vec_id", "_v", "_norm")
    q = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("_v").alias("_qv"), F.col("_norm").alias("_qn")
    )
    pairs = base.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    scored = pairs.withColumn(
        "cosine",
        F.round(_dot(F.col("_v"), F.col("_qv")) / (F.col("_norm") * F.col("_qn")), 6),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine", "rank")
        .orderBy("query_id", "rank")
    )


def cosine_topk_sql(n_queries: int = 5, k: int = 5) -> str:
    return f"""
    WITH base AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM base
          WHERE vec_id < {n_queries}),
    scored AS (
        SELECT q.query_id, b.vec_id AS neighbor_id,
               ROUND(list_dot_product(b.v, q.qv) / (b.nrm * q.qn), 6) AS cosine
        FROM base b JOIN q ON b.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rank
    FROM ranked WHERE rank <= {k}
    ORDER BY query_id, rank
    """


def ann_lsh_topk(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 5,
    n_planes: int = 8,
    n_bands: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH with band-OR candidates.

    Hyperplane p's component for dimension d is
    ``(h32(f"{p}:{d}") / 2^31) - 1 ∈ [-1, 1)`` — pure function of (p, d), so
    every executor materializes identical planes without broadcasting RNG
    state, and the whole pipeline is DuckDB-expressible (see
    :func:`ann_lsh_topk_sql`).

    Round-1 required an exact match on the FULL ``n_planes``-bit signature
    (one bucket, no multi-probe), which collapsed recall (12 of the 25
    brute-force rows at sf0.01).  Now the signature splits into ``n_bands``
    bands and a vector is a candidate if it shares ANY band with the query —
    the classic OR-construction: P(candidate) = 1-(1-s^r)^b for sign-agree
    rate s, r = planes/band.  Exact cosine re-ranks candidates.

    Scale plan: base side explodes to N×bands rows joined on the band value
    (equi-join, AQE-splittable); the query side is broadcast."""
    rows = n_planes // n_bands
    planes = [
        F.array(
            *[
                (h32(F.lit(f"{p}:{d}")) / F.lit(float(1 << 31)) - 1.0)
                for d in range(dim)
            ]
        ).alias(f"plane_{p}")
        for p in range(n_planes)
    ]
    base = with_norm(embeddings).select("vec_id", "_v", "_norm", *planes)
    bits = [
        F.when(_dot(F.col("_v"), F.col(f"plane_{p}")) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for p in range(n_planes)
    ]
    band_vals = F.array(
        *[
            F.concat_ws("", F.lit(f"{b}_"), *bits[b * rows : (b + 1) * rows])
            for b in range(n_bands)
        ]
    )
    banded = base.select("vec_id", F.explode(band_vals).alias("band_val"))
    qb = banded.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "band_val"
    )
    cand = (
        banded.join(
            F.broadcast(qb),
            (banded.band_val == qb.band_val) & (banded.vec_id != qb.query_id),
        )
        .select("query_id", "vec_id")
        .dropDuplicates(["query_id", "vec_id"])
    )
    vecs = with_norm(embeddings).select("vec_id", "_v", "_norm")
    qv = vecs.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("_v").alias("_qv"),
        F.col("_norm").alias("_qn"),
    )
    scored = (
        cand.join(vecs, "vec_id")
        .join(F.broadcast(qv), "query_id")
        .withColumn(
            "cosine",
            F.round(_dot(F.col("_v"), F.col("_qv")) / (F.col("_norm") * F.col("_qn")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine", "rank")
        .orderBy("query_id", "rank")
    )


def dedup_embedding_cosine(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 8,
    n_bands: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the dedup-family variant of
    ANN): candidates from the band-OR hyperplane LSH self-join — never a
    cross join — then exact cosine verification at ``threshold``.

    Approximate-candidate + exact-verify semantics: a qualifying pair is
    reported iff it shares ≥1 LSH band (standard near-dup practice; raise
    ``n_bands`` for recall).  The SQL oracle mirrors the same candidate rule,
    so results are value-exact."""
    rows = n_planes // n_bands
    planes = [
        F.array(
            *[(h32(F.lit(f"{p}:{d}")) / F.lit(float(1 << 31)) - 1.0) for d in range(dim)]
        ).alias(f"plane_{p}")
        for p in range(n_planes)
    ]
    base = with_norm(embeddings).select("vec_id", "_v", "_norm", *planes)
    bits = [
        F.when(_dot(F.col("_v"), F.col(f"plane_{p}")) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for p in range(n_planes)
    ]
    band_vals = F.array(
        *[
            F.concat_ws("", F.lit(f"{b}_"), *bits[b * rows : (b + 1) * rows])
            for b in range(n_bands)
        ]
    )
    banded = base.select("vec_id", F.explode(band_vals).alias("band_val"))
    a, c = banded.alias("a"), banded.alias("c")
    cand = (
        a.join(c, (F.col("a.band_val") == F.col("c.band_val"))
               & (F.col("a.vec_id") < F.col("c.vec_id")))
        .select(F.col("a.vec_id").alias("vec_a"), F.col("c.vec_id").alias("vec_b"))
        .dropDuplicates(["vec_a", "vec_b"])
    )
    vecs = with_norm(embeddings).select("vec_id", "_v", "_norm")
    va = vecs.select(F.col("vec_id").alias("vec_a"), F.col("_v").alias("_va"),
                     F.col("_norm").alias("_na"))
    vb = vecs.select(F.col("vec_id").alias("vec_b"), F.col("_v").alias("_vb"),
                     F.col("_norm").alias("_nb"))
    return (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .withColumn(
            "cosine",
            F.round(_dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")), 6),
        )
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
        .orderBy("vec_a", "vec_b")
    )


def dedup_embedding_cosine_sql(
    threshold: float = 0.9, n_planes: int = 8, n_bands: int = 4, dim: int = 64
) -> str:
    rows = n_planes // n_bands

    def plane(p: int) -> str:
        return (
            f"list_transform(range(0, {dim}), d -> "
            f"CAST(('0x' || substr(md5('{p}:' || d), 1, 8)) AS UBIGINT)::BIGINT"
            f" / 2147483648.0 - 1.0)"
        )

    bits = ", ".join(
        f"CASE WHEN list_dot_product(v, {plane(p)}) >= 0 THEN '1' ELSE '0' END AS bit_{p}"
        for p in range(n_planes)
    )
    sig = " || ".join(f"bit_{p}" for p in range(n_planes))
    band_or = " OR ".join(
        f"substr(a.sig, {b * rows + 1}, {rows}) = substr(c.sig, {b * rows + 1}, {rows})"
        for b in range(n_bands)
    )
    return f"""
    WITH base AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        FROM embeddings
    ),
    bitted AS (SELECT vec_id, v, nrm, {bits} FROM base),
    sig AS (SELECT vec_id, v, nrm, {sig} AS sig FROM bitted),
    cand AS (
        SELECT DISTINCT a.vec_id AS vec_a, c.vec_id AS vec_b
        FROM sig a JOIN sig c ON a.vec_id < c.vec_id AND ({band_or})
    ),
    scored AS (
        SELECT cand.vec_a, cand.vec_b,
               ROUND(list_dot_product(sa.v, sb.v) / (sa.nrm * sb.nrm), 6) AS cosine
        FROM cand JOIN sig sa ON sa.vec_id = cand.vec_a
                  JOIN sig sb ON sb.vec_id = cand.vec_b
    )
    SELECT vec_a, vec_b, cosine FROM scored
    WHERE cosine >= {threshold}
    ORDER BY vec_a, vec_b
    """


def ann_lsh_topk_sql(
    n_queries: int = 5,
    k: int = 5,
    n_planes: int = 8,
    n_bands: int = 4,
    dim: int = 64,
) -> str:
    """DuckDB oracle for :func:`ann_lsh_topk` — the hyperplanes are md5-hash
    functions of (plane, dim), so the whole ANN path is SQL-expressible."""
    rows = n_planes // n_bands

    def plane(p: int) -> str:
        return (
            f"list_transform(range(0, {dim}), d -> "
            f"CAST(('0x' || substr(md5('{p}:' || d), 1, 8)) AS UBIGINT)::BIGINT"
            f" / 2147483648.0 - 1.0)"
        )

    bits = ", ".join(
        f"CASE WHEN list_dot_product(v, {plane(p)}) >= 0 THEN '1' ELSE '0' END AS bit_{p}"
        for p in range(n_planes)
    )
    sig = " || ".join(f"bit_{p}" for p in range(n_planes))
    band_or = " OR ".join(
        f"substr(b.sig, {b * rows + 1}, {rows}) = substr(q.qsig, {b * rows + 1}, {rows})"
        for b in range(n_bands)
    )
    return f"""
    WITH base AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        FROM embeddings
    ),
    bitted AS (SELECT vec_id, v, nrm, {bits} FROM base),
    sig AS (SELECT vec_id, v, nrm, {sig} AS sig FROM bitted),
    q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, sig AS qsig
          FROM sig WHERE vec_id < {n_queries}),
    cand AS (
        SELECT DISTINCT q.query_id, b.vec_id
        FROM sig b JOIN q ON b.vec_id <> q.query_id AND ({band_or})
    ),
    scored AS (
        SELECT c.query_id, c.vec_id AS neighbor_id,
               ROUND(list_dot_product(b.v, q.qv) / (b.nrm * q.qn), 6) AS cosine
        FROM cand c JOIN sig b ON b.vec_id = c.vec_id
                    JOIN q ON q.query_id = c.query_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rank
    FROM ranked WHERE rank <= {k}
    ORDER BY query_id, rank
    """
