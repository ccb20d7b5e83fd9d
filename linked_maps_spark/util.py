"""Small shared helpers (digests for replay-equality checks)."""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame


def table_digest(df: DataFrame, cols: list[str] | None = None) -> str:
    """Order-insensitive sha256 digest of a DataFrame's content.

    Used by the exactly-once / resume tests: two replays are equal iff their
    digests are equal (SURVEY.md §5.2 item 2).
    """
    use = sorted(cols or df.columns)
    rows = df.select(*use).collect()
    lines = sorted(repr(tuple(r[c] for c in use)) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism — but ONLY
    when the scan yields fewer partitions (the local small-file artifact:
    one parquet file = one task, serializing every downstream explode/UDF
    onto a single core).  At production scale the scan already yields
    thousands of splits and this is a no-op — no shuffle is added.

    ``cols`` (optional) hash-partitions by those columns so downstream
    per-key work stays co-located; otherwise round-robin.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= min(target, 8):
        return df
    from pyspark.sql import functions as F  # local: util stays import-light

    return df.repartition(target, *[F.col(c) for c in cols]) if cols else df.repartition(target)
