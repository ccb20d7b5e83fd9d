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
