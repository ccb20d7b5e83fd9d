"""Structured Streaming front-end for the CDC engine (SURVEY.md §2.11).

The reference is batch-only (sequential per-edition fold, main.py:141-154).
The engine's streaming story: ``readStream`` over the WAL landing directory →
``foreachBatch`` → the same epoch-apply used by batch ingest.  Event order is
given by ``commit`` (not wall-clock), so no watermark is needed for
correctness — within each micro-batch events are folded in commit order per
key, and the commit-log watermark makes redelivery a no-op (exactly-once at
the table level even under at-least-once delivery from the source).

``trigger(availableNow=True)`` drains the backlog incrementally with source
checkpointing — the streaming analog of the batch ``ingest()`` loop; a
continuous trigger tails new files as they land.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .changelog import CHANGE_LOG_SCHEMA
from .ingest import CdcEngine


def stream_ingest(
    engine: CdcEngine,
    wal_dir: str,
    checkpoint_dir: str,
    commits_per_epoch: int = 8,
    schema: str = CHANGE_LOG_SCHEMA,
):
    """Drain the WAL directory into the engine via Structured Streaming.

    Returns the finished StreamingQuery (availableNow drains and stops).
    """
    spark: SparkSession = engine.spark
    stream = spark.readStream.schema(schema).parquet(wal_dir)

    def apply_batch(batch_df, batch_id: int) -> None:
        # The commit-log watermark inside ingest() deduplicates redelivered
        # micro-batches (checkpoint replay after a crash) — the sink-side
        # half of exactly-once; the source checkpoint is the other half.
        engine.ingest(batch_df, commits_per_epoch=commits_per_epoch)

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
