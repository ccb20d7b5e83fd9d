"""CDC ingest: WAL tail → per-key fold → exactly-once MERGE into lake tables.

Spark redesign of the reference lifecycle (SURVEY.md §3.1): the reference
folds editions sequentially over a single Postgres connection
(main.py:141-154, one transaction per edition at main.py:121); here the WAL is
consumed in **epochs** (micro-batches of commit labels), each epoch shuffled
by ``(repo, path)`` into a cogrouped ``applyInPandas`` fold — sequential per
key, parallel across keys — and MERGEd into snapshot-versioned lake tables.

Exactly-once contract
---------------------
* The watermark (last ingested commit label) is read from the ``commit_log``
  table, which is written **last** in each epoch.
* A crash between the segments/relations MERGE and the commit-log append
  replays the epoch; the MERGE is idempotent (content-hash gids, whole-row
  upserts), so replay converges to the same state — verified by the
  digest-equality tests.
* Duplicate / reordered events inside an epoch are collapsed by a
  deterministic last-writer-wins window over ``(repo, path, commit)``.

Resume state lives in the ``segments`` table itself (``is_leaf`` rows), not
in Spark state stores — SURVEY.md §7.3.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import geometry as G
from .fold import RELATION_COLUMNS, SEGMENT_BASE_COLUMNS, fold_key
from .lakehouse import LakeTable

EVENT_CORE_COLS = ("repo", "path", "commit", "content")

COMMIT_LOG_SCHEMA = (
    "epoch long, start_commit string, end_commit string, n_events long, "
    "n_keys long, wall_ms double, throughput_eps double"
)
METRICS_SCHEMA = (
    "epoch long, partition_id int, n_keys long, n_segments long, "
    "n_relations long, n_events long"
)


def _fold_output_schema(extras: list[tuple[str, str]]) -> str:
    base = ", ".join(f"{c} {t}" for c, t in SEGMENT_BASE_COLUMNS)
    rel = "parent_gid string, child_gid string"
    extra = "".join(f", {c} {t}" for c, t in extras)
    return f"kind string, _pid int, {base}, {rel}{extra}"


def _make_fold_fn(geom_type: str, extras: list[tuple[str, str]]):
    seg_cols = [c for c, _ in SEGMENT_BASE_COLUMNS]
    extra_cols = [c for c, _ in extras]
    out_cols = ["kind", "_pid", *seg_cols, "parent_gid", "child_gid", *extra_cols]

    def fn(key, events_pdf: pd.DataFrame, leaves_pdf: pd.DataFrame) -> pd.DataFrame:
        if events_pdf.empty:
            return pd.DataFrame(columns=out_cols)
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else -1
        repo, path = key
        res = fold_key(
            repo,
            path,
            events_pdf.to_dict("records"),
            leaves_pdf.to_dict("records"),
            geom_type=geom_type,
        )
        rows = []
        for seg in res.segments:
            row = {c: seg.get(c) for c in seg_cols + extra_cols}
            row.update(kind="segment", _pid=pid, parent_gid=None, child_gid=None)
            rows.append(row)
        for rel in res.relations:
            row = dict.fromkeys(seg_cols + extra_cols)
            row.update(
                kind="relation",
                _pid=pid,
                repo=rel["repo"],
                path=rel["path"],
                parent_gid=rel["parent_gid"],
                child_gid=rel["child_gid"],
            )
            rows.append(row)
        return pd.DataFrame(rows, columns=out_cols)

    return fn


@dataclass
class EpochStats:
    epoch: int
    start_commit: str
    end_commit: str
    n_events: int
    n_keys: int
    wall_ms: float


@dataclass
class IngestStats:
    epochs: list[EpochStats] = field(default_factory=list)

    @property
    def n_events(self) -> int:
        return sum(e.n_events for e in self.epochs)

    @property
    def wall_ms(self) -> float:
        return sum(e.wall_ms for e in self.epochs)

    @property
    def throughput_eps(self) -> float:
        return self.n_events / (self.wall_ms / 1000.0) if self.wall_ms else 0.0


class CdcEngine:
    """The engine: lake warehouse + ingest loop + table accessors."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        geom_type: str = G.LINE,
        n_buckets: int = 16,
    ):
        self.spark = spark
        self.warehouse = os.path.abspath(warehouse)
        self.geom_type = geom_type
        self.n_buckets = n_buckets

    # ---------------------------------------------------------------- tables

    def _path(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    def create_tables(self, overwrite: bool = False) -> None:
        seg_schema = ", ".join(f"{c} {t}" for c, t in SEGMENT_BASE_COLUMNS)
        rel_schema = ", ".join(f"{c} {t}" for c, t in RELATION_COLUMNS)
        LakeTable.create(
            self.spark, self._path("segments"), seg_schema,
            key_cols=["gid"], n_buckets=self.n_buckets, overwrite=overwrite,
        )
        LakeTable.create(
            self.spark, self._path("relations"), rel_schema,
            key_cols=["parent_gid", "child_gid"], n_buckets=self.n_buckets,
            overwrite=overwrite,
        )
        LakeTable.create(
            self.spark, self._path("commit_log"), COMMIT_LOG_SCHEMA,
            key_cols=[], n_buckets=1, overwrite=overwrite,
        )
        LakeTable.create(
            self.spark, self._path("metrics"), METRICS_SCHEMA,
            key_cols=[], n_buckets=1, overwrite=overwrite,
        )

    @property
    def segments(self) -> LakeTable:
        return LakeTable.load(self.spark, self._path("segments"))

    @property
    def relations(self) -> LakeTable:
        return LakeTable.load(self.spark, self._path("relations"))

    @property
    def commit_log(self) -> LakeTable:
        return LakeTable.load(self.spark, self._path("commit_log"))

    @property
    def metrics(self) -> LakeTable:
        return LakeTable.load(self.spark, self._path("metrics"))

    # ----------------------------------------------------------------- state

    def watermark(self) -> str | None:
        """Last fully committed commit label (from the commit_log table)."""
        df = self.commit_log.read()
        row = df.agg(F.max("end_commit").alias("wm")).collect()[0]
        return row["wm"]

    def current_segments(self) -> DataFrame:
        return self.segments.read()

    def current_leaves(self) -> DataFrame:
        return self.segments.read().filter(F.col("is_leaf") & ~F.col("retired"))

    # ---------------------------------------------------------------- ingest

    def ingest(
        self,
        change_log: DataFrame,
        commits_per_epoch: int = 4,
        max_epochs: int | None = None,
    ) -> IngestStats:
        """Tail the WAL from the current watermark to its head.

        ``max_epochs`` stops early (kill-and-resume tests); a subsequent call
        resumes from the watermark and converges to the same final state.
        """
        wm = self.watermark()
        pending = (
            change_log.select("commit").distinct()
            .filter(F.col("commit") > F.lit(wm)) if wm is not None
            else change_log.select("commit").distinct()
        )
        commits = sorted(r["commit"] for r in pending.collect())
        stats = IngestStats()
        epoch0 = (self.commit_log.read().count() or 0)
        for i in range(0, len(commits), commits_per_epoch):
            if max_epochs is not None and i // commits_per_epoch >= max_epochs:
                break
            chunk = commits[i : i + commits_per_epoch]
            es = self._ingest_epoch(
                epoch0 + i // commits_per_epoch, change_log, chunk[0], chunk[-1]
            )
            stats.epochs.append(es)
        return stats

    def _ingest_epoch(
        self, epoch: int, change_log: DataFrame, start_commit: str, end_commit: str
    ) -> EpochStats:
        t0 = time.monotonic()
        batch = change_log.filter(
            (F.col("commit") >= F.lit(start_commit)) & (F.col("commit") <= F.lit(end_commit))
        )
        # deterministic last-writer-wins dedup within the epoch (window op,
        # SURVEY.md §2.11) — shuffles on the finer (repo,path,commit) key
        w = Window.partitionBy("repo", "path", "commit").orderBy(F.col("content").desc())
        batch = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .cache()
        )

        extras = [
            (f.name, f.dataType.simpleString())
            for f in batch.schema.fields
            if f.name not in EVENT_CORE_COLS
        ]
        # resume state: current leaves of only the keys present in this batch
        leaves = self.current_leaves().join(
            batch.select("repo", "path").distinct(), on=["repo", "path"], how="left_semi"
        )
        changes = (
            batch.groupBy("repo", "path")
            .cogroup(leaves.groupBy("repo", "path"))
            .applyInPandas(
                _make_fold_fn(self.geom_type, extras), _fold_output_schema(extras)
            )
            .cache()
        )

        seg_cols = [c for c, _ in SEGMENT_BASE_COLUMNS] + [c for c, _ in extras]
        seg_changes = changes.filter(F.col("kind") == "segment").select(*seg_cols)
        rel_changes = changes.filter(F.col("kind") == "relation").select(
            *[c for c, _ in RELATION_COLUMNS]
        )
        self.segments.merge_upsert(
            seg_changes, summary={"epoch": epoch, "end_commit": end_commit}
        )
        self.relations.merge_upsert(
            rel_changes, summary={"epoch": epoch, "end_commit": end_commit}
        )

        # per-partition lineage metrics (north_rule: lineage + metrics table)
        mrows = (
            changes.groupBy("_pid")
            .agg(
                F.countDistinct("repo", "path").alias("n_keys"),
                F.sum(F.when(F.col("kind") == "segment", 1).otherwise(0)).alias("n_segments"),
                F.sum(F.when(F.col("kind") == "relation", 1).otherwise(0)).alias("n_relations"),
            )
            .select(
                F.lit(epoch).alias("epoch"),
                F.col("_pid").alias("partition_id"),
                "n_keys",
                "n_segments",
                "n_relations",
                F.lit(None).cast("long").alias("n_events"),
            )
        )
        cnt = batch.agg(
            F.count(F.lit(1)).alias("n"), F.countDistinct("repo", "path").alias("k")
        ).collect()[0]
        n_events, n_keys = cnt["n"], cnt["k"]
        self.metrics.append(mrows, summary={"epoch": epoch})
        changes.unpersist()
        batch.unpersist()

        wall_ms = (time.monotonic() - t0) * 1000.0
        log_row = self.spark.createDataFrame(
            [
                (
                    epoch,
                    start_commit,
                    end_commit,
                    n_events,
                    n_keys,
                    wall_ms,
                    n_events / (wall_ms / 1000.0) if wall_ms else 0.0,
                )
            ],
            COMMIT_LOG_SCHEMA,
        )
        # written LAST: the watermark only advances once the epoch is durable
        self.commit_log.append(log_row, summary={"epoch": epoch, "end_commit": end_commit})
        return EpochStats(epoch, start_commit, end_commit, n_events, n_keys, wall_ms)
