"""CDC ingest driver for real ``spark-submit --py-files`` deployment.

The north rule's deployment contract, run literally::

    python -c "import sys; sys.path.insert(0, '.'); \
               from linked_maps_spark.session import _package_zip; \
               print(_package_zip())"           # → /tmp/linked_maps_spark_pyfiles.zip
    /opt/spark/bin/spark-submit \
        --master 'local-cluster[4,8,8192]' \
        --py-files /tmp/linked_maps_spark_pyfiles.zip \
        tools/submit_job.py --keys 600 --commits 8

Unlike ``tools/ingest_job.py`` (the in-repo scaling harness), this script
makes NO sys.path assumptions: ``linked_maps_spark`` must resolve from the
``--py-files`` zip on both the driver and every executor JVM's python
workers — running it from a directory that does not contain the repo proves
the packaged deployment works end-to-end.  The master comes from
``spark-submit --master`` (not hardcoded), so the same command line moves
to a real multi-executor cluster unchanged.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import tempfile
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", type=int, default=600)
    ap.add_argument("--commits", type=int, default=8)
    ap.add_argument("--seed", type=int, default=77)
    ap.add_argument("--zipf", type=float, default=1.2)
    ap.add_argument("--walks", type=int, default=6)
    ap.add_argument("--walklen", type=int, default=8)
    ap.add_argument("--commits-per-epoch", type=int, default=4)
    ap.add_argument("--shuffle", type=int, default=32)
    ap.add_argument("--n-buckets", type=int, default=16)
    args = ap.parse_args()

    builder = (
        SparkSession.builder.appName("lms-submit")
        # engine defaults (session.get_spark), minus the master: that is
        # spark-submit's job in a packaged deployment
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.shuffle.partitions", str(args.shuffle))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.ui.enabled", "false")
    )
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        local_dir = os.path.join(shm, "lms-spark-local")
        os.makedirs(local_dir, exist_ok=True)
        builder = builder.config("spark.local.dir", local_dir)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # resolved from --py-files on driver AND executors — no repo checkout
    from linked_maps_spark import geometry as G
    from linked_maps_spark.changelog import synth_change_log, to_spark
    from linked_maps_spark.ingest import CdcEngine

    wal = synth_change_log(
        n_keys=args.keys, n_commits=args.commits, seed=args.seed,
        zipf_s=args.zipf, n_walks=args.walks, walk_len=args.walklen,
    )
    wal_df = to_spark(spark, wal).cache()
    n_events = wal_df.count()

    scratch = shm if os.path.isdir(shm) else None
    wh = tempfile.mkdtemp(prefix="lms_submit_", dir=scratch)
    try:
        eng = CdcEngine(spark, wh, geom_type=G.LINE, n_buckets=args.n_buckets)
        eng.create_tables(overwrite=True)
        t0 = time.monotonic()
        eng.ingest(wal_df, commits_per_epoch=args.commits_per_epoch)
        sec = time.monotonic() - t0
        rows = eng.current_segments().count()
    finally:
        shutil.rmtree(wh, ignore_errors=True)

    print(
        json.dumps(
            {
                "master": spark.sparkContext.master,
                "events": n_events,
                "wall_sec": round(sec, 2),
                "events_per_sec": round(n_events / sec, 1),
                "segment_rows": rows,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
