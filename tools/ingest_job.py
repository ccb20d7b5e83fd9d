"""Standalone CDC ingest job (one JVM) — used by bench_scaling.py.

Runs the identical job (same seeded WAL, same configs scaled to cores) at a
given parallelism and prints one JSON line with wall time and throughput.
This is the sandbox stand-in for `spark-submit --py-files` at N vs 4N
executors (BASELINE.md sandbox evidence plan).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--keys", type=int, default=600)
    ap.add_argument("--commits", type=int, default=8)
    ap.add_argument("--seed", type=int, default=77)
    ap.add_argument("--zipf", type=float, default=1.2)
    ap.add_argument("--walks", type=int, default=6)
    ap.add_argument("--walklen", type=int, default=8)
    ap.add_argument("--commits-per-epoch", type=int, default=4)
    ap.add_argument("--shuffle", type=int, default=None)
    ap.add_argument(
        "--executors", type=int, default=None,
        help="use local-cluster[E, cores, 8192] with E real executor JVMs",
    )
    args = ap.parse_args()

    from linked_maps_spark import geometry as G
    from linked_maps_spark.changelog import synth_change_log, to_spark
    from linked_maps_spark.ingest import CdcEngine, prewarm_workers
    from linked_maps_spark.session import get_spark

    spark = get_spark(
        f"scaling-{args.cores}", cores=args.cores, shuffle_partitions=args.shuffle,
        executors=args.executors,
    )
    spark.sparkContext.setLogLevel("ERROR")

    # boot the python-worker pool while the driver synthesizes the WAL —
    # session setup, overlapped instead of paid inside the first fold stage
    prewarm_workers(spark)
    wal = synth_change_log(
        n_keys=args.keys, n_commits=args.commits, seed=args.seed, zipf_s=args.zipf,
        n_walks=args.walks, walk_len=args.walklen,
    )
    wal_df = to_spark(spark, wal).repartition(args.cores).cache()
    n_events = wal_df.count()

    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    wh = tempfile.mkdtemp(prefix=f"lms_scale_{args.cores}_", dir=scratch)
    try:
        eng = CdcEngine(spark, wh, geom_type=G.LINE, n_buckets=max(args.cores, 16))
        eng.create_tables(overwrite=True)
        t0 = time.monotonic()
        eng.ingest(wal_df, commits_per_epoch=args.commits_per_epoch)
        sec = time.monotonic() - t0
        digest_rows = eng.current_segments().count()
    finally:
        shutil.rmtree(wh, ignore_errors=True)

    print(
        json.dumps(
            {
                "executors": args.executors,
                "cores": args.cores,
                "events": n_events,
                "sec": round(sec, 2),
                "events_per_sec": round(n_events / sec, 1),
                "segments_rows": digest_rows,
            }
        )
    )


if __name__ == "__main__":
    main()
