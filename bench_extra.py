"""Round-6 auxiliary benchmarks (bench.py is FROZEN; extras live here).

Subcommands:

* ``sweep [sf_dir]``   — time EVERY ``queries()`` entry (count() action, one
  pass), print sorted-by-cost + total.  The round-6 optimization evidence:
  526 s → 110 s over 105 entries at sf0.1 (see OPTIMIZATION_r06.md).
* ``ingest``           — the bench.py cdc_ingest leg twice in one session
  (cold and warm) with ``LMS_TRACE_INGEST=1`` span breakdowns.
* ``noop <name> [sf]`` — isolate one query's computation with the noop sink
  (guide §1.4), 3 samples.

Usage: ``python bench_extra.py sweep /root/testdata/sf0.1``
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _spark(cpus: str = "32"):
    from linked_maps_spark.session import get_spark

    sp = get_spark(
        "bench-extra",
        cores=cpus,
        extra_conf={"spark.sql.adaptive.coalescePartitions.enabled": "true"},
    )
    sp.sparkContext.setLogLevel("ERROR")
    sp.range(1000).count()
    return sp


def sweep(sf_dir: str) -> None:
    import __spark_entry__ as entry_mod

    spark = _spark()
    qs = entry_mod.queries()
    out = []
    for name, fn in qs.items():
        spark.sparkContext.setJobDescription(f"sweep: {name}")
        t0 = time.monotonic()
        n = fn(spark, sf_dir).count()
        dt = time.monotonic() - t0
        out.append((dt, name, n))
        print(f"{dt:7.2f}s  {name} ({n})", flush=True)
    print("---- slowest ----")
    for dt, name, _ in sorted(out, reverse=True)[:15]:
        print(f"{dt:7.2f}s  {name}")
    print(f"total: {sum(d for d, _, _ in out):.1f}s over {len(out)} queries")
    spark.stop()


def ingest() -> None:
    import shutil
    import tempfile

    from linked_maps_spark import geometry as G
    from linked_maps_spark.changelog import synth_change_log, to_spark
    from linked_maps_spark.ingest import CdcEngine, prewarm_workers
    from linked_maps_spark.util import scratch_root

    os.environ["LMS_TRACE_INGEST"] = "1"
    spark = _spark()
    prewarm_workers(spark)
    wal = synth_change_log(n_keys=4000, n_commits=8, seed=77, zipf_s=1.2)
    wal_df = to_spark(spark, wal).repartition(32).cache()
    n = wal_df.count()
    for run in ("cold", "warm"):
        wh = tempfile.mkdtemp(prefix="lms_bx_", dir=scratch_root())
        try:
            eng = CdcEngine(spark, wh, geom_type=G.LINE, n_buckets=32)
            eng.create_tables(overwrite=True)
            t0 = time.monotonic()
            eng.ingest(wal_df, commits_per_epoch=8)
            dt = time.monotonic() - t0
            print(f"[{run}] ingest: {dt:.2f}s  ({n / dt:.0f} ev/s)", flush=True)
        finally:
            shutil.rmtree(wh, ignore_errors=True)
    spark.stop()


def noop(name: str, sf_dir: str) -> None:
    import __spark_entry__ as entry_mod

    spark = _spark()
    qs = entry_mod.queries()
    for i in range(3):
        t0 = time.monotonic()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        print(f"{name} noop run{i}: {time.monotonic() - t0:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "sweep"
    if cmd == "sweep":
        sweep(sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1")
    elif cmd == "ingest":
        ingest()
    elif cmd == "noop":
        noop(sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1")
    else:
        raise SystemExit(f"unknown subcommand {cmd!r}")
