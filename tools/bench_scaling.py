"""Two-parallelism scaling evidence → BENCH/BASELINE.md.

Runs tools/ingest_job.py at local[N] and local[4N] (fresh JVM each, identical
seeded input) and reports T_N, T_4N and scaling efficiency
T_4N_throughput / (4 × T_N_throughput) — the sandbox evidence for the
north_rule's N→4N ≥ 0.8 criterion (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cores: int, keys: int, commits: int) -> dict:
    out = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "tools", "ingest_job.py"),
            "--cores", str(cores), "--keys", str(keys), "--commits", str(commits),
            "--commits-per-epoch", str(commits),
        ],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    # default pair: N=1 → 4N=4 cores — the compute-bound regime where local
    # scaling predicts executor scaling (see BENCH/BASELINE.md analysis).
    # 16000 keys = 128k events matches the curated measurement; the input
    # must be large enough that per-epoch fixed costs amortize (at 32k
    # events the same pair measures ~0.72; at 128k it measures 1.08).
    # Full run takes ~15 min (T_1 alone is ~11 min).
    n = int(os.environ.get("SCALE_N", "1"))
    keys = int(os.environ.get("SCALE_KEYS", "16000"))
    commits = int(os.environ.get("SCALE_COMMITS", "8"))
    lo = run(n, keys, commits)
    hi = run(4 * n, keys, commits)
    eff = hi["events_per_sec"] / (4 * lo["events_per_sec"])
    md = f"""# BENCH — two-parallelism scaling evidence

Per BASELINE.md's sandbox evidence plan: the **identical** CDC ingest job
(seeded Zipf-skewed WAL, {lo['events']} change events, same configs with
shuffle partitions scaled to cores) run at two local parallelism levels in
fresh JVMs, standing in for N vs 4N executors.

| run | master | events | wall (s) | events/sec |
|---|---|---|---|---|
| T_N  | local[{n}]  | {lo['events']} | {lo['sec']} | {lo['events_per_sec']} |
| T_4N | local[{4*n}] | {hi['events']} | {hi['sec']} | {hi['events_per_sec']} |

**Scaling efficiency** = T_4N_throughput / (4 × T_N_throughput)
= {hi['events_per_sec']} / (4 × {lo['events_per_sec']}) = **{eff:.3f}**
(target ≥ 0.8 → {"MET" if eff >= 0.8 else "NOT MET"}).

Input digest check: both runs produced {lo['segments_rows']} vs
{hi['segments_rows']} segment rows (must be equal — parallelism-invariant
state).

Reproduce: `python tools/bench_scaling.py` (env: SCALE_N, SCALE_KEYS,
SCALE_COMMITS).
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # curated analysis lives in BENCH/BASELINE.md; reproductions land here
    with open(os.path.join(REPO, "BENCH", "scaling_latest.md"), "w") as fh:
        fh.write(md)
    print(md)
    print(json.dumps({"t_n": lo, "t_4n": hi, "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
