"""Two-parallelism scaling evidence → BENCH/scaling_latest.md.

Runs tools/ingest_job.py at local[N] and local[4N] (fresh JVM each, identical
seeded input) and reports T_N, T_4N and scaling efficiency
T_4N_throughput / (4 × T_N_throughput) — the sandbox evidence for the
north_rule's N→4N ≥ 0.8 criterion (BASELINE.md).

Each leg runs SCALE_REPEATS times and the BEST (max-throughput) sample is
used: this sandbox shares a hypervisor whose background load was measured
swinging identical runs by up to 1.8× (e.g. the same 4-core job: 144 s /
166 s / 258 s back-to-back), and best-of-N is the standard estimator of the
uncontended machine.  All samples are reported in the artifact.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(cores: int, keys: int, commits: int) -> dict:
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


def run_interleaved(
    n: int, keys: int, commits: int, repeats: int
) -> tuple[dict, list[dict], dict, list[dict]]:
    """Alternate (N, 4N) legs so both legs see the same weather windows.

    Running all T_N legs then all T_4N legs (the old order) lets hypervisor
    load drift between the two phases bias the ratio in either direction;
    paired alternation exposes both legs to the same background-load
    trajectory.  The estimator is unchanged: best-of-N per leg.
    """
    lo_samples: list[dict] = []
    hi_samples: list[dict] = []
    for _ in range(repeats):
        lo_samples.append(run_once(n, keys, commits))
        hi_samples.append(run_once(4 * n, keys, commits))
    lo = max(lo_samples, key=lambda s: s["events_per_sec"])
    hi = max(hi_samples, key=lambda s: s["events_per_sec"])
    return lo, lo_samples, hi, hi_samples


def main() -> None:
    # default pair: N=1 → 4N=4 cores — the compute-bound regime where local
    # scaling predicts executor scaling (see BENCH/BASELINE.md analysis).
    # 16000 keys = 128k events: large enough that per-epoch fixed costs
    # amortize (at 32k events the same pair measures ~0.72).
    n = int(os.environ.get("SCALE_N", "1"))
    keys = int(os.environ.get("SCALE_KEYS", "16000"))
    commits = int(os.environ.get("SCALE_COMMITS", "8"))
    repeats = int(os.environ.get("SCALE_REPEATS", "2"))
    lo, lo_samples, hi, hi_samples = run_interleaved(n, keys, commits, repeats)
    eff = hi["events_per_sec"] / (4 * lo["events_per_sec"])

    def fmt_samples(samples: list[dict]) -> str:
        return ", ".join(f"{s['sec']}s ({s['events_per_sec']} ev/s)" for s in samples)

    md = f"""# BENCH — two-parallelism scaling evidence

Per BASELINE.md's sandbox evidence plan: the **identical** CDC ingest job
(seeded Zipf-skewed WAL, {lo['events']} change events, same configs with
shuffle partitions scaled to cores) run at two local parallelism levels in
fresh JVMs, standing in for N vs 4N executors.  Each leg = best of
{repeats} runs, legs ALTERNATED (N, 4N, N, 4N, ...) so both legs sample the
same background-load windows (hypervisor load swings identical runs by up
to 1.8×; all samples below).

| run | master | events | wall (s) | events/sec | all samples |
|---|---|---|---|---|---|
| T_N  | local[{n}]  | {lo['events']} | {lo['sec']} | {lo['events_per_sec']} | {fmt_samples(lo_samples)} |
| T_4N | local[{4*n}] | {hi['events']} | {hi['sec']} | {hi['events_per_sec']} | {fmt_samples(hi_samples)} |

**Scaling efficiency** = T_4N_throughput / (4 × T_N_throughput)
= {hi['events_per_sec']} / (4 × {lo['events_per_sec']}) = **{eff:.3f}**
(target ≥ 0.8 → {"MET" if eff >= 0.8 else "NOT MET"}).

Input digest check: both runs produced {lo['segments_rows']} vs
{hi['segments_rows']} segment rows (must be equal — parallelism-invariant
state).

Reproduce: `python tools/bench_scaling.py` (env: SCALE_N, SCALE_KEYS,
SCALE_COMMITS, SCALE_REPEATS).
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # curated analysis lives in BENCH/BASELINE.md; reproductions land here
    with open(os.path.join(REPO, "BENCH", "scaling_latest.md"), "w") as fh:
        fh.write(md)
    print(md)
    print(json.dumps({"t_n": lo, "t_4n": hi, "efficiency": round(eff, 3),
                      "t_n_samples": lo_samples, "t_4n_samples": hi_samples}))


if __name__ == "__main__":
    main()
