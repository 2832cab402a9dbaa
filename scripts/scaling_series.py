#!/usr/bin/env python
"""Repeated-pair scaling evidence: run the headline crawl at two
parallelism levels k times each (alternating, fresh process per run) and
report per-run seconds plus MIN-based scaling efficiency.

Why min: the sandbox shares a physical host; neighbor load inflates
wide (32-cpu) runs far more than narrow ones (an 8-vcpu run barely
notices a neighbor that a 32-vcpu run contends with). The minimum of k
runs estimates uncontended capability at each width — the quantity the
N-vs-4N *dedicated-node* criterion actually specifies. All samples are
printed so the variance is visible.

Usage: python scripts/scaling_series.py [lo] [hi] [k]
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(ncpu: int) -> float:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_BENCH_MODE="scaling")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    ).stdout
    return float(json.loads(out.strip().splitlines()[-1])["value"])


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    run(hi)  # warm-up: builds web + page cache, spawns worker pool once
    t_lo: list[float] = []
    t_hi: list[float] = []
    for i in range(k):
        t_lo.append(run(lo))
        t_hi.append(run(hi))
        print(f"pair {i + 1}/{k}: sec_{lo}={t_lo[-1]} sec_{hi}={t_hi[-1]}", file=sys.stderr, flush=True)
    eff_min = (min(t_lo) / min(t_hi)) / (hi / lo)
    eff_med = (sorted(t_lo)[k // 2] / sorted(t_hi)[k // 2]) / (hi / lo)
    print(json.dumps({
        f"sec_{lo}_runs": t_lo,
        f"sec_{hi}_runs": t_hi,
        f"sec_{lo}_min": min(t_lo),
        f"sec_{hi}_min": min(t_hi),
        "scaling_efficiency_min": round(eff_min, 3),
        "scaling_efficiency_median": round(eff_med, 3),
        "pairs": k,
    }))


if __name__ == "__main__":
    main()
