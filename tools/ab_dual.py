"""A/B one bundled instance on the real chip and report fragment stats.

Runs warm (one warm-up solve, one timed solve) through the production wave
backend and prints one JSON line with elapsed seconds, host-record counts,
and golden parity.  The knob under test (e.g. MOIP_FRAG_VMEM_MB, or any
MOIP_* flag) is set by the caller's environment; run one setting per
process so kernel caches and env-read-at-trace-time knobs can't bleed
between arms.  (Named for its first user, the round-3/4 dual-simplex A/B
that ended in the path's deletion — the harness is knob-agnostic.)

Usage:
    MOIP_FRAG_VMEM_MB=88 python tools/ab_dual.py 2AP20
    python tools/ab_dual.py 2AP20 --single   # skip warm-up (long instances)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--single", action="store_true")
    args = ap.parse_args()

    from bench_scale import golden_front, instance_path

    import numpy as np

    from moip_aira_tpu.api import solve_front
    from moip_aira_tpu.io import read_problem
    from moip_aira_tpu.solver.wave import WaveLexBackend
    from moip_aira_tpu.utils.trace import GLOBAL_TIMINGS

    p = read_problem(instance_path(args.name))
    be = WaveLexBackend(p)
    row = {
        "name": args.name,
        "knobs": {
            k: v for k, v in os.environ.items() if k.startswith("MOIP_")
        },
    }
    if not args.single:
        t0 = time.monotonic()
        solve_front(p, backend=be)
        row["warmup_s"] = round(time.monotonic() - t0, 1)
        row["warm_host_recs"] = be.frag_stats.get("host_recs", 0)
    # isolate the timed run's stats from the warm-up's
    warm_fs = {
        k: v for k, v in dict(be.frag_stats).items()
        if isinstance(v, (int, float))
    }
    warm_why = {k: int(v) for k, v in dict(be.frag_stats.get("why", {})).items()}
    GLOBAL_TIMINGS.totals.clear()
    GLOBAL_TIMINGS.counts.clear()
    t0 = time.monotonic()
    res = solve_front(p, backend=be)
    row["elapsed_s"] = round(time.monotonic() - t0, 1)
    row["points"] = res.solution_count
    row["ips"] = res.ip_count
    fs = dict(be.frag_stats)
    for k, v in fs.items():
        if isinstance(v, (int, float)):
            row.setdefault("stats", {})[k] = v - warm_fs.get(k, 0)
    row["host_recs"] = fs.get("host_recs", 0) - row.get("warm_host_recs", 0)
    row["waves"] = fs.get("waves", 0)
    row["ticks"] = fs.get("ticks", 0)
    row["dev_iters"] = fs.get("dev_iters", 0)
    row["why"] = {
        k: int(v) - warm_why.get(k, 0)
        for k, v in dict(fs.get("why", {})).items()
    }
    if "court" in fs:
        row["court"] = {k: int(v) for k, v in fs["court"].items()}
    row["timings"] = {
        k: round(v, 2) for k, v in sorted(GLOBAL_TIMINGS.totals.items())
        if v >= 0.05
    }
    g = golden_front(args.name)
    if g is not None:
        row["parity"] = bool(
            res.points.shape == g.shape and (res.points == g).all()
        )
    print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
