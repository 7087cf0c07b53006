"""Benchmark: ILP subproblem throughput per chip, with front-parity guard.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Workload: a realistic mix of distinct CLMOIP subproblems from the 2AP05
enumeration space (both objective orderings x a grid of objective-bound
boxes), solved through the production TPU path (wave backend: batched f32
device LPs + f64 certification + host B&B).  The value is lexicographic ILP
subproblems (CPXmipopt-equivalents) per second per chip.

Baseline: the reference solves 2AP05 at 24 IPs in 0.031 CPU-seconds
(Examples/2AP05.out footer; BASELINE.md §A) => ~774 IP/s on its
(unspecified) CPU.  vs_baseline = ours / 774.
"""

import json
import os
import sys
import time

# the TRUE reference instance + its 9-point golden (read-only), so the
# parity guard guards the reference contract, not a regenerated twin
EXAMPLES = (
    "/root/reference/Examples"
    if os.path.exists("/root/reference/Examples/2AP05.lp")
    else os.path.join(os.path.dirname(os.path.abspath(__file__)), "examples")
)

BASELINE_IPS_PER_SEC = 24 / 0.031  # reference 2AP05 footer


def main() -> int:
    import numpy as np

    from moip_aira_tpu.io import read_problem
    from moip_aira_tpu.solver.lex import LexRequest
    from moip_aira_tpu.solver.wave import WaveLexBackend

    p = read_problem(os.path.join(EXAMPLES, "2AP05.lp"))

    # 2048 lanes fit the whole 1920-request grid in one wave per stage
    # generation: 12 device waves instead of 16 (A/B: 3.2-3.5k vs 2.6-3.0k
    # lex-IP/s at 1024)
    be = WaveLexBackend(p, batch_width=2048, nodes_per_task=32)

    # --- workload: distinct subproblems over the front's bound space -------
    reqs = []
    for perm in ([0, 1], [1, 0]):
        for b1 in range(24, 56):  # golden obj1 range
            for b0 in [np.inf, 50, 42, 34, 27]:
                rhs = np.array([float(b0), float(b1)])
                if perm == [1, 0]:
                    rhs = rhs[::-1]
                reqs.append(LexRequest(rhs=rhs, perm=perm))
    # replicate the grid with perturbed first-objective caps for saturation
    extra = []
    for r in reqs:
        for d in (1, 2, 3, 4, 5):
            rhs = r.rhs.copy()
            if np.isfinite(rhs).any():
                rhs[np.isfinite(rhs)] += d
            extra.append(LexRequest(rhs=rhs, perm=r.perm))
    reqs = (reqs + extra)[:1920]

    # --- warm-up (compile; persistent-cached across runs) ------------------
    t0 = time.time()
    be.lex_solve_batch(reqs[:2])
    warm_s = time.time() - t0

    # --- timed runs: median of 3 (tunnel/device variance is ~15%) ----------
    lp0, wv0 = int(be.lp_count), int(be.device_waves)
    trials = []
    for _ in range(3):
        t0 = time.time()
        outs = be.lex_solve_batch(reqs)
        dt = time.time() - t0
        trials.append((sum(o.ip_solves for o in outs) / dt, dt))
    trials.sort()
    ips_per_sec, dt = trials[1]
    ips = round(ips_per_sec * dt)
    lp_count = (int(be.lp_count) - lp0) // 3  # per-trial
    waves = (int(be.device_waves) - wv0) // 3

    # --- parity guard: the full enumeration must reproduce the golden front
    # (read the expected front from the .out file next to the instance)
    expected = 0
    with open(os.path.join(EXAMPLES, "2AP05.out")) as fh:
        for line in fh:
            parts = line.split()
            if parts and all(t.lstrip("-").isdigit() for t in parts):
                expected += 1
    # reuse the already-compiled backend (a second kernel build would roll
    # the compile-service dice again)
    from moip_aira_tpu.core.store import Solutions
    from moip_aira_tpu.engine.scheduler import Scheduler
    from moip_aira_tpu.parallel.cluster import build_cluster

    sched = Scheduler(p, be)
    all_s = Solutions(p.objcnt)
    sched.run(
        build_cluster(2, p.objcnt, p.objsen, True), all_s, Solutions(p.objcnt)
    )
    parity = all_s.sorted_unique_points().shape[0] == expected

    print(
        json.dumps(
            {
                "metric": "ilp_subproblems_per_sec_per_chip",
                "value": round(ips_per_sec, 1),
                "unit": "lex-IP/s",
                "vs_baseline": round(ips_per_sec / BASELINE_IPS_PER_SEC, 3),
                "detail": {
                    "workload": "2AP05 subproblem grid x both orderings",
                    "requests": len(reqs),
                    "stage_ips": int(ips),
                    "lp_relaxations": lp_count,
                    "device_waves": waves,
                    "verify_fallbacks": int(be.verify_fallbacks),
                    "seconds": round(dt, 3),
                    "trials_ips_per_sec": [round(t[0], 1) for t in trials],
                    "warmup_compile_seconds": round(warm_s, 1),
                    "front_parity_2AP05": parity,
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except Exception as e:  # never leave the driver without a JSON line
        print(
            json.dumps(
                {
                    "metric": "ilp_subproblems_per_sec_per_chip",
                    "value": 0.0,
                    "unit": "lex-IP/s",
                    "vs_baseline": 0.0,
                    "error": f"{type(e).__name__}: {e}",
                }
            )
        )
        sys.exit(0)
