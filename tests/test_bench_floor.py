"""Performance floor — the default TPU path must not silently regress.

Round 2 shipped a 5x throughput regression (fragments default-on for
shallow trees) that no test caught because the perf harness only ran at
round end; round 3's fixed 800-floor was too loose to catch a 23% drift.
This guard runs the bench workload's core (a 2AP05 subproblem grid through
the production wave path) whenever a REAL TPU is attached and fails if
throughput drops below **60% of the last driver-captured BENCH_r*.json
value** — tight enough to flag real drift, loose enough for axon run-to-run
variance.  On CPU hosts the test skips — the floor is a device-path
property.
"""

import glob
import json
import os

import numpy as np
import pytest


def _on_real_tpu() -> bool:
    try:
        import jax

        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _last_committed_bench() -> float:
    """Newest BENCH_r*.json value at the repo root (driver-captured)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    best = 0.0
    for path in sorted(glob.glob(os.path.join(repo, "BENCH_r*.json"))):
        try:
            with open(path) as fh:
                rec = json.load(fh)
            val = float(rec.get("parsed", rec).get("value", 0.0))
        except Exception:
            continue
        if val > 0:
            best = val  # sorted ascending: keep the newest round's value
    return best


FLOOR_LEX_IPS_PER_SEC = max(800.0, 0.6 * _last_committed_bench())


@pytest.mark.skipif(not _on_real_tpu(), reason="device-path perf floor")
def test_wave_throughput_floor():
    import time

    from moip_aira_tpu.io import read_problem
    from moip_aira_tpu.solver.lex import LexRequest
    from moip_aira_tpu.solver.wave import WaveLexBackend

    p = read_problem("/root/reference/Examples/2AP05.lp")
    be = WaveLexBackend(p, batch_width=1024, nodes_per_task=32)
    reqs = []
    for perm in ([0, 1], [1, 0]):
        for b1 in range(24, 56):
            for b0 in [np.inf, 50, 42, 34, 27]:
                rhs = np.array([float(b0), float(b1)])
                if perm == [1, 0]:
                    rhs = rhs[::-1]
                reqs.append(LexRequest(rhs=rhs.copy(), perm=list(perm)))
    be.lex_solve_batch(reqs[:2])  # compile warm-up
    t0 = time.time()
    outs = be.lex_solve_batch(reqs)
    dt = time.time() - t0
    ips = sum(o.ip_solves for o in outs)
    rate = ips / dt
    assert rate >= FLOOR_LEX_IPS_PER_SEC, (
        f"wave path throughput {rate:.0f} lex-IP/s under the "
        f"{FLOOR_LEX_IPS_PER_SEC:.0f} floor (60% of last BENCH_r*.json)"
    )
