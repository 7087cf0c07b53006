"""Revised-simplex Pallas kernel (solver/pallas_rev.py) vs the NumPy oracle.

Runs the Mosaic kernel in interpret mode on CPU — slow per call, so batches
are small — covering: random-LP agreement, the MOP infinite-bound
regression, the warm-start basis rebuild, and the full wave path with
``engine="pallas_rev"``.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from moip_aira_tpu.solver import simplex_jax as sx
from moip_aira_tpu.solver.pallas_rev import make_pallas_rev_batch
from moip_aira_tpu.solver.simplex_np import SimplexWorkspace, solve_lp
from moip_aira_tpu.solver.status import SolveStatus

from conftest import EXAMPLES
from test_simplex import random_lp


def _tile(a, B):
    return jnp.asarray(np.tile(a, (B, 1)), dtype=jnp.float32)


def test_rev_random_lps_match_numpy():
    """One batch of 8 independent random LPs, each checked against the
    NumPy oracle (status + objective)."""
    B = 8
    rng = np.random.default_rng(7)
    m, n = 4, 6
    probs = [random_lp(rng, m, n) for _ in range(B)]
    # all share the same A so the shared-W kernel applies; regenerate with
    # a fixed A and per-lane bounds/costs
    A = probs[0][0]
    ws = SimplexWorkspace(A)
    W = np.hstack([A, -np.eye(m)])
    fn, meta = make_pallas_rev_batch(W.astype(np.float32), B, interpret=True)

    cs, los, his, oracle = [], [], [], []
    for _, row_lb, row_ub, lb, ub, c in probs:
        lo = np.concatenate([lb, row_lb])
        hi = np.concatenate([ub, row_ub])
        oracle.append(solve_lp(ws, c, lo, hi))
        cs.append(np.concatenate([c, np.zeros(m)]))
        los.append(lo)
        his.append(hi)

    c_b = jnp.asarray(np.array(cs), jnp.float32)
    lo_b = jnp.asarray(np.array(los), jnp.float32)
    hi_b = jnp.asarray(np.array(his), jnp.float32)
    st, obj, z, basis, atup, iters = fn(c_b, lo_b, hi_b)
    for i, ref in enumerate(oracle):
        if ref.status == SolveStatus.OPTIMAL:
            assert int(st[i]) == sx.OPTIMAL, i
            assert float(obj[i]) == pytest.approx(ref.obj, abs=1e-3), i
        elif ref.status == SolveStatus.INFEASIBLE:
            assert int(st[i]) == sx.INFEASIBLE, i


def test_rev_infinite_upper_bounds_mop():
    """Same regression contract as the dense kernel: infinite bounds on
    entering variables must survive the pivot (MOP-family instances)."""
    from moip_aira_tpu.io import read_problem

    p = read_problem(f"{EXAMPLES}/moip_2_30_1_knapsack.mop")
    A_full = np.vstack([p.A, p.C])
    m = A_full.shape[0]
    W = np.hstack([A_full, -np.eye(m)])
    B = 8
    fn, _ = make_pallas_rev_batch(W.astype(np.float32), B, interpret=True)
    lo = np.concatenate([p.lb, p.row_lb, [-np.inf] * p.objcnt])
    hi = np.concatenate([p.ub, p.row_ub, [np.inf] * p.objcnt])
    c = np.concatenate([p.C[0], np.zeros(m)])
    st, obj, x, basis, atup, iters = fn(_tile(c, B), _tile(lo, B), _tile(hi, B))
    assert int(st[0]) == 0
    assert float(obj[0]) == pytest.approx(-1885.714, abs=0.01)


def test_rev_warm_start_basis_rebuild():
    """Warm lanes reproduce the cold optimum via the (m, 2m) Gauss-Jordan
    rebuild in far fewer pivots, incl. on a branched child; mixed
    warm/cold waves agree."""
    from moip_aira_tpu.io import read_problem

    p = read_problem(f"{EXAMPLES}/2AP05.lp")
    A_full = np.vstack([p.A, p.C])
    m = A_full.shape[0]
    W = np.hstack([A_full, -np.eye(m)])
    B = 8
    fn, _ = make_pallas_rev_batch(W.astype(np.float32), B, interpret=True)
    lo = np.concatenate([p.lb, p.row_lb, [-np.inf] * p.objcnt])
    hi = np.concatenate([p.ub, p.row_ub, [np.inf] * p.objcnt])
    c = np.concatenate([p.C[0], np.zeros(m)])

    st, obj, x, basis, atup, iters = fn(_tile(c, B), _tile(lo, B), _tile(hi, B))
    assert int(st[0]) == 0
    cold_obj = float(obj[0])
    cold_iters = int(iters[0])
    assert cold_iters > 3

    st2, obj2, _, _, _, it2 = fn(
        _tile(c, B), _tile(lo, B), _tile(hi, B), jnp.asarray(basis), jnp.asarray(atup)
    )
    assert int(st2[0]) == 0
    assert float(obj2[0]) == pytest.approx(cold_obj, abs=1e-3)
    assert int(it2[0]) <= 2

    xs = np.asarray(x[0])
    j = int(np.argmax(np.minimum(xs[: p.n], 1 - xs[: p.n])))
    hi_c = hi.copy()
    hi_c[j] = 0.0
    st3c, obj3c, _, _, _, it3c = fn(_tile(c, B), _tile(lo, B), _tile(hi_c, B))
    st3w, obj3w, _, _, _, it3w = fn(
        _tile(c, B),
        _tile(lo, B),
        _tile(hi_c, B),
        jnp.asarray(basis),
        jnp.asarray(atup),
    )
    assert int(st3w[0]) == int(st3c[0])
    if int(st3c[0]) == 0:
        assert float(obj3w[0]) == pytest.approx(float(obj3c[0]), abs=1e-3)
        assert int(it3w[0]) <= int(it3c[0])

    wb_mix = np.asarray(basis).copy()
    wa_mix = np.asarray(atup).copy()
    wb_mix[1::2] = -1
    wa_mix[1::2] = 0
    st4, obj4, _, _, _, _ = fn(
        _tile(c, B), _tile(lo, B), _tile(hi, B), jnp.asarray(wb_mix), jnp.asarray(wa_mix)
    )
    assert np.all(np.asarray(st4) == 0)
    assert np.allclose(np.asarray(obj4), cold_obj, atol=1e-3)


@pytest.mark.slow
def test_rev_wave_front_parity():
    """Full front enumeration through the wave backend with the revised
    kernel (interpret mode) matches the numpy-oracle front."""
    from moip_aira_tpu.api import solve_front
    from moip_aira_tpu.engine.scheduler import Scheduler
    from moip_aira_tpu.io import read_problem
    from moip_aira_tpu.native import make_solutions
    from moip_aira_tpu.parallel.cluster import build_cluster
    from moip_aira_tpu.solver.wave import WaveLexBackend

    p = read_problem(f"{EXAMPLES}/2AP05.lp")
    ref = solve_front(p, n_workers=1, backend="numpy")

    be = WaveLexBackend(p, batch_width=32, engine="pallas_rev")
    assert be.warm_start  # auto default flips on for the revised kernel
    sched = Scheduler(p, be)
    store = make_solutions(p.objcnt)
    infeas = make_solutions(p.objcnt)
    specs = build_cluster(1, p.objcnt, p.objsen, True)
    sched.run(specs, store, infeas)
    got = store.sorted_unique_points()
    assert sorted(map(tuple, got)) == sorted(map(tuple, ref.points))
