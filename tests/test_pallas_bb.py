"""B&B fragment kernel (solver/pallas_bb.py) + host audit (solver/bb_audit.py).

Runs the Mosaic kernel in interpret mode on CPU.  The contract under test is
the exactness protocol: whatever the speculative f32 fragment does, the
logged walk must (a) replay to the exact node boxes, (b) yield a feasible
incumbent, and (c) leave open nodes whose exact closure recovers the true
optimum — the same guarantee the wave path gets per-LP today, lifted to
whole subtrees.
"""

import collections

import numpy as np
import pytest

import jax.numpy as jnp

from moip_aira_tpu.solver import bb_audit
from moip_aira_tpu.solver.bnb_np import check_candidate, solve_mip
from moip_aira_tpu.solver.pallas_bb import (
    ACT_BRANCH,
    ACT_INFEAS,
    ACT_LEAF,
    F_ACTION,
    F_DIR,
    F_FL,
    F_ITERS,
    F_J,
    F_OBJ,
    F_STATUS,
    LS_BUDGET,
    LS_EXHAUSTED,
    make_pallas_bb_batch,
)
from moip_aira_tpu.solver.simplex_np import SimplexWorkspace, solve_lp
from moip_aira_tpu.solver.status import SolveStatus

from conftest import EXAMPLES


def make_knapsack(seed, n=12, n_rows=2):
    """min -v.x  s.t.  w_k.x <= cap_k, x binary — fractional LP root."""
    rng = np.random.default_rng(seed)
    v = rng.integers(3, 30, n).astype(np.float64)
    A = rng.integers(2, 20, (n_rows, n)).astype(np.float64)
    cap = (A.sum(axis=1) * 0.45).round()
    lo = np.concatenate([np.zeros(n), [-np.inf] * n_rows])
    hi = np.concatenate([np.ones(n), cap])
    return A, lo, hi, -v


def run_fragment(A_full, lo, hi, cobj, F=64, D=32, budget=None, incumbent=1e30):
    """One active lane; returns kernel outputs + replay + host reference."""
    m, n = A_full.shape
    W = np.hstack([A_full, -np.eye(m)])
    ws = SimplexWorkspace(A_full)
    c = np.concatenate([cobj, np.zeros(m)])
    is_int = np.ones(n, bool)
    ref = solve_mip(ws, cobj, lo, hi, is_int, True)

    B = 8
    fn, meta = make_pallas_bb_batch(
        W.astype(np.float32), np.ones(n, np.float32), B, F=F, D=D,
        interpret=True,
    )
    tile = lambda a: jnp.asarray(np.tile(a, (B, 1)), jnp.float32)
    par = np.zeros((B, 4), np.float32)
    par[:, 0] = incumbent
    par[:, 1] = 1.0
    par[:, 2] = budget if budget is not None else F
    par[0, 3] = 1.0
    out = fn(tile(c), tile(lo), tile(hi), jnp.asarray(par))
    nlog = int(np.asarray(out["nlog"])[0])
    lgs = np.asarray(out["lg_scal"])[0]
    rep = bb_audit.replay_lane(lo[:n], hi[:n], lgs, nlog)
    return dict(
        ws=ws, c=c, n=n, lo=lo, hi=hi, ref=ref, out=out, nlog=nlog,
        lgs=lgs, rep=rep, is_int=is_int, meta=meta, incumbent=incumbent,
    )


def check_exactness(r):
    """(a) node LPs match the log, (b) incumbent feasible, (c) closure."""
    ws, c, n, lo, hi = r["ws"], r["c"], r["n"], r["lo"], r["hi"]
    best = float(np.asarray(r["out"]["best"])[0])
    bestx = np.asarray(r["out"]["bestx"])[0][:n]
    for t in range(r["nlog"]):
        node_lo = np.concatenate([r["rep"].node_lo[t], lo[n:]])
        node_hi = np.concatenate([r["rep"].node_hi[t], hi[n:]])
        exact = solve_lp(ws, c[:n], node_lo, node_hi)
        claimed_st = int(r["lgs"][t, F_STATUS])
        if exact.status == SolveStatus.OPTIMAL and claimed_st == 0:
            assert float(r["lgs"][t, F_OBJ]) == pytest.approx(
                exact.obj, abs=1e-2 * max(1.0, abs(exact.obj))
            ), t
        elif exact.status == SolveStatus.INFEASIBLE:
            assert claimed_st in (1, 4), (t, claimed_st)
    if best < r["incumbent"] - 1e-9:  # bestx valid only when improved
        v = check_candidate(ws, c[:n], lo, hi, np.round(bestx))
        # `best` is the kernel's f32 CLAIM; the exact f64 value v is what
        # production adopts (bb_audit revalidation) — compare at f32 claim
        # precision, not f64, and carry v (not the claim) into the closure
        assert v is not None and v == pytest.approx(
            best, abs=1e-4 * max(1.0, abs(v))
        )
        best = v
    # closure = incumbent + open (unvisited) nodes + host-resolution
    # records: ITERLIM records always go to the host in production
    # (bb_audit.audit_records), so their subtrees count as open here too
    vals = [best]
    host_boxes = [
        (r["rep"].node_lo[t], r["rep"].node_hi[t])
        for t in range(r["nlog"])
        if int(r["lgs"][t, F_ACTION]) == bb_audit.ACT_ITERLIM
    ]
    for olo, ohi in host_boxes + [
        (olo, ohi) for olo, ohi, _ in r["rep"].open_nodes
    ]:
        rr = solve_mip(
            ws, c[:n], np.concatenate([olo, lo[n:]]),
            np.concatenate([ohi, hi[n:]]), r["is_int"], True,
        )
        if rr.status == SolveStatus.OPTIMAL:
            vals.append(rr.obj)
    assert min(vals) == pytest.approx(r["ref"].obj, abs=1e-6)


def test_fragment_integral_root_leaf():
    """2AP05 stage LP is integral: one LEAF node, exact optimum, no opens."""
    from moip_aira_tpu.io import read_problem

    p = read_problem(f"{EXAMPLES}/2AP05.lp")
    A_full = np.vstack([p.A, p.C])
    lo = np.concatenate([p.lb, p.row_lb, [-np.inf] * p.objcnt])
    hi = np.concatenate([p.ub, p.row_ub, [np.inf] * p.objcnt])
    r = run_fragment(A_full, lo, hi, p.C[0], F=16)
    assert r["nlog"] == 1
    assert int(r["lgs"][0, F_ACTION]) == ACT_LEAF
    assert int(np.asarray(r["out"]["lstate"])[0]) == LS_EXHAUSTED
    assert float(np.asarray(r["out"]["best"])[0]) == pytest.approx(
        r["ref"].obj
    )
    assert not r["rep"].open_nodes
    check_exactness(r)


@pytest.mark.parametrize("seed", [1, 2])
def test_fragment_branching_exact_closure(seed):
    """Fractional knapsacks: the fragment branches; incumbent + open-node
    closure recover the exact optimum."""
    A, lo, hi, cobj = make_knapsack(seed)
    r = run_fragment(A, lo, hi, cobj)
    acts = collections.Counter(r["lgs"][: r["nlog"], F_ACTION].astype(int))
    assert acts.get(ACT_BRANCH, 0) > 0
    check_exactness(r)


def test_fragment_budget_stop_covers():
    """A 3-node budget stop leaves open nodes that still cover the tree."""
    A, lo, hi, cobj = make_knapsack(7)
    r = run_fragment(A, lo, hi, cobj, F=8, budget=3)
    assert r["nlog"] <= 3
    assert int(np.asarray(r["out"]["lstate"])[0]) == LS_BUDGET
    assert r["rep"].open_nodes
    check_exactness(r)


def test_fragment_incumbent_prunes():
    """Handing the true optimum as incumbent shrinks the tree vs cold."""
    A, lo, hi, cobj = make_knapsack(3)
    cold = run_fragment(A, lo, hi, cobj)
    warm = run_fragment(A, lo, hi, cobj, incumbent=float(cold["ref"].obj))
    assert warm["nlog"] < cold["nlog"]
    check_exactness(warm)


def test_audit_records_classification():
    """audit_records: confirmed closures vs host-resolution records."""
    recs = np.zeros((5, 8), np.float32)
    recs[0, F_ACTION] = ACT_BRANCH
    recs[1, F_ACTION] = ACT_LEAF
    recs[2, F_ACTION] = bb_audit.ACT_PRUNE
    recs[3, F_ACTION] = ACT_INFEAS
    recs[4, F_ACTION] = bb_audit.ACT_ITERLIM
    dual_lb = np.array([-np.inf, -3.2, -4.9, np.inf, -np.inf])
    leaf_ok = np.array([False, True, False, False, False])
    box_empty = np.zeros(5, bool)
    res = bb_audit.audit_records(
        recs, dual_lb, leaf_ok, box_empty, final_best=-4.0, obj_int=True
    )
    # leaf: ceil(-3.2) = -3 >= -4 -> closed; prune: ceil(-4.9) = -4 >= -4
    # -> closed; infeas certified -> closed; iterlim -> host
    assert res.host_recs == [4]
    assert res.confirmed == 3
    # leaf whose candidate failed validation must go to the host
    leaf_ok[1] = False
    res2 = bb_audit.audit_records(
        recs, dual_lb, leaf_ok, box_empty, final_best=-4.0, obj_int=True
    )
    assert res2.host_recs == [1, 4]
    # prune whose bound (-4) falls short of the incumbent (-3): the node
    # could still hide a -4 solution -> host resolution
    res3 = bb_audit.audit_records(
        recs, dual_lb, leaf_ok, box_empty, final_best=-3.0, obj_int=True
    )
    assert 2 in res3.host_recs


def test_replay_mirrors_kernel_boxes():
    """White-box: replayed boxes at each record match a hand reconstruction
    for a known branch/backtrack pattern."""
    root_lo = np.zeros(4)
    root_hi = np.ones(4) * 5
    recs = np.zeros((4, 8), np.float32)
    # rec0: branch on j=1, fl=2, down first -> child hi[1]=2
    recs[0, [F_ACTION, F_J, F_FL, F_DIR]] = [ACT_BRANCH, 1, 2, 1]
    # rec1: branch on j=3, fl=0, up first -> child lo[3]=1
    recs[1, [F_ACTION, F_J, F_FL, F_DIR]] = [ACT_BRANCH, 3, 0, 0]
    # rec2: leaf -> backtrack switches rec1's entry to its sibling hi[3]=0
    recs[2, F_ACTION] = ACT_LEAF
    # rec3: infeasible sibling -> backtrack pops rec1, switches rec0: lo[1]=3
    recs[3, F_ACTION] = ACT_INFEAS
    rep = bb_audit.replay_lane(root_lo, root_hi, recs, 4)
    assert np.array_equal(rep.node_lo[1], [0, 0, 0, 0])
    assert np.array_equal(rep.node_hi[1], [5, 2, 5, 5])
    assert np.array_equal(rep.node_lo[2], [0, 0, 0, 1])
    assert np.array_equal(rep.node_hi[2], [5, 2, 5, 5])
    assert np.array_equal(rep.node_lo[3], [0, 0, 0, 0])
    assert np.array_equal(rep.node_hi[3], [5, 2, 5, 0])
    # pending sibling of rec0 (lo[1]=3) is the only open node
    assert len(rep.open_nodes) == 1
    olo, ohi, parent = rep.open_nodes[0]
    assert olo[1] == 3 and ohi[1] == 5 and parent == 0


def test_warm_root_matches_cold_and_pivots_less():
    """A fragment root warm-started from the exact optimal basis must claim
    the same root LP (status/objective) as a cold root, with (far) fewer
    simplex iterations, and the whole warm fragment must stay exact."""
    A, lo, hi, cobj = make_knapsack(7, n=12, n_rows=2)
    m, n = A.shape
    W = np.hstack([A, -np.eye(m)])
    ws = SimplexWorkspace(A)
    # exact root basis from the host LP
    r0 = solve_lp(ws, cobj, lo, hi)
    assert r0.status == SolveStatus.OPTIMAL
    wb = np.flatnonzero(r0.in_basis).astype(np.int32)
    assert wb.shape[0] == m
    wa = (r0.at_upper[: n + m] > 0).astype(np.int32)

    B = 8
    fn, meta = make_pallas_bb_batch(
        W.astype(np.float32), np.ones(n, np.float32), B, F=16, D=16,
        interpret=True,
    )
    c = np.concatenate([cobj, np.zeros(m)])
    tile = lambda a: jnp.asarray(np.tile(a, (B, 1)), jnp.float32)
    par = np.zeros((B, 4), np.float32)
    par[:, 0] = 1e30
    par[:, 1] = 1.0
    par[:, 2] = 16
    par[0, 3] = 1.0  # lane 0: cold
    par[1, 3] = 1.0  # lane 1: warm
    wb_in = np.full((B, m), -1, np.int32)
    wa_in = np.zeros((B, n + m), np.int32)
    wb_in[1] = wb
    wa_in[1] = wa
    out = fn(
        tile(c), tile(lo), tile(hi), jnp.asarray(par),
        jnp.asarray(wb_in), jnp.asarray(wa_in),
    )
    lgs = np.asarray(out["lg_scal"])
    iters = np.asarray(out["iters"])
    # both lanes log the same root claim
    assert int(lgs[0, 0, F_STATUS]) == 0 and int(lgs[1, 0, F_STATUS]) == 0
    assert float(lgs[1, 0, F_OBJ]) == pytest.approx(
        float(lgs[0, 0, F_OBJ]), abs=1e-3
    )
    # the warm root re-uses the optimal basis: first node needs ~0 pivots
    assert int(lgs[1, 0, F_ITERS]) <= 2, int(lgs[1, 0, F_ITERS])
    assert int(lgs[1, 0, F_ITERS]) < int(lgs[0, 0, F_ITERS])
    # warm lane exactness: replay + incumbent + closure vs host reference
    nlog1 = int(np.asarray(out["nlog"])[1])
    rep1 = bb_audit.replay_lane(lo[:n], hi[:n], lgs[1], nlog1)
    ref = solve_mip(ws, cobj, lo, hi, np.ones(n, bool), True)
    best1 = float(np.asarray(out["best"])[1])
    vals = [best1]
    for olo, ohi, _ in rep1.open_nodes:
        rr = solve_mip(
            ws, cobj, np.concatenate([olo, lo[n:]]),
            np.concatenate([ohi, hi[n:]]), np.ones(n, bool), True,
        )
        if rr.status == SolveStatus.OPTIMAL:
            vals.append(rr.obj)
    assert min(vals) == pytest.approx(ref.obj, abs=1e-6)


# (the MOIP_DUAL exactness tier was deleted with the dual-simplex path in
# round 5 — see solver/pallas_bb.py's tombstone note for the measurements)
