"""Exactness of the combinatorial court (solver/match_court.py).

Soundness contract (CLAUDE.md exactness invariant): every court verdict
must agree with the exact f64 LP/MIP on the same node —
  * min_cost == LP min over the assignment polytope restricted to the box
    (totally unimodular, so the LP min is the matching min),
  * "infeasible" only when the restricted polytope is truly empty,
  * judge()'s prune/solved verdicts never cut a node containing a better
    incumbent than the task's.
"""

from __future__ import annotations

import numpy as np
import pytest

from moip_aira_tpu.solver.heuristics import detect_assignment
from moip_aira_tpu.solver.match_court import MatchCourt
from moip_aira_tpu.solver.simplex_np import SimplexWorkspace, solve_lp
from moip_aira_tpu.solver.status import SolveStatus


def _ap_structure(N, rng, objcnt=2):
    """Build an N x N assignment problem's stacked row matrix + costs."""
    n = N * N
    A_eq = np.zeros((2 * N, n))
    for i in range(N):
        for j in range(N):
            A_eq[i, i * N + j] = 1.0  # row-sums
            A_eq[N + j, i * N + j] = 1.0  # col-sums
    C = rng.integers(1, 30, size=(objcnt, n)).astype(np.float64)
    A_full = np.vstack([A_eq, C])
    return A_full, C


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_min_cost_matches_exact_lp(seed):
    rng = np.random.default_rng(seed)
    N = 4
    n = N * N
    A_full, C = _ap_structure(N, rng)
    m = A_full.shape[0]
    glo = np.concatenate([np.zeros(n), np.ones(2 * N), [-np.inf] * 2])
    ghi = np.concatenate([np.ones(n), np.ones(2 * N), [np.inf] * 2])
    struct = detect_assignment(A_full, glo, ghi)
    assert struct is not None
    court = MatchCourt(struct, A_full)
    ws = SimplexWorkspace(A_full)

    for _ in range(30):
        nlo = np.zeros(n)
        nhi = np.ones(n)
        # random fixings: forbid some cells, force a few
        nhi[rng.random(n) < 0.3] = 0.0
        forced = rng.integers(0, n, size=2)
        nlo[forced] = 1.0
        nhi[forced] = 1.0
        cost = rng.integers(-20, 20, size=n).astype(np.float64)
        cvec = np.concatenate([cost, np.zeros(m)])
        val, x = court.min_cost(cvec, nlo, nhi)

        lo_f = np.concatenate([nlo, glo[n:]])
        hi_f = np.concatenate([nhi, ghi[n:]])
        r = solve_lp(ws, cost, lo_f, hi_f)
        if val is None:
            assert r.status == SolveStatus.INFEASIBLE
        else:
            assert r.status == SolveStatus.OPTIMAL
            assert abs(r.obj - val) < 1e-6
            # the attaining x is a valid permutation honouring the box
            assert np.all(x >= nlo - 1e-9) and np.all(x <= nhi + 1e-9)
            assert abs(float(cost @ x) - val) < 1e-9


def test_judge_infeasible_via_objective_row_bound():
    rng = np.random.default_rng(5)
    N = 3
    n = N * N
    A_full, C = _ap_structure(N, rng)
    m = A_full.shape[0]
    glo = np.concatenate([np.zeros(n), np.ones(2 * N), [-np.inf] * 2])
    ghi = np.concatenate([np.ones(n), np.ones(2 * N), [np.inf] * 2])
    struct = detect_assignment(A_full, glo, ghi)
    court = MatchCourt(struct, A_full)

    class T:
        cvec = np.concatenate([C[0], np.zeros(m)])
        obj_int = True
        best = np.inf
        llo = np.concatenate([np.ones(2 * N), [-np.inf, -np.inf]])
        # obj-1 bound below the best attainable activity -> provably empty
        lhi = np.concatenate([np.ones(2 * N), [np.inf, 0.0]])

    v = court.judge(T(), np.zeros(n), np.ones(n))
    assert v == ("infeasible",)


def test_judge_solved_adopts_exact_optimum():
    rng = np.random.default_rng(7)
    N = 3
    n = N * N
    A_full, C = _ap_structure(N, rng)
    m = A_full.shape[0]
    glo = np.concatenate([np.zeros(n), np.ones(2 * N), [-np.inf] * 2])
    ghi = np.concatenate([np.ones(n), np.ones(2 * N), [np.inf] * 2])
    struct = detect_assignment(A_full, glo, ghi)
    court = MatchCourt(struct, A_full)

    class T:
        cvec = np.concatenate([C[0], np.zeros(m)])
        obj_int = True
        best = np.inf
        llo = np.concatenate([np.ones(2 * N), [-np.inf, -np.inf]])
        lhi = np.concatenate([np.ones(2 * N), [np.inf, np.inf]])

    v = court.judge(T(), np.zeros(n), np.ones(n))
    assert v is not None and v[0] == "solved"
    # cross-check against brute force over all permutations
    import itertools

    best = min(
        sum(C[0][i * N + p[i]] for i in range(N))
        for p in itertools.permutations(range(N))
    )
    assert abs(v[1] - best) < 1e-9
