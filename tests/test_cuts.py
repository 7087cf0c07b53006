"""Cover-cut validity and cut-and-branch equivalence (solver/cuts.py).

The cuts are integer-combinatorial (exactly valid by a counting argument),
so the binding test is: no integer-feasible point is ever cut off, and
``solve_mip`` returns the identical optimum with the root cut loop on.
"""

import itertools

import numpy as np
import pytest

from moip_aira_tpu.solver.bnb_np import solve_mip
from moip_aira_tpu.solver.cuts import separate_cover_cuts
from moip_aira_tpu.solver.simplex_np import SimplexWorkspace
from moip_aira_tpu.solver.status import SolveStatus


def _rand_kp(rng, n, rows=2):
    """Random small 2-constraint knapsack with an epsilon covering row."""
    A = rng.integers(60, 101, size=(rows, n)).astype(float)
    caps = A.sum(axis=1) * 0.5
    v1 = rng.integers(60, 101, size=n).astype(float)
    A_full = np.vstack([A, v1[None]])
    row_lb = np.concatenate([np.full(rows, -np.inf), [v1.sum() * 0.45]])
    row_ub = np.concatenate([caps, [np.inf]])
    return A_full, row_lb, row_ub


@pytest.mark.parametrize("seed", range(6))
def test_cover_cuts_never_cut_integer_points(seed):
    rng = np.random.default_rng(seed)
    n = 10
    A_full, row_lb, row_ub = _rand_kp(rng, n)
    lo = np.concatenate([np.zeros(n), row_lb])
    hi = np.concatenate([np.ones(n), row_ub])
    is_int = np.ones(n, dtype=bool)
    # separate at a deliberately fractional point
    xstar = rng.uniform(0, 1, size=n)
    cuts = separate_cover_cuts(
        A_full, row_lb, row_ub, xstar, lo, hi, is_int, max_cuts=16
    )
    # enumerate every feasible binary point; each must satisfy every cut
    for bits in itertools.product([0, 1], repeat=n):
        x = np.asarray(bits, dtype=float)
        act = A_full @ x
        if np.any(act < row_lb - 1e-9) or np.any(act > row_ub + 1e-9):
            continue
        for row, c_lb, c_ub in cuts:
            v = row @ x
            assert v >= c_lb - 1e-9 and v <= c_ub + 1e-9, (
                f"cut {row} in [{c_lb},{c_ub}] violated by feasible {bits}"
            )


@pytest.mark.parametrize("seed", range(4))
def test_solve_mip_same_optimum_with_cuts(seed):
    rng = np.random.default_rng(100 + seed)
    n = 14
    A_full, row_lb, row_ub = _rand_kp(rng, n)
    ws = SimplexWorkspace(A_full)
    c = -rng.integers(60, 101, size=n).astype(float)  # maximize value
    lo = np.concatenate([np.zeros(n), row_lb])
    hi = np.concatenate([np.ones(n), row_ub])
    is_int = np.ones(n, dtype=bool)
    r_plain = solve_mip(ws, c, lo, hi, is_int, True, root_cuts=False)
    r_cuts = solve_mip(ws, c, lo, hi, is_int, True, root_cuts=True)
    assert r_plain.status == r_cuts.status
    if r_plain.status == SolveStatus.OPTIMAL:
        assert r_plain.obj == r_cuts.obj
