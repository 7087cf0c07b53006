"""Branch-and-bound tests: NumPy backend vs brute-force enumeration."""

import itertools

import numpy as np
import pytest

from moip_aira_tpu.solver.bnb_np import solve_mip
from moip_aira_tpu.solver.simplex_np import SimplexWorkspace
from moip_aira_tpu.solver.status import SolveStatus


def brute_force(A, row_lb, row_ub, ub, c):
    best = None
    n = A.shape[1]
    for x in itertools.product(*[range(int(u) + 1) for u in ub]):
        x = np.array(x, dtype=float)
        act = A @ x
        if np.all(act <= row_ub + 1e-9) and np.all(act >= row_lb - 1e-9):
            v = c @ x
            if best is None or v < best:
                best = v
    return best


@pytest.mark.parametrize("seed", range(25))
def test_mip_vs_bruteforce(seed):
    rng = np.random.default_rng(seed)
    m, n = rng.integers(1, 4), rng.integers(2, 6)
    A = rng.integers(-4, 7, size=(m, n)).astype(float)
    ub = rng.integers(1, 3, size=n).astype(float)
    lb = np.zeros(n)
    x0 = rng.integers(0, 2, size=n).astype(float)
    act = A @ x0
    row_lb = np.where(rng.random(m) < 0.4, act - rng.integers(0, 3, m), -np.inf)
    row_ub = np.where(rng.random(m) < 0.8, act + rng.integers(0, 3, m), np.inf)
    c = rng.integers(-9, 10, size=n).astype(float)

    ws = SimplexWorkspace(A)
    lo = np.concatenate([lb, row_lb])
    hi = np.concatenate([ub, row_ub])
    r = solve_mip(ws, c, lo, hi, np.ones(n, dtype=bool), integral_objective=True)
    ref = brute_force(A, row_lb, row_ub, ub, c)
    if ref is None:
        assert r.status == SolveStatus.INFEASIBLE
    else:
        assert r.status == SolveStatus.OPTIMAL
        assert r.obj == pytest.approx(ref, abs=1e-6)
