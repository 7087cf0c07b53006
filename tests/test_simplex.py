"""LP kernel tests: NumPy oracle vs scipy.linprog, and JAX kernel vs NumPy."""

import numpy as np
import pytest
from scipy.optimize import linprog

from moip_aira_tpu.solver.simplex_np import SimplexWorkspace, solve_lp
from moip_aira_tpu.solver.status import SolveStatus


def random_lp(rng, m, n):
    A = rng.integers(-5, 6, size=(m, n)).astype(float)
    lb = np.zeros(n)
    ub = rng.integers(1, 5, size=n).astype(float)
    # random row bounds around a random feasible point
    x0 = rng.uniform(0, 1, size=n) * ub
    act = A @ x0
    row_lb = np.where(rng.random(m) < 0.5, act - rng.integers(0, 4, m), -np.inf)
    row_ub = np.where(rng.random(m) < 0.5, act + rng.integers(0, 4, m), np.inf)
    c = rng.integers(-9, 10, size=n).astype(float)
    return A, row_lb, row_ub, lb, ub, c


def scipy_solve(A, row_lb, row_ub, lb, ub, c):
    A_ub, b_ub = [], []
    for i in range(A.shape[0]):
        if np.isfinite(row_ub[i]):
            A_ub.append(A[i])
            b_ub.append(row_ub[i])
        if np.isfinite(row_lb[i]):
            A_ub.append(-A[i])
            b_ub.append(-row_lb[i])
    res = linprog(
        c,
        A_ub=np.array(A_ub) if A_ub else None,
        b_ub=np.array(b_ub) if b_ub else None,
        bounds=list(zip(lb, ub)),
        method="highs",
    )
    return res


@pytest.mark.parametrize("seed", range(30))
def test_numpy_simplex_vs_scipy(seed):
    rng = np.random.default_rng(seed)
    m, n = rng.integers(2, 7), rng.integers(2, 9)
    A, row_lb, row_ub, lb, ub, c = random_lp(rng, m, n)
    ws = SimplexWorkspace(A)
    lo = np.concatenate([lb, row_lb])
    hi = np.concatenate([ub, row_ub])
    mine = solve_lp(ws, c, lo, hi)
    ref = scipy_solve(A, row_lb, row_ub, lb, ub, c)
    if ref.status == 2:  # infeasible
        assert mine.status == SolveStatus.INFEASIBLE
    elif ref.status == 0:
        assert mine.status == SolveStatus.OPTIMAL
        assert mine.obj == pytest.approx(ref.fun, abs=1e-6)
    # (unbounded cannot occur: all variable bounds finite)


def test_equality_rows():
    # x + y = 3, minimise x  ->  x=0 (y=3 needs ub >= 3)
    A = np.array([[1.0, 1.0]])
    ws = SimplexWorkspace(A)
    lo = np.array([0.0, 0.0, 3.0])
    hi = np.array([5.0, 5.0, 3.0])
    r = solve_lp(ws, np.array([1.0, 0.0]), lo, hi)
    assert r.status == SolveStatus.OPTIMAL
    assert r.obj == pytest.approx(0.0)


def test_infeasible_box():
    A = np.array([[1.0, 1.0]])
    ws = SimplexWorkspace(A)
    # x + y = 10 but ub sums to 4
    lo = np.array([0.0, 0.0, 10.0])
    hi = np.array([2.0, 2.0, 10.0])
    r = solve_lp(ws, np.array([1.0, 1.0]), lo, hi)
    assert r.status == SolveStatus.INFEASIBLE


@pytest.mark.parametrize("seed", range(10))
def test_jax_simplex_matches_numpy(seed):
    import jax.numpy as jnp

    from moip_aira_tpu.solver import simplex_jax as sx

    rng = np.random.default_rng(100 + seed)
    m, n = rng.integers(2, 6), rng.integers(2, 7)
    A, row_lb, row_ub, lb, ub, c = random_lp(rng, m, n)
    ws = SimplexWorkspace(A)
    lo = np.concatenate([lb, row_lb])
    hi = np.concatenate([ub, row_ub])
    mine = solve_lp(ws, c, lo, hi)

    W = jnp.asarray(ws.W)
    jsolve = sx.make_lp_solver(W, 2000)
    c_full = jnp.concatenate([jnp.asarray(c), jnp.zeros(m)])
    out = jsolve(c_full, jnp.asarray(lo), jnp.asarray(hi))
    if mine.status == SolveStatus.OPTIMAL:
        assert int(out.status) == sx.OPTIMAL
        assert float(out.obj) == pytest.approx(mine.obj, abs=1e-6)
    elif mine.status == SolveStatus.INFEASIBLE:
        assert int(out.status) == sx.INFEASIBLE
