"""Differential correctness: random instances vs brute-force Pareto fronts.

The golden tests pin the bundled instances; this pins the *algorithm*: for
random small MOIPs the full integer lattice is enumerable, so the exact
nondominated set is computable independently of any solver component.
Every decomposition mode must reproduce it.
"""

import itertools

import numpy as np
import pytest

from moip_aira_tpu.api import solve_front
from moip_aira_tpu.problem import Problem
from moip_aira_tpu.sense import INF, Sense


def brute_force_front(p: Problem) -> np.ndarray:
    assert p.is_int.all()
    pts = []
    ranges = [range(int(p.lb[i]), int(min(p.ub[i], 3)) + 1) for i in range(p.n)]
    for x in itertools.product(*ranges):
        x = np.array(x, dtype=float)
        act = p.A @ x
        if np.any(act < p.row_lb - 1e-9) or np.any(act > p.row_ub + 1e-9):
            continue
        pts.append(p.C @ x)
    if not pts:
        return np.zeros((0, p.objcnt), dtype=np.int64)
    pts = np.unique(np.rint(np.array(pts)).astype(np.int64), axis=0)
    sign = 1 if p.objsen is Sense.MIN else -1
    vals = sign * pts
    keep = []
    for i in range(len(vals)):
        dominated = False
        for j in range(len(vals)):
            if i != j and (vals[j] <= vals[i]).all() and (vals[j] < vals[i]).any():
                dominated = True
                break
        if not dominated:
            keep.append(i)
    front = pts[keep]
    order = np.lexsort(tuple(front[:, i] for i in range(front.shape[1] - 1, -1, -1)))
    return front[order[::-1]]


def random_problem(seed: int, k: int) -> Problem:
    rng = np.random.default_rng(seed)
    n = int(rng.integers(4, 7))
    m = int(rng.integers(1, 3))
    A = rng.integers(0, 6, size=(m, n)).astype(float)
    ub = rng.integers(1, 3, size=n).astype(float)
    cap = (A @ ub) * rng.uniform(0.4, 0.8, size=m)
    C = rng.integers(1, 12, size=(k, n)).astype(float)
    sense = Sense.MIN if rng.random() < 0.5 else Sense.MAX
    if sense is Sense.MIN:
        # minimisation with covering rows so the zero point is not optimal
        row_lb = np.floor(cap)
        row_ub = np.full(m, INF)
    else:
        row_lb = np.full(m, -INF)
        row_ub = np.ceil(cap)
    return Problem(
        objcnt=k,
        objsen=sense,
        var_names=[f"x{i}" for i in range(n)],
        C=C,
        A=A,
        row_lb=row_lb,
        row_ub=row_ub,
        lb=np.zeros(n),
        ub=ub,
        is_int=np.ones(n, dtype=bool),
        filename=f"random-{seed}-{k}",
    )


@pytest.mark.parametrize("seed", range(12))
@pytest.mark.parametrize("k", [2, 3])
def test_random_vs_bruteforce_serial(seed, k):
    p = random_problem(100 * k + seed, k)
    expect = brute_force_front(p)
    got = solve_front(p, n_workers=1, backend="numpy")
    assert got.points.shape == expect.shape, (
        f"{p.filename}: {got.points.tolist()} vs {expect.tolist()}"
    )
    assert (got.points == expect).all()


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize(
    "cfg",
    [
        dict(n_workers=2),
        dict(n_workers=3, spread=False),
        dict(n_workers=2, split=True),
        dict(n_workers=2, split=True, split_normal=True),
    ],
    ids=["t2", "t3-cluster", "t2-split", "t2-split-normal"],
)
def test_random_vs_bruteforce_parallel(seed, cfg):
    k = 3
    p = random_problem(500 + seed, k)
    expect = brute_force_front(p)
    got = solve_front(p, backend="numpy", **cfg)
    assert got.points.shape == expect.shape, (
        f"{p.filename}: {got.points.tolist()} vs {expect.tolist()}"
    )
    assert (got.points == expect).all()
