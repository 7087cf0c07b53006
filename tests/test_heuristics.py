"""Unit tests for solver/heuristics.py — incl. the capped swap scan at scale."""

import numpy as np
import pytest

from moip_aira_tpu.solver.heuristics import (
    SWAP_FULL_LIMIT,
    candidate_value,
    local_search,
)


def _knap(n, seed):
    rng = np.random.default_rng(seed)
    w = rng.integers(10, 40, n).astype(float)
    v = rng.integers(10, 40, n).astype(float)
    cap = 0.5 * w.sum()
    Wx = w[None, :]
    lo = np.concatenate([np.zeros(n), [-np.inf]])
    hi = np.concatenate([np.ones(n), [cap]])
    return Wx, -v, lo, hi  # minimise -value


def test_local_search_improves_small():
    Wx, c, lo, hi = _knap(40, 0)
    x0 = np.zeros(40)
    x, v = local_search(Wx, c, lo, hi, x0, np.arange(40))
    assert v < 0.0  # picked something
    assert candidate_value(Wx, c, lo, hi, x) == pytest.approx(v)


def test_local_search_large_n_capped_swaps_fast_and_feasible():
    n = SWAP_FULL_LIMIT * 4  # forces the candidate-subset path
    Wx, c, lo, hi = _knap(n, 1)
    x0 = np.zeros(n)
    x, v = local_search(Wx, c, lo, hi, x0, np.arange(n), max_moves=50)
    assert candidate_value(Wx, c, lo, hi, x) == pytest.approx(v)
    assert v < 0.0


def test_local_search_swap_on_equality_rows():
    # assignment-style: unit moves are never feasible, only swaps are
    n = 4
    Wx = np.ones((1, n))
    c = np.array([5.0, 1.0, 4.0, 2.0])
    lo = np.concatenate([np.zeros(n), [1.0]])
    hi = np.concatenate([np.ones(n), [1.0]])  # sum x == 1
    x0 = np.array([1.0, 0.0, 0.0, 0.0])
    x, v = local_search(Wx, c, lo, hi, x0, np.arange(n))
    assert v == pytest.approx(1.0)
    assert x[1] == pytest.approx(1.0)


def test_local_search_large_equality_swap():
    # capped path must still find improving swaps under equality rows
    n = SWAP_FULL_LIMIT * 2
    rng = np.random.default_rng(2)
    c = rng.integers(1, 100, n).astype(float)
    Wx = np.ones((1, n))
    lo = np.concatenate([np.zeros(n), [3.0]])
    hi = np.concatenate([np.ones(n), [3.0]])  # pick exactly 3
    x0 = np.zeros(n)
    worst = np.argsort(-c)[:3]
    x0[worst] = 1.0
    x, v = local_search(Wx, c, lo, hi, x0, np.arange(n))
    assert v == pytest.approx(np.sort(c)[:3].sum())


def test_repair_fixes_one_step_bound_violation():
    """The sweep-chain case: a point feasible for every structural row but
    one unit past the new objective-bound row is repaired by a swap."""
    from moip_aira_tpu.solver.heuristics import candidate_value, repair

    # min c.x, rows: x1+x2+x3 >= 2 (cover), v.x <= 7 (objective bound)
    Wx = np.array([[1.0, 1.0, 1.0], [3.0, 4.0, 5.0]])
    c = np.array([1.0, 2.0, 3.0])
    lo = np.array([0.0, 0.0, 0.0, 2.0, -np.inf])
    hi = np.array([1.0, 1.0, 1.0, np.inf, 7.0])
    x0 = np.array([0.0, 1.0, 1.0])  # v.x = 9 > 7: violates the bound row
    assert candidate_value(Wx, c, lo, hi, x0) is None
    x = repair(Wx, c, lo, hi, x0, np.arange(3))
    assert x is not None
    v = candidate_value(Wx, c, lo, hi, x)
    assert v is not None  # feasible after repair
    assert np.array_equal(x, [1.0, 1.0, 0.0])  # the cheapest repair


def test_repair_returns_none_when_stuck():
    from moip_aira_tpu.solver.heuristics import repair

    # x1 binary, row x1 >= 2 cannot be satisfied by any unit move
    Wx = np.array([[1.0]])
    c = np.array([1.0])
    lo = np.array([0.0, 2.0])
    hi = np.array([1.0, np.inf])
    x = repair(Wx, c, lo, hi, np.array([1.0]), np.arange(1))
    assert x is None


def test_sweep_hint_rides_feeder_to_wave_incumbent():
    """End-to-end: the wave backend accepts LexRequest.x_hint and repairs it
    into a warm incumbent (observable: golden parity is kept and the hint
    path doesn't crash on either sense)."""
    from moip_aira_tpu.io import read_problem
    from moip_aira_tpu.api import solve_front
    from moip_aira_tpu.solver.wave import WaveLexBackend

    p = read_problem("/root/reference/Examples/2AP05.lp")
    be = WaveLexBackend(p, batch_width=16)
    front = solve_front(p, n_workers=2, backend=be)
    assert front.solution_count == 9
