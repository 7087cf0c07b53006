"""Edge cases: single objective, infeasible instances, OBJSENSE, ranges."""

import numpy as np
import pytest

from moip_aira_tpu.api import solve_front
from moip_aira_tpu.io import read_problem
from moip_aira_tpu.problem import Problem
from moip_aira_tpu.sense import INF, Sense


def test_single_objective(tmp_path):
    """k=1: the AIRA nest is empty; the front is the single optimum
    (the reference would behave identically — objective_counter loop
    range(1, 1))."""
    f = tmp_path / "one.lp"
    f.write_text(
        """Minimize 0
s.t.
x + y >= 3
2 x + y < 1
Binary
x y
End
"""
    )
    # last row RHS 1 => objcnt 1; objective 2x + y, x+y >= 3 infeasible for
    # binaries... use >= 2 instead
    f.write_text(
        """Minimize 0
s.t.
x + y >= 2
2 x + y < 1
Binary
x y
End
"""
    )
    p = read_problem(str(f))
    assert p.objcnt == 1
    front = solve_front(p, n_workers=4, backend="numpy")
    assert front.solution_count == 1
    assert front.points.tolist() == [[3]]  # x=1, y=1 forced


def test_infeasible_problem(tmp_path):
    f = tmp_path / "inf.lp"
    f.write_text(
        """Minimize 0
s.t.
x + y >= 3
x + y <= 1
x + 2 y < 1
y + 2 x < 2
Binary
x y
End
"""
    )
    p = read_problem(str(f))
    assert p.objcnt == 2
    for cfg in (dict(n_workers=1), dict(n_workers=2), dict(n_workers=2, split=True)):
        front = solve_front(p, backend="numpy", **cfg)
        assert front.solution_count == 0, cfg


def test_mop_objsense_max(tmp_path):
    g = tmp_path / "m.mop"
    g.write_text(
        """NAME  t
OBJSENSE
    MAX
ROWS
 N  OBJ1
 N  OBJ2
 L  CAP
COLUMNS
    MARK  'MARKER'  'INTORG'
    x1  OBJ1  3
    x1  OBJ2  1
    x1  CAP  2
    x2  OBJ1  1
    x2  OBJ2  3
    x2  CAP  2
    MARK  'MARKER'  'INTEND'
RHS
    RHS  CAP  2
BOUNDS
 UP BOUND  x1  1
 UP BOUND  x2  1
ENDATA
"""
    )
    p = read_problem(str(g))
    assert p.objsen is Sense.MAX
    front = solve_front(p, n_workers=2, backend="numpy")
    # capacity admits exactly one item: (3,1) and (1,3) are the front
    assert front.points.tolist() == [[3, 1], [1, 3]]


def test_degenerate_single_point_front_split():
    """A front with one point makes the EPP range degenerate
    (biggest == smallest -> sentinel widening, aira.cpp:1962-1981)."""
    p = Problem(
        objcnt=2,
        objsen=Sense.MIN,
        var_names=["x", "y"],
        C=np.array([[1.0, 0.0], [0.0, 1.0]]),
        A=np.array([[1.0, 0.0], [0.0, 1.0]]),
        row_lb=np.array([1.0, 1.0]),
        row_ub=np.array([1.0, 1.0]),
        lb=np.zeros(2),
        ub=np.ones(2),
        is_int=np.ones(2, dtype=bool),
    )
    for cfg in (dict(n_workers=1), dict(n_workers=2, split=True)):
        front = solve_front(p, backend="numpy", **cfg)
        assert front.points.tolist() == [[1, 1]], cfg


def test_equality_heavy_problem():
    """All-equality rows exercise the phase-1 path on every solve."""
    rng = np.random.default_rng(5)
    n = 6
    C = rng.integers(1, 9, size=(2, n)).astype(float)
    A = np.ones((1, n))
    p = Problem(
        objcnt=2,
        objsen=Sense.MIN,
        var_names=[f"x{i}" for i in range(n)],
        C=C,
        A=A,
        row_lb=np.array([3.0]),
        row_ub=np.array([3.0]),
        lb=np.zeros(n),
        ub=np.ones(n),
        is_int=np.ones(n, dtype=bool),
    )
    a = solve_front(p, n_workers=1, backend="numpy")
    b = solve_front(p, n_workers=2, backend="numpy")
    assert a.solution_count >= 1
    assert (a.points == b.points).all()
