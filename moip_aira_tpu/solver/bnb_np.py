"""Branch-and-bound MIP solve over the NumPy simplex — host reference backend.

This replaces the reference's ``CPXmipopt`` call (src/aira.cpp:480-487).  The
search is depth-first with best-bound pruning; with all-integer objective data
the bound is rounded up (``ceil``) before pruning, which both prunes harder
and guarantees the exact integer optimum the AIRA layer relies on
(aira.cpp:517 rounds the CPLEX objective to an int).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import numpy as np

from moip_aira_tpu.solver.simplex_np import LPResult, SimplexWorkspace, solve_lp
from moip_aira_tpu.solver.status import SolveStatus

INT_TOL = 1e-6


class MIPResult(NamedTuple):
    status: SolveStatus
    obj: float
    x: Optional[np.ndarray]


def solve_mip(
    ws: SimplexWorkspace,
    c: np.ndarray,
    lo: np.ndarray,
    hi: np.ndarray,
    is_int: np.ndarray,
    integral_objective: bool,
    max_nodes: int = 200000,
) -> MIPResult:
    """Minimise c @ x with z-bounds (lo, hi) and integrality on x[is_int]."""
    n_int = int(np.count_nonzero(is_int))
    int_idx = np.flatnonzero(is_int)

    best_obj = np.inf
    best_x: Optional[np.ndarray] = None

    # node stack holds (lo_x_over, hi_x_over) overrides for integer vars only
    stack = [(lo[: len(is_int)].copy(), hi[: len(is_int)].copy())]
    nodes = 0
    lo_full = lo.copy()
    hi_full = hi.copy()

    while stack:
        nodes += 1
        if nodes > max_nodes:
            return MIPResult(SolveStatus.NODE_LIMIT, best_obj, best_x)
        node_lo, node_hi = stack.pop()
        lo_full[: len(node_lo)] = node_lo
        hi_full[: len(node_hi)] = node_hi
        r = solve_lp(ws, c, lo_full, hi_full)
        if r.status == SolveStatus.INFEASIBLE:
            continue
        if r.status == SolveStatus.UNBOUNDED:
            return MIPResult(SolveStatus.UNBOUNDED, -np.inf, None)
        if r.status == SolveStatus.ITERATION_LIMIT:
            return MIPResult(SolveStatus.ITERATION_LIMIT, best_obj, best_x)
        bound = r.obj
        if integral_objective:
            bound = math.ceil(bound - INT_TOL)
        # prune: the subtree cannot strictly improve on the incumbent
        if bound >= best_obj - (INT_TOL if integral_objective else 1e-9):
            continue
        x = r.x
        frac = np.abs(x[int_idx] - np.rint(x[int_idx]))
        worst = np.argmax(frac) if n_int else 0
        if n_int == 0 or frac[worst] <= INT_TOL:
            # integer feasible
            obj = r.obj
            if obj < best_obj - INT_TOL:
                best_obj = obj
                best_x = x.copy()
            continue
        j = int(int_idx[worst])
        v = x[j]
        fl = math.floor(v + INT_TOL)
        # DFS: explore the "down" child first (pushed last)
        up_lo = node_lo.copy()
        up_lo[j] = fl + 1
        stack.append((up_lo, node_hi.copy()))
        dn_hi = node_hi.copy()
        dn_hi[j] = fl
        stack.append((node_lo.copy(), dn_hi))

    if best_x is None:
        return MIPResult(SolveStatus.INFEASIBLE, np.nan, None)
    if integral_objective:
        best_obj = float(np.rint(best_obj))
    return MIPResult(SolveStatus.OPTIMAL, best_obj, best_x)
