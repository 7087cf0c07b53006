"""Dense bounded-variable full-tableau simplex — NumPy reference backend.

This is the host-side reference implementation of the LP kernel that replaces
the LP relaxation inside CPLEX's ``CPXmipopt`` (reference src/aira.cpp:480).
The JAX/TPU backend (solver/simplex_jax.py) implements the *same algorithm*
with the same tolerances so both produce identical bases; this NumPy version
is the debuggable oracle used by the unit tests.

Formulation ("logical variable" form, as used by production LP codes):

    variables  z = (x, r),  x structural (n), r row activities (m)
    constraint [A | -I] z = 0
    bounds     lb <= x <= ub,  row_lb <= r <= row_ub

The initial basis is the logical identity (B = -I), which is always
nonsingular; structural variables start nonbasic at a finite bound.  A
composite phase-1 (minimise total bound infeasibility of basic variables,
cf. Maros, "Computational Techniques of the Simplex Method") reaches
feasibility without artificial variables or big-M, then phase-2 optimises
``c @ x``.  Degenerate cycling is broken by switching to Bland's rule after a
stall.  All data in the target problems is integer, so float64 arithmetic with
1e-7 tolerances recovers exact optima.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from moip_aira_tpu.sense import INF
from moip_aira_tpu.solver.status import SolveStatus

FEAS_TOL = 1e-7
COST_TOL = 1e-9
PIVOT_TOL = 1e-9
STALL_LIMIT = 60  # iterations without objective progress before Bland's rule


class LPResult(NamedTuple):
    status: SolveStatus
    obj: float
    x: Optional[np.ndarray]  # structural variable values (n,)
    #: reduced costs of all columns at the final basis (None unless optimal);
    #: used for reduced-cost variable fixing in branch-and-bound
    d: Optional[np.ndarray] = None
    #: True for nonbasic-at-upper columns (with d, defines the fixing side)
    at_upper: Optional[np.ndarray] = None
    in_basis: Optional[np.ndarray] = None


class SimplexWorkspace:
    """Per-problem static data: W = [A_full | -I] with A_full = [A; C]."""

    def __init__(self, A_full: np.ndarray):
        self.m, self.n = A_full.shape
        self.W = np.hstack([A_full, -np.eye(self.m)])
        self.ncols = self.n + self.m


def solve_lp(
    ws: SimplexWorkspace,
    c: np.ndarray,
    lo: np.ndarray,
    hi: np.ndarray,
    max_iters: int = 20000,
    warm_basis: Optional[np.ndarray] = None,
    warm_at_upper: Optional[np.ndarray] = None,
) -> LPResult:
    """Minimise c @ x subject to [A|-I] z = 0, lo <= z <= hi.

    ``lo``/``hi`` have length n + m: structural bounds then row-activity
    bounds (objective-bound rows included in A_full by the caller).

    ``warm_basis``/``warm_at_upper`` restart from an advanced basis (e.g. the
    near-optimal basis an f32 device kernel returned): the tableau is rebuilt
    exactly as B^-1 W and the composite phase-1/phase-2 loop continues from
    there — typically a handful of pivots.
    """
    m, ncols = ws.m, ws.ncols
    n = ws.n
    cz = np.zeros(ncols)
    cz[:n] = c

    # quick bound sanity: an empty box is infeasible
    if np.any(lo > hi + FEAS_TOL):
        return LPResult(SolveStatus.INFEASIBLE, np.nan, None)

    finite_lo = np.isfinite(lo)
    finite_hi = np.isfinite(hi)

    T = None
    basis = None
    at_upper = None
    if warm_basis is not None:
        wb = np.asarray(warm_basis, dtype=np.int64)
        B = ws.W[:, wb]
        try:
            Tw = np.linalg.solve(B, ws.W)
            if np.isfinite(Tw).all():
                T = Tw
                basis = wb.copy()
                at_upper = np.asarray(warm_at_upper, dtype=bool).copy()
        except np.linalg.LinAlgError:
            T = None

    if T is None:
        # --- cold start: logical basis -----------------------------------
        basis = np.arange(n, n + m)
        at_upper = np.zeros(ncols, dtype=bool)
        at_upper[:n] = ~finite_lo[:n] & finite_hi[:n]
        # tableau T = B^-1 W; with B = -I, T = -W
        T = -ws.W.copy()

    in_basis = np.zeros(ncols, dtype=bool)
    in_basis[basis] = True
    # nonbasic values
    zvals = np.where(at_upper, hi, np.where(finite_lo, lo, 0.0))
    zvals[~finite_lo & ~finite_hi] = 0.0  # free vars at 0
    # basic values: xB = -B^-1 N xN  =>  with T = B^-1 W:  xB = -T_N @ zN
    nonbasic_mask = ~in_basis
    xB = -T[:, nonbasic_mask] @ zvals[nonbasic_mask]

    stall = 0
    last_obj = np.inf
    phase = 1

    for it in range(max_iters):
        bl = lo[basis]
        bh = hi[basis]
        below = xB < bl - FEAS_TOL
        above = xB > bh + FEAS_TOL
        infeasible_sum = np.sum(np.where(below, bl - xB, 0.0)) + np.sum(
            np.where(above, xB - bh, 0.0)
        )
        if phase == 1 and infeasible_sum <= FEAS_TOL:
            phase = 2
            stall = 0
            last_obj = np.inf

        if phase == 1:
            cB = np.where(below, -1.0, np.where(above, 1.0, 0.0))
            cur_obj = infeasible_sum
        else:
            cB = cz[basis]
            cur_obj = cz[basis] @ xB + cz[~in_basis] @ zvals[~in_basis]

        # reduced costs d_j = c_j - cB @ T[:, j]  (zero for basic columns)
        d = cz - cB @ T if phase == 2 else -(cB @ T)

        nb = ~in_basis
        free = nb & ~finite_lo & ~finite_hi
        can_up = nb & (((~at_upper) & (d < -COST_TOL)) | (free & (d < -COST_TOL)))
        can_dn = nb & ((at_upper & (d > COST_TOL)) | (free & (d > COST_TOL)))
        eligible = can_up | can_dn
        if not eligible.any():
            if phase == 1:
                return LPResult(SolveStatus.INFEASIBLE, np.nan, None)
            # optimal
            z = zvals.copy()
            z[basis] = xB
            d_full = cz - cz[basis] @ T
            return LPResult(
                SolveStatus.OPTIMAL,
                float(cz @ z),
                z[:n],
                d=d_full,
                at_upper=at_upper.copy(),
                in_basis=in_basis.copy(),
            )

        if stall >= STALL_LIMIT:
            q = int(np.flatnonzero(eligible)[0])  # Bland
        else:
            scores = np.where(eligible, np.abs(d), -1.0)
            q = int(np.argmax(scores))
        sigma = 1.0 if can_up[q] else -1.0

        alpha = T[:, q]
        eta = -sigma * alpha  # d xB_i / d theta

        # --- ratio test ---------------------------------------------------
        theta = np.inf
        leave = -1  # -1 => bound flip of the entering variable
        leave_to_upper = False

        # entering variable's own opposite bound
        if finite_lo[q] and finite_hi[q]:
            theta = hi[q] - lo[q]

        moving = np.abs(eta) > PIVOT_TOL
        idx = np.flatnonzero(moving)
        if idx.size:
            e = eta[idx]
            xb = xB[idx]
            bl_i = bl[idx]
            bh_i = bh[idx]
            below_i = below[idx]
            above_i = above[idx]
            ratios = np.full(idx.size, np.inf)
            hits_upper = np.zeros(idx.size, dtype=bool)
            feas = ~below_i & ~above_i
            # feasible basics block at the bound they move towards
            mdn = feas & (e < 0) & np.isfinite(bl_i)
            ratios[mdn] = (xb[mdn] - bl_i[mdn]) / (-e[mdn])
            mup = feas & (e > 0) & np.isfinite(bh_i)
            ratios[mup] = (bh_i[mup] - xb[mup]) / e[mup]
            hits_upper[mup] = True
            # infeasible basics block when they *reach* the violated bound
            mbu = below_i & (e > 0)
            ratios[mbu] = (bl_i[mbu] - xb[mbu]) / e[mbu]
            mau = above_i & (e < 0)
            ratios[mau] = (xb[mau] - bh_i[mau]) / (-e[mau])
            hits_upper[mau] = True
            ratios = np.maximum(ratios, 0.0)
            rmin = ratios.min()
            if rmin < theta:
                # tie-break: largest |pivot| for stability (Bland: smallest idx)
                tied = np.flatnonzero(ratios <= rmin + FEAS_TOL)
                if stall >= STALL_LIMIT:
                    pick = tied[np.argmin(basis[idx[tied]])]
                else:
                    pick = tied[np.argmax(np.abs(e[tied]))]
                theta = ratios[pick]
                leave = int(idx[pick])
                leave_to_upper = bool(hits_upper[pick])

        if not np.isfinite(theta):
            if phase == 1:
                # cannot happen for a bounded phase-1; guard anyway
                return LPResult(SolveStatus.INFEASIBLE, np.nan, None)
            return LPResult(SolveStatus.UNBOUNDED, -np.inf, None)

        # --- apply step ---------------------------------------------------
        xB = xB + eta * theta
        if leave < 0:
            # bound flip
            at_upper[q] = ~at_upper[q]
            zvals[q] = hi[q] if at_upper[q] else lo[q]
        else:
            p = basis[leave]
            # leaving variable becomes nonbasic at the bound it hit
            at_upper[p] = leave_to_upper
            zvals[p] = hi[p] if leave_to_upper else lo[p]
            in_basis[p] = False
            in_basis[q] = True
            # entering variable's new value
            start = zvals[q] if (finite_lo[q] or finite_hi[q]) else 0.0
            newval = start + sigma * theta
            # pivot the tableau on (leave, q)
            piv = T[leave, q]
            T[leave, :] = T[leave, :] / piv
            col = T[:, q].copy()
            col[leave] = 0.0
            T -= np.outer(col, T[leave, :])
            basis[leave] = q
            xB[leave] = newval

        # stall detection (objective progress)
        if cur_obj < last_obj - 1e-12:
            stall = 0
        else:
            stall += 1
        last_obj = cur_obj

    return LPResult(SolveStatus.ITERATION_LIMIT, np.nan, None)
