"""Primal heuristics for the branch-and-bound backends.

The LP-guided tree search proves optimality cheaply once a near-optimal
incumbent exists (integral data + ceiling bounds make the pruning window
narrow); what the plain dive lacks is incumbent *quality*.  This module
supplies it generically:

* ``round_candidates`` — the rounded/floored LP point (clipped to node
  bounds), feasibility-checked;
* ``local_search``   — vectorised 1-move / 1-swap improvement: all
  ``x_j += 1``, ``x_j -= 1`` and ``x_j += 1, x_l -= 1`` moves are evaluated
  in one broadcast feasibility check per round, taking the best improving
  feasible move until a local optimum.  On knapsack-family instances this
  routinely lands within a few units of the true optimum, collapsing the
  tree from thousands of nodes to tens.

Everything operates on the same (lo, hi) z-bound representation as the
simplex (structural bounds then row-activity bounds), so equality rows and
objective-bound rows are respected automatically.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

TOL = 1e-7


def candidate_value(
    Wx: np.ndarray,  # (m, n) structural part of [A|-I] (i.e. A_full)
    c: np.ndarray,
    lo: np.ndarray,
    hi: np.ndarray,
    x: np.ndarray,
) -> Optional[float]:
    """c @ x if x is feasible for bounds and row activities, else None."""
    n = Wx.shape[1]
    if np.any(x < lo[:n] - TOL) or np.any(x > hi[:n] + TOL):
        return None
    act = Wx @ x
    if np.any(act < lo[n:] - TOL) or np.any(act > hi[n:] + TOL):
        return None
    return float(c @ x)


def local_search(
    Wx: np.ndarray,
    c: np.ndarray,
    lo: np.ndarray,
    hi: np.ndarray,
    x0: np.ndarray,
    int_idx: np.ndarray,
    max_moves: int = 200,
) -> Tuple[np.ndarray, float]:
    """Improve a feasible integer point by best-improving unit moves/swaps.

    Returns (x, value); x0 must already be feasible.
    """
    n = Wx.shape[1]
    m = Wx.shape[0]
    x = np.asarray(x0, dtype=np.float64).copy()
    act = Wx @ x
    val = float(c @ x)
    if int_idx.size == 0:
        return x, val
    Wi = Wx[:, int_idx]  # (m, ni)
    ci = c[int_idx]
    lo_x = lo[int_idx]
    hi_x = hi[int_idx]
    row_lo = lo[n:]
    row_hi = hi[n:]
    ni = int_idx.size

    for _ in range(max_moves):
        can_up = x[int_idx] + 1 <= hi_x + TOL
        can_dn = x[int_idx] - 1 >= lo_x - TOL
        # single +1 moves: act + Wi[:, j]
        act_up = act[:, None] + Wi  # (m, ni)
        ok_up = can_up & (
            (act_up >= row_lo[:, None] - TOL) & (act_up <= row_hi[:, None] + TOL)
        ).all(axis=0)
        act_dn = act[:, None] - Wi
        ok_dn = can_dn & (
            (act_dn >= row_lo[:, None] - TOL) & (act_dn <= row_hi[:, None] + TOL)
        ).all(axis=0)
        gain_up = np.where(ok_up, ci, np.inf)  # minimise: want negative
        gain_dn = np.where(ok_dn, -ci, np.inf)

        # pair swaps x_j += 1, x_l -= 1: act + Wi[:,j] - Wi[:,l]
        # (m, ni, ni) broadcast — fine for ni up to a few hundred
        act_sw = act_up[:, :, None] - Wi[:, None, :]
        ok_sw = (
            (act_sw >= row_lo[:, None, None] - TOL)
            & (act_sw <= row_hi[:, None, None] + TOL)
        ).all(axis=0)
        ok_sw &= can_up[:, None] & can_dn[None, :]
        np.fill_diagonal(ok_sw, False)
        gain_sw = np.where(ok_sw, ci[:, None] - ci[None, :], np.inf)

        best_up = gain_up.min()
        best_dn = gain_dn.min()
        best_sw = gain_sw.min()
        best = min(best_up, best_dn, best_sw)
        if best >= -TOL:
            break
        if best == best_up:
            j = int(np.argmin(gain_up))
            x[int_idx[j]] += 1
            act += Wi[:, j]
        elif best == best_dn:
            j = int(np.argmin(gain_dn))
            x[int_idx[j]] -= 1
            act -= Wi[:, j]
        else:
            j, l = np.unravel_index(int(np.argmin(gain_sw)), gain_sw.shape)
            x[int_idx[j]] += 1
            x[int_idx[l]] -= 1
            act += Wi[:, j] - Wi[:, l]
        val += best
    return x, float(c @ x)
