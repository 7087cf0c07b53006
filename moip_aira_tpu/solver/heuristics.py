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


#: above this many integer variables the full (m, ni, ni) swap tensor is
#: replaced by a candidate subset — keeps the heuristic O(m·K²) at scale
SWAP_FULL_LIMIT = 300
SWAP_CAND = 128


def repair(
    Wx: np.ndarray,
    c: np.ndarray,
    lo: np.ndarray,
    hi: np.ndarray,
    x0: np.ndarray,
    int_idx: np.ndarray,
    max_moves: int = 60,
) -> Optional[np.ndarray]:
    """Restore ROW feasibility of an integer point by unit moves/swaps.

    The bound-sweep chains (solver/sweep.py) hand each successor MIP the
    PARENT rung's optimal point as a warm hint: it satisfies every structural
    constraint but violates the new objective-bound row by exactly one front
    step, so one or two greedy swaps usually repair it into a near-optimal
    incumbent — where the rounding heuristic from a cold LP can be far off.

    Each move is chosen to minimise the total row violation, tie-broken by
    objective delta; a move must strictly reduce violation, so the loop
    terminates.  Returns a feasible x, or None if repair stalls.
    """
    n = Wx.shape[1]
    x = np.asarray(x0, dtype=np.float64).copy()
    if int_idx.size:
        x[int_idx] = np.rint(x[int_idx])
    x = np.clip(x, lo[:n], hi[:n])
    act = Wx @ x
    row_lo, row_hi = lo[n:], hi[n:]

    def violation(a):
        return np.maximum(row_lo - a, 0.0).sum() + np.maximum(
            a - row_hi, 0.0
        ).sum()

    viol = violation(act)
    if int_idx.size == 0:
        return x if viol <= TOL else None
    Wi = Wx[:, int_idx]
    ci = c[int_idx]
    lo_x, hi_x = lo[int_idx], hi[int_idx]
    ni = int_idx.size

    for _ in range(max_moves):
        if viol <= TOL:
            return x
        can_up = x[int_idx] + 1 <= hi_x + TOL
        can_dn = x[int_idx] - 1 >= lo_x - TOL
        act_up = act[:, None] + Wi  # (m, ni)
        act_dn = act[:, None] - Wi
        v_up = (
            np.maximum(row_lo[:, None] - act_up, 0.0)
            + np.maximum(act_up - row_hi[:, None], 0.0)
        ).sum(axis=0)
        v_dn = (
            np.maximum(row_lo[:, None] - act_dn, 0.0)
            + np.maximum(act_dn - row_hi[:, None], 0.0)
        ).sum(axis=0)
        v_up = np.where(can_up, v_up, np.inf)
        v_dn = np.where(can_dn, v_dn, np.inf)
        if ni <= SWAP_FULL_LIMIT:
            js = ls = np.arange(ni)
        else:
            ju = np.flatnonzero(can_up)
            ld = np.flatnonzero(can_dn)
            js = ju[np.argsort(ci[ju])[:SWAP_CAND]] if ju.size else ju
            ls = ld[np.argsort(-ci[ld])[:SWAP_CAND]] if ld.size else ld
        if js.size and ls.size:
            act_sw = act_up[:, js, None] - Wi[:, None, ls]
            v_sw = (
                np.maximum(row_lo[:, None, None] - act_sw, 0.0)
                + np.maximum(act_sw - row_hi[:, None, None], 0.0)
            ).sum(axis=0)
            v_sw = np.where(
                can_up[js, None] & can_dn[None, ls]
                & (js[:, None] != ls[None, :]),
                v_sw,
                np.inf,
            )
        else:
            v_sw = np.full((1, 1), np.inf)

        best_v = min(v_up.min(), v_dn.min(), v_sw.min())
        if best_v >= viol - TOL:
            return None  # no move strictly reduces violation
        # among near-best violation reducers, prefer the cheapest objective
        if best_v == v_sw.min():
            jj, ll = np.unravel_index(int(np.argmin(v_sw)), v_sw.shape)
            j, l = int(js[jj]), int(ls[ll])
            x[int_idx[j]] += 1
            x[int_idx[l]] -= 1
            act += Wi[:, j] - Wi[:, l]
        elif best_v == v_up.min():
            j = int(np.argmin(np.where(v_up <= best_v + TOL, ci, np.inf)))
            x[int_idx[j]] += 1
            act += Wi[:, j]
        else:
            j = int(np.argmin(np.where(v_dn <= best_v + TOL, -ci, np.inf)))
            x[int_idx[j]] -= 1
            act -= Wi[:, j]
        viol = violation(act)
    return None


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

    Returns (x, value); x0 must already be feasible.  Beyond
    ``SWAP_FULL_LIMIT`` integer variables, the all-pairs swap scan is
    restricted to the ``SWAP_CAND`` cheapest-to-raise and costliest-to-lower
    columns (an improving swap needs c[j] < c[l]) so a single round stays
    ~O(m·K²) instead of O(m·n²) — at 2AP40 scale (n=1600) the full tensor
    is 1.7 GB/round and was the dominant cost of the whole solve.
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
        if ni <= SWAP_FULL_LIMIT:
            js = ls = np.arange(ni)
        else:
            # improving swap needs ci[j] < ci[l]: scan the K cheapest
            # raisable j's against the K costliest lowerable l's
            ju = np.flatnonzero(can_up)
            ld = np.flatnonzero(can_dn)
            js = ju[np.argsort(ci[ju])[:SWAP_CAND]] if ju.size else ju
            ls = ld[np.argsort(-ci[ld])[:SWAP_CAND]] if ld.size else ld
        if js.size and ls.size:
            act_sw = act_up[:, js, None] - Wi[:, None, ls]
            ok_sw = (
                (act_sw >= row_lo[:, None, None] - TOL)
                & (act_sw <= row_hi[:, None, None] + TOL)
            ).all(axis=0)
            ok_sw &= can_up[js, None] & can_dn[None, ls]
            ok_sw &= js[:, None] != ls[None, :]
            gain_sw = np.where(ok_sw, ci[js, None] - ci[None, ls], np.inf)
        else:
            gain_sw = np.full((1, 1), np.inf)

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
            jj, ll = np.unravel_index(int(np.argmin(gain_sw)), gain_sw.shape)
            j, l = int(js[jj]), int(ls[ll])
            x[int_idx[j]] += 1
            x[int_idx[l]] -= 1
            act += Wi[:, j] - Wi[:, l]
        val += best
    return x, float(c @ x)
