"""Adaptive parallel bound sweep — the TPU-shaped bi-objective front driver.

The AIRA epsilon ladder (engine/worker.py; reference aira.cpp:700-1840)
discovers the k=2 nondominated set SEQUENTIALLY: each round's objective
bound depends on the previous round's solved point, so a front of F points
needs ~F dependent rounds, and a device batch built from 1-2 workers runs
almost empty (measured on 2AP20: 124 fragment waves averaging 17 of 256
lanes).  That control-dependence is an artefact of walking the ladder one
rung at a time — not of the problem:

  For MIN objectives, the lexicographic optimum (f0, f1) of the box
  {obj1 <= b} is a nondominated point for ANY bound b, and it is the ONLY
  nondominated point with obj1 in [f1, b]  (a second such point p would
  have p0 > f0 — f0 is optimal under the bound — and p1 >= f1, so (f0, f1)
  would dominate it).  An infeasible bound b proves no point has obj1 <= b.

So the whole front is an INTERVAL-COVERING problem over the integer range
of obj1: seed a grid of bounds spanning the range, solve ALL of them as one
batched backend call (every lane is an independent lexicographic IP — the
wave/fragment backend runs them concurrently), mark the covered intervals,
and re-seed only the uncovered gaps.  A front of F points completes in
~ceil(F / batch) + O(1) adaptive rounds instead of F dependent ones, with
every device wave full.

Exactness: every emitted point is a full-permutation lexicographic optimum
of a downward-closed box (the CLAUDE.md invariant), solved by the same
exact backend as the ladder; the covering argument above is what makes the
union COMPLETE.  Requires integer-valued objectives (the reference's own
standing assumption — it rounds every objective value, aira.cpp:517).

Reference analogue: the EPP splitter (aira.cpp:1886-1990) statically cuts
the SAME range into one strip per thread; this driver is the adaptive,
batch-width-sized version of that idea.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from moip_aira_tpu.problem import Problem
from moip_aira_tpu.sense import INF, Sense
from moip_aira_tpu.solver.lex import LexRequest


class SweepResult:
    __slots__ = ("points", "ip_count", "rounds", "batch_sizes")

    def __init__(self, points, ip_count, rounds, batch_sizes):
        self.points = points
        self.ip_count = ip_count
        self.rounds = rounds
        self.batch_sizes = batch_sizes


def _subdivide(gaps: List[Tuple[int, int]], budget: int) -> List[int]:
    """Pick up to ``budget`` bound values across the gaps.

    Every gap gets its TOP value (solving at the top covers a suffix of the
    gap, so each gap strictly shrinks every round — termination); remaining
    budget spreads speculative extra bounds evenly inside the larger gaps.
    """
    bounds: List[int] = [hi for (_lo, hi) in gaps]
    extra = budget - len(bounds)
    if extra > 0:
        total = sum(hi - lo for lo, hi in gaps)
        if total > 0:
            for lo, hi in gaps:
                share = int(round(extra * (hi - lo) / total))
                if share <= 0 or hi - lo < 1:
                    continue
                step = max(1, (hi - lo) // (share + 1))
                b = hi - step
                while b >= lo and len(bounds) < budget:
                    bounds.append(b)
                    b -= step
    return bounds[:budget]


def sweep_front(
    problem: Problem,
    backend,
    batch: int = 256,
) -> Optional[SweepResult]:
    """Exact bi-objective nondominated set by adaptive parallel bound sweep.

    Returns None when the driver does not apply (objcnt != 2, or a
    non-integral objective makes integer interval covering unsound).
    """
    p = problem
    if p.objcnt != 2:
        return None
    for j in range(2):
        if not (
            np.all(p.C[j] == np.rint(p.C[j]))
            and np.all(p.is_int[np.abs(p.C[j]) > 0])
        ):
            return None  # non-integral objective: interval steps unsound

    is_min = p.objsen is Sense.MIN
    sgn = 1 if is_min else -1
    rounds = 0
    batch_sizes: List[int] = []
    ip_count = 0
    pts: List[np.ndarray] = []

    def solve(reqs: List[LexRequest]):
        nonlocal rounds, ip_count
        rounds += 1
        batch_sizes.append(len(reqs))
        outs = backend.lex_solve_batch(reqs)
        ip_count += sum(o.ip_solves for o in outs)
        return outs

    # ---- round 1: the two lexicographic extremes --------------------------
    free = p.initial_rhs()
    outs = solve(
        [
            LexRequest(rhs=free.copy(), perm=[0, 1]),
            LexRequest(rhs=free.copy(), perm=[1, 0]),
        ]
    )
    if outs[0].result is None:  # whole problem infeasible
        return SweepResult(
            np.zeros((0, 2), dtype=np.int64), ip_count, rounds, batch_sizes
        )
    L = np.asarray(outs[0].result, dtype=np.int64)  # min obj0 end
    R = np.asarray(outs[1].result, dtype=np.int64)  # min obj1 end
    pts.append(L)
    if not np.array_equal(L, R):
        pts.append(R)

    # working in SIGN-FOLDED obj1 units (w = sgn * obj1, so "tighter" is
    # always smaller): covered so far is [R_w, R_w] and [L_w, +inf); the
    # unknown region is w in [R_w + 1, L_w - 1]
    Lw = int(sgn * L[1])
    Rw = int(sgn * R[1])
    gaps: List[Tuple[int, int]] = []
    if Rw + 1 <= Lw - 1:
        gaps.append((Rw + 1, Lw - 1))

    # online front-density estimate: seeding bounds DENSER than the actual
    # point spacing only solves duplicate subproblems (each bound whose
    # interval another bound already covers returns the same point — 2AP40
    # measured 739 lex-IPs for a 108-point front with a flat batch budget).
    # Start at half the batch and re-budget each round from the measured
    # points-per-covered-length.
    distinct = {tuple(int(v) for v in q) for q in pts}

    while gaps:
        remaining = sum(hi - lo + 1 for lo, hi in gaps)
        total_range = Lw - Rw - 1
        covered_len = max(1, total_range - remaining)
        density = max(len(distinct) - 1, 1) / covered_len
        want = len(gaps) + int(np.ceil(density * remaining))
        budget = int(min(batch, max(len(gaps), want)))
        if rounds == 1:
            # no density signal yet: speculative half-batch, but never
            # denser than a quarter of the integer range (integer fronts
            # have >= 1-unit spacing; flooding a short range only solves
            # duplicates — 2AP20 measured 292 lex-IPs for a 46-point front)
            budget = min(batch // 2, max(len(gaps), remaining // 4, 1))
        bounds = _subdivide(gaps, budget)
        reqs = []
        for b in bounds:
            rhs = free.copy()
            rhs[1] = float(sgn * b)  # obj1 <= b (MIN) / >= -b (MAX)
            reqs.append(LexRequest(rhs=rhs, perm=[0, 1]))
        outs = solve(reqs)
        # covered intervals this round (in w units)
        covered: List[Tuple[int, int]] = []
        for b, out in zip(bounds, outs):
            if out.result is None:
                covered.append((-(2**62), b))  # infeasible below b too
            else:
                r = np.asarray(out.result, dtype=np.int64)
                pts.append(r)
                distinct.add(tuple(int(v) for v in r))
                covered.append((int(sgn * r[1]), b))
        covered.sort()
        # subtract the covered union from every gap
        merged: List[Tuple[int, int]] = []
        for lo, hi in covered:
            if merged and lo <= merged[-1][1] + 1:
                merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
            else:
                merged.append((lo, hi))
        nxt: List[Tuple[int, int]] = []
        for lo, hi in gaps:
            cur = lo
            for clo, chi in merged:
                if chi < cur or clo > hi:
                    continue
                if clo > cur:
                    nxt.append((cur, clo - 1))
                cur = max(cur, chi + 1)
                if cur > hi:
                    break
            if cur <= hi:
                nxt.append((cur, hi))
        gaps = nxt

    arr = np.stack(pts)
    # dedup + sort descending-lexicographic (store contract)
    order = np.lexsort(tuple(arr[:, i] for i in range(arr.shape[1] - 1, -1, -1)))
    arr = arr[order[::-1]]
    keep = np.ones(arr.shape[0], dtype=bool)
    keep[1:] = (arr[1:] != arr[:-1]).any(axis=1)
    return SweepResult(arr[keep], ip_count, rounds, batch_sizes)
