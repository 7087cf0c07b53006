"""Pareto-point / relaxation store.

Reference parity: src/solutions.{h,cpp} and src/result.{h,cpp}.

``Solutions.find`` implements the relaxation test of solutions.cpp:17-47: a
stored subproblem (its objective-bound vector ``ip`` and solved objective
vector ``result``) answers a query bound vector ``q`` when, for MIN,

* the stored box contains the query box:      stored.ip >= q   (elementwise)
* the stored optimum lies inside the query box: stored.result <= q

(the inequalities flip for MAX).  An *infeasible* stored box containing the
query box proves the query infeasible.  Because every stored result is the
lexicographic optimum of a downward-closed box, any hit returns exactly the
optimum of the queried subproblem.

Unlike the reference's O(store) linked-list scan per query (the hot loop noted
in SURVEY §2/C3), the store keeps fixed-capacity NumPy arrays so a query is a
single vectorised comparison — and many queries can be answered in one shot
(`find_batch`), which is what the bulk-synchronous scheduler uses.
"""

from __future__ import annotations

from typing import Iterator, List, Optional

import numpy as np

from moip_aira_tpu.sense import Sense


class Result:
    """One stored subproblem outcome (reference src/result.h:10-20)."""

    __slots__ = ("ip", "result", "infeasible")

    def __init__(self, ip: np.ndarray, result: Optional[np.ndarray], infeasible: bool):
        self.ip = ip
        self.result = result
        self.infeasible = infeasible

    def sort_key(self):
        # Descending order for display (reference result.cpp:9-28).
        return tuple(-int(v) for v in self.result)

    def __repr__(self) -> str:
        if self.infeasible:
            return f"Result(ip={self.ip}, infeasible)"
        return f"Result(ip={self.ip}, result={self.result})"


class Solutions:
    """Vectorised relaxation store with amortised-growth arrays."""

    def __init__(self, objective_count: int, capacity: int = 256):
        self.objective_count = objective_count
        self._n = 0
        self._ips = np.empty((capacity, objective_count), dtype=np.float64)
        self._results = np.zeros((capacity, objective_count), dtype=np.int64)
        self._infeasible = np.empty(capacity, dtype=bool)

    def __len__(self) -> int:
        return self._n

    # -- growth ------------------------------------------------------------
    def _ensure(self, extra: int) -> None:
        need = self._n + extra
        cap = self._ips.shape[0]
        if need <= cap:
            return
        while cap < need:
            cap *= 2
        self._ips = np.resize(self._ips, (cap, self.objective_count))
        self._results = np.resize(self._results, (cap, self.objective_count))
        self._infeasible = np.resize(self._infeasible, cap)

    # -- reference API -----------------------------------------------------
    def insert(self, ip, result, infeasible: bool) -> None:
        """Store a solved subproblem (reference solutions.cpp:82-101)."""
        self._ensure(1)
        i = self._n
        self._ips[i] = np.asarray(ip, dtype=np.float64)
        if infeasible:
            self._results[i] = 0
        else:
            self._results[i] = np.asarray(result, dtype=np.int64)
        self._infeasible[i] = infeasible
        self._n = i + 1

    def find(self, ip, sense: Sense) -> Optional[Result]:
        """Return a stored relaxation answering the query, else None."""
        n = self._n
        if n == 0:
            return None
        q = np.asarray(ip, dtype=np.float64)
        ips = self._ips[:n]
        res = self._results[:n]
        inf = self._infeasible[:n]
        if sense is Sense.MIN:
            t1 = (ips >= q).all(axis=1)
            t3 = (res <= q).all(axis=1)
        else:
            t1 = (ips <= q).all(axis=1)
            t3 = (res >= q).all(axis=1)
        hit = t1 & (inf | t3)
        idx = np.flatnonzero(hit)
        if idx.size == 0:
            return None
        i = int(idx[0])
        if self._infeasible[i]:
            return Result(self._ips[i], None, True)
        return Result(self._ips[i], self._results[i].copy(), False)

    def find_batch(self, queries: np.ndarray, sense: Sense):
        """Answer B queries at once.

        Returns (hit_mask (B,), infeasible (B,), results (B, k)).  Rows with
        hit_mask False have undefined results.
        """
        B = queries.shape[0]
        k = self.objective_count
        hit = np.zeros(B, dtype=bool)
        infeas = np.zeros(B, dtype=bool)
        out = np.zeros((B, k), dtype=np.int64)
        n = self._n
        if n == 0 or B == 0:
            return hit, infeas, out
        ips = self._ips[:n]  # (n, k)
        res = self._results[:n]
        inf = self._infeasible[:n]
        q = queries[:, None, :]  # (B, 1, k)
        if sense is Sense.MIN:
            t1 = (ips[None] >= q).all(axis=2)  # (B, n)
            t3 = (res[None] <= q).all(axis=2)
        else:
            t1 = (ips[None] <= q).all(axis=2)
            t3 = (res[None] >= q).all(axis=2)
        match = t1 & (inf[None] | t3)
        hit = match.any(axis=1)
        first = match.argmax(axis=1)
        infeas = inf[first] & hit
        out = res[first]
        return hit, infeas, out

    def merge(self, other: "Solutions") -> None:
        """Splice another store into this one (reference solutions.h:41-44)."""
        m = other._n
        self._ensure(m)
        self._ips[self._n : self._n + m] = other._ips[:m]
        self._results[self._n : self._n + m] = other._results[:m]
        self._infeasible[self._n : self._n + m] = other._infeasible[:m]
        self._n += m
        other._n = 0

    def feasible_points(self) -> np.ndarray:
        """All stored feasible objective vectors, shape (f, k)."""
        mask = ~self._infeasible[: self._n]
        return self._results[: self._n][mask]

    def sorted_unique_points(self) -> np.ndarray:
        """Feasible points, descending-lexicographic, deduplicated.

        Reference solutions.h:54-57 + result.cpp:9-46 (sort is descending so
        the output file lists big first coordinates first).
        """
        pts = self.feasible_points()
        if pts.shape[0] == 0:
            return pts
        order = np.lexsort(tuple(pts[:, i] for i in range(pts.shape[1] - 1, -1, -1)))
        pts = pts[order[::-1]]
        keep = np.ones(pts.shape[0], dtype=bool)
        keep[1:] = (pts[1:] != pts[:-1]).any(axis=1)
        return pts[keep]

    def __iter__(self) -> Iterator[Result]:
        for i in range(self._n):
            if self._infeasible[i]:
                yield Result(self._ips[i], None, True)
            else:
                yield Result(self._ips[i], self._results[i], False)
