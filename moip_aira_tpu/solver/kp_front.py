"""Full-front dynamic program for bi-objective knapsack instances.

The reference solves its knapsack family (2KP50.lp …, KP2D in the paper)
point-by-point: one CPLEX MIP per lexicographic stage per Pareto point
(src/aira.cpp:452-536), with cuts and presolve carrying the hardness of the
correlated knapsack subproblems.  A branch-and-bound rebuild matches it on
small instances but hits the knapsack wall (tiny LP gaps, huge node counts)
long before the reference's 100–2000-item sizes.

This module takes the TPU-native route instead: for the *single-capacity*
bi-objective family, the entire nondominated set is one dense dynamic
program

    g[c, s] = max { v0(T) : T subset of items, w(T) <= c, v1(T) == s }

over a (cap+1, V1+1) table — a few hundred MB of int32 whose per-item
update is two shifted elementwise maxima.  That is pure vector work at HBM
bandwidth: the whole 2KP100 front (77 points) is ~100 shifted-max passes
over a 128 MB table, milliseconds of device time, where the MIP ladder
stalls for hours.  No branching, no LP, no tolerances — the arithmetic is
exact integer throughout, so the result needs no certification.

Structure detection is conservative: exactly two objectives, one capacity
row, nonnegative integer data, integral variables (bounded integers are
binary-split into power-of-two pseudo-items).  Everything else falls back
to the general AIRA + wave engine.

The table is bucketed (rounded up to multiples of 256 with no-op padding
items) so XLA compiles are keyed on the bucket shape, not the exact
instance — repeated benchmark sizes share one compile.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional

import numpy as np

from moip_aira_tpu.problem import Problem
from moip_aira_tpu.sense import Sense

#: hard ceiling on table cells (int32) so detection never commits the jax
#: path to an allocation it cannot make: 2^31 cells = 8 GB.
MAX_TABLE_CELLS = 2**31
#: numpy-oracle ceiling — the python loop over items is ~1 GB/s, keep the
#: oracle to sizes where it answers in seconds.
MAX_TABLE_CELLS_NP = 2**27

_BUCKET = 256


@dataclasses.dataclass
class KP2:
    """Canonical maximisation form: max (V[0]·x, V[1]·x) s.t. w·x <= cap,
    x binary after multiplicity expansion."""

    w: np.ndarray  # (n_items,) int64 > 0 expanded weights
    V: np.ndarray  # (2, n_items) int64 >= 0 expanded values
    cap: int
    #: True when the original problem minimises (points are negated back)
    negate: bool
    #: which original objective rides the DP s-axis (the smaller value sum)
    s_axis: int

    @property
    def table_cells(self) -> int:
        return (self.cap + 1) * (int(self.V[1].sum()) + 1)


def detect_kp2(problem: Problem) -> Optional[KP2]:
    """Return the canonical KP2 structure, or None if it doesn't apply.

    Accepts: 2 objectives; all variables integer with lb 0; exactly one
    structural row that is a pure <= capacity row (or >= with nonpositive
    data, the mirrored form); objective/weight data integral; objectives
    uniformly "profit-like" (maximise nonnegative, or minimise nonpositive
    as the reference's .mop convention encodes it).
    """
    p = problem
    if p.objcnt != 2 or p.m_struct != 1:
        return None
    if not bool(np.all(p.is_int)):
        return None
    if not bool(np.all(p.lb == 0)):
        return None
    w = np.asarray(p.A[0], dtype=np.float64)
    row_lb = float(p.row_lb[0])
    row_ub = float(p.row_ub[0])
    if np.isfinite(row_ub) and not np.isfinite(row_lb):
        cap = row_ub
    elif np.isfinite(row_lb) and not np.isfinite(row_ub) and np.all(w <= 0):
        # -w·x >= -cap mirrored form
        w, cap = -w, -row_lb
    else:
        return None
    if cap < 0 or np.any(w < 0):
        return None
    if not np.all(w == np.rint(w)):
        return None
    # integer weights make a fractional capacity equivalent to its floor
    cap = math.floor(cap)
    C = np.asarray(p.C, dtype=np.float64)
    if not np.all(C == np.rint(C)):
        return None
    if p.objsen is Sense.MAX and np.all(C >= 0):
        V = C.copy()
        negate = False
    elif p.objsen is Sense.MIN and np.all(C <= 0):
        V = -C
        negate = True
    else:
        return None

    # effective integer upper bounds; unbounded vars are capped by capacity
    ub = np.asarray(p.ub, dtype=np.float64).copy()
    unb = ~np.isfinite(ub)
    if np.any(unb):
        with np.errstate(divide="ignore"):
            by_cap = np.floor(np.where(w > 0, cap / np.maximum(w, 1e-300), 0))
        # a zero-weight unbounded var with positive value => unbounded front
        if np.any(unb & (w == 0) & (V.max(axis=0) > 0)):
            return None
        ub[unb] = by_cap[unb]
    ub = np.rint(ub).astype(np.int64)
    w = np.rint(w).astype(np.int64)
    V = np.rint(V).astype(np.int64)
    cap = int(cap)

    # drop useless items; expand multiplicities by binary splitting
    ws, v0s, v1s = [], [], []
    for i in range(p.n):
        u = int(ub[i])
        if u <= 0 or (V[0, i] == 0 and V[1, i] == 0):
            continue
        if w[i] > cap:
            continue
        u = min(u, cap // w[i]) if w[i] > 0 else u
        t = 1
        while u > 0:
            k = min(t, u)
            ws.append(w[i] * k)
            v0s.append(V[0, i] * k)
            v1s.append(V[1, i] * k)
            u -= k
            t *= 2
    if not ws:
        w_e = np.zeros(0, dtype=np.int64)
        V_e = np.zeros((2, 0), dtype=np.int64)
    else:
        w_e = np.asarray(ws, dtype=np.int64)
        V_e = np.stack(
            [np.asarray(v0s, dtype=np.int64), np.asarray(v1s, dtype=np.int64)]
        )

    # the smaller value sum rides the s-axis (smaller table)
    s_axis = int(np.argmin(V_e.sum(axis=1))) if w_e.size else 1
    if s_axis == 0:
        V_e = V_e[::-1].copy()
    kp = KP2(w=w_e, V=V_e, cap=int(cap), negate=negate, s_axis=s_axis)
    if kp.table_cells > MAX_TABLE_CELLS:
        return None
    return kp


def _extract_front(last_row: np.ndarray, kp: KP2) -> np.ndarray:
    """Nondominated (obj0, obj1) points from the c=cap table row, in the
    problem's native objective order and the store's descending-lex sort."""
    best = np.asarray(last_row, dtype=np.int64)
    S = best.shape[0] - 1
    pts = []
    run = -1
    for s in range(S, -1, -1):
        if best[s] > run:
            run = int(best[s])
            pts.append((run, s))
    if not pts:
        return np.zeros((0, 2), dtype=np.int64)
    arr = np.asarray(pts, dtype=np.int64)  # columns: (v_other, v_s)
    if kp.s_axis == 0:
        arr = arr[:, ::-1]
    if kp.negate:
        arr = -arr
    order = np.lexsort((arr[:, 1], arr[:, 0]))
    return arr[order[::-1]]


def front_np(kp: KP2) -> np.ndarray:
    """NumPy oracle: full-table DP, exact int32 arithmetic."""
    S = int(kp.V[1].sum())
    C = kp.cap
    if (C + 1) * (S + 1) > MAX_TABLE_CELLS_NP:
        raise MemoryError(
            f"KP2 table {(C + 1)}x{(S + 1)} exceeds the numpy-oracle budget"
        )
    g = np.full((C + 1, S + 1), -1, dtype=np.int32)
    g[:, 0] = 0
    for wi, b0, a1 in zip(kp.w, kp.V[0], kp.V[1]):
        wi, b0, a1 = int(wi), int(b0), int(a1)
        src = g[: C + 1 - wi, : S + 1 - a1]
        cand = np.where(src >= 0, src + b0, -1)
        tgt = g[wi:, a1:]
        np.maximum(tgt, cand, out=tgt)
    return _extract_front(g[C], kp)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def front_jax(kp: KP2) -> np.ndarray:
    """Device DP: ``lax.scan`` over items, each step two shifted elementwise
    maxima over the (C_p, S_p) int32 table — pure HBM-bandwidth work that
    XLA fuses into one pass.  Table dims and item count are bucketed so the
    compile is reused across instances of the same size class."""
    import jax
    import jax.numpy as jnp

    S = int(kp.V[1].sum())
    C = kp.cap
    n = kp.w.shape[0]
    C_p = _round_up(C + 1, _BUCKET)
    S_p = _round_up(S + 1, _BUCKET)
    n_p = _round_up(max(n, 1), 64)
    # no-op padding items: w=0, v=0 leaves the table unchanged
    w = np.zeros(n_p, dtype=np.int32)
    b0 = np.zeros(n_p, dtype=np.int32)
    a1 = np.zeros(n_p, dtype=np.int32)
    w[:n] = kp.w
    b0[:n] = kp.V[0]
    a1[:n] = kp.V[1]
    wmax = int(w.max()) if n else 0
    amax = int(a1.max()) if n else 0

    @jax.jit
    def run(w_a, b0_a, a1_a):
        g0 = jnp.full((C_p, S_p), -1, dtype=jnp.int32)
        g0 = g0.at[:, 0].set(0)

        def step(g, item):
            wi, b0i, a1i = item
            # shifted read g[c-wi, s-a1i] via a NEG-padded frame: static
            # slice sizes, dynamic offsets
            gp = jnp.full((C_p + wmax, S_p + amax), -1, dtype=jnp.int32)
            gp = jax.lax.dynamic_update_slice(gp, g, (wmax, amax))
            sh = jax.lax.dynamic_slice(gp, (wmax - wi, amax - a1i), (C_p, S_p))
            cand = jnp.where(sh >= 0, sh + b0i, -1)
            return jnp.maximum(g, cand), None

        g, _ = jax.lax.scan(step, g0, (w_a, b0_a, a1_a))
        return g[C]

    dev = jax.jit(run)
    last = np.asarray(dev(jnp.asarray(w), jnp.asarray(b0), jnp.asarray(a1)))
    return _extract_front(last[: S + 1], kp)


#: compiled-runner cache: identical table/item geometry reuses one jit
_PALLAS_CACHE: dict = {}


def _pallas_runner(
    C: int,
    S: int,
    wmax: int,
    amax: int,
    n_p: int,
    interpret: bool,
):
    """Build (or fetch) the compiled DP runner for this geometry."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S_p = _round_up(S + 1, 128)
    # block rows sized against Mosaic's 16 MB scoped-vmem ceiling: the two
    # scratch buffers PLUS ~two roll intermediates (they live on the same
    # VMEM stack) — budget ≈ 4 live copies of the padded block
    R = max(8, (14 * 2**20) // (4 * 4 * (S_p + 128)) - 8)
    R = max(8, min(512, (R // 8) * 8))
    C_p = _round_up(C + 1, R)
    key = (C_p, S_p, wmax, amax, n_p, R, C, S, interpret)
    cached = _PALLAS_CACHE.get(key)
    if cached is not None:
        return cached

    nb = C_p // R
    # table rows/cols: [sentinel pad | data | DMA overrun pad] — the aligned
    # source window can read up to 8 rows / 128 cols past the data region
    ROWS = wmax + C_p + 8
    COLS = amax + S_p + 128

    def kernel(items_ref, tbl_in, tbl_out, src, tgt, sem_s, sem_t):
        i = pl.program_id(0)
        j = pl.program_id(1)
        wi = items_ref[0, i]
        b0 = items_ref[1, i]
        a1 = items_ref[2, i]
        r0 = pl.multiple_of(C_p - (j + 1) * R, 8)  # descending capacity blocks

        @pl.when((wi > 0) | (a1 > 0) | (b0 > 0))
        def _():
            # source window aligned DOWN to the (8, 128) int32 tile; the
            # residual (dr, dc) offset is applied in VMEM below
            rb = wmax + r0 - wi
            ca = amax - a1
            dr = jax.lax.rem(rb, 8)
            dc = jax.lax.rem(ca, 128)
            d_src = pltpu.make_async_copy(
                tbl_out.at[
                    pl.ds(pl.multiple_of((rb // 8) * 8, 8), R + 8),
                    pl.ds(pl.multiple_of((ca // 128) * 128, 128), S_p + 128),
                ],
                src,
                sem_s,
            )
            d_tgt = pltpu.make_async_copy(
                tbl_out.at[
                    pl.ds(pl.multiple_of(wmax + r0, 8), R),
                    pl.ds(amax, S_p),
                ],
                tgt,
                sem_t,
            )
            d_src.start()
            d_tgt.start()
            d_src.wait()
            d_tgt.wait()
            # realign in VMEM: dynamic circular shifts (no wrap reaches the
            # used [0:R, 0:S_p] window since dr < 8 <= pad, dc < 128 <= pad).
            # pltpu.roll requires NON-NEGATIVE shifts, so shift left by the
            # modular complement
            sh_r = jax.lax.rem(jnp.int32(R + 8) - dr, jnp.int32(R + 8))
            sh_c = jax.lax.rem(jnp.int32(S_p + 128) - dc, jnp.int32(S_p + 128))
            rolled = pltpu.roll(src[...], shift=sh_r, axis=0)
            rolled = pltpu.roll(rolled, shift=sh_c, axis=1)
            shifted = rolled[:R, :S_p]
            cand = jnp.where(shifted >= 0, shifted + b0, -1)
            tgt[...] = jnp.maximum(tgt[...], cand)
            d_out = pltpu.make_async_copy(
                tgt,
                tbl_out.at[
                    pl.ds(pl.multiple_of(wmax + r0, 8), R),
                    pl.ds(amax, S_p),
                ],
                sem_t,
            )
            d_out.start()
            d_out.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_p, nb),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((R + 8, S_p + 128), jnp.int32),
            pltpu.VMEM((R, S_p), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ROWS, COLS), jnp.int32),
        input_output_aliases={1: 0},
        interpret=interpret,
    )

    @functools.partial(jax.jit, static_argnums=())
    def run(items_a):
        tbl = jnp.full((ROWS, COLS), -1, dtype=jnp.int32)
        tbl = tbl.at[wmax:, amax].set(0)
        out = fn(items_a, tbl)
        # the answer row: c = cap (any c >= cap is equivalent by monotonicity)
        return out[wmax + C, amax : amax + S + 1]

    _PALLAS_CACHE[key] = run
    return run


def front_pallas(kp: KP2, interpret: bool = False) -> np.ndarray:
    """TPU production path: the DP as ONE Mosaic kernel.

    Why not the ``lax.scan`` version on TPU: the axon compile service takes
    10–600 s for XLA:TPU loop programs while Mosaic compiles in seconds
    (see CLAUDE.md); and the scan's functional double-buffering doubles HBM
    footprint where this kernel updates the table in place.

    Layout: the table lives in HBM padded by (wmax8, amax128) sentinel
    rows/columns on the top/left so the in-place write offsets are
    tile-aligned; the shifted read ``g[c - w_i, s - a1_i]`` DMAs an
    aligned-down window and realigns in VMEM (dynamic rolls).  Grid =
    (items, row-blocks); row blocks walk capacity DESCENDING, so a block's
    shifted source rows (strictly lower c) still hold the previous item's
    values — the 0/1 knapsack in-place order — while sequential TPU grid
    execution orders items.
    """
    import jax.numpy as jnp

    S = int(kp.V[1].sum())
    C = kp.cap
    n = kp.w.shape[0]
    if n == 0:
        return _extract_front(np.where(np.arange(S + 1) == 0, 0, -1), kp)
    wmax = _round_up(max(int(kp.w.max()), 1), 8)
    amax = _round_up(max(int(kp.V[1].max()), 1), 128)
    n_p = _round_up(n, 8)
    items = np.zeros((3, n_p), dtype=np.int32)
    items[0, :n] = kp.w
    items[1, :n] = kp.V[0]
    items[2, :n] = kp.V[1]

    run = _pallas_runner(C, S, wmax, amax, n_p, interpret)
    last = np.asarray(run(jnp.asarray(items)))
    return _extract_front(last, kp)


def kp2_front(problem: Problem, engine: str = "auto") -> Optional[np.ndarray]:
    """Detect + solve; returns sorted nondominated points or None.

    ``engine``: 'auto' (Mosaic kernel on TPU, XLA scan elsewhere, numpy
    last resort), 'pallas', 'jax', 'numpy'.
    """
    kp = detect_kp2(problem)
    if kp is None:
        return None
    if engine == "numpy":
        return front_np(kp)
    if engine == "jax":
        return front_jax(kp)
    if engine == "pallas":
        return front_pallas(kp)
    try:
        import jax

        # 'axon' is the tunnelled-TPU platform; GPUs get the XLA scan
        if jax.devices()[0].platform in ("tpu", "axon"):
            return front_pallas(kp)
        return front_jax(kp)
    except Exception:
        if kp.table_cells <= MAX_TABLE_CELLS_NP:
            return front_np(kp)
        raise
