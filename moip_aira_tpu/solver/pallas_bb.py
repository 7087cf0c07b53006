"""Batched branch-and-bound FRAGMENT kernel — a B&B subtree per lane, on
the revised-simplex core, in one Mosaic program.

Why: the wave backend (solver/wave.py) solves ONE LP relaxation per lane
per device call, so a deep B&B tree pays one host<->device round trip per
tree level — through the axon tunnel (~28 ms fixed dispatch) that makes
sequential trees latency-bound (2AP40: ~450 s for a front the reference
does in ~11 s, almost all of it round trips).  This kernel keeps the tree
walk ON the device: each lane runs an entire depth-first B&B fragment —
solve the node LP (revised simplex, warm-pivoting across nodes with the
SAME continuously-maintained basis inverse), branch on the most-fractional
integer variable, descend / backtrack with incremental bound edits — for up
to ``F`` nodes per call.  Lanes are asynchronous inside one lock-step loop:
every tick each lane advances its own state machine (PIVOT / TRANSITION /
BACKTRACK / DONE), so a lane finishing its LP immediately branches and keeps
pivoting while its neighbours are mid-solve — no slowest-lane wave barrier.

Exactness (CLAUDE.md invariant) is preserved by decision LOGGING + host
audit, not by trusting f32: the kernel records every node it processed
(claimed status, objective, basis, packed at-upper flags, branch decision)
and the host (solver/bb_audit.py) replays the walk, reconstructs every
node's exact bounds, re-certifies every claim in f64 (solver/verify.py
rigorous interval certificates), and re-opens any node whose prune doesn't
hold rigorously against the VALIDATED final incumbent.  The kernel is thus
a *speculative* searcher; the audit is the proof, exactly as the wave
path's per-node certification is today.

Replaces the same reference hot path as pallas_rev.py: the CPXmipopt
branch-and-bound inside `solve` (/root/reference/src/aira.cpp:452-536) —
but as whole-subtree device residency rather than per-LP offload.

Layout/idiom notes (Mosaic): per-lane scalars ride (B, 128) broadcast rows;
bools never enter minor-dim inserts (int32 detours); stack entries are
(B, D) arrays scattered/gathered by depth-iota masks; the at-upper log is
bit-packed 16-per-f32-word via one shared (nc_p, PW) matmul.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from moip_aira_tpu.solver import simplex_jax as sx
from moip_aira_tpu.utils import knobs

BIG = 1e30
STALL_LIMIT = 60
STALL_EXIT = 300  # zero-progress phase-2 pivots before claiming OPTIMAL
INT_TOL = 1e-4  # f32 integrality tolerance (audit re-checks in f64)

# node actions (logged)
ACT_BRANCH = 0
ACT_PRUNE = 1
ACT_INFEAS = 2
ACT_LEAF = 3
ACT_ITERLIM = 4

# lane modes
MODE_PIVOT = 0
MODE_TRANS = 1
MODE_BACK = 2
MODE_DONE = 3

# lane exit states
LS_EXHAUSTED = 0
LS_BUDGET = 1
LS_TICKS = 3

# log scalar-row field indices (lg_scal[:, f, FIELD])
F_STATUS = 0
F_OBJ = 1
F_J = 2
F_FL = 3
F_DIR = 4  # 1 = down child first
F_ACTION = 5
F_ITERS = 6
F_PHASE1 = 7  # 1 = the lane was still primal-infeasible when it closed


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def make_pallas_bb_batch(
    W_np: np.ndarray,
    int_mask_np: np.ndarray,
    batch: int,
    F: int = 32,
    D: int = 128,
    node_iters: int = 1500,
    max_ticks: int = 8192,
    feas_tol: float = 3e-4,
    cost_tol: float = 3e-5,
    pivot_tol: float = 3e-5,
    interpret: bool = False,
    aot: bool = False,
    compact: bool = True,
):
    """Build the fragment solver.

    fn(c, lo, hi, par) -> dict of arrays:
      best (B,) f32        best incumbent value found (<= par[:,0])
      bestx (B, nc) f32    its solution (valid where best < par[:,0])
      nlog (B,) i32        nodes logged
      lstate (B,) i32      LS_* exit state
      iters (B,) i32       total simplex iterations
      lg_scal (B, F, 8)    per-node scalars (F_* fields)
      lg_basis (B, F, m)   per-node basis (f32-encoded col ids)
      lg_atup (B, F, nc)   per-node at-upper flags (unpacked to 0/1)

    Inputs: c/lo/hi as in pallas_rev (root-node bounds incl. logical
    stage bounds); par (B, 4): [0]=incumbent, [1]=obj-integral flag,
    [2]=node budget (<= F), [3]=lane active flag; wb (B, m) i32 warm
    ROOT basis (-1 = cold) rebuilt in-kernel by Gauss-Jordan — re-opened
    subtree roots restart from their parent record's basis instead of a
    cold phase-1 (the assignment family's degeneracy makes cold solves
    300-1500+ iterations vs a handful warm); wa (B, nc) i32 at-upper.
    ``int_mask_np`` marks integer STRUCTURAL columns (length n or nc).
    """
    m, nc = W_np.shape
    n = nc - m
    # the noise-stall exit must be reachable BEFORE the per-node iteration
    # cap, or every degenerate stall burns its full budget and lands on the
    # host as ITERLIM instead of claiming OPTIMAL (which certifies, or at
    # worst costs the same host LP): cap it at half the node budget.
    stall_exit = min(STALL_EXIT, max(60, node_iters // 2))
    # phase-1 stall exit: a lane still primal-infeasible after ``p1_stall``
    # consecutive zero-progress pivots (Bland kicked in at STALL_LIMIT and
    # hasn't escaped) is in an f32 degenerate stall it will not leave —
    # measured (2AP20/2AP40): every ITERLIM record burned its FULL per-node
    # budget.  Claiming ITERLIM at the stall threshold instead halves the
    # wasted device ticks per stalled node and frees the lane for the rest
    # of its fragment; the record lands on the same host path either way.
    # MOIP_FRAG_P1_STALL=0 disables (burn the full node budget as before).
    p1_stall = int(knobs.get("MOIP_FRAG_P1_STALL", str(stall_exit)))
    # Dual-simplex reoptimisation of warm nodes: built, measured twice, and
    # DELETED (round 5).  The simple dual lost r3's A/B (2AP20 134.2 s vs
    # 39.9 s, 926 false INFEASIBLE claims from f32 d-sign noise); the
    # production version (bound-flipping long-step ratio test + Harris
    # tie-breaking, r4) was a wash at 2AP20 and LOST at 2AP40 (>100 min vs
    # the primal's 20).  Round 5 then moved its entire target workload —
    # warm assignment-family children — off the LP path altogether
    # (solver/ap_bb.py closes those IPs with exact matchings), leaving the
    # dual no instance family to win on.  git history has the full kernel
    # (tag: commit 6dd59ef) if a future workload re-motivates it.
    m_p = _round_up(m, 8)
    nc_p = _round_up(n + m_p, 128)
    PW = _round_up(-(-nc_p // 16), 128)  # packed at-upper words
    if nc_p > np.iinfo(np.int16).max:
        # the compact record fetch stores basis column ids as int16; a
        # padded column count past 32767 would silently wrap them and
        # corrupt warm/audit bases — take the full-tensor fetch instead
        compact = False

    # VMEM budget per lane: LP state (BI + warm-GJ P1 + rows) + B&B + logs
    per_lane = (
        2 * m_p * m_p  # BI + P1
        + 11 * nc_p  # c/lo/hi/wa/clo/chi/zv-temps/bestx/inb/atup
        + 13 * m_p
        + 6 * D
        + 9 * 128  # per-lane scalar rows (stall/lpstat/.../restart)
        + F * (128 + m_p + PW)
    ) * 4
    bytes_shared = (m_p * nc_p + nc_p * PW) * 4
    # Per-chunk VMEM budget for the autosizer.  The grid runs chunks
    # SEQUENTIALLY per core, so wave wall-time scales with the chunk count:
    # doubling CHUNK halves the sequential passes per wave.  v5e has 128 MB
    # of VMEM per core (vmem_limit below already asks for 100 MB); the
    # budget only needs to leave room for the in/out blocks (~10-15 MB at
    # reference shapes).  MOIP_FRAG_VMEM_MB overrides for experiments.
    vmem_budget = int(knobs.get("MOIP_FRAG_VMEM_MB")) * 2**20
    CHUNK = 256
    while CHUNK > 8 and bytes_shared + CHUNK * per_lane > vmem_budget:
        CHUNK //= 2
    if batch < CHUNK:
        CHUNK = max(8, batch)
    assert batch % CHUNK == 0, (batch, CHUNK)
    B = CHUNK

    Wp = np.zeros((m_p, nc_p), dtype=np.float32)
    Wp[:m, :n] = W_np[:, :n]
    for i in range(m_p):
        Wp[i, n + i] = -1.0
    Wp[:m, n : n + m] = W_np[:, n:]
    Wp_j = jnp.asarray(Wp)

    im = np.zeros((8, nc_p), dtype=np.float32)
    im[:, : int_mask_np.shape[0]] = np.asarray(int_mask_np, np.float32)[None]
    im[:, n:] = 0.0  # logical columns are never integral
    im_j = jnp.asarray(im)

    pk = np.zeros((nc_p, PW), dtype=np.float32)
    for i in range(nc_p):
        pk[i, i // 16] = float(1 << (i % 16))
    pk_j = jnp.asarray(pk)

    RUNNING, OPTIMAL, INFEASIBLE, UNBOUNDED, ITERLIM = (
        sx.RUNNING,
        sx.OPTIMAL,
        sx.INFEASIBLE,
        sx.UNBOUNDED,
        sx.ITER_LIMIT,
    )

    def kernel(
        W_ref, im_ref, pk_ref, c_ref, lo_ref, hi_ref, par_ref, wb_ref, wa_ref,
        # outputs
        best_ref, bestx_ref, nlog_ref, lstate_ref, titer_ref,
        lgs_ref, lgb_ref, lga_ref, fb_ref, fa_ref,
        # scratch
        BI, P1, xB, bl, bh, cB, cIb, basis, inb, atup,
        clo, chi, zscr,
        stall, lpstat, lobj, niter, mode, best, ncnt, depth, restart,
        st_j, st_fl, st_ol, st_oh, st_state, st_dir,
    ):
        c = c_ref[...]
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, nc_p), 1)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, m_p), 1)
        cid128 = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
        d_iota = jax.lax.broadcasted_iota(jnp.int32, (B, D), 1)
        f_iota3 = jax.lax.broadcasted_iota(jnp.int32, (B, F, 1), 1)
        col_valid = (col_ids < n + m).astype(jnp.float32)
        cvalid = jnp.broadcast_to(col_valid > 0, (B, nc_p))
        intm = jnp.broadcast_to(im_ref[0:1, :], (B, nc_p))

        def eb(v):  # (B,) -> (B, 1) bool via int32 (Mosaic minor-dim rule)
            return v.astype(jnp.int32)[:, None] > 0

        def eb3(v):
            return v.astype(jnp.int32)[:, None, None] > 0

        def sc(v):  # per-lane scalar (B,) -> (B, 128) broadcast rows
            return jnp.broadcast_to(v[:, None], (B, 128))

        def mm(a, b_, ca, cb_):
            return jax.lax.dot_general(
                a, b_,
                dimension_numbers=(((ca,), (cb_,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        # ---- init ---------------------------------------------------------
        active0 = par_ref[:, 3] > 0.5
        obj_int = par_ref[:, 1] > 0.5  # (B,)
        budget = par_ref[:, 2]
        clo[...] = lo_ref[...]
        chi[...] = hi_ref[...]
        bi_row = jax.lax.broadcasted_iota(jnp.int32, (1, m_p, m_p), 1)
        bi_col = jax.lax.broadcasted_iota(jnp.int32, (1, m_p, m_p), 2)
        neg_eye = jnp.where(bi_row == bi_col, -1.0, 0.0)
        basis_cold = jnp.broadcast_to(n + row_ids, (B, m_p)).astype(jnp.int32)
        basis[...] = basis_cold

        # ---- warm-root basis rebuild (pallas_rev.py pattern) ---------------
        # Fragment roots re-opened from a parent record restart from the
        # parent's basis instead of a cold -I: gather the warm basis columns
        # into P1, greedy Gauss-Jordan on [P1 | -I] — the row-op matrix that
        # one-hots P1 is B^-1, so BI ends as -B^-1.  Cold phase-1 on the
        # massively degenerate assignment polytopes burns 300-1500+
        # iterations per node; a parent basis re-attains feasibility in a
        # handful.  Scratch roles during GJ: xB = assigned-row mask,
        # atup[:, :m_p] = remaining-entry mask, stall[:, 0] = rebuild-ok.
        warm0 = wb_ref[:, 0] >= 0
        BI[...] = jnp.broadcast_to(neg_eye, (B, m_p, m_p))
        stall[...] = jnp.zeros((B, 128), jnp.int32)

        @pl.when(jnp.any(warm0))
        def _():
            def gather_step(t, _):
                tsel = (row_ids == t).astype(jnp.int32)  # (1, m_p)
                wbt = jnp.sum(tsel * wb_ref[...], axis=1)  # (B,)
                colmask = (col_ids == wbt[:, None]).astype(jnp.float32)
                colt = mm(colmask, W_ref[...], 1, 1)  # (B, m_p)
                P1[...] = jnp.where(bi_col == t, colt[:, :, None], P1[...])
                return 0

            jax.lax.fori_loop(0, m_p, gather_step, 0)

            xB[...] = jnp.zeros((B, m_p), jnp.float32)
            atup[...] = jnp.broadcast_to(
                (col_ids < m_p).astype(jnp.int32), (B, nc_p)
            )
            stall[...] = jnp.broadcast_to(
                warm0.astype(jnp.int32)[:, None], (B, 128)
            )
            rid_b = jax.lax.broadcasted_iota(jnp.int32, (B, m_p), 1)

            def gj_step(i, _):
                okw = stall[:, 0] > 0
                assigned = xB[...]  # (B, m_p) rows
                rem = atup[:, :m_p].astype(jnp.float32)  # (B, m_p) entries
                scores = (
                    jnp.abs(P1[...])
                    * (1.0 - assigned)[:, :, None]
                    * rem[:, None, :]
                )
                rowmax = jnp.max(scores, axis=2)  # (B, m_p)
                r = jnp.argmax(rowmax, axis=1).astype(jnp.int32)
                rmask = (rid_b == r[:, None]).astype(jnp.float32)
                scores_r = jnp.sum(scores * rmask[:, :, None], axis=1)
                tb = jnp.argmax(scores_r, axis=1).astype(jnp.int32)  # (B,)
                tmask = (rid_b == tb[:, None]).astype(jnp.float32)
                pivcol = jnp.sum(P1[...] * tmask[:, None, :], axis=2)
                piv = jnp.sum(pivcol * rmask, axis=1)  # (B,)
                good = jnp.abs(piv) > 1e-5
                act = okw & good
                actf = act.astype(jnp.float32)[:, None]
                safe_piv = jnp.where(jnp.abs(piv) > 1e-5, piv, 1.0)
                colv_mod = jnp.where(rmask > 0, piv[:, None] - 1.0, pivcol)
                for Xr in (P1, BI):
                    rowv = jnp.sum(Xr[...] * rmask[:, :, None], axis=1)
                    rowdiv = rowv / safe_piv[:, None]
                    Xn = Xr[...] - colv_mod[:, :, None] * rowdiv[:, None, :]
                    Xr[...] = jnp.where(eb3(act), Xn, Xr[...])
                wbt = jnp.sum(tmask * wb_ref[...].astype(jnp.float32), axis=1)
                basis[...] = jnp.where(
                    (rmask > 0) & eb(act),
                    wbt.astype(jnp.int32)[:, None],
                    basis[...],
                )
                xB[...] = jnp.minimum(assigned + rmask * actf, 1.0)
                atup[...] = jnp.where(
                    (col_ids < m_p) & (col_ids == tb[:, None]) & eb(act),
                    0,
                    atup[...],
                )
                stall[...] = jnp.broadcast_to(
                    (okw & good).astype(jnp.int32)[:, None], (B, 128)
                )
                return 0

            jax.lax.fori_loop(0, m_p, gj_step, 0)

        use_warm = warm0 & (stall[:, 0] > 0)
        # BI holds -B^-1 for good warm lanes; cold / failed-warm lanes take
        # the logical basis (B = -I  =>  B^-1 = -I)
        BI[...] = jnp.where(
            eb3(use_warm), -BI[...], jnp.broadcast_to(neg_eye, (B, m_p, m_p))
        )
        basis[...] = jnp.where(eb(use_warm), basis[...], basis_cold).astype(
            jnp.int32
        )

        # membership / at-upper masks from the effective basis
        inb[...] = jnp.zeros((B, nc_p), jnp.int32)

        def memb_step(i, _):
            rsel = (row_ids == i).astype(jnp.int32)
            bi_i = jnp.sum(rsel * basis[...], axis=1)
            inb[...] = jnp.where(col_ids == bi_i[:, None], 1, inb[...])
            return 0

        jax.lax.fori_loop(0, m_p, memb_step, 0)
        is_struct = col_ids < n
        at0 = is_struct & ~jnp.isfinite(clo[...]) & jnp.isfinite(chi[...])
        atup_cold = jnp.where((inb[...] == 0) & at0, 1, 0)
        atup_warm = jnp.where((inb[...] == 0) & (wa_ref[...] > 0), 1, 0)
        atup[...] = jnp.where(eb(use_warm), atup_warm, atup_cold)

        # basic bounds / costs / int flags gathered from the basis
        # (mask-multiply over +-BIG-sanitised bounds; restored to inf after)
        lo_s = jnp.where(
            jnp.isposinf(clo[...]), BIG,
            jnp.where(jnp.isneginf(clo[...]), -BIG, clo[...]),
        )
        hi_s = jnp.where(
            jnp.isposinf(chi[...]), BIG,
            jnp.where(jnp.isneginf(chi[...]), -BIG, chi[...]),
        )

        def pick_step(i, _):
            rsel = (row_ids == i).astype(jnp.int32)  # (1, m_p)
            bi_i = jnp.sum(rsel * basis[...], axis=1)  # (B,)
            sel = (col_ids == bi_i[:, None]).astype(jnp.float32)
            rself = rsel.astype(jnp.float32)
            bl[...] = jnp.where(
                rself > 0, jnp.sum(sel * lo_s, axis=1)[:, None], bl[...]
            )
            bh[...] = jnp.where(
                rself > 0, jnp.sum(sel * hi_s, axis=1)[:, None], bh[...]
            )
            cB[...] = jnp.where(
                rself > 0, jnp.sum(sel * c, axis=1)[:, None], cB[...]
            )
            cIb[...] = jnp.where(
                rself > 0, jnp.sum(sel * intm.astype(jnp.float32), axis=1)[:, None],
                cIb[...],
            )
            return 0

        bl[...] = jnp.zeros((B, m_p), jnp.float32)
        bh[...] = jnp.zeros((B, m_p), jnp.float32)
        cB[...] = jnp.zeros((B, m_p), jnp.float32)
        cIb[...] = jnp.zeros((B, m_p), jnp.float32)
        jax.lax.fori_loop(0, m_p, pick_step, 0)
        bl[...] = jnp.where(bl[...] <= -BIG / 2, -jnp.inf, bl[...])
        bh[...] = jnp.where(bh[...] >= BIG / 2, jnp.inf, bh[...])

        best[...] = sc(par_ref[:, 0])
        bestx_ref[...] = jnp.zeros((B, nc_p), jnp.float32)
        ncnt[...] = jnp.zeros((B, 128), jnp.int32)
        depth[...] = jnp.zeros((B, 128), jnp.int32)
        stall[...] = jnp.zeros((B, 128), jnp.int32)
        niter[...] = jnp.zeros((B, 128), jnp.int32)
        titer_ref[...] = jnp.zeros((B, 128), jnp.int32)
        lobj[...] = jnp.full((B, 128), jnp.inf, jnp.float32)
        lpstat[...] = jnp.full((B, 128), RUNNING, jnp.int32)
        mode[...] = sc(
            jnp.where(active0, MODE_PIVOT, MODE_DONE).astype(jnp.int32)
        )
        lstate_ref[...] = sc(
            jnp.where(active0, LS_TICKS, LS_EXHAUSTED).astype(jnp.int32)
        )
        restart[...] = sc(active0.astype(jnp.int32))
        st_j[...] = jnp.zeros((B, D), jnp.int32)
        st_fl[...] = jnp.zeros((B, D), jnp.float32)
        st_ol[...] = jnp.zeros((B, D), jnp.float32)
        st_oh[...] = jnp.zeros((B, D), jnp.float32)
        st_state[...] = jnp.zeros((B, D), jnp.int32)
        st_dir[...] = jnp.zeros((B, D), jnp.int32)
        lgs_ref[...] = jnp.zeros((B, F, 128), jnp.float32)
        lgb_ref[...] = jnp.zeros((B, F, m_p), jnp.float32)
        lga_ref[...] = jnp.zeros((B, F, PW), jnp.float32)

        def zv_now():
            """Nonbasic values from CURRENT bounds + at-upper flags."""
            lov = clo[...]
            hiv = chi[...]
            flo = jnp.isfinite(lov)
            fhi = jnp.isfinite(hiv)
            zv = jnp.where(
                (atup[...] > 0) & fhi,
                hiv,
                jnp.where(flo, lov, jnp.where(fhi, hiv, 0.0)),
            )
            return jnp.where((inb[...] > 0) | ~cvalid, 0.0, zv)

        def set_var_bounds(lane, j, new_lo, new_hi):
            """Masked write of var j's bounds + basic-row mirrors."""
            jm = (col_ids == j[:, None]) & eb(lane)
            clo[...] = jnp.where(jm, new_lo[:, None], clo[...])
            chi[...] = jnp.where(jm, new_hi[:, None], chi[...])
            rm = (basis[...] == j[:, None]) & eb(lane)
            bl[...] = jnp.where(rm, new_lo[:, None], bl[...])
            bh[...] = jnp.where(rm, new_hi[:, None], bh[...])

        def body(carry):
            it, _ = carry

            # ---- 1. restart: re-init the LP for lanes on a fresh node ----
            @pl.when(jnp.any(restart[:, 0] > 0))
            def _():
                rs = restart[:, 0] > 0
                zv = zv_now()
                WzN = mm(zv, W_ref[...], 1, 1)  # (B, m_p)
                xBn = -jnp.sum(BI[...] * WzN[:, None, :], axis=2)
                xB[...] = jnp.where(eb(rs), xBn, xB[...])
                emp = jnp.any(
                    (clo[...] > chi[...] + feas_tol) & cvalid, axis=1
                )
                lpstat[...] = jnp.where(
                    eb(rs),
                    sc(jnp.where(emp, INFEASIBLE, RUNNING).astype(jnp.int32)),
                    lpstat[...],
                )
                mode[...] = jnp.where(
                    eb(rs),
                    sc(
                        jnp.where(emp, MODE_TRANS, MODE_PIVOT).astype(
                            jnp.int32
                        )
                    ),
                    mode[...],
                )
                niter[...] = jnp.where(eb(rs), 0, niter[...])
                stall[...] = jnp.where(eb(rs), 0, stall[...])
                lobj[...] = jnp.where(eb(rs), jnp.inf, lobj[...])
                restart[...] = jnp.zeros((B, 128), jnp.int32)

            # ---- 2. one simplex pivot for PIVOT lanes ---------------------
            lov = clo[...]
            hiv = chi[...]
            finite_lo = jnp.isfinite(lov)
            finite_hi = jnp.isfinite(hiv)
            free = cvalid & ~finite_lo & ~finite_hi
            stepping0 = (mode[:, 0] == MODE_PIVOT) & (lpstat[:, 0] == RUNNING)

            xb = xB[...]
            bll = bl[...]
            bhh = bh[...]
            below = xb < bll - feas_tol
            above = xb > bhh + feas_tol
            infeas = jnp.where(below, bll - xb, 0.0) + jnp.where(
                above, xb - bhh, 0.0
            )
            infeas_sum = jnp.sum(infeas, axis=1)
            phase1 = infeas_sum > feas_tol

            p1_primal = phase1
            cB_eff = jnp.where(
                eb(p1_primal),
                jnp.where(below, -1.0, jnp.where(above, 1.0, 0.0)),
                cB[...],
            )
            y = jnp.sum(BI[...] * cB_eff[:, :, None], axis=1)
            d = -mm(y, W_ref[...], 1, 0)
            d = jnp.where(eb(p1_primal), d, d + c)

            inbm = inb[...] > 0
            atm = atup[...] > 0
            nbm = cvalid & ~inbm
            can_up = nbm & (~atm | free) & (d < -cost_tol)
            can_dn = nbm & (atm | free) & (d > cost_tol)
            elig = can_up | can_dn
            any_elig = jnp.any(elig, axis=1)

            bland = stall[:, 0] >= STALL_LIMIT
            score_d = jnp.where(elig, jnp.abs(d), -1.0)
            score_b = jnp.where(elig, -col_ids.astype(jnp.float32), -BIG)
            score = jnp.where(eb(bland), score_b, score_d)
            q_p = jnp.argmax(score, axis=1).astype(jnp.int32)

            q = q_p
            qmask = col_ids == q[:, None]
            can_up_eff = can_up.astype(jnp.int32)
            sigma = jnp.where(
                jnp.sum(
                    jnp.where(qmask, can_up_eff.astype(jnp.float32), 0.0),
                    axis=1,
                )
                > 0,
                1.0,
                -1.0,
            )
            Wq = mm(qmask.astype(jnp.float32), W_ref[...], 1, 1)
            alpha = jnp.sum(BI[...] * Wq[:, None, :], axis=2)
            eta = -sigma[:, None] * alpha

            lo_q = jnp.sum(
                jnp.where(qmask, jnp.where(finite_lo, lov, 0.0), 0.0), axis=1
            )
            hi_q = jnp.sum(
                jnp.where(qmask, jnp.where(finite_hi, hiv, 0.0), 0.0), axis=1
            )
            q_bounded = (
                jnp.sum(
                    jnp.where(
                        qmask, (finite_lo & finite_hi).astype(jnp.float32), 0.0
                    ),
                    axis=1,
                )
                > 0
            )
            flip_theta = jnp.where(q_bounded, hi_q - lo_q, jnp.inf)

            feas_b = ~below & ~above
            moving = jnp.abs(eta) > pivot_tol
            fin_bl = jnp.isfinite(bll)
            fin_bh = jnp.isfinite(bhh)
            safe_e = jnp.where(jnp.abs(eta) > pivot_tol, eta, 1.0)
            r_dn = (xb - jnp.where(fin_bl, bll, -BIG)) / (-safe_e)
            r_up = (jnp.where(fin_bh, bhh, BIG) - xb) / safe_e
            ratios = jnp.full((B, m_p), jnp.inf, jnp.float32)
            hits_up = jnp.zeros((B, m_p), jnp.float32)
            c1m = moving & feas_b & (eta < 0) & fin_bl
            ratios = jnp.where(c1m, r_dn, ratios)
            c2m = moving & feas_b & (eta > 0) & fin_bh
            ratios = jnp.where(c2m, r_up, ratios)
            hits_up = jnp.maximum(hits_up, c2m.astype(jnp.float32))
            c3m = moving & below & (eta > 0)
            ratios = jnp.where(c3m, (bll - xb) / safe_e, ratios)
            c4m = moving & above & (eta < 0)
            ratios = jnp.where(c4m, (xb - bhh) / (-safe_e), ratios)
            hits_up = jnp.maximum(hits_up, c4m.astype(jnp.float32))
            ratios = jnp.maximum(ratios, 0.0)

            rmin = jnp.min(ratios, axis=1)
            tied = ratios <= rmin[:, None] + feas_tol
            basis_f = basis[...].astype(jnp.float32)
            pick_d = jnp.where(tied, jnp.abs(eta), -1.0)
            pick_b = jnp.where(tied, -basis_f, -BIG)
            pick = jnp.where(eb(bland), pick_b, pick_d)
            r = jnp.argmax(pick, axis=1).astype(jnp.int32)
            rmask = row_ids == r[:, None]
            r_ratio = jnp.sum(jnp.where(rmask, ratios, 0.0), axis=1)
            row_blocks = rmin < flip_theta
            theta = jnp.where(row_blocks, r_ratio, flip_theta)
            unbounded = ~jnp.isfinite(theta)

            lp_new = jnp.where(
                ~any_elig,
                jnp.where(phase1, INFEASIBLE, OPTIMAL),
                jnp.where(
                    unbounded,
                    jnp.where(phase1, INFEASIBLE, UNBOUNDED),
                    RUNNING,
                ),
            ).astype(jnp.int32)
            lp_new = jnp.where(
                stepping0, lp_new, lpstat[:, 0]
            )
            stepping = stepping0 & (lp_new == RUNNING)

            do_pivot = stepping & row_blocks
            do_flip = stepping & ~row_blocks

            atq = jnp.sum(jnp.where(qmask, atup[...], 0), axis=1)
            atup_flip = jnp.where(
                qmask & eb(do_flip), 1 - atq[:, None], atup[...]
            )
            piv = jnp.sum(jnp.where(rmask, alpha, 0.0), axis=1)
            safe_piv = jnp.where(jnp.abs(piv) > 1e-12, piv, 1.0)
            rowv = jnp.sum(
                BI[...] * rmask.astype(jnp.float32)[:, :, None], axis=1
            )
            rowdiv = rowv / safe_piv[:, None]
            colv_mod = jnp.where(rmask, piv[:, None] - 1.0, alpha)
            BI_new = BI[...] - colv_mod[:, :, None] * rowdiv[:, None, :]
            BI[...] = jnp.where(eb3(do_pivot), BI_new, BI[...])

            p_col = jnp.sum(jnp.where(rmask, basis[...], 0), axis=1)
            leave_up = jnp.sum(rmask.astype(jnp.float32) * hits_up, axis=1)
            pmask = col_ids == p_col[:, None]
            atup_piv = jnp.where(
                pmask & eb(do_pivot),
                (leave_up > 0).astype(jnp.int32)[:, None],
                atup_flip,
            )
            atup[...] = atup_piv
            inb_new = jnp.where(pmask & eb(do_pivot), 0, inb[...])
            inb_new = jnp.where(qmask & eb(do_pivot), 1, inb_new)
            inb[...] = inb_new

            zq = jnp.where(
                atq > 0, hi_q, jnp.where(jnp.isfinite(lo_q), lo_q, 0.0)
            )
            zq = jnp.where(
                jnp.sum(
                    jnp.where(
                        qmask, (finite_lo | finite_hi).astype(jnp.float32), 0.0
                    ),
                    axis=1,
                )
                > 0,
                zq,
                0.0,
            )
            newval = zq + sigma * theta
            xb_step = xb + eta * theta[:, None]
            xb_step = jnp.where(rmask & eb(do_pivot), newval[:, None], xb_step)
            xB[...] = jnp.where(eb(do_pivot | do_flip), xb_step, xb)

            basis_new = jnp.where(
                rmask & eb(do_pivot), q[:, None], basis[...]
            )
            basis[...] = basis_new
            lo_q_b = jnp.sum(
                jnp.where(qmask, jnp.where(finite_lo, lov, -BIG), 0.0), axis=1
            )
            hi_q_b = jnp.sum(
                jnp.where(qmask, jnp.where(finite_hi, hiv, BIG), 0.0), axis=1
            )
            bl[...] = jnp.where(
                rmask & eb(do_pivot),
                jnp.where(lo_q_b <= -BIG / 2, -jnp.inf, lo_q_b)[:, None],
                bll,
            )
            bh[...] = jnp.where(
                rmask & eb(do_pivot),
                jnp.where(hi_q_b >= BIG / 2, jnp.inf, hi_q_b)[:, None],
                bhh,
            )
            cq = jnp.sum(jnp.where(qmask, c, 0.0), axis=1)
            cB[...] = jnp.where(rmask & eb(do_pivot), cq[:, None], cB[...])
            iq = jnp.sum(jnp.where(qmask, intm, 0.0), axis=1)
            cIb[...] = jnp.where(rmask & eb(do_pivot), iq[:, None], cIb[...])

            cur_obj = jnp.where(
                p1_primal, infeas_sum, jnp.sum(cB[...] * xB[...], axis=1)
            )
            last = lobj[:, 0]
            progressed = cur_obj < last - 1e-9
            st_new = jnp.where(progressed | ~stepping0, 0, stall[:, 0] + 1)
            stall[...] = jnp.where(eb(stepping0), sc(st_new), stall[...])
            lobj[...] = jnp.where(eb(stepping0), sc(cur_obj), lobj[...])
            niter[...] = niter[...] + jnp.where(
                eb(stepping0), 1, 0
            )
            titer_ref[...] = titer_ref[...] + jnp.where(eb(stepping0), 1, 0)

            # noise-stall exit: hundreds of consecutive pivots with ZERO
            # objective progress in phase 2 means the lane sits on (or next
            # to) the optimal face but f32 reduced-cost noise keeps finding
            # "eligible" columns — measured on 2AP40 such lanes burn the
            # whole 8k+ iteration budget at the optimum (the exact host LP
            # warm from the same basis finishes in a handful of pivots).
            # Claim OPTIMAL and let the f64 audit confirm or cheaply refute.
            lp_new = jnp.where(
                (lp_new == RUNNING)
                & stepping0
                & ~phase1
                & (stall[:, 0] >= stall_exit),
                OPTIMAL,
                lp_new,
            )
            # phase-1 stall exit (see p1_stall above): give up early on
            # primal-infeasible lanes making zero progress — they never
            # recover in f32 and the audit sends them to the host either way
            if p1_stall > 0:
                lp_new = jnp.where(
                    (lp_new == RUNNING)
                    & stepping0
                    & phase1
                    & (stall[:, 0] >= p1_stall),
                    ITERLIM,
                    lp_new,
                )
            # per-node iteration cap
            lp_new = jnp.where(
                (lp_new == RUNNING) & stepping0 & (niter[:, 0] >= node_iters),
                ITERLIM,
                lp_new,
            )
            lpstat[...] = jnp.where(eb(stepping0), sc(lp_new), lpstat[...])
            mode[...] = jnp.where(
                eb(stepping0 & (lp_new != RUNNING)), MODE_TRANS, mode[...]
            )

            # ---- 3. node transition for TRANS lanes -----------------------
            @pl.when(jnp.any(mode[:, 0] == MODE_TRANS))
            def _():
                tr = mode[:, 0] == MODE_TRANS
                lst = lpstat[:, 0]
                zv = zv_now()
                objv = jnp.sum(cB[...] * xB[...], axis=1) + jnp.sum(
                    jnp.where(cvalid, c * zv, 0.0), axis=1
                )
                # UNBOUNDED in a node of a bounded MIP means f32 trouble —
                # treat as iteration trouble (host re-opens the node)
                lst = jnp.where(lst == UNBOUNDED, ITERLIM, lst)
                bnd = jnp.where(
                    obj_int, jnp.ceil(objv - INT_TOL), objv
                )
                eps_l = jnp.where(obj_int, jnp.float32(1e-6), 1e-9)
                # most-fractional basic integer column
                frv = jnp.abs(xB[...] - jnp.round(xB[...])) * cIb[...]
                rstar = jnp.argmax(frv, axis=1).astype(jnp.int32)
                rsm = row_ids == rstar[:, None]
                frmax = jnp.sum(jnp.where(rsm, frv, 0.0), axis=1)
                jbr = jnp.sum(jnp.where(rsm, basis[...], 0), axis=1)
                xval = jnp.sum(jnp.where(rsm, xB[...], 0.0), axis=1)
                fl = jnp.floor(xval + INT_TOL)

                act = jnp.where(
                    lst == INFEASIBLE,
                    ACT_INFEAS,
                    jnp.where(
                        lst == ITERLIM,
                        ACT_ITERLIM,
                        jnp.where(
                            bnd >= best[:, 0] - eps_l,
                            ACT_PRUNE,
                            jnp.where(frmax <= INT_TOL, ACT_LEAF, ACT_BRANCH),
                        ),
                    ),
                ).astype(jnp.int32)
                # depth-limited branches: the host re-opens the node
                act = jnp.where(
                    (act == ACT_BRANCH) & (depth[:, 0] >= D - 1),
                    ACT_ITERLIM,
                    act,
                )
                down_first = (xval - fl) <= 0.5

                # ---- log the record at index ncnt --------------------------
                f_here3 = (f_iota3 == ncnt[:, 0][:, None, None]) & eb3(tr)
                scal_row = (
                    jnp.where(cid128 == F_STATUS, lst.astype(jnp.float32)[:, None], 0.0)
                    + jnp.where(cid128 == F_OBJ, objv[:, None], 0.0)
                    + jnp.where(cid128 == F_J, jbr.astype(jnp.float32)[:, None], 0.0)
                    + jnp.where(cid128 == F_FL, fl[:, None], 0.0)
                    + jnp.where(
                        cid128 == F_DIR,
                        down_first.astype(jnp.float32)[:, None],
                        0.0,
                    )
                    + jnp.where(cid128 == F_ACTION, act.astype(jnp.float32)[:, None], 0.0)
                    + jnp.where(
                        cid128 == F_ITERS,
                        niter[:, 0].astype(jnp.float32)[:, None],
                        0.0,
                    )
                    + jnp.where(
                        cid128 == F_PHASE1,
                        phase1.astype(jnp.float32)[:, None],
                        0.0,
                    )
                )
                lgs_ref[...] = jnp.where(
                    f_here3, scal_row[:, None, :], lgs_ref[...]
                )
                lgb_ref[...] = jnp.where(
                    f_here3,
                    basis[...].astype(jnp.float32)[:, None, :],
                    lgb_ref[...],
                )
                packed = mm(atup[...].astype(jnp.float32), pk_ref[...], 1, 0)
                lga_ref[...] = jnp.where(
                    f_here3, packed[:, None, :], lga_ref[...]
                )
                ncnt[...] = ncnt[...] + jnp.where(eb(tr), 1, 0)

                # ---- leaf adoption ----------------------------------------
                adopt = tr & (act == ACT_LEAF) & (objv < best[:, 0] - eps_l)

                @pl.when(jnp.any(adopt))
                def _():
                    zscr[...] = jnp.where(eb(adopt), zv, zscr[...])

                    def zstep(i, _):
                        rsel = (row_ids == i).astype(jnp.int32)
                        bi_i = jnp.sum(rsel * basis[...], axis=1)
                        xi = jnp.sum(
                            rsel.astype(jnp.float32) * xB[...], axis=1
                        )
                        zscr[...] = jnp.where(
                            (col_ids == bi_i[:, None]) & eb(adopt),
                            xi[:, None],
                            zscr[...],
                        )
                        return 0

                    jax.lax.fori_loop(0, m_p, zstep, 0)
                    bestx_ref[...] = jnp.where(
                        eb(adopt), zscr[...], bestx_ref[...]
                    )
                    best[...] = jnp.where(eb(adopt), sc(objv), best[...])

                # ---- descend on branch ------------------------------------
                br = tr & (act == ACT_BRANCH)
                d_here = (d_iota == depth[:, 0][:, None]) & eb(br)
                jold_lo = jnp.sum(
                    jnp.where(col_ids == jbr[:, None], clo[...], 0.0), axis=1
                )
                jold_hi = jnp.sum(
                    jnp.where(col_ids == jbr[:, None], chi[...], 0.0), axis=1
                )
                # an infinite original bound must survive the masked gather
                jold_lo = jnp.where(
                    jnp.sum(
                        jnp.where(
                            col_ids == jbr[:, None],
                            (~jnp.isfinite(clo[...])).astype(jnp.float32),
                            0.0,
                        ),
                        axis=1,
                    )
                    > 0,
                    -jnp.inf,
                    jold_lo,
                )
                jold_hi = jnp.where(
                    jnp.sum(
                        jnp.where(
                            col_ids == jbr[:, None],
                            (~jnp.isfinite(chi[...])).astype(jnp.float32),
                            0.0,
                        ),
                        axis=1,
                    )
                    > 0,
                    jnp.inf,
                    jold_hi,
                )
                st_j[...] = jnp.where(d_here, jbr[:, None], st_j[...])
                st_fl[...] = jnp.where(d_here, fl[:, None], st_fl[...])
                st_ol[...] = jnp.where(d_here, jold_lo[:, None], st_ol[...])
                st_oh[...] = jnp.where(d_here, jold_hi[:, None], st_oh[...])
                st_state[...] = jnp.where(d_here, 0, st_state[...])
                st_dir[...] = jnp.where(
                    d_here, down_first.astype(jnp.int32)[:, None], st_dir[...]
                )
                # first child: down => x_j <= fl ; up => x_j >= fl + 1
                nlo = jnp.where(down_first, jold_lo, fl + 1.0)
                nhi = jnp.where(down_first, fl, jold_hi)
                set_var_bounds(br, jbr, nlo, nhi)
                depth[...] = depth[...] + jnp.where(eb(br), 1, 0)

                # ---- mode hand-off ----------------------------------------
                hit_budget = ncnt[:, 0].astype(jnp.float32) >= budget
                new_mode = jnp.where(
                    tr & hit_budget,
                    MODE_DONE,
                    jnp.where(
                        tr & br,
                        MODE_PIVOT,
                        jnp.where(tr, MODE_BACK, mode[:, 0]),
                    ),
                ).astype(jnp.int32)
                lstate_ref[...] = jnp.where(
                    eb(tr & hit_budget), LS_BUDGET, lstate_ref[...]
                )
                restart[...] = jnp.where(
                    eb(tr & br & ~hit_budget), 1, restart[...]
                )
                mode[...] = jnp.where(eb(tr), sc(new_mode), mode[...])

            # ---- 4. one backtrack pop for BACK lanes ----------------------
            @pl.when(jnp.any(mode[:, 0] == MODE_BACK))
            def _():
                bk = mode[:, 0] == MODE_BACK
                emptyst = bk & (depth[:, 0] == 0)
                mode[...] = jnp.where(eb(emptyst), MODE_DONE, mode[...])
                lstate_ref[...] = jnp.where(
                    eb(emptyst), LS_EXHAUSTED, lstate_ref[...]
                )
                bk = bk & (depth[:, 0] > 0)

                @pl.when(jnp.any(bk))
                def _():
                    top = depth[:, 0] - 1
                    tsel = d_iota == top[:, None]

                    def g_i(a):
                        return jnp.sum(jnp.where(tsel, a[...], 0), axis=1)

                    def g_f(a):
                        return jnp.sum(jnp.where(tsel, a[...], 0.0), axis=1)

                    ej = g_i(st_j)
                    efl = g_f(st_fl)
                    eol = g_f(st_ol)
                    eoh = g_f(st_oh)
                    est = g_i(st_state)
                    edir = g_i(st_dir)
                    second_done = bk & (est == 1)
                    to_sib = bk & (est == 0)
                    # restore: both children done -> pop
                    set_var_bounds(second_done, ej, eol, eoh)
                    depth[...] = depth[...] - jnp.where(eb(second_done), 1, 0)
                    # switch to the sibling child
                    #   dir==1 (down first): sibling is up  => [fl+1, old_hi]
                    #   dir==0 (up first):   sibling is down => [old_lo, fl]
                    slo = jnp.where(edir > 0, efl + 1.0, eol)
                    shi = jnp.where(edir > 0, eoh, efl)
                    set_var_bounds(to_sib, ej, slo, shi)
                    st_state[...] = jnp.where(
                        tsel & eb(to_sib), 1, st_state[...]
                    )
                    restart[...] = jnp.where(eb(to_sib), 1, restart[...])
                    mode[...] = jnp.where(eb(to_sib), MODE_PIVOT, mode[...])

            running = jnp.sum(
                (mode[:, 0] != MODE_DONE).astype(jnp.int32)
            )
            return it + 1, running

        it0 = jnp.int32(0)
        n0 = jnp.sum((mode[:, 0] != MODE_DONE).astype(jnp.int32))
        # NOTE: a straggler early-stop (end the wave once few lanes remain
        # live) was measured on 2AP20 and LOST: the tail lanes genuinely
        # need the ticks, and cutting them converts device ticks into
        # dispatch round trips + audit resumes (117 s -> 153-190 s).
        ticks, _ = jax.lax.while_loop(
            lambda cr: (cr[1] > 0) & (cr[0] < max_ticks), body, (it0, n0)
        )

        best_ref[...] = best[...]
        nlog_ref[...] = ncnt[...]
        # lock-step tick count this chunk ran (telemetry: per-tick cost =
        # device wave time / sum of chunk ticks) — rides titer column 1
        titer_ref[...] = jnp.where(cid128 == 1, ticks, titer_ref[...])
        # final LP state: a lane stopped mid-solve by the tick budget
        # resumes from THIS basis next call instead of re-pivoting from its
        # parent's (the host threads it into the reopened pending node)
        fb_ref[...] = basis[...]
        fa_ref[...] = mm(atup[...].astype(jnp.float32), pk_ref[...], 1, 0)
        # lanes still live at the tick limit keep LS_TICKS from init

    NB = batch
    grid = (NB // CHUNK,)
    pallas_fn = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_p, nc_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, nc_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nc_p, PW), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, nc_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, nc_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, nc_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, m_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, nc_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((CHUNK, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, nc_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (CHUNK, F, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (CHUNK, F, m_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (CHUNK, F, PW), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((CHUNK, m_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, PW), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NB, 128), jnp.float32),  # best
            jax.ShapeDtypeStruct((NB, nc_p), jnp.float32),  # bestx
            jax.ShapeDtypeStruct((NB, 128), jnp.int32),  # nlog
            jax.ShapeDtypeStruct((NB, 128), jnp.int32),  # lstate
            jax.ShapeDtypeStruct((NB, 128), jnp.int32),  # iters
            jax.ShapeDtypeStruct((NB, F, 128), jnp.float32),  # lg_scal
            jax.ShapeDtypeStruct((NB, F, m_p), jnp.float32),  # lg_basis
            jax.ShapeDtypeStruct((NB, F, PW), jnp.float32),  # lg_atup
            jax.ShapeDtypeStruct((NB, m_p), jnp.int32),  # final basis
            jax.ShapeDtypeStruct((NB, PW), jnp.float32),  # final at-upper
        ),
        # raise the scoped-VMEM ceiling: XLA places the custom call's full
        # output tuple (logs at (NB, F, ·)) in VMEM on top of the kernel's
        # scratch, and the default 16 MB limit OOMs mid-size shapes (2AP20:
        # 19 MB) even though v5e has 128 MB of VMEM per core
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        scratch_shapes=[
            pltpu.VMEM((B, m_p, m_p), jnp.float32),  # BI
            pltpu.VMEM((B, m_p, m_p), jnp.float32),  # P1 (warm GJ)
            pltpu.VMEM((B, m_p), jnp.float32),  # xB
            pltpu.VMEM((B, m_p), jnp.float32),  # bl
            pltpu.VMEM((B, m_p), jnp.float32),  # bh
            pltpu.VMEM((B, m_p), jnp.float32),  # cB
            pltpu.VMEM((B, m_p), jnp.float32),  # cIb
            pltpu.VMEM((B, m_p), jnp.int32),  # basis
            pltpu.VMEM((B, nc_p), jnp.int32),  # inb
            pltpu.VMEM((B, nc_p), jnp.int32),  # atup
            pltpu.VMEM((B, nc_p), jnp.float32),  # clo
            pltpu.VMEM((B, nc_p), jnp.float32),  # chi
            pltpu.VMEM((B, nc_p), jnp.float32),  # zscr
            pltpu.VMEM((B, 128), jnp.int32),  # stall
            pltpu.VMEM((B, 128), jnp.int32),  # lpstat
            pltpu.VMEM((B, 128), jnp.float32),  # lobj
            pltpu.VMEM((B, 128), jnp.int32),  # niter
            pltpu.VMEM((B, 128), jnp.int32),  # mode
            pltpu.VMEM((B, 128), jnp.float32),  # best
            pltpu.VMEM((B, 128), jnp.int32),  # ncnt
            pltpu.VMEM((B, 128), jnp.int32),  # depth
            pltpu.VMEM((B, 128), jnp.int32),  # restart
            pltpu.VMEM((B, D), jnp.int32),  # st_j
            pltpu.VMEM((B, D), jnp.float32),  # st_fl
            pltpu.VMEM((B, D), jnp.float32),  # st_ol
            pltpu.VMEM((B, D), jnp.float32),  # st_oh
            pltpu.VMEM((B, D), jnp.int32),  # st_state
            pltpu.VMEM((B, D), jnp.int32),  # st_dir
        ],
        interpret=interpret,
    )

    # unpack matrix for the at-upper log: word w bit b -> column 16*w + b
    unpack_cols = np.arange(nc_p)
    #: at-upper words that carry real columns (the rest is lane padding)
    PW_USE = -(-nc_p // 16)
    #: compacted-record row budget per wave (see _run_w); MOIP_FRAG_CAP
    CAP = int(knobs.get("MOIP_FRAG_CAP"))

    @jax.jit
    def _run_w(Wp_arg, im_arg, pk_arg, c, lo, hi, par, wb, wa):
        zpad = jnp.zeros((NB, nc_p - (n + m)), jnp.float32)
        cp = jnp.concatenate([c, zpad], axis=1)
        lop = jnp.concatenate([lo, zpad], axis=1)
        hip = jnp.concatenate([hi, zpad], axis=1)
        parp = jnp.zeros((NB, 128), jnp.float32).at[:, :4].set(par)
        # pad warm bases: cold lanes stay -1, warm lanes' padding rows take
        # the padded logical columns n+m..n+m_p-1 (the -1 diagonal block)
        cold = wb[:, :1] < 0
        if m_p > m:
            rows_pad = n + jnp.arange(m, m_p, dtype=jnp.int32)[None, :]
            wb_pad = jnp.where(
                cold, -1, jnp.broadcast_to(rows_pad, (NB, m_p - m))
            )
        else:
            wb_pad = jnp.zeros((NB, 0), jnp.int32)
        wbp = jnp.concatenate([wb, wb_pad], axis=1).astype(jnp.int32)
        zpad_i = jnp.zeros((NB, nc_p - (n + m)), jnp.int32)
        wap = jnp.concatenate([wa.astype(jnp.int32), zpad_i], axis=1)
        (best, bestx, nlog, lstate, iters, lgs, lgb, lga, fb, fa) = pallas_fn(
            Wp_arg, im_arg, pk_arg, cp, lop, hip, parp, wbp, wap
        )
        out = (
            best[:, 0],
            bestx[:, : n + m],
            nlog[:, 0],
            lstate[:, 0],
            iters[:, 0],
            iters[:, 1],  # per-chunk lock-step tick count (telemetry)
            lgs[:, :, :8],
            lgb,
            lga[:, :, :PW_USE],
            fb,
            fa[:, :PW_USE],
        )
        if not compact:
            return out
        # ---- device-side record compaction --------------------------------
        # The (NB, F, ·) log tensors are ~96% padding (measured nlog sums:
        # ~300-600 records per 256-lane wave) and the axon tunnel moves only
        # a few MB/s — fetching them full was ~70% of warm solve time
        # (2AP20: 55 s of a 77 s solve).  Scatter each lane's first nlog
        # records into one dense (CAP, ·) buffer; the host rebuilds lane
        # offsets from nlog.  Overflow rows park in trash slot CAP and the
        # host falls back to fetching the FULL tensors — still returned,
        # device-resident, and free unless actually fetched.
        nl = nlog[:, 0]
        off = jnp.cumsum(nl) - nl  # (NB,)
        fidx = jnp.arange(F, dtype=nl.dtype)[None, :]
        valid = fidx < nl[:, None]
        dest = jnp.minimum(jnp.where(valid, off[:, None] + fidx, CAP), CAP)
        comp_scal = (
            jnp.zeros((CAP + 1, 8), jnp.float32).at[dest].set(lgs[:, :, :8])
        )
        comp_basis = (
            jnp.zeros((CAP + 1, m_p), jnp.int16)
            .at[dest]
            .set(lgb.astype(jnp.int16))
        )
        comp_atup = (
            jnp.zeros((CAP + 1, PW_USE), jnp.float32)
            .at[dest]
            .set(lga[:, :, :PW_USE])
        )
        return out + (comp_scal[:CAP], comp_basis[:CAP], comp_atup[:CAP])

    if aot and not interpret:
        # AOT-compile + disk-cache the executable (utils/aot_cache.py): the
        # axon platform's server-side compile otherwise re-runs per process
        # (measured 80-950 s for this kernel at reference shapes).  Lowered
        # under x64(False) to match solve_fragments' call-time context.
        from moip_aira_tpu.utils.aot_cache import cached_compile

        with jax.enable_x64(False):
            _run_w = cached_compile(
                _run_w,
                (
                    Wp_j, im_j, pk_j,
                    jnp.zeros((NB, n + m), jnp.float32),
                    jnp.zeros((NB, n + m), jnp.float32),
                    jnp.zeros((NB, n + m), jnp.float32),
                    jnp.zeros((NB, 4), jnp.float32),
                    jnp.full((NB, m), -1, jnp.int32),
                    jnp.zeros((NB, n + m), jnp.int32),
                ),
                tag=f"bb-m{m}-n{n}-b{NB}-F{F}",
            )

    def solve_fragments(c, lo, hi, par, wb=None, wa=None):
        if wb is None:
            wb = jnp.full((NB, m), -1, jnp.int32)
            wa = jnp.zeros((NB, n + m), jnp.int32)
        res = _run_w(Wp_j, im_j, pk_j, c, lo, hi, par, wb, wa)
        best, bestx, nlog, lstate, iters, ticks, lgs, lgb, lga, fb, fa = res[:11]
        out = dict(
            best=best, bestx=bestx, nlog=nlog, lstate=lstate, iters=iters,
            ticks=ticks, lg_scal=lgs, lg_basis=lgb, lg_atup=lga,
            fin_basis=fb, fin_atup=fa,
        )
        if compact:
            out["lg_cscal"], out["lg_cbasis"], out["lg_catup"] = res[11:]
        return out

    def unpack_atup(lga_np: np.ndarray) -> np.ndarray:
        """(B, F, PW) packed f32 words -> (B, F, nc) 0/1 int8."""
        w = np.asarray(lga_np).astype(np.int64)  # values < 2^16, exact
        words = w[:, :, unpack_cols // 16]
        bits = (words >> (unpack_cols % 16)) & 1
        return bits[:, :, : n + m].astype(np.int8)

    def unpack_atup1(fa_np: np.ndarray) -> np.ndarray:
        """(B, PW) packed f32 words -> (B, nc) 0/1 int8."""
        return unpack_atup(np.asarray(fa_np)[:, None, :])[:, 0]

    meta = dict(
        m=m, nc=nc, n=n, m_p=m_p, nc_p=nc_p, chunk=CHUNK, F=F, D=D, PW=PW,
        cap=CAP, compact=compact,
        unpack_atup=unpack_atup, unpack_atup1=unpack_atup1,
    )
    return solve_fragments, meta
