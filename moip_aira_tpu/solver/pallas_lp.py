"""Batched bounded-variable simplex as ONE Pallas TPU kernel.

The XLA while-loop kernel (simplex_jax.py) spends ~1.5 ms per pivot at batch
256 on TPU — each iteration's ~30 small HLO ops carry launch overhead that
dwarfs the arithmetic.  This kernel moves the entire batch and the entire
pivot loop inside a single Pallas program: the tableaus of all lanes live in
VMEM as one (B, m_p, nc_p) scratch tensor and every iteration is a handful
of fused VPU ops over it, so a pivot costs VMEM-bandwidth time (~10 us for
the whole batch) instead of dispatch time.  Mosaic also compiles in seconds
where XLA:TPU takes minutes on the equivalent loop — which matters on a
shared/tunnelled compile service.

Same algorithm and tolerances as simplex_jax.make_lp_solver (composite
phase-1 bounded simplex, Dantzig/Bland pricing, largest-pivot ratio
tie-break); f32 arithmetic, results certified exactly in f64 by
solver/verify.py exactly like the XLA f32 path.

Layout notes (TPU tiling):
* lanes ride the sublane dimension: (B, nc_p) and (B, m_p) state tensors,
* per-lane dynamic gathers (entering column q_b, pivot row r_b) are one-hot
  contractions — no scatter/gather primitives needed,
* the pivot rank-1 update folds the "set row r" step into the outer product
  by replacing colv[r] with (piv - 1).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from moip_aira_tpu.solver import simplex_jax as sx

BIG = 1e30
STALL_LIMIT = 60


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def make_pallas_lp_batch(
    W_np: np.ndarray,
    batch: int,
    max_iters: int = 2000,
    feas_tol: float = 3e-4,
    cost_tol: float = 3e-5,
    pivot_tol: float = 3e-5,
    interpret: bool = False,
    aot: bool = False,
    pack: bool = False,
):
    """Build fn(c, lo, hi) -> (status, obj, x, basis, at_upper, iters).

    Inputs are (B, nc) f32 in the UNPADDED column layout [x | logicals];
    outputs match simplex_jax.LPOutcome fields (batched, unpadded).

    ``pack=True`` changes the contract to fn(S) -> buf with ONE fused
    f32 buffer in each direction: S is (5, B, n+m) holding
    [c | lo | hi | at-upper | basis-plane] and buf is (B, 2n+2m+2) with
    columns [obj | x(n) | status | basis(m) | at_upper(n+m)].  Rationale:
    the axon tunnel charges its full round-trip latency PER TRANSFERRED
    LEAF — the 5-leaf output fetch alone was ~34% of a warm 2AP05 bench
    trial.  The integer fields ride as exact small-magnitude f32 values
    (astype, not bitcast: statuses/indices < 2^24, and astype cannot
    produce the denormal bit patterns a bitcast could); each side rounds
    them back.
    """
    m, nc = W_np.shape
    n = nc - m
    m_p = _round_up(m, 8)
    nc_p = _round_up(n + m_p, 128)
    # grid-chunk the batch so per-program VMEM stays bounded (~16MB budget).
    # 256 is the measured sweet spot: chunks run sequentially but each
    # while-loop runs to its slowest LANE, so bigger chunks trade fewer
    # launches for longer degenerate tails (2AP05 bench A/B: CHUNK 1024 =
    # 1886 lex-IP/s vs CHUNK 256 = 2756) — and short waves skip whole
    # pad-only chunks, a win bigger chunks forfeit.
    CHUNK = 256
    while CHUNK * (m_p * nc_p + 6 * nc_p) * 4 > 10 * 2**20 and CHUNK > 8:
        CHUNK //= 2
    if batch < CHUNK:
        CHUNK = max(8, batch)
    assert batch % CHUNK == 0, (batch, CHUNK)
    B = CHUNK

    # padded system matrix: [A | -I_m | pad] with -1 diagonal continued for
    # padded rows so the padded logical basis stays nonsingular
    Wp = np.zeros((m_p, nc_p), dtype=np.float32)
    Wp[:m, :n] = W_np[:, :n]
    for i in range(m_p):
        Wp[i, n + i] = -1.0
    Wp[:m, n : n + m] = W_np[:, n:]

    col_valid = np.zeros((1, nc_p), dtype=np.float32)
    col_valid[0, : n + m] = 1.0  # padded logical cols are fixed at 0
    col_valid_p = np.zeros((1, nc_p), dtype=np.float32)
    col_valid_p[0, : n + m_p] = 1.0  # incl. padded logicals (for basis ops)

    Wp_j = jnp.asarray(Wp)

    RUNNING, OPTIMAL, INFEASIBLE, UNBOUNDED, ITERLIM = (
        sx.RUNNING,
        sx.OPTIMAL,
        sx.INFEASIBLE,
        sx.UNBOUNDED,
        sx.ITER_LIMIT,
    )

    def kernel(
        W_ref,
        c_ref,
        lo_ref,
        hi_ref,
        wb_ref,
        wa_ref,
        status_ref,
        obj_ref,
        z_ref,
        basis_ref,
        atup_ref,
        iters_ref,
        T,
        xB,
        bl,
        bh,
        cB,
        inb,
        atup,
        stall,
    ):
        c = c_ref[...]
        lo = lo_ref[...]
        hi = hi_ref[...]
        finite_lo = jnp.isfinite(lo)
        finite_hi = jnp.isfinite(hi)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, nc_p), 1)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, m_p), 1)
        col_valid = (col_ids < n + m).astype(jnp.float32)

        # ---- init ----------------------------------------------------------
        # warm lanes carry a starting basis (wb_ref[:,0] >= 0): rebuild their
        # tableau as B^-1 W by Gauss-Jordan; cold lanes use the logical basis
        # B = -I => T0 = -W.  The GJ pivots are masked per lane, and a lane
        # whose warm basis turns out singular falls back to the cold start.
        warm0 = wb_ref[:, 0] >= 0  # (B,)
        is_struct = col_ids < n  # (1, nc_p)
        at0 = is_struct & ~finite_lo & finite_hi

        def eb_(v):
            return v.astype(jnp.int32)[:, None] > 0

        def eb3_(v):
            return v.astype(jnp.int32)[:, None, None] > 0

        Wb = jnp.broadcast_to(W_ref[...][None], (B, m_p, nc_p))
        T[...] = jnp.where(eb3_(warm0), Wb, -Wb)

        rid_b = jax.lax.broadcasted_iota(jnp.int32, (B, m_p), 1)
        # basis-column membership mask (union over the warm basis entries)
        onehot_wb = (
            jax.lax.broadcasted_iota(jnp.int32, (m_p, nc_p), 1)[None]
            == wb_ref[...][:, :, None]
        ).astype(jnp.float32)
        rem_cols0 = jnp.minimum(jnp.sum(onehot_wb, axis=1), 1.0)  # (B, nc_p)

        # Gauss-Jordan with greedy partial pivoting: the basis-to-row
        # correspondence is free, so each step picks the (row, basis-column)
        # pair with the largest |T| among unassigned rows / remaining
        # columns.  All per-step state lives in scratch refs — Mosaic cannot
        # legalize fori_loops that carry large vector state, so xB doubles
        # as the assigned-row mask, atup as the remaining-column mask and
        # stall[:,0] as the per-lane ok flag during this init phase.
        basis_cold = jnp.broadcast_to(n + row_ids, (B, m_p)).astype(jnp.int32)
        basis_ref[...] = basis_cold
        xB[...] = jnp.zeros((B, m_p), jnp.float32)  # assigned-row mask
        atup[...] = rem_cols0.astype(jnp.int32)  # remaining-column mask
        stall[...] = jnp.broadcast_to(
            warm0.astype(jnp.int32)[:, None], (B, 128)
        )

        any_warm = jnp.any(warm0)

        def gj_step(i, _):
            okw = stall[:, 0] > 0  # warm lanes still reconstructing
            assigned = xB[...]
            rem_cols = atup[...].astype(jnp.float32)
            scores = (
                jnp.abs(T[...])
                * (1.0 - assigned)[:, :, None]
                * rem_cols[:, None, :]
            )
            rowmax = jnp.max(scores, axis=2)  # (B, m_p)
            r = jnp.argmax(rowmax, axis=1).astype(jnp.int32)  # (B,)
            rmask = (rid_b == r[:, None]).astype(jnp.float32)  # (B, m_p)
            scores_r = jnp.sum(scores * rmask[:, :, None], axis=1)  # (B, nc_p)
            cb = jnp.argmax(scores_r, axis=1).astype(jnp.int32)  # (B,)
            cmask = (col_ids == cb[:, None]).astype(jnp.float32)  # (B, nc_p)
            pivcol = jnp.sum(T[...] * cmask[:, None, :], axis=2)  # (B, m_p)
            piv = jnp.sum(pivcol * rmask, axis=1)  # (B,)
            good = jnp.abs(piv) > 1e-5
            act = okw & good
            actf = act.astype(jnp.float32)[:, None]
            safe_piv = jnp.where(jnp.abs(piv) > 1e-5, piv, 1.0)
            rowv = jnp.sum(T[...] * rmask[:, :, None], axis=1)  # (B, nc_p)
            rowdiv = rowv / safe_piv[:, None]
            colv_mod = jnp.where(rmask > 0, piv[:, None] - 1.0, pivcol)
            T_new = T[...] - colv_mod[:, :, None] * rowdiv[:, None, :]
            T[...] = jnp.where(eb3_(act), T_new, T[...])
            xB[...] = jnp.minimum(assigned + rmask * actf, 1.0)
            atup[...] = jnp.maximum(
                rem_cols - cmask * actf, 0.0
            ).astype(jnp.int32)
            basis_ref[...] = jnp.where(
                (rmask > 0) & eb_(act), cb[:, None], basis_ref[...]
            )
            new_ok = (okw & good).astype(jnp.int32)
            stall[...] = jnp.broadcast_to(new_ok[:, None], (B, 128))
            return 0

        # skip the whole rebuild when the wave has no warm lanes
        @pl.when(any_warm)
        def _():
            jax.lax.fori_loop(0, m_p, gj_step, 0)

        warm_ok = warm0 & (stall[:, 0] > 0)
        use_warm = warm0 & warm_ok
        # singular warm bases: reset to the cold tableau
        T[...] = jnp.where(eb3_(warm0 & ~warm_ok), -Wb, T[...])

        basis_eff = jnp.where(eb_(use_warm), basis_ref[...], basis_cold).astype(
            jnp.int32
        )
        basis_ref[...] = basis_eff
        cid2 = jax.lax.broadcasted_iota(jnp.int32, (m_p, nc_p), 1)
        rid2 = jax.lax.broadcasted_iota(jnp.int32, (m_p, nc_p), 0)
        onehot_b = (cid2[None] == basis_eff[:, :, None]).astype(jnp.float32)
        inb_eff = jnp.sum(onehot_b, axis=1) > 0.5  # (B, nc_p)
        inb[...] = inb_eff.astype(jnp.int32)
        atup_warm = ((wa_ref[...] > 0) & ~inb_eff).astype(jnp.int32)
        atup_cold = (at0 & ~inb_eff).astype(jnp.int32)
        atup[...] = jnp.where(eb_(use_warm), atup_warm, atup_cold)

        # basic bounds/costs gathered at the effective basis columns
        def pick(v):
            vs = jnp.where(jnp.isposinf(v), BIG, jnp.where(jnp.isneginf(v), -BIG, v))
            out = jnp.sum(onehot_b * vs[:, None, :], axis=2)
            return jnp.where(out >= BIG, jnp.inf, jnp.where(out <= -BIG, -jnp.inf, out))

        bl[...] = pick(lo)
        bh[...] = pick(hi)
        cB[...] = jnp.sum(onehot_b * c[:, None, :], axis=2)
        # nonbasic values and basic solution (valid for warm and cold alike)
        atm0 = atup[...] > 0
        zv0 = jnp.where(
            atm0 & finite_hi,
            hi,
            jnp.where(finite_lo, lo, jnp.where(finite_hi, hi, 0.0)),
        )
        zv0 = jnp.where(inb_eff | (col_ids >= n + m), 0.0, zv0)
        xB[...] = -jnp.sum(T[...] * zv0[:, None, :], axis=2)
        stall[...] = jnp.zeros((B, 128), jnp.int32)
        empty = jnp.any((lo > hi + feas_tol) & (col_valid > 0), axis=1)  # (B,)
        status0 = jnp.where(empty, INFEASIBLE, RUNNING).astype(jnp.int32)
        status_ref[...] = jnp.broadcast_to(status0[:, None], (B, 128)).astype(
            jnp.int32
        )
        iters_ref[...] = jnp.zeros((B, 128), jnp.int32)
        obj_ref[...] = jnp.full((B, 128), jnp.inf, jnp.float32)  # last_obj

        cvalid = jnp.broadcast_to(col_valid > 0, (B, nc_p))
        free = cvalid & ~finite_lo & ~finite_hi

        # Mosaic only supports minor-dim insertion for 32-bit types, so all
        # (B,) bool -> (B,1[,1]) expansions round-trip through int32.
        def eb(v):
            return v.astype(jnp.int32)[:, None] > 0

        def eb3(v):
            return v.astype(jnp.int32)[:, None, None] > 0

        def body(carry):
            it, _ = carry
            status = status_ref[:, 0]
            active = status == RUNNING  # (B,)

            xb = xB[...]
            bll = bl[...]
            bhh = bh[...]
            below = xb < bll - feas_tol
            above = xb > bhh + feas_tol
            infeas = jnp.where(below, bll - xb, 0.0) + jnp.where(
                above, xb - bhh, 0.0
            )
            infeas_sum = jnp.sum(infeas, axis=1)  # (B,)
            phase1 = infeas_sum > feas_tol

            cB_eff = jnp.where(
                eb(phase1),
                jnp.where(below, -1.0, jnp.where(above, 1.0, 0.0)),
                cB[...],
            )
            # reduced costs: d = c_eff - cB_eff @ T   (per lane)
            d = -jnp.sum(cB_eff[:, :, None] * T[...], axis=1)  # (B, nc_p)
            d = jnp.where(eb(phase1), d, d + c)

            inbm = inb[...] > 0
            atm = atup[...] > 0
            nbm = cvalid & ~inbm
            can_up = nbm & (~atm | free) & (d < -cost_tol)
            can_dn = nbm & (atm | free) & (d > cost_tol)
            elig = can_up | can_dn
            any_elig = jnp.any(elig, axis=1)  # (B,)

            bland = stall[:, 0] >= STALL_LIMIT
            score_d = jnp.where(elig, jnp.abs(d), -1.0)
            score_b = jnp.where(elig, -col_ids.astype(jnp.float32), -BIG)
            score = jnp.where(eb(bland), score_b, score_d)
            q = jnp.argmax(score, axis=1).astype(jnp.int32)  # (B,)
            qmask = col_ids == q[:, None]  # (B, nc_p)
            sigma = jnp.where(
                jnp.sum(jnp.where(qmask, can_up.astype(jnp.float32), 0.0), axis=1)
                > 0,
                1.0,
                -1.0,
            )  # (B,)
            alpha = jnp.sum(
                T[...] * qmask.astype(jnp.float32)[:, None, :], axis=2
            )  # (B, m_p)
            eta = -sigma[:, None] * alpha

            # ---- ratio test ------------------------------------------------
            qsel = qmask.astype(jnp.float32)
            lo_q = jnp.sum(jnp.where(qmask, jnp.where(finite_lo, lo, 0.0), 0.0), axis=1)
            hi_q = jnp.sum(jnp.where(qmask, jnp.where(finite_hi, hi, 0.0), 0.0), axis=1)
            q_bounded = (
                jnp.sum(jnp.where(qmask, (finite_lo & finite_hi).astype(jnp.float32), 0.0), axis=1)
                > 0
            )
            flip_theta = jnp.where(q_bounded, hi_q - lo_q, jnp.inf)  # (B,)

            feas_b = ~below & ~above
            moving = jnp.abs(eta) > pivot_tol
            fin_bl = jnp.isfinite(bll)
            fin_bh = jnp.isfinite(bhh)
            safe_e = jnp.where(jnp.abs(eta) > pivot_tol, eta, 1.0)
            r_dn = (xb - jnp.where(fin_bl, bll, -BIG)) / (-safe_e)
            r_up = (jnp.where(fin_bh, bhh, BIG) - xb) / safe_e
            ratios = jnp.full((B, m_p), jnp.inf, jnp.float32)
            # hits_up kept as f32 0/1 — bool selects on (B, m_p) hit an
            # unsupported i8->i1 truncation in Mosaic
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

            rmin = jnp.min(ratios, axis=1)  # (B,)
            tied = ratios <= rmin[:, None] + feas_tol
            basis_f = basis_ref[...].astype(jnp.float32)
            pick_d = jnp.where(tied, jnp.abs(eta), -1.0)
            pick_b = jnp.where(tied, -basis_f, -BIG)
            pick = jnp.where(eb(bland), pick_b, pick_d)
            r = jnp.argmax(pick, axis=1).astype(jnp.int32)  # (B,)
            rmask = row_ids == r[:, None]  # (B, m_p)
            r_ratio = jnp.sum(jnp.where(rmask, ratios, 0.0), axis=1)
            row_blocks = rmin < flip_theta
            theta = jnp.where(row_blocks, r_ratio, flip_theta)  # (B,)
            unbounded = ~jnp.isfinite(theta)

            new_status = jnp.where(
                ~any_elig,
                jnp.where(phase1, INFEASIBLE, OPTIMAL),
                jnp.where(
                    unbounded,
                    jnp.where(phase1, INFEASIBLE, UNBOUNDED),
                    RUNNING,
                ),
            ).astype(jnp.int32)
            new_status = jnp.where(active, new_status, status)
            stepping = active & (new_status == RUNNING)

            do_pivot = stepping & row_blocks
            do_flip = stepping & ~row_blocks

            # ---- apply: bound flip ----------------------------------------
            atq = jnp.sum(jnp.where(qmask, atup[...], 0), axis=1)  # (B,)
            atup_flip = jnp.where(
                qmask & eb(do_flip), 1 - atq[:, None], atup[...]
            )

            # ---- apply: pivot ---------------------------------------------
            piv = jnp.sum(jnp.where(rmask, alpha, 0.0), axis=1)  # (B,)
            safe_piv = jnp.where(jnp.abs(piv) > 1e-12, piv, 1.0)
            rowv = jnp.sum(
                T[...] * rmask.astype(jnp.float32)[:, :, None], axis=1
            )  # (B, nc_p)
            rowdiv = rowv / safe_piv[:, None]
            colv = alpha  # T[:, q]
            colv_mod = jnp.where(rmask, piv[:, None] - 1.0, colv)
            T_new = T[...] - colv_mod[:, :, None] * rowdiv[:, None, :]
            T[...] = jnp.where(eb3(do_pivot), T_new, T[...])

            p_col = jnp.sum(jnp.where(rmask, basis_ref[...], 0), axis=1)  # (B,)
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

            # entering value: current nonbasic value + sigma*theta
            zq = jnp.where(atq > 0, hi_q, jnp.where(jnp.isfinite(lo_q), lo_q, 0.0))
            zq = jnp.where(
                jnp.sum(jnp.where(qmask, (finite_lo | finite_hi).astype(jnp.float32), 0.0), axis=1) > 0,
                zq,
                0.0,
            )
            newval = zq + sigma * theta
            xb_step = xb + eta * theta[:, None]
            xb_step = jnp.where(rmask & eb(do_pivot), newval[:, None], xb_step)
            xB[...] = jnp.where(eb(do_pivot | do_flip), xb_step, xb)

            basis_new = jnp.where(
                rmask & eb(do_pivot), q[:, None], basis_ref[...]
            )
            basis_ref[...] = basis_new
            # per-row bound/cost refresh for the pivot row
            # entering variable's own bounds become the pivot row's bounds.
            # lo_q/hi_q use 0-sentinels for +-inf (fine for zq/flip_theta,
            # both guarded by finiteness flags) — here infinities must
            # SURVIVE, so regather with +-BIG sentinels and restore them.
            lo_q_b = jnp.sum(
                jnp.where(qmask, jnp.where(finite_lo, lo, -BIG), 0.0), axis=1
            )
            hi_q_b = jnp.sum(
                jnp.where(qmask, jnp.where(finite_hi, hi, BIG), 0.0), axis=1
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

            # ---- objective / stall ----------------------------------------
            cur_obj = jnp.where(phase1, infeas_sum, jnp.sum(cB[...] * xB[...], axis=1))
            last = obj_ref[:, 0]
            progressed = cur_obj < last - 1e-9
            st_new = jnp.where(progressed | ~active, 0, stall[:, 0] + 1)
            stall[...] = jnp.broadcast_to(st_new[:, None], (B, 128))
            obj_ref[...] = jnp.broadcast_to(cur_obj[:, None], (B, 128))

            status_ref[...] = jnp.broadcast_to(new_status[:, None], (B, 128))
            iters_ref[...] = iters_ref[...] + active.astype(jnp.int32)[:, None]
            n_active = jnp.sum((new_status == RUNNING).astype(jnp.int32))
            return it + 1, n_active

        it0 = jnp.int32(0)
        n0 = jnp.sum((status_ref[:, 0] == RUNNING).astype(jnp.int32))
        jax.lax.while_loop(
            lambda cr: (cr[1] > 0) & (cr[0] < max_iters), body, (it0, n0)
        )

        # ---- finalize ------------------------------------------------------
        status = status_ref[:, 0]
        status = jnp.where(status == RUNNING, ITERLIM, status)
        status_ref[...] = jnp.broadcast_to(status[:, None], (B, 128))
        atm = atup[...] > 0
        zv = jnp.where(
            atm & finite_hi,
            hi,
            jnp.where(finite_lo, lo, jnp.where(finite_hi, hi, 0.0)),
        )
        zv = jnp.where((inb[...] > 0) | (col_valid <= 0), 0.0, zv)
        # scatter basic values: z[basis[i]] = xB[i]
        onehot_b = (
            cid2[None] == basis_ref[...][:, :, None]
        )  # (B, m_p, nc_p)
        zb = jnp.sum(jnp.where(onehot_b, xB[...][:, :, None], 0.0), axis=1)
        z = zv + zb
        z_ref[...] = z
        obj_ref[...] = jnp.broadcast_to(
            jnp.sum(jnp.where(cvalid, c * z, 0.0), axis=1)[:, None], (B, 128)
        )
        atup_ref[...] = atup[...]

    NB = batch
    grid = (NB // CHUNK,)
    pallas_fn = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_p, nc_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, nc_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, nc_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, nc_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, m_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, nc_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((CHUNK, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, nc_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, m_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, nc_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NB, 128), jnp.int32),  # status
            jax.ShapeDtypeStruct((NB, 128), jnp.float32),  # obj
            jax.ShapeDtypeStruct((NB, nc_p), jnp.float32),  # z
            jax.ShapeDtypeStruct((NB, m_p), jnp.int32),  # basis
            jax.ShapeDtypeStruct((NB, nc_p), jnp.int32),  # at_upper
            jax.ShapeDtypeStruct((NB, 128), jnp.int32),  # iters
        ),
        scratch_shapes=[
            pltpu.VMEM((B, m_p, nc_p), jnp.float32),  # T
            pltpu.VMEM((B, m_p), jnp.float32),  # xB
            pltpu.VMEM((B, m_p), jnp.float32),  # bl
            pltpu.VMEM((B, m_p), jnp.float32),  # bh
            pltpu.VMEM((B, m_p), jnp.float32),  # cB
            pltpu.VMEM((B, nc_p), jnp.int32),  # in_basis
            pltpu.VMEM((B, nc_p), jnp.int32),  # at_upper (work)
            pltpu.VMEM((B, 128), jnp.int32),  # stall
        ],
        interpret=interpret,
    )

    def _core(Wp_arg, c, lo, hi, wb, wa):
        # W is a runtime argument (not a traced constant) so the persistent
        # compilation cache is keyed on SHAPES only — every instance of the
        # same (m, n) shape reuses one compile.
        zpad = jnp.zeros((NB, nc_p - (n + m)), jnp.float32)
        cp = jnp.concatenate([c, zpad], axis=1)
        lop = jnp.concatenate([lo, zpad], axis=1)
        hip = jnp.concatenate([hi, zpad], axis=1)
        # warm-basis pad: rows >= m hold the padded logicals n+i (identity
        # in the padded block, so the GJ rebuild stays nonsingular); a cold
        # lane is all -1
        cold = wb[:, :1] < 0
        rows_pad = n + jnp.arange(m, m_p, dtype=jnp.int32)[None, :]
        wb_pad = jnp.where(
            cold, -1, jnp.broadcast_to(rows_pad, (NB, m_p - m))
        ) if m_p > m else jnp.zeros((NB, 0), jnp.int32)
        wbp = jnp.concatenate([wb, wb_pad], axis=1).astype(jnp.int32)
        zpad_i = jnp.zeros((NB, nc_p - (n + m)), jnp.int32)
        wap = jnp.concatenate([wa.astype(jnp.int32), zpad_i], axis=1)
        status, obj, z, basis, atup, iters = pallas_fn(
            Wp_arg, cp, lop, hip, wbp, wap
        )
        if pack:
            return jnp.concatenate(
                [
                    obj[:, :1],
                    z[:, :n],
                    status[:, :1].astype(jnp.float32),
                    basis[:, :m].astype(jnp.float32),
                    atup[:, : n + m].astype(jnp.float32),
                ],
                axis=1,
            )
        return (
            status[:, 0],
            obj[:, 0],
            z[:, :n],
            basis[:, :m],  # real rows only (padded rows hold padded logicals)
            atup[:, : n + m],
            iters[:, 0],
        )

    if pack:
        # single fused INPUT buffer too: c/lo/hi/wb/wa as separate uploads
        # paid the tunnel round-trip per leaf just like the output fetch.
        # S is (5, NB, n+m) f32: [c | lo | hi | at-upper | basis-plane]
        # (basis ids < nc_p < 2^24 ride exactly as f32; -1 = cold)
        @jax.jit
        def _solve_batch_w(Wp_arg, S):
            c, lo, hi = S[0], S[1], S[2]
            wa = S[3].astype(jnp.int32)
            wb = S[4, :, :m].astype(jnp.int32)
            return _core(Wp_arg, c, lo, hi, wb, wa)
    else:
        _solve_batch_w = jax.jit(_core)

    if aot and not interpret:
        # AOT-compile + disk-cache the executable (utils/aot_cache.py): the
        # axon platform's server-side compile otherwise re-runs per process.
        # Lowered under x64(False) to match the caller's call-time context.
        from moip_aira_tpu.utils.aot_cache import cached_compile

        dummy = (
            (jnp.zeros((5, NB, n + m), jnp.float32),)
            if pack
            else (
                jnp.zeros((NB, n + m), jnp.float32),
                jnp.zeros((NB, n + m), jnp.float32),
                jnp.zeros((NB, n + m), jnp.float32),
                jnp.full((NB, m), -1, jnp.int32),
                jnp.zeros((NB, n + m), jnp.int32),
            )
        )
        with jax.enable_x64(False):
            _solve_batch_w = cached_compile(
                _solve_batch_w,
                (Wp_j,) + dummy,
                tag=f"lp-m{m}-n{n}-b{NB}" + ("-pk" if pack else ""),
            )

    if pack:
        def solve_batch(S):
            return _solve_batch_w(Wp_j, S)
    else:
        def solve_batch(c, lo, hi, wb=None, wa=None):
            if wb is None:
                wb = jnp.full((NB, m), -1, jnp.int32)
                wa = jnp.zeros((NB, n + m), jnp.int32)
            return _solve_batch_w(Wp_j, c, lo, hi, wb, wa)

    meta = dict(m=m, nc=nc, n=n, m_p=m_p, nc_p=nc_p, chunk=CHUNK)
    return solve_batch, meta
