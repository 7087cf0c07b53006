"""Batched bounded-variable REVISED simplex as one Pallas TPU kernel.

The dense-tableau kernel (pallas_lp.py) carries T = B^-1 W per lane —
(B, m_p, nc_p) f32 VMEM — which caps the batch long before reference-scale
instances (VMEM budget: a 2AP40-shape lane is ~0.6 MB, a 2AP100 lane ~8 MB).
This kernel carries only the basis inverse B^-1 per lane — (B, m_p, m_p) —
and reconstructs the two tableau slices each pivot actually needs:

* **pricing**  d = c - (c_B^T B^-1) W : one (B, m_p) x (m_p, nc_p) matmul
  against the SHARED system matrix — MXU work instead of reading a per-lane
  tableau, and W is read once per iteration for the whole batch;
* **entering column**  alpha = B^-1 W[:, q] : W[:, q] gathered for every
  lane as one (B, nc_p) x (m_p, nc_p)^T one-hot matmul, then a per-lane
  (m_p, m_p) matvec on the VPU;
* the pivot is the classic product-form rank-1 update of B^-1 — m_p-wide
  instead of nc_p-wide.

Per-pivot state traffic drops from O(B * m * nc) to O(B * m^2) + one shared
O(m * nc) matmul, so batches of 64+ lanes fit VMEM at 2AP40 shape (m=82,
n=1600) where the dense kernel collapses to chunks of 8.  Warm starts
(parent-basis reuse across B&B children) also become profitable: the
Gauss-Jordan basis rebuild runs on [B | -I] — (B, m_p, 2 m_p) — instead of
the full (B, m_p, nc_p) tableau, nc/m times cheaper (measured: the dense
rebuild cost MORE than a cold solve at small m; see wave.py).

Algorithm, tolerances, statuses and the (c, lo, hi, wb, wa) -> LPOutcome
contract are identical to pallas_lp.make_pallas_lp_batch; every f32 result
is certified in f64 by solver/verify.py the same way.  Replaces the same
reference hot spot: the CPXmipopt LP relaxations inside `solve`
(/root/reference/src/aira.cpp:452-536).
"""

from __future__ import annotations

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


def make_pallas_rev_batch(
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
    """Build fn(c, lo, hi[, wb, wa]) -> (status, obj, x, basis, at_upper, iters).

    Same contract as pallas_lp.make_pallas_lp_batch (inputs (B, nc) f32 in
    the unpadded [x | logicals] layout; wb (B, m) i32 basis / -1 = cold,
    wa (B, nc) i32 at-upper flags), including the ``pack`` single fused
    transfer buffer in each direction (see pallas_lp.py for the layout).
    """
    m, nc = W_np.shape
    n = nc - m
    m_p = _round_up(m, 8)
    nc_p = _round_up(n + m_p, 128)

    # per-chunk VMEM: shared W + per-lane B^-1 (+ GJ scratch) + the (B, nc)
    # input/output/working rows; ~4 live (B, nc_p) temporaries assumed
    bytes_shared = m_p * nc_p * 4
    per_lane = (2 * m_p * m_p + 10 * nc_p + 8 * m_p) * 4
    CHUNK = 256
    while CHUNK > 8 and bytes_shared + CHUNK * per_lane > 12 * 2**20:
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
        BI,  # (B, m_p, m_p) basis inverse
        P1,  # (B, m_p, m_p) warm-GJ pivot block (gathered basis columns)
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
        # (1, m_p, m_p) iotas for the basis-inverse block
        bi_row = jax.lax.broadcasted_iota(jnp.int32, (1, m_p, m_p), 1)
        bi_col = jax.lax.broadcasted_iota(jnp.int32, (1, m_p, m_p), 2)
        neg_eye = jnp.where(bi_row == bi_col, -1.0, 0.0)  # (1, m_p, m_p)

        def eb(v):  # (B,) -> (B, 1) bool via int32 (Mosaic minor-dim rule)
            return v.astype(jnp.int32)[:, None] > 0

        def eb3(v):
            return v.astype(jnp.int32)[:, None, None] > 0

        def mm(a, b_, ca, cb_):
            return jax.lax.dot_general(
                a,
                b_,
                dimension_numbers=(((ca,), (cb_,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        # ---- init --------------------------------------------------------
        warm0 = wb_ref[:, 0] >= 0  # (B,)
        is_struct = col_ids < n
        at0 = is_struct & ~finite_lo & finite_hi
        basis_cold = jnp.broadcast_to(n + row_ids, (B, m_p)).astype(jnp.int32)
        basis_ref[...] = basis_cold
        any_warm = jnp.any(warm0)

        # Warm rebuild: gather the basis columns into P1 (P1[:, :, t] =
        # W[:, wb[t]]), then greedy Gauss-Jordan on [P1 | BI0] where
        # BI0 = W's logical block = -I; the row-op matrix M that one-hots
        # P1 satisfies M = B^-1 (for the row<->basis-entry assignment the
        # greedy pivoting picks), so BI ends as M @ (-I) = -B^-1.
        @pl.when(any_warm)
        def _():
            BI[...] = jnp.broadcast_to(neg_eye, (B, m_p, m_p))

            def gather_step(t, _):
                tsel = (row_ids == t).astype(jnp.int32)  # (1, m_p)
                wbt = jnp.sum(tsel * wb_ref[...], axis=1)  # (B,)
                colmask = (col_ids == wbt[:, None]).astype(jnp.float32)
                colt = mm(colmask, W_ref[...], 1, 1)  # (B, m_p) over rows j
                P1[...] = jnp.where(
                    bi_col == t, colt[:, :, None], P1[...]
                )
                return 0

            jax.lax.fori_loop(0, m_p, gather_step, 0)

            # greedy GJ: scratch roles during this phase — xB = assigned-row
            # mask, atup[:, :m_p] = remaining-entry mask, stall[:,0] = ok
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
                rem = atup[:, :m_p].astype(jnp.float32)  # (B, m_p) entries t
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
                tmask = (
                    jax.lax.broadcasted_iota(jnp.int32, (B, m_p), 1)
                    == tb[:, None]
                ).astype(jnp.float32)
                pivcol = jnp.sum(P1[...] * tmask[:, None, :], axis=2)  # (B,m_p)
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
                # basis value for row r = wb[tb]
                wbt = jnp.sum(tmask * wb_ref[...].astype(jnp.float32), axis=1)
                basis_ref[...] = jnp.where(
                    (rmask > 0) & eb(act),
                    wbt.astype(jnp.int32)[:, None],
                    basis_ref[...],
                )
                xB[...] = jnp.minimum(assigned + rmask * actf, 1.0)
                atup[...] = jnp.where(
                    (col_ids < m_p)
                    & (col_ids == tb[:, None])
                    & eb(act),
                    0,
                    atup[...],
                )
                stall[...] = jnp.broadcast_to(
                    (okw & good).astype(jnp.int32)[:, None], (B, 128)
                )
                return 0

            jax.lax.fori_loop(0, m_p, gj_step, 0)

        warm_ok = warm0 & (stall[:, 0] > 0)
        use_warm = warm0 & warm_ok
        # BI currently holds -B^-1 for good warm lanes; cold / failed-warm
        # lanes take the logical basis (B = -I  =>  B^-1 = -I)
        BI[...] = jnp.where(
            eb3(use_warm),
            -BI[...],
            jnp.broadcast_to(neg_eye, (B, m_p, m_p)),
        )
        basis_eff = jnp.where(
            eb(use_warm), basis_ref[...], basis_cold
        ).astype(jnp.int32)
        basis_ref[...] = basis_eff

        # membership/at-upper masks + basic bounds, costs, values
        inb_eff = jnp.zeros((B, nc_p), jnp.float32)

        def memb_step(i, _):
            rsel = (row_ids == i).astype(jnp.int32)  # (1, m_p)
            bi_i = jnp.sum(rsel * basis_ref[...], axis=1)  # (B,)
            inb[...] = jnp.where(
                col_ids == bi_i[:, None], 1, inb[...]
            )
            return 0

        inb[...] = jnp.zeros((B, nc_p), jnp.int32)
        jax.lax.fori_loop(0, m_p, memb_step, 0)
        inb_eff = inb[...] > 0
        atup_warm = ((wa_ref[...] > 0) & ~inb_eff).astype(jnp.int32)
        atup_cold = (at0 & ~inb_eff).astype(jnp.int32)
        atup[...] = jnp.where(eb(use_warm), atup_warm, atup_cold)

        # gather basic lo/hi/c by looping rows (no (B, m_p, nc_p) one-hot)
        lo_s = jnp.where(
            jnp.isposinf(lo), BIG, jnp.where(jnp.isneginf(lo), -BIG, lo)
        )
        hi_s = jnp.where(
            jnp.isposinf(hi), BIG, jnp.where(jnp.isneginf(hi), -BIG, hi)
        )

        def pick_step(i, _):
            rsel = (row_ids == i).astype(jnp.int32)  # (1, m_p)
            bi_i = jnp.sum(rsel * basis_ref[...], axis=1)  # (B,)
            sel = (col_ids == bi_i[:, None]).astype(jnp.float32)  # (B, nc_p)
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
            return 0

        bl[...] = jnp.zeros((B, m_p), jnp.float32)
        bh[...] = jnp.zeros((B, m_p), jnp.float32)
        cB[...] = jnp.zeros((B, m_p), jnp.float32)
        jax.lax.fori_loop(0, m_p, pick_step, 0)
        bl[...] = jnp.where(bl[...] <= -BIG, -jnp.inf, bl[...])
        bh[...] = jnp.where(bh[...] >= BIG, jnp.inf, bh[...])

        # nonbasic values and basic solution: xB = -B^-1 (W z_N) = -BI (W zN)
        atm0 = atup[...] > 0
        zv0 = jnp.where(
            atm0 & finite_hi,
            hi,
            jnp.where(finite_lo, lo, jnp.where(finite_hi, hi, 0.0)),
        )
        zv0 = jnp.where(inb_eff | (col_ids >= n + m), 0.0, zv0)
        WzN = mm(zv0, W_ref[...], 1, 1)  # (B, m_p) rows j
        xB[...] = -jnp.sum(BI[...] * WzN[:, None, :], axis=2)

        stall[...] = jnp.zeros((B, 128), jnp.int32)
        empty = jnp.any((lo > hi + feas_tol) & (col_valid > 0), axis=1)
        status0 = jnp.where(empty, INFEASIBLE, RUNNING).astype(jnp.int32)
        status_ref[...] = jnp.broadcast_to(status0[:, None], (B, 128)).astype(
            jnp.int32
        )
        iters_ref[...] = jnp.zeros((B, 128), jnp.int32)
        obj_ref[...] = jnp.full((B, 128), jnp.inf, jnp.float32)  # last_obj

        cvalid = jnp.broadcast_to(col_valid > 0, (B, nc_p))
        free = cvalid & ~finite_lo & ~finite_hi

        def body(carry):
            it, _ = carry
            status = status_ref[:, 0]
            active = status == RUNNING

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

            cB_eff = jnp.where(
                eb(phase1),
                jnp.where(below, -1.0, jnp.where(above, 1.0, 0.0)),
                cB[...],
            )
            # pricing: y = cB_eff^T B^-1 (per lane), d = -(y W) [+ c]
            y = jnp.sum(BI[...] * cB_eff[:, :, None], axis=1)  # (B, m_p) j
            d = -mm(y, W_ref[...], 1, 0)  # (B, nc_p)
            d = jnp.where(eb(phase1), d, d + c)

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
            q = jnp.argmax(score, axis=1).astype(jnp.int32)
            qmask = col_ids == q[:, None]
            sigma = jnp.where(
                jnp.sum(
                    jnp.where(qmask, can_up.astype(jnp.float32), 0.0), axis=1
                )
                > 0,
                1.0,
                -1.0,
            )
            # entering column: alpha = B^-1 W[:, q]
            Wq = mm(qmask.astype(jnp.float32), W_ref[...], 1, 1)  # (B, m_p) j
            alpha = jnp.sum(BI[...] * Wq[:, None, :], axis=2)  # (B, m_p) i
            eta = -sigma[:, None] * alpha

            # ---- ratio test (identical to the dense kernel) --------------
            lo_q = jnp.sum(
                jnp.where(qmask, jnp.where(finite_lo, lo, 0.0), 0.0), axis=1
            )
            hi_q = jnp.sum(
                jnp.where(qmask, jnp.where(finite_hi, hi, 0.0), 0.0), axis=1
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
            basis_f = basis_ref[...].astype(jnp.float32)
            pick_d = jnp.where(tied, jnp.abs(eta), -1.0)
            pick_b = jnp.where(tied, -basis_f, -BIG)
            pick = jnp.where(eb(bland), pick_b, pick_d)
            r = jnp.argmax(pick, axis=1).astype(jnp.int32)
            rmask = row_ids == r[:, None]
            r_ratio = jnp.sum(jnp.where(rmask, ratios, 0.0), axis=1)
            row_blocks = rmin < flip_theta
            theta = jnp.where(row_blocks, r_ratio, flip_theta)
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

            # ---- apply: bound flip ---------------------------------------
            atq = jnp.sum(jnp.where(qmask, atup[...], 0), axis=1)
            atup_flip = jnp.where(
                qmask & eb(do_flip), 1 - atq[:, None], atup[...]
            )

            # ---- apply: pivot (rank-1 update of B^-1) --------------------
            piv = jnp.sum(jnp.where(rmask, alpha, 0.0), axis=1)
            safe_piv = jnp.where(jnp.abs(piv) > 1e-12, piv, 1.0)
            # Mosaic: no bool minor-dim insertion — cast before expanding
            rowv = jnp.sum(BI[...] * rmask.astype(jnp.float32)[:, :, None], axis=1)
            rowdiv = rowv / safe_piv[:, None]  # (B, m_p) over j
            colv_mod = jnp.where(rmask, piv[:, None] - 1.0, alpha)
            BI_new = BI[...] - colv_mod[:, :, None] * rowdiv[:, None, :]
            BI[...] = jnp.where(eb3(do_pivot), BI_new, BI[...])

            p_col = jnp.sum(jnp.where(rmask, basis_ref[...], 0), axis=1)
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
                rmask & eb(do_pivot), q[:, None], basis_ref[...]
            )
            basis_ref[...] = basis_new
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

            cur_obj = jnp.where(
                phase1, infeas_sum, jnp.sum(cB[...] * xB[...], axis=1)
            )
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
        z_ref[...] = zv

        def zstep(i, _):
            rsel = (row_ids == i).astype(jnp.int32)  # (1, m_p)
            bi_i = jnp.sum(rsel * basis_ref[...], axis=1)  # (B,)
            xi = jnp.sum(rsel.astype(jnp.float32) * xB[...], axis=1)  # (B,)
            z_ref[...] = jnp.where(
                col_ids == bi_i[:, None], xi[:, None], z_ref[...]
            )
            return 0

        jax.lax.fori_loop(0, m_p, zstep, 0)
        z = z_ref[...]
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
        # raise the scoped-VMEM ceiling (see pallas_bb.py): XLA may place
        # the full output tuple in VMEM on top of the kernel's scratch, and
        # the default 16 MB scoped limit OOMs mid-size shapes
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        scratch_shapes=[
            pltpu.VMEM((B, m_p, m_p), jnp.float32),  # BI
            pltpu.VMEM((B, m_p, m_p), jnp.float32),  # P1
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
        # W is a runtime argument so the persistent compile cache keys on
        # SHAPES only — instances of one (m, n) shape share a compile
        zpad = jnp.zeros((NB, nc_p - (n + m)), jnp.float32)
        cp = jnp.concatenate([c, zpad], axis=1)
        lop = jnp.concatenate([lo, zpad], axis=1)
        hip = jnp.concatenate([hi, zpad], axis=1)
        cold = wb[:, :1] < 0
        rows_pad = n + jnp.arange(m, m_p, dtype=jnp.int32)[None, :]
        wb_pad = (
            jnp.where(cold, -1, jnp.broadcast_to(rows_pad, (NB, m_p - m)))
            if m_p > m
            else jnp.zeros((NB, 0), jnp.int32)
        )
        wbp = jnp.concatenate([wb, wb_pad], axis=1).astype(jnp.int32)
        zpad_i = jnp.zeros((NB, nc_p - (n + m)), jnp.int32)
        wap = jnp.concatenate([wa.astype(jnp.int32), zpad_i], axis=1)
        status, obj, z, basis, atup, iters = pallas_fn(
            Wp_arg, cp, lop, hip, wbp, wap
        )
        if pack:
            # one fused (B, 2n+2m+2) transfer buffer — see pallas_lp.py's
            # make_pallas_lp_batch docstring for the layout + rationale
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
            basis[:, :m],
            atup[:, : n + m],
            iters[:, 0],
        )

    if pack:
        # fused input buffer (see pallas_lp.py): S (5, NB, n+m) f32
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
                tag=f"rev-m{m}-n{n}-b{NB}" + ("-pk" if pack else ""),
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
