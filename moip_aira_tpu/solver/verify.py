"""Exact (f64) certification of f32 device LP results.

The TPU kernel runs the simplex in float32 (f64 emulation inflates XLA-TPU
compile times ~20x and halves throughput).  Exactness is restored here: the
kernel returns the final *basis* and nonbasic bound statuses, and this module
recomputes the vertex in float64 and certifies the claim:

* OPTIMAL claim  — basic solution from ``B z_B = -N z_N`` must satisfy all
  bounds, and the reduced costs ``d = c - W^T y`` (with ``B^T y = c_B``) must
  have the right signs for every nonbasic column.  A certified basis pins the
  exact rational vertex, so the objective is exact to f64 roundoff.
* INFEASIBLE claim — the phase-1 basis yields a Farkas certificate: with
  ``c1`` the infeasibility gradient and ``B^T y = c1_B``, the box-supremum of
  ``(W^T y) . z`` equals minus the basis's infeasibility, so proving
  ``sup < 0`` proves the box empty.

Lanes whose certificate fails (f32 landed on a wrong basis — rare, counted)
are re-solved exactly on the host.  Everything is vectorised over the batch:
the certificates cost two batched (m,m) solves, trivial next to the device
wave they confirm.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from moip_aira_tpu.solver import simplex_jax as sx

CERT_TOL = 1e-9


class CertifiedBatch(NamedTuple):
    ok: np.ndarray  # (B,) bool — certificate valid
    status: np.ndarray  # (B,) int32 (sx codes, only valid where ok)
    obj: np.ndarray  # (B,) f64 exact objective (where ok & optimal)
    x: np.ndarray  # (B, n) f64 exact structural solution
    #: exact reduced costs (B, nc) and nonbasic-at-upper/in-basis masks for
    #: reduced-cost fixing in the branch-and-bound layer (rows valid where
    #: ok & optimal)
    d: np.ndarray = None
    at_upper: np.ndarray = None
    in_basis: np.ndarray = None


class LPVerifier:
    def __init__(self, W: np.ndarray):
        self.W = np.asarray(W, dtype=np.float64)  # (m, nc)
        self.m, self.nc = self.W.shape
        self.n = self.nc - self.m

    def certify(
        self,
        c: np.ndarray,  # (B, nc) f64
        lo: np.ndarray,  # (B, nc)
        hi: np.ndarray,  # (B, nc)
        status: np.ndarray,  # (B,) int32 claims from the device
        basis: np.ndarray,  # (B, m) int32
        at_upper: np.ndarray,  # (B, nc) bool
    ) -> CertifiedBatch:
        W, m, nc, n = self.W, self.m, self.nc, self.n
        B = c.shape[0]
        ok = np.zeros(B, dtype=bool)
        out_status = np.asarray(status, dtype=np.int32).copy()
        out_obj = np.full(B, np.nan)
        out_x = np.zeros((B, n))

        claim_opt = status == sx.OPTIMAL
        claim_inf = status == sx.INFEASIBLE
        out_d = np.zeros((B, nc))
        out_atup = np.zeros((B, nc), dtype=bool)
        out_inb = np.zeros((B, nc), dtype=bool)
        interesting = claim_opt | claim_inf
        if not interesting.any():
            return CertifiedBatch(
                ok, out_status, out_obj, out_x, out_d, out_atup, out_inb
            )

        idx = np.flatnonzero(interesting)
        basis_i = basis[idx]  # (b, m)
        Bmats = W[:, basis_i].transpose(1, 0, 2)  # (b, m, m)

        # nonbasic values
        finite_lo = np.isfinite(lo[idx])
        finite_hi = np.isfinite(hi[idx])
        zN = np.where(
            finite_lo, lo[idx], np.where(finite_hi, hi[idx], 0.0)
        )
        zN = np.where(at_upper[idx] & finite_hi, hi[idx], zN)
        in_basis = np.zeros((len(idx), nc), dtype=bool)
        np.put_along_axis(in_basis, basis_i, True, axis=1)
        zN = np.where(in_basis, 0.0, zN)

        rhs_vec = -(zN @ W.T)  # (b, m): -N z_N
        xB, solvable = _batch_solve(Bmats, rhs_vec)

        z = zN.copy()
        np.put_along_axis(z, basis_i, xB, axis=1)

        lo_i, hi_i = lo[idx], hi[idx]
        feas = (
            (z >= lo_i - 1e-7) & (z <= hi_i + 1e-7)
        ).all(axis=1) & solvable

        # ---- optimality certificates ---------------------------------------
        cB = np.take_along_axis(c[idx], basis_i, axis=1)  # (b, m)
        y, solvable_T = _batch_solve(Bmats.transpose(0, 2, 1), cB)
        d = c[idx] - y @ W  # (b, nc) reduced costs
        at_lo_nb = ~in_basis & ~at_upper[idx] & finite_lo
        at_hi_nb = ~in_basis & (at_upper[idx] | (~finite_lo & finite_hi))
        free_nb = ~in_basis & ~finite_lo & ~finite_hi
        # soundness: a nonbasic column flagged "at upper" with an INFINITE
        # upper bound is an invalid solver state — rejecting it is what kept
        # the inf-bound pivot-row bug (pallas_lp history) from silently
        # certifying wrong optima
        bogus_state = (~in_basis) & at_upper[idx] & ~finite_hi
        opt_ok = (
            np.where(at_lo_nb, d >= -CERT_TOL, True).all(axis=1)
            & np.where(at_hi_nb & finite_hi, d <= CERT_TOL, True).all(axis=1)
            & np.where(free_nb, np.abs(d) <= CERT_TOL, True).all(axis=1)
            & ~bogus_state.any(axis=1)
            & feas
            & solvable_T
        )

        # ---- infeasibility certificates (Farkas from the phase-1 basis) ----
        below = xB < np.take_along_axis(lo_i, basis_i, axis=1) - 1e-9
        above = xB > np.take_along_axis(hi_i, basis_i, axis=1) + 1e-9
        c1B = np.where(below, -1.0, np.where(above, 1.0, 0.0))
        y1, s1 = _batch_solve(Bmats.transpose(0, 2, 1), c1B)
        a = y1 @ W  # (b, nc)
        pos = a > CERT_TOL
        neg = a < -CERT_TOL
        # sup over box of a.z ; +inf appearing means certificate failure
        hi_for_sup = np.where(pos, hi_i, np.where(neg, lo_i, 0.0))
        sup_terms = np.where(pos | neg, a * hi_for_sup, 0.0)
        sup_finite = np.isfinite(sup_terms).all(axis=1)
        sup = np.where(sup_finite, sup_terms.sum(axis=1), np.inf)
        inf_ok = (sup < -CERT_TOL) & s1 & solvable

        cl_opt = claim_opt[idx]
        ok_i = np.where(cl_opt, opt_ok, inf_ok)
        ok[idx] = ok_i
        obj_i = (c[idx] * z).sum(axis=1)
        out_obj[idx] = np.where(cl_opt, obj_i, np.nan)
        out_x[idx] = z[:, :n]
        out_d[idx] = d
        out_atup[idx] = at_upper[idx] | (~finite_lo & finite_hi)
        out_inb[idx] = in_basis
        return CertifiedBatch(
            ok, out_status, out_obj, out_x, out_d, out_atup, out_inb
        )


def _batch_solve(mats: np.ndarray, rhs: np.ndarray):
    """Solve mats[i] @ x = rhs[i]; returns (x, solvable_mask)."""
    b = mats.shape[0]
    try:
        x = np.linalg.solve(mats, rhs[..., None])[..., 0]
        bad = ~np.isfinite(x).all(axis=1)
        return x, ~bad
    except np.linalg.LinAlgError:
        xs = np.zeros_like(rhs)
        okm = np.zeros(b, dtype=bool)
        for i in range(b):
            try:
                xs[i] = np.linalg.solve(mats[i], rhs[i])
                okm[i] = np.isfinite(xs[i]).all()
            except np.linalg.LinAlgError:
                okm[i] = False
        return xs, okm
