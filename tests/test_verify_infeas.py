"""Soundness fuzz of the infeasibility certificates (solver/verify.py).

The rigor contract: a lane the verifier marks ``ok`` on an INFEASIBLE claim
(equivalently ``dual_bound == +inf``) must be TRULY infeasible — under any
basis, including adversarial garbage.  This covers both the combined
phase-1 Farkas certificate and the single-row rescue pass added for the
dual-simplex kernel's one-violated-row claims.
"""

from __future__ import annotations

import numpy as np
import pytest

from moip_aira_tpu.solver.simplex_np import SimplexWorkspace, solve_lp
from moip_aira_tpu.solver.status import SolveStatus
from moip_aira_tpu.solver import simplex_jax as sx
from moip_aira_tpu.solver.verify import LPVerifier


def _random_instance(rng, n, m):
    A = rng.integers(-4, 5, size=(m, n)).astype(np.float64)
    return A


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_infeasible_certificates_are_sound_under_garbage_bases(seed):
    rng = np.random.default_rng(seed)
    n, m = 8, 4
    A = _random_instance(rng, n, m)
    W = np.hstack([A, -np.eye(m)])
    ws = SimplexWorkspace(A)
    ver = LPVerifier(W)
    nc = n + m

    B = 64
    c = rng.integers(-5, 6, size=(B, n)).astype(np.float64)
    cz = np.zeros((B, nc))
    cz[:, :n] = c
    lo = np.zeros((B, nc))
    hi = np.zeros((B, nc))
    lo[:, :n] = 0.0
    hi[:, :n] = rng.integers(0, 2, size=(B, n)).astype(np.float64)
    # tight random row boxes -> a good mix of feasible and empty nodes
    lo[:, n:] = rng.integers(-6, 1, size=(B, m)).astype(np.float64)
    hi[:, n:] = lo[:, n:] + rng.integers(0, 4, size=(B, m)).astype(np.float64)

    # every lane CLAIMS infeasible, from a random (often garbage) basis
    basis = np.stack([
        rng.choice(nc, size=m, replace=False).astype(np.int32)
        for _ in range(B)
    ])
    at_upper = rng.integers(0, 2, size=(B, nc)).astype(bool)
    status = np.full(B, sx.INFEASIBLE, dtype=np.int32)

    cert = ver.certify(cz, lo, hi, status, basis, at_upper)

    checked = 0
    for i in range(B):
        if not cert.ok[i]:
            continue
        r = solve_lp(ws, c[i], lo[i], hi[i])
        assert r.status == SolveStatus.INFEASIBLE, (
            f"lane {i} certified infeasible but the exact LP found "
            f"obj={r.obj}"
        )
        checked += 1
    # the fuzz must actually exercise certificates, not vacuously pass
    assert checked > 0


def test_single_row_rescue_certifies_one_row_empty_box():
    # one row makes the box empty: x1 + x2 >= 3 with x binary (max sum = 2).
    # A basis whose phase-1 vector mixes BOTH rows' multipliers fails the
    # combined certificate; the single-row pass must still certify.
    n, m = 2, 2
    A = np.array([[1.0, 1.0], [1.0, -1.0]])
    W = np.hstack([A, -np.eye(m)])
    ver = LPVerifier(W)
    nc = n + m
    lo = np.array([[0.0, 0.0, 3.0, -10.0]])
    hi = np.array([[1.0, 1.0, 10.0, 10.0]])
    cz = np.zeros((1, nc))
    # logical basis: xB = row activities of nonbasics at lower bounds
    basis = np.array([[2, 3]], dtype=np.int32)
    at_upper = np.zeros((1, nc), dtype=bool)
    status = np.full(1, sx.INFEASIBLE, dtype=np.int32)
    cert = ver.certify(cz, lo, hi, status, basis, at_upper)
    assert bool(cert.ok[0])
    assert cert.dual_bound[0] == np.inf
