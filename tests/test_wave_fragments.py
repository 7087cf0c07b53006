"""Fragment wave path: WaveLexBackend(fragments=True) end-to-end.

The fragment path swaps per-LP device waves for whole B&B subtrees per
device call (solver/pallas_bb.py) with host replay + rigorous f64 audit
(solver/bb_audit.py).  The contract is unchanged: exact lexicographic
optima, exact fronts.  Runs the Mosaic kernel in interpret mode on CPU.
"""

import numpy as np
import pytest

from moip_aira_tpu.api import solve_front
from moip_aira_tpu.io import read_problem
from moip_aira_tpu.solver.lex import LexRequest, NumpyLexBackend
from moip_aira_tpu.solver.wave import WaveLexBackend

from conftest import EXAMPLES


def _frag_backend(p, **kw):
    kw.setdefault("batch_width", 8)
    return WaveLexBackend(p, fragments=True, **kw)


def test_fragment_wave_2AP05_front():
    p = read_problem(f"{EXAMPLES}/2AP05.lp")
    be = _frag_backend(p)
    assert be.fragments
    front = solve_front(p, n_workers=2, backend=be)
    ref = solve_front(p, n_workers=2, backend="numpy")
    assert np.array_equal(front.points, ref.points)
    assert len(front.points) == 9  # reference golden front size
    # the device fragment path actually carried the search
    assert be.device_waves > 0
    assert be.frag_stats["records"] > 0


def test_fragment_wave_lex_parity_random():
    """Random fractional knapsack stage solves: fragment == numpy oracle."""
    rng = np.random.default_rng(5)
    p = read_problem(f"{EXAMPLES}/2KP50.lp")
    be = _frag_backend(p)
    np_be = NumpyLexBackend(p)
    reqs = []
    for _ in range(6):
        rhs = np.array([np.inf, float(rng.integers(900, 1400))])
        perm = [0, 1] if rng.random() < 0.5 else [1, 0]
        reqs.append(LexRequest(rhs=rhs.copy(), perm=perm))
    got = be.lex_solve_batch(reqs)
    want = np_be.lex_solve_batch(reqs)
    for g, w in zip(got, want):
        assert g.status == w.status
        if w.result is not None:
            assert np.array_equal(g.result, w.result)


def test_fragment_wave_tiny_budget_reopen():
    """A 2-node fragment budget forces budget stops + re-opened siblings on
    every deep tree; the front must still be exact."""
    p = read_problem(f"{EXAMPLES}/3KP10.lp")
    be = _frag_backend(p, frag_nodes=2)
    front = solve_front(p, n_workers=1, backend=be)
    ref = solve_front(p, n_workers=1, backend="numpy")
    assert np.array_equal(front.points, ref.points)
    assert be.frag_stats["reopened"] > 0


def test_fragment_auto_off_on_cpu():
    """fragments='auto' stays off where the kernel would be interpreted."""
    p = read_problem(f"{EXAMPLES}/2AP05.lp")
    be = WaveLexBackend(p)
    assert not be.fragments
