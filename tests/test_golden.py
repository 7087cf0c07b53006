"""Golden end-to-end tests — the reference's own contract.

Mirrors Examples/CMakeLists.txt:4-28: for each instance, five configurations
(serial, 2 synergistic workers, explicit spreading, EPP uniform, EPP normal)
must all reproduce the committed golden Pareto front.  The oracle is the
front itself plus the solution count (scripts/checkResults.sh:10 ignores
timing/ipcount/banner lines).
"""

import numpy as np
import pytest

from moip_aira_tpu.api import solve_front
from moip_aira_tpu.io import read_problem

from conftest import EXAMPLES

CONFIGS = [
    ("t1", dict(n_workers=1)),
    ("t2", dict(n_workers=2)),
    ("t2-spread", dict(n_workers=2, spread=True)),
    ("t2-split", dict(n_workers=2, split=True)),
    ("t2-split-normal", dict(n_workers=2, split=True, split_normal=True)),
]

FAST = ["2AP05", "3AP05", "3KP10"]
SLOW = ["4KP10", "4AP05", "2KP50"]


def golden_front(name: str) -> np.ndarray:
    rows = []
    with open(f"{EXAMPLES}/{name}.out") as fh:
        for line in fh:
            parts = line.split()
            if parts and all(p.lstrip("-").isdigit() for p in parts):
                rows.append([int(p) for p in parts])
    return np.array(rows)


def check(name: str, backend: str, **kwargs):
    p = read_problem(
        f"{EXAMPLES}/{name}.lp" if not name.endswith("knapsack") else f"{EXAMPLES}/{name}.mop"
    )
    front = solve_front(p, backend=backend, **kwargs)
    expect = golden_front(name)
    assert front.points.shape == expect.shape, (
        f"{name}: got {front.points.shape[0]} points, want {expect.shape[0]}"
    )
    assert (front.points == expect).all(), f"{name}: front mismatch"


@pytest.mark.parametrize("cfg_name,cfg", CONFIGS, ids=[c[0] for c in CONFIGS])
@pytest.mark.parametrize("name", FAST)
def test_golden_fast_numpy(name, cfg_name, cfg):
    check(name, "numpy", **cfg)


@pytest.mark.parametrize("cfg_name,cfg", CONFIGS, ids=[c[0] for c in CONFIGS])
@pytest.mark.parametrize("name", FAST)
def test_golden_fast_jax(name, cfg_name, cfg):
    check(name, "jax", **cfg)


@pytest.mark.slow
@pytest.mark.parametrize("cfg_name,cfg", CONFIGS, ids=[c[0] for c in CONFIGS])
@pytest.mark.parametrize("name", SLOW)
def test_golden_slow_jax(name, cfg_name, cfg):
    check(name, "jax", **cfg)


@pytest.mark.slow
def test_golden_mop_jax():
    check("moip_2_30_1_knapsack", "jax", n_workers=1)


def test_front_counts_table():
    """BASELINE.md table A solution counts for the fast instances."""
    for name, count in [("2AP05", 9), ("3AP05", 12), ("3KP10", 6)]:
        p = read_problem(f"{EXAMPLES}/{name}.lp")
        front = solve_front(p, n_workers=1, backend="numpy")
        assert front.solution_count == count


# ---- wave tier: the PRODUCTION TPU path on the reference goldens ----------
# The wave backend is what every real TPU run takes (api.make_backend
# 'auto'); run it through the same 5-config matrix as numpy/jax so the
# contract backend and the tested backend are the same.  CPU interpret mode;
# fragments both off (per-LP waves) and on (device B&B subtrees).


def _wave_backend(name: str, frag: bool):
    from moip_aira_tpu.solver.wave import WaveLexBackend

    p = read_problem(f"{EXAMPLES}/{name}.lp")
    return p, WaveLexBackend(p, fragments=frag, batch_width=8)


@pytest.mark.parametrize("cfg_name,cfg", CONFIGS, ids=[c[0] for c in CONFIGS])
@pytest.mark.parametrize("frag", [False, True], ids=["perLP", "frag"])
@pytest.mark.parametrize("name", FAST)
def test_golden_fast_wave(name, frag, cfg_name, cfg):
    p, be = _wave_backend(name, frag)
    front = solve_front(p, backend=be, **cfg)
    expect = golden_front(name)
    assert front.points.shape == expect.shape, (
        f"{name}: got {front.points.shape[0]} points, want {expect.shape[0]}"
    )
    assert (front.points == expect).all(), f"{name}: front mismatch"


# (the MOIP_DUAL golden tier was deleted with the dual-simplex path in
# round 5 — see solver/pallas_bb.py's tombstone note for the measurements)
