"""5-objective proof point.

The reference build rejects objcnt >= maxObjCount (default 5, so at most 4
objectives: aira.cpp:230-233, mk_symgroup.py codegen ceiling).  This
framework generates permutation tables at runtime (parallel/symgroup.py)
with no ceiling — these tests prove a 5-objective instance actually
enumerates correctly, differential-verified against the brute-forced
nondominated set, serial and parallel.
"""

import os
import tempfile

import numpy as np
import pytest

from moip_aira_tpu.api import solve_front
from moip_aira_tpu.io import read_problem
from moip_aira_tpu.utils.generate import ap_lp, kp_lp

from test_differential import brute_force_front


def _load(text: str, suffix: str):
    with tempfile.NamedTemporaryFile("w", suffix=suffix, delete=False) as fh:
        fh.write(text)
        path = fh.name
    try:
        return read_problem(path)
    finally:
        os.unlink(path)


@pytest.fixture(scope="module")
def kp8_5obj():
    p = _load(kp_lp(items=8, objectives=5, seed=3, vlo=3, vhi=15), ".lp")
    return p, brute_force_front(p)


@pytest.fixture(scope="module")
def ap4_5obj():
    p = _load(ap_lp(size=4, objectives=5, seed=3, lo=0, hi=9), ".lp")
    return p, brute_force_front(p)


def test_5kp08_serial(kp8_5obj):
    p, expect = kp8_5obj
    got = solve_front(p, n_workers=1, backend="numpy")
    assert np.array_equal(got.points, expect)


def test_5kp08_parallel_spread(kp8_5obj):
    p, expect = kp8_5obj
    got = solve_front(p, n_workers=6, backend="numpy")
    assert np.array_equal(got.points, expect)


def test_5kp08_split(kp8_5obj):
    p, expect = kp8_5obj
    got = solve_front(p, n_workers=2, split=True, backend="numpy")
    assert np.array_equal(got.points, expect)


@pytest.mark.slow
def test_5ap04_serial(ap4_5obj):
    p, expect = ap4_5obj
    got = solve_front(p, n_workers=1, backend="numpy")
    assert np.array_equal(got.points, expect)


@pytest.mark.slow
def test_5ap04_parallel_cluster(ap4_5obj):
    p, expect = ap4_5obj
    got = solve_front(p, n_workers=5, spread=False, backend="numpy")
    assert np.array_equal(got.points, expect)
