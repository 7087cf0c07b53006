"""Solutions store tests — the relaxation-find dominance semantics of
reference src/solutions.cpp:17-47."""

import numpy as np

from moip_aira_tpu.core.store import Solutions
from moip_aira_tpu.sense import INF, Sense


def test_find_min_relaxation():
    s = Solutions(2)
    # solved box (ip <= [inf, 50]) with optimum (30, 40)
    s.insert([INF, 50.0], [30, 40], False)
    # query a tighter box whose bounds still contain the stored optimum
    hit = s.find(np.array([40.0, 45.0]), Sense.MIN)
    assert hit is not None and not hit.infeasible
    assert hit.result.tolist() == [30, 40]
    # box that cuts off the stored optimum -> no hit
    assert s.find(np.array([40.0, 39.0]), Sense.MIN) is None
    # box larger than the stored one -> stored is not a relaxation
    assert s.find(np.array([INF, 60.0]), Sense.MIN) is None


def test_find_infeasible_propagation():
    s = Solutions(2)
    s.insert([25.0, 40.0], None, True)  # box obj0<=25, obj1<=40 infeasible
    hit = s.find(np.array([20.0, 40.0]), Sense.MIN)  # smaller box
    assert hit is not None and hit.infeasible
    assert s.find(np.array([30.0, 40.0]), Sense.MIN) is None  # bigger box


def test_find_max_sense():
    s = Solutions(2)
    s.insert([-INF, 10.0], [50, 20], False)  # MAX: bounds are lower bounds
    hit = s.find(np.array([5.0, 15.0]), Sense.MAX)
    assert hit is not None and hit.result.tolist() == [50, 20]
    assert s.find(np.array([5.0, 25.0]), Sense.MAX) is None


def test_find_batch_matches_find():
    rng = np.random.default_rng(0)
    s = Solutions(3)
    for _ in range(40):
        ip = np.where(rng.random(3) < 0.3, INF, rng.integers(0, 50, 3))
        if rng.random() < 0.2:
            s.insert(ip, None, True)
        else:
            s.insert(ip, rng.integers(0, 40, 3), False)
    queries = np.where(
        rng.random((64, 3)) < 0.3, INF, rng.integers(0, 50, (64, 3))
    ).astype(float)
    hit, infeas, res = s.find_batch(queries, Sense.MIN)
    for i, q in enumerate(queries):
        one = s.find(q, Sense.MIN)
        assert hit[i] == (one is not None)
        if one is not None:
            assert infeas[i] == one.infeasible
            if not one.infeasible:
                assert (res[i] == one.result).all()


def test_sorted_unique_points_descending_dedup():
    s = Solutions(2)
    for r in [[3, 4], [10, 1], [3, 4], [5, 2]]:
        s.insert([INF, INF], r, False)
    s.insert([1.0, 1.0], None, True)
    pts = s.sorted_unique_points()
    assert pts.tolist() == [[10, 1], [5, 2], [3, 4]]


def test_merge():
    a, b = Solutions(2), Solutions(2)
    a.insert([INF, INF], [1, 2], False)
    b.insert([INF, INF], [3, 4], False)
    a.merge(b)
    assert len(a) == 2 and len(b) == 0
