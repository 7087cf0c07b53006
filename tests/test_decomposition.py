"""Symgroup order + cluster wiring tests (reference mk_symgroup.py and
cluster.cpp)."""

from math import factorial

from moip_aira_tpu.engine.worker_spec import Cell
from moip_aira_tpu.parallel.cluster import build_cluster
from moip_aira_tpu.parallel.symgroup import max_workers, sym_perms
from moip_aira_tpu.sense import Sense


def test_sym_perms_reference_order_n3():
    # DFS preferring high leading digits, then reversed (mk_symgroup.py:25-37)
    assert [list(p) for p in sym_perms(3)] == [
        [0, 1, 2],
        [1, 0, 2],
        [0, 2, 1],
        [2, 0, 1],
        [1, 2, 0],
        [2, 1, 0],
    ]


def test_sym_perms_sizes():
    for n in range(1, 6):
        assert len(sym_perms(n)) == factorial(n)
        assert len(set(sym_perms(n))) == factorial(n)
    assert max_workers(4) == 24


def test_cluster_single_worker():
    specs = build_cluster(1, 3, Sense.MIN, spread=True)
    assert len(specs) == 1
    w = specs[0]
    assert w.perm == [0, 1, 2]
    assert all(c is None for c in w.share_to)
    assert all(c is None for c in w.share_from)


def test_cluster_two_workers_two_obj():
    specs = build_cluster(2, 2, Sense.MIN, spread=True)
    assert len(specs) == 2
    a, b = specs
    assert a.perm == [0, 1]
    assert b.perm == [1, 0]
    # partners exchange through one shared cell per position: worker a
    # publishes its objective-1 values where b reads them, and vice versa
    assert a.share_to[1] is not None and a.share_to[1] is b.share_from[1]
    assert b.share_to[0] is not None and b.share_to[0] is a.share_from[0]
    assert a.partnered and b.partnered


def test_cluster_worker_counts():
    for k, t in [(3, 2), (3, 3), (3, 6), (4, 2), (4, 4), (4, 24)]:
        for spread in (True, False):
            specs = build_cluster(t, k, Sense.MIN, spread)
            assert len(specs) == t, (k, t, spread)
            perms = {tuple(s.perm) for s in specs}
            assert len(perms) == t  # all distinct orderings


def test_cluster_spread_vs_cluster_orderings():
    # spreading distributes first positions; clustering fills one subtree
    spread = build_cluster(2, 3, Sense.MIN, spread=True)
    clust = build_cluster(2, 3, Sense.MIN, spread=False)
    # spread: the two workers start in different ordering subtrees
    assert spread[0].perm[-1] != spread[1].perm[-1]
    # cluster: both workers share the last objective of the first subtree
    assert clust[0].perm[-1] == clust[1].perm[-1]
