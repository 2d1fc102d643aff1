"""Generalized k-cliques, labeled matching, FSM edge support."""

from __future__ import annotations

import random
from itertools import combinations

from pyspark.sql import functions as F

from graphminer_spark.algorithms.patterns import (
    clique_count,
    fsm_edge_support,
    labeled_triangle_count,
)
from graphminer_spark.graph.build import build_dag, degrees, symmetrize
from graphminer_spark.graph.labels import with_synthetic_labels
from tests.conftest import edges_df

TWO_CLIQUES = [
    (a, b) for c in (0, 5) for a in range(c, c + 5) for b in range(a + 1, c + 5)
]


def _random_graph(n, m, seed):
    rng = random.Random(seed)
    return [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]


def _brute_cliques(edges, k):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    count = 0
    for sub in combinations(sorted(adj), k):
        if all(y in adj[x] for x, y in combinations(sub, 2)):
            count += 1
    return count


def test_clique_counts_vs_bruteforce(spark):
    edges = _random_graph(40, 250, seed=8)
    dag = build_dag(edges_df(spark, edges))
    for k in (3, 4, 5):
        got = clique_count(dag, k).collect()[0][0]
        assert got == _brute_cliques(edges, k), f"k={k}"


def test_clique_fixture(spark):
    dag = build_dag(edges_df(spark, TWO_CLIQUES))
    # two disjoint 5-cliques: C(5,k) each
    assert clique_count(dag, 3).collect()[0][0] == 20
    assert clique_count(dag, 4).collect()[0][0] == 10
    assert clique_count(dag, 5).collect()[0][0] == 2


def test_labeled_triangles(spark):
    # triangle 0-1-2 labeled (0,1,2) under id % 3; triangle 3-4-5 same
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    df = edges_df(spark, edges)
    dag = build_dag(df)
    verts = spark.range(6).select("id")
    lv = with_synthetic_labels(verts, n_classes=3)
    total = 0
    from itertools import product

    per_combo = {}
    for labs in product(range(3), repeat=3):
        n = labeled_triangle_count(dag, lv, labs).collect()[0][0]
        per_combo[labs] = n
        total += n
    assert total == 2  # each triangle matched under exactly one ordered combo
    assert sum(1 for v in per_combo.values() if v > 0) <= 2


def test_fsm_edge_support(spark):
    edges = [(0, 1), (0, 3), (2, 1), (2, 3), (4, 1)]
    df = symmetrize(edges_df(spark, edges), dedup=False)
    verts = spark.range(5).select("id")
    lv = with_synthetic_labels(verts, n_classes=2)  # even=0, odd=1
    rows = {
        (r["la"], r["lb"]): r["support"]
        for r in fsm_edge_support(df, lv, minsup=1).collect()
    }
    # all edges connect even(0)–odd(1): distinct evens {0,2,4}, odds {1,3}
    assert rows == {(0, 1): 2}
    assert (
        fsm_edge_support(df, lv, minsup=3).count() == 0
    )  # support 2 < 3 pruned


def test_fsm_2edge_support_vs_bruteforce(spark):
    """MNI domain support of labeled wedges vs a literal python
    oracle (src/fsm/domain_support.h semantics)."""
    import random

    from graphminer_spark.algorithms.patterns import fsm_2edge_support
    from graphminer_spark.graph.build import symmetrize
    from tests.conftest import edges_df

    rng = random.Random(5)
    n = 30
    edges = {
        (i, j)
        for i in range(n)
        for j in range(i + 1, n)
        if rng.random() < 0.2
    }
    adj = {i: set() for i in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    doms = {}
    for b in adj:
        for a in adj[b]:
            for c in adj[b]:
                if a == c:
                    continue
                la, lb, lc = a % 7, b % 7, c % 7
                if la > lc:
                    continue
                d = doms.setdefault((la, lb, lc), (set(), set(), set()))
                d[0].add(a)
                d[1].add(b)
                d[2].add(c)
    minsup = 3
    want = {
        k: min(len(d[0]), len(d[1]), len(d[2]))
        for k, d in doms.items()
        if min(len(d[0]), len(d[1]), len(d[2])) >= minsup
    }
    sym = symmetrize(edges_df(spark, edges), dedup=False)
    verts = spark.createDataFrame(
        [(v, v % 7) for v in adj], "id long, vlabel int"
    )
    got = {
        (r["la"], r["lb"], r["lc"]): r["support"]
        for r in fsm_2edge_support(sym, verts, minsup=minsup).collect()
    }
    assert got == want


def test_fsm_3edge_support_vs_bruteforce(spark):
    """Every 3-edge shape (triangle/star/path) MNI-supported exactly as
    a literal python oracle computes it."""
    import itertools
    import random

    from graphminer_spark.algorithms.patterns import fsm_3edge_support
    from graphminer_spark.graph.build import symmetrize
    from tests.conftest import edges_df

    rng = random.Random(12)
    n = 26
    edges = {
        (i, j)
        for i in range(n)
        for j in range(i + 1, n)
        if rng.random() < 0.4
    }
    adj = {i: set() for i in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    doms = {}

    def add(shape, labels, verts):
        d = doms.setdefault((shape, *labels), [set() for _ in verts])
        for i, v in enumerate(verts):
            d[i].add(v)

    L = lambda v: v % 7  # noqa: E731
    for u in adj:
        for v in adj[u]:
            for w in adj[v]:
                if w == u:
                    continue
                # triangle (ordered, labels ascending)
                if w in adj[u] and L(u) <= L(v) <= L(w):
                    add("triangle", (L(u), L(v), L(w), -1), (u, v, w))
                # path u-v-w-x
                for x in adj[w]:
                    if x in (u, v):
                        continue
                    lu, lv, lw, lx = L(u), L(v), L(w), L(x)
                    if lu < lx or (lu == lx and lv <= lw):
                        add("path", (lu, lv, lw, lx), (u, v, w, x))
        # star
        for x, y, z in itertools.permutations(adj[u], 3):
            if L(x) <= L(y) <= L(z):
                add("star", (L(u), L(x), L(y), L(z)), (u, x, y, z))
    minsup = 3
    want = {
        k: min(len(s) for s in d)
        for k, d in doms.items()
        if min(len(s) for s in d) >= minsup
    }
    sym = symmetrize(edges_df(spark, edges), dedup=False)
    verts = spark.createDataFrame(
        [(v, v % 7) for v in adj], "id long, vlabel int"
    )
    got = {
        (r["shape"], r["p1"], r["p2"], r["p3"], r["p4"]): r["support"]
        for r in fsm_3edge_support(sym, verts, minsup=minsup).collect()
    }
    assert set(got) == set(want)
    assert got == want
    assert any(k[0] == "triangle" for k in got), "triangle branch untested"
