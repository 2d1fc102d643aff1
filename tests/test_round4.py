"""Round-4 additions: streaming-maintenance crash idempotency, pangolin
atlas k-guard, HITS one-schema durable checkpoints, dedup persist
lifecycle."""

from __future__ import annotations

import glob
import random
import shutil

import pytest
from pyspark.sql import functions as F

from graphminer_spark.graph.build import build_dag, symmetrize
from tests.conftest import edges_df


def _random_graph(n, m, seed):
    rng = random.Random(seed)
    return [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]


# ---------------------------------------- streaming crash idempotency


def test_stream_maintenance_survives_partial_edge_write(spark, tmp_path):
    """Simulate a kill between the edges write and the deltas write: a
    pre-existing UNCOMMITTED ``edges/b=0`` partition (no deltas row)
    must be recomputed wholesale on replay — the total still exactly
    matches the accumulated graph's triangle count."""
    from graphminer_spark.algorithms.triangles import triangle_count
    from graphminer_spark.streaming.graphstream import (
        stream_triangle_maintenance,
    )

    edges = sorted(
        {(min(a, b), max(a, b)) for a, b in _random_graph(20, 90, 7) if a != b}
    )
    src = tmp_path / "edge_stream"
    state = tmp_path / "state"
    src.mkdir()

    tmp = tmp_path / "w_b1"
    spark.createDataFrame(edges, "src long, dst long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp))
    part = glob.glob(str(tmp / "part-*.parquet"))[0]
    shutil.copy(part, str(src / "b1.parquet"))

    # the "partial write from the killed first attempt": only a strict
    # subset of batch 0's edges landed, and no deltas commit marker
    (state / "edges").mkdir(parents=True)
    spark.createDataFrame(edges[: len(edges) // 3], "src long, dst long").write.mode(
        "overwrite"
    ).parquet(str(state / "edges" / "b=0"))

    q = stream_triangle_maintenance(spark, str(src), str(state), "tm_crash")
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    deltas = spark.read.parquet(str(state / "deltas"))
    total = deltas.agg(F.sum("n_new_triangles")).collect()[0][0]
    acc = spark.read.parquet(str(state / "edges")).select("src", "dst")
    want = triangle_count(build_dag(acc)).collect()[0]["n_triangles"]
    assert total == want
    # the partial partition was overwritten, not appended to
    assert acc.count() == len(edges)
    assert acc.distinct().count() == len(edges)


def test_stream_maintenance_skips_committed_batch(spark, tmp_path):
    """A batch whose batch_id already has a deltas row is fully
    skipped on replay (commit marker wins — no recount)."""
    from graphminer_spark.streaming.graphstream import (
        stream_triangle_maintenance,
    )

    edges = [(0, 1), (1, 2), (0, 2)]
    src = tmp_path / "edge_stream"
    state = tmp_path / "state"
    src.mkdir()

    tmp = tmp_path / "w"
    spark.createDataFrame(edges, "src long, dst long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp))
    part = glob.glob(str(tmp / "part-*.parquet"))[0]
    shutil.copy(part, str(src / "b1.parquet"))

    # pre-commit batch 0 with a sentinel delta row; replay must keep it
    spark.createDataFrame(
        [(0, 3, 99)], "batch_id long, n_delta_edges long, n_new_triangles long"
    ).write.mode("overwrite").parquet(str(state / "deltas"))

    q = stream_triangle_maintenance(spark, str(src), str(state), "tm_skip")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.read.parquet(str(state / "deltas")).collect()
    assert len(rows) == 1 and rows[0]["n_new_triangles"] == 99


# --------------------------------------- hub-safe FSM MNI (round-4 ask)


def _brute_mni_2edge(edges, label):
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    dom = defaultdict(lambda: defaultdict(set))
    for b in adj:
        for a in adj[b]:
            for c in adj[b]:
                if a == c:
                    continue
                la, lb, lc = label[a], label[b], label[c]
                if la > lc:
                    continue
                k = (la, lb, lc)
                dom[k][("arm", la)].add(a)
                dom[k][("c",)].add(b)
                dom[k][("arm", lc)].add(c)
    return {k: min(len(s) for s in p.values()) for k, p in dom.items()}


def _brute_mni_3edge(edges, label):
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    dom = defaultdict(lambda: defaultdict(set))
    for u in adj:
        for v in adj[u]:
            for w in adj[v]:
                if w != u and w in adj[u]:
                    ls = sorted([label[u], label[v], label[w]])
                    k = ("triangle", ls[0], ls[1], ls[2], -1)
                    for x in (u, v, w):
                        dom[k][("l", label[x])].add(x)
    for b in adj:
        ns = list(adj[b])
        for x in ns:
            for y in ns:
                for z in ns:
                    if len({x, y, z}) < 3:
                        continue
                    lx, ly, lz = label[x], label[y], label[z]
                    if not (lx <= ly <= lz):
                        continue
                    k = ("star", label[b], lx, ly, lz)
                    dom[k][("c",)].add(b)
                    for leaf in (x, y, z):
                        dom[k][("l", label[leaf])].add(leaf)
    for b in adj:
        for a in adj[b]:
            for c in adj[b]:
                if c == a:
                    continue
                for d in adj[c]:
                    if d in (b, a):
                        continue
                    la, lb, lc, ld = label[a], label[b], label[c], label[d]
                    if not ((la < ld) or (la == ld and lb <= lc)):
                        continue
                    k = ("path", la, lb, lc, ld)
                    dom[k][(1,)].add(a)
                    dom[k][(2,)].add(b)
                    dom[k][(3,)].add(c)
                    dom[k][(4,)].add(d)
    return {k: min(len(s) for s in p.values()) for k, p in dom.items()}


@pytest.mark.parametrize("seed,mod", [(11, 3), (5, 2), (42, 7)])
def test_fsm_mni_matches_brute_force(spark, seed, mod):
    """The hub-safe NLF/triangle-indexed domain computation is exact
    MNI — identical to brute-force enumeration over every 2-edge and
    3-edge pattern (including tied-label collision cases)."""
    from graphminer_spark.algorithms.patterns import (
        fsm_2edge_support,
        fsm_3edge_support,
    )

    raw = _random_graph(30, 80, seed)
    edges = sorted({(min(a, b), max(a, b)) for a, b in raw if a != b})
    label = {v: v % mod for v in range(30)}
    sym = symmetrize(edges_df(spark, edges), dedup=False)
    lv = spark.createDataFrame(
        [(v, label[v]) for v in range(30)], "id long, vlabel int"
    )
    got2 = {
        (r["la"], r["lb"], r["lc"]): r["support"]
        for r in fsm_2edge_support(sym, lv, minsup=1).collect()
    }
    assert got2 == _brute_mni_2edge(edges, label)
    got3 = {
        (r["shape"], r["p1"], r["p2"], r["p3"], r["p4"]): r["support"]
        for r in fsm_3edge_support(sym, lv, minsup=1).collect()
    }
    assert got3 == _brute_mni_3edge(edges, label)


def test_fsm_mni_bounded_on_zipf_hub(spark):
    """An 8000-degree hub: the old wedge/star/path-materializing plans
    would push ~deg² .. deg³ (10⁸ .. 5·10¹¹) rows through the MNI
    aggregate; the NLF-domain plans stay O(|E|·L²) and finish. Supports
    are asserted analytically for the fixture."""
    from graphminer_spark.algorithms.patterns import (
        fsm_2edge_support,
        fsm_3edge_support,
    )

    h = 8000
    edges = [(0, i) for i in range(1, h + 1)] + [
        (i, i + 1) for i in range(1, 501)
    ]
    sym = symmetrize(edges_df(spark, edges), dedup=False)
    lv = spark.createDataFrame(
        [(v, 0) for v in range(h + 1)], "id long, vlabel int"
    )
    # wedge (0,0,0): centers = hub + chain leaves 1..501 = 502;
    # arms = all 8000 leaves + hub = 8001 → support 502
    w = fsm_2edge_support(sym, lv, minsup=1).collect()
    assert {(r["la"], r["lb"], r["lc"]): r["support"] for r in w} == {
        (0, 0, 0): 502
    }
    got = {
        (r["shape"], r["p1"], r["p2"], r["p3"], r["p4"]): r["support"]
        for r in fsm_3edge_support(sym, lv, minsup=1).collect()
    }
    assert got == {
        # hub–i–(i+1) triangles, corners = hub + 1..501
        ("triangle", 0, 0, 0, -1): 502,
        # centers with ≥3 neighbors = hub + chain interior 2..500 = 500
        ("star", 0, 0, 0, 0): 500,
        # mids = hub + 1..501 = 502; ends = everyone = 8001
        ("path", 0, 0, 0, 0): 502,
    }


# --------------------------------------------- general-k FSM frontier


def test_fsm_kedge_agrees_with_specialized_kernels(spark):
    """The generic gSpan frontier loop at k=2/3 reproduces the
    (brute-force-validated) closed-form kernels' support multisets."""
    from graphminer_spark.algorithms.fsm_general import fsm_kedge_support
    from graphminer_spark.algorithms.patterns import (
        fsm_2edge_support,
        fsm_3edge_support,
    )

    raw = _random_graph(25, 60, 13)
    edges = sorted({(min(a, b), max(a, b)) for a, b in raw if a != b})
    sym = symmetrize(edges_df(spark, edges), dedup=False)
    lv = spark.createDataFrame(
        [(v, v % 3) for v in range(25)], "id long, vlabel int"
    )
    for k, spec in [(2, fsm_2edge_support), (3, fsm_3edge_support)]:
        gen = sorted(
            r["support"]
            for r in fsm_kedge_support(sym, lv, k, 1).collect()
        )
        ref = sorted(r["support"] for r in spec(sym, lv, 1).collect())
        assert gen == ref, f"k={k} support multiset mismatch"


def test_fsm_kedge_k5_matches_universal_brute(spark):
    """k=5 (beyond the gate's k=4): total pattern count and support
    multiset match the universal all-permutation brute force — the
    frontier loop is genuinely general-k."""
    from collections import defaultdict
    from itertools import combinations, permutations

    from graphminer_spark.algorithms.fsm_general import fsm_kedge_support

    raw = _random_graph(12, 18, 5)
    edges = sorted({(min(a, b), max(a, b)) for a, b in raw if a != b})
    label = {v: v % 2 for v in range(12)}
    sym = symmetrize(edges_df(spark, edges), dedup=False)
    lv = spark.createDataFrame(
        [(v, label[v]) for v in range(12)], "id long, vlabel int"
    )

    def connected(es):
        ad = defaultdict(set)
        for u, v in es:
            ad[u].add(v)
            ad[v].add(u)
        seen = {es[0][0]}
        stack = [es[0][0]]
        while stack:
            x = stack.pop()
            for y in ad[x]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        return seen == set(ad)

    dom = defaultdict(lambda: defaultdict(set))
    for es in combinations(edges, 5):
        if not connected(es):
            continue
        vs = sorted({x for e in es for x in e})
        n = len(vs)
        encs = []
        for assign in permutations(range(n)):
            pos_of = {vs[q]: p for p, q in enumerate(assign)}
            encs.append(
                (
                    (
                        tuple(
                            sorted(
                                tuple(sorted((pos_of[u], pos_of[v])))
                                for u, v in es
                            )
                        ),
                        tuple(label[vs[assign[p]]] for p in range(n)),
                    ),
                    assign,
                )
            )
        best = min(e for e, _ in encs)
        for enc, assign in encs:
            if enc == best:
                for p in range(n):
                    dom[best][p].add(vs[assign[p]])
    brute = sorted(
        min(len(s) for s in poss.values()) for poss in dom.values()
    )
    got = sorted(
        r["support"] for r in fsm_kedge_support(sym, lv, 5, 1).collect()
    )
    assert got == brute


def test_fsm_4edge_matches_universal_brute(spark):
    """k=4: per-shape support multisets match a universal brute force
    (min-encoding pattern id over all vertex permutations, position
    domains = exact MNI by definition)."""
    from collections import Counter, defaultdict
    from itertools import combinations, permutations

    from graphminer_spark.algorithms.fsm_general import fsm_4edge_support

    raw = _random_graph(22, 50, 13)
    edges = sorted({(min(a, b), max(a, b)) for a, b in raw if a != b})
    label = {v: v % 3 for v in range(22)}
    sym = symmetrize(edges_df(spark, edges), dedup=False)
    lv = spark.createDataFrame(
        [(v, label[v]) for v in range(22)], "id long, vlabel int"
    )

    def connected(es):
        ad = defaultdict(set)
        for u, v in es:
            ad[u].add(v)
            ad[v].add(u)
        seen = {es[0][0]}
        stack = [es[0][0]]
        while stack:
            x = stack.pop()
            for y in ad[x]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        return seen == set(ad)

    shape_of = {
        (1, 1, 1, 1, 4): "star4",
        (1, 1, 1, 2, 3): "chair",
        (1, 1, 2, 2, 2): "path5",
        (2, 2, 2, 2): "cycle4",
        (1, 2, 2, 3): "paw",
    }
    dom = defaultdict(lambda: defaultdict(set))
    pat_shape = {}
    for es in combinations(edges, 4):
        if not connected(es):
            continue
        vs = sorted({x for e in es for x in e})
        n = len(vs)
        best = None
        for assign in permutations(range(n)):
            pos_of = {vs[q]: p for p, q in enumerate(assign)}
            enc = (
                tuple(
                    sorted(
                        tuple(sorted((pos_of[u], pos_of[v]))) for u, v in es
                    )
                ),
                tuple(label[vs[assign[p]]] for p in range(n)),
            )
            if best is None or enc < best:
                best = enc
        for assign in permutations(range(n)):
            pos_of = {vs[q]: p for p, q in enumerate(assign)}
            enc = (
                tuple(
                    sorted(
                        tuple(sorted((pos_of[u], pos_of[v]))) for u, v in es
                    )
                ),
                tuple(label[vs[assign[p]]] for p in range(n)),
            )
            if enc == best:
                for p in range(n):
                    dom[best][p].add(vs[assign[p]])
        degc = Counter()
        for u, v in es:
            degc[u] += 1
            degc[v] += 1
        pat_shape[best] = shape_of[tuple(sorted(degc.values()))]

    brute = defaultdict(list)
    for pat, poss in dom.items():
        brute[pat_shape[pat]].append(min(len(s) for s in poss.values()))
    got = defaultdict(list)
    for r in fsm_4edge_support(sym, lv, minsup=1).collect():
        got[r["shape"]].append(r["support"])
    for sh in set(brute) | set(got):
        assert sorted(brute[sh]) == sorted(got[sh]), f"shape {sh} mismatch"


# --------------------------------- post-filter cardinality query order


def test_query_order_uses_post_filter_cardinality(spark):
    """GQL-style refinement: the matching order follows FILTERED
    candidate counts, not raw label frequency — on a fixture where the
    frequent label's candidates collapse under the degree/NLF filter,
    the seed flips to that position (and the count stays exact)."""
    from graphminer_spark.algorithms.subgraph import (
        PatternSpec,
        count_matches,
        match_embeddings,
    )

    # one label-0 hub in 2 triangles; 48 degree-1 label-0 decoys
    edges = [
        (0, 100), (0, 200), (100, 200),
        (0, 101), (0, 201), (101, 201),
    ] + [(i, 100) for i in range(2, 50)]
    sym = symmetrize(edges_df(spark, edges), dedup=False)
    lv = spark.createDataFrame(
        [(i, 0) for i in range(50)]
        + [(100, 1), (101, 1), (200, 2), (201, 2)],
        "id long, vlabel int",
    )
    spec = PatternSpec(
        "t012", 3, ((0, 1), (0, 2), (1, 2)), vlabels=(0, 1, 2)
    )
    probe: dict = {}
    emb = match_embeddings(sym, spec, lv, prune=True, _plan_probe=probe)
    # label histogram says position 0 is the WORST seed (50 label-0
    # vertices vs 2/2); the post-filter counts say it is the best (1)
    assert probe["cand_est"] == [1, 2, 2]
    assert 0 in probe["seed"]
    assert emb.count() == 2
    # pruned and unpruned plans agree
    n_noprune = count_matches(sym, spec, lv, prune=False).collect()[0][0]
    assert n_noprune == 2


def test_candidate_refinement_sound_and_effective(spark):
    """CFL/DPiso structural rounds: counts are invariant for any round
    count, and on a fixture with structurally-dead candidates (right
    label + degree + NLF, but no neighbor that itself is a candidate)
    the refined sets are strictly smaller."""
    from graphminer_spark.algorithms.subgraph import (
        PatternSpec,
        count_matches,
        match_embeddings,
    )

    # labeled 4-path 0-1-2-3; decoy section: label-1/label-2 vertices
    # that satisfy NLF locally but whose would-be continuation dead-ends
    edges = [
        # real 4-paths: 10-20-30-40, 11-20-30-41
        (10, 20), (11, 20), (20, 30), (30, 40), (30, 41),
        # decoys: 21 (label 1) sees label-0 and label-2 neighbors, but
        # its label-2 neighbor 31 has no label-3 neighbor at all
        (12, 21), (21, 31), (31, 13),
    ]
    lv = spark.createDataFrame(
        [(10, 0), (11, 0), (12, 0), (13, 0),
         (20, 1), (21, 1), (30, 2), (31, 2), (40, 3), (41, 3)],
        "id long, vlabel int",
    )
    sym = symmetrize(edges_df(spark, edges), dedup=False)
    spec = PatternSpec(
        "lp4", 4, ((0, 1), (1, 2), (2, 3)), vlabels=(0, 1, 2, 3)
    )
    p0, p1 = {}, {}
    match_embeddings(sym, spec, lv, prune=True, refine=0, _plan_probe=p0)
    match_embeddings(sym, spec, lv, prune=True, refine=2, _plan_probe=p1)
    # decoy 21/31 (and dead-end 12) survive NLF but not refinement
    assert sum(p1["cand_est"]) < sum(p0["cand_est"])
    # {10,11} × 20 × 30 × {40,41} = 4 labeled paths, any round count
    for r in (0, 1, 2):
        n = count_matches(sym, spec, lv, prune=True, refine=r).collect()[0][0]
        assert n == 4, f"refine={r}"


# ------------------------------------------------- AQE superstep gate


def test_superstep_planning_gates_and_restores(spark):
    from graphminer_spark.checkpoint import (
        SUPERSTEP_AQE_MIN_EDGES,
        superstep_planning,
    )

    key = "spark.sql.adaptive.enabled"
    spark.conf.set(key, "true")
    with superstep_planning(spark, 1000):  # small: AQE off inside
        assert spark.conf.get(key) == "false"
    assert spark.conf.get(key) == "true"  # restored
    with superstep_planning(spark, SUPERSTEP_AQE_MIN_EDGES):  # big: no-op
        assert spark.conf.get(key) == "true"
    # restored even when the loop raises
    try:
        with superstep_planning(spark, 1000):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get(key) == "true"
    # and the iterative algorithms leave the session conf untouched
    from graphminer_spark.algorithms.pagerank import pagerank

    edges = edges_df(spark, [(0, 1), (1, 2), (2, 0)])
    verts = spark.createDataFrame([(0,), (1,), (2,)], "id long")
    pagerank(edges, verts, tol=0.0, max_iter=2)
    assert spark.conf.get(key) == "true"


# ------------------------------------------- vertex feature propagation


def test_feature_propagation_matches_brute(spark):
    """2-hop integer-basis-point neighbor mean equals a direct Python
    computation, and the array face agrees with the flat face."""
    from collections import defaultdict

    from graphminer_spark.graph.features import (
        propagate_features,
        propagate_features_flat,
        synthetic_features_flat,
        with_synthetic_features,
    )

    raw = _random_graph(30, 70, 3)
    edges = sorted({(min(a, b), max(a, b)) for a, b in raw if a != b})
    sym = symmetrize(edges_df(spark, edges), dedup=False)
    verts = sym.select(F.col("src").alias("id")).distinct()
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)

    feat = {(v, d): (v * 31 + d * 17) % 1000 for v in adj for d in range(4)}
    for _ in range(2):
        feat = {
            (v, d): (10000 * sum(feat[(u, d)] for u in adj[v])) // len(adj[v])
            for v in adj
            for d in range(4)
        }
    flat = propagate_features_flat(
        sym, synthetic_features_flat(verts), hops=2
    )
    got = {(r["id"], r["d"]): r["val"] for r in flat.collect()}
    assert got == feat

    # array face: same values back on the input's float scale
    # (flat ints are the float features × 1000, so expected float
    # result = flat result / 1000 / 10^(4·hops))
    arr = propagate_features(
        sym, with_synthetic_features(verts), hops=2
    ).collect()
    for r in arr:
        for d, x in enumerate(r["feat"]):
            e = feat[(r["id"], d)] / 1000.0 / 1e8
            assert abs(x - e) < 1e-4 * max(1.0, abs(e))


# ------------------------------------------------- pangolin atlas guard


@pytest.mark.parametrize("k", [2, 6])
def test_pangolin_atlas_rejects_out_of_range_k(spark, k):
    from graphminer_spark.algorithms.pangolin import mine_motifs

    sym = symmetrize(edges_df(spark, [(0, 1), (1, 2)]), dedup=False)
    with pytest.raises(ValueError, match="3..5"):
        # the guard fires in the driver-side atlas build, before any job
        mine_motifs(sym, k).collect()


# ------------------------------------- HITS durable checkpoint layout


def test_hits_checkpoints_have_one_schema(spark, tmp_path):
    """Every durable HITS checkpoint (including iteration 0) has the
    (id, auth, h_raw) layout, and hub = h_raw / sum(h_raw) at any
    iteration reproduces the returned scores."""
    from graphminer_spark.algorithms.hits import hits
    from graphminer_spark.checkpoint import CheckpointManager

    edges = edges_df(spark, _random_graph(15, 40, 3))
    verts = (
        symmetrize(edges, dedup=False).select(F.col("src").alias("id")).distinct()
    )
    ckpt = CheckpointManager(str(tmp_path / "hits"), every=1)
    out = {r["id"]: r for r in hits(edges, verts, n_iter=2, checkpointer=ckpt).collect()}

    import os

    iter_dirs = sorted(
        d for d in os.listdir(tmp_path / "hits") if d.startswith("iter=")
    )
    assert iter_dirs[0] == "iter=000000"
    for d in iter_dirs:
        df = spark.read.parquet(str(tmp_path / "hits" / d))
        assert sorted(df.columns) == ["auth", "h_raw", "id"]
    # latest() resumes with ONE derivation rule, no iteration branching
    last = spark.read.parquet(str(tmp_path / "hits" / iter_dirs[-1]))
    s = last.agg(F.sum("h_raw")).collect()[0][0]
    for r in last.collect():
        assert abs(r["h_raw"] / s - out[r["id"]]["hub"]) < 1e-12
        assert abs(r["auth"] - out[r["id"]]["auth"]) < 1e-12


# --------------------------------------------- dedup persist lifecycle


def test_dedup_operators_release_persisted_tables(spark):
    """jaccard_pairs / simhash_near_pairs leave no persisted RDDs
    behind (eager-materialize-then-unpersist, like count_matches)."""
    from graphminer_spark.textops.dedup import jaccard_pairs, simhash_near_pairs

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different text with no overlap at all"),
        ],
        "doc_id long, text string",
    )
    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    pairs = jaccard_pairs(docs, 0.3)
    assert pairs.count() >= 1  # docs 1 and 2 are near-dups
    sim = simhash_near_pairs(docs)
    sim.count()
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    # each call may leave its OWN eager-materialized result checkpoint
    # (released when the Python ref drops); the internal shingle /
    # simhash persists must be gone — they'd double the delta
    leaked = after - before
    assert len(leaked) <= 2, f"internal persisted tables leaked: {leaked}"


# ---------------------------------------- wedge-close cycle rewrite


def test_wedge_close_agrees_with_extend_probe(spark):
    """The >=4-cycle wedge-close rewrite (subgraph.py level loop) must
    count exactly what the extend-then-probe path counts, on a random
    graph dense enough that pentagons/houses/4-cycles all appear."""
    import graphminer_spark.algorithms.subgraph as sg
    from graphminer_spark.algorithms.subgraph import SGL_PATTERNS, count_matches

    sym = symmetrize(edges_df(spark, _random_graph(60, 500, seed=11)))
    sym = sym.persist()
    sym.count()
    try:
        for name in ("pentagon", "house", "rectangle", "hexagon"):
            if name not in SGL_PATTERNS:
                continue
            spec = SGL_PATTERNS[name]
            sg.WEDGE_CLOSE = True
            a = count_matches(sym, spec).collect()[0][0]
            sg.WEDGE_CLOSE = False
            b = count_matches(sym, spec).collect()[0][0]
            assert a == b, (name, a, b)
    finally:
        sg.WEDGE_CLOSE = True
        sym.unpersist()


# ---------------------------------------- color-coding approx paths


@pytest.mark.parametrize("k", [3, 4, 5])
def test_colorful_path_count_matches_brute_force(spark, k):
    """Colorful k-path count vs a literal python brute force using the
    SAME md5-derived colors; the estimate column must be exactly
    colorful * k^k // k! (FASCIA/Motivo scale)."""
    import hashlib
    import math

    from graphminer_spark.algorithms.approx import colorful_path_count

    edges = _random_graph(30, 90, seed=7)
    canon = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    adj = {}
    for a, b in canon:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    def color(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) % k

    def paths(colorful_only):
        cnt = 0
        stack = [(v,) for v in adj]
        while stack:
            walk = stack.pop()
            if len(walk) == k:
                if walk[0] < walk[-1] and (
                    not colorful_only
                    or len({color(x) for x in walk}) == k
                ):
                    cnt += 1
                continue
            for nxt in adj[walk[-1]]:
                if nxt not in walk:
                    stack.append(walk + (nxt,))
        return cnt

    want = paths(colorful_only=True)
    sym = symmetrize(edges_df(spark, edges))
    row = colorful_path_count(sym, k=k).collect()[0]
    assert row["colorful_paths"] == want
    assert row["est_paths"] == want * k**k // math.factorial(k)

    # estimator sanity on this fixture: within 2x of the exact count
    exact = paths(colorful_only=False)
    assert exact / 2 <= row["est_paths"] <= exact * 2


def test_colorful_path_rejects_bad_k(spark):
    from graphminer_spark.algorithms.approx import colorful_path_count, vertex_color
    from pyspark.sql import functions as F

    sym = symmetrize(edges_df(spark, [(0, 1)]))
    with pytest.raises(ValueError):
        colorful_path_count(sym, k=6)
    with pytest.raises(ValueError):
        vertex_color(F.col("id"), 1)


def test_colorful_dp_agrees_with_enumeration(spark):
    """The FASCIA color-set DP and the walk enumeration are two
    independent implementations of the colorful path count — they
    must agree exactly, per k."""
    from graphminer_spark.algorithms.approx import (
        colorful_path_count,
        colorful_path_count_dp,
    )

    sym = symmetrize(edges_df(spark, _random_graph(40, 140, seed=3)))
    sym = sym.persist()
    sym.count()
    try:
        for k in (3, 4, 5):
            a = colorful_path_count(sym, k=k).collect()[0]
            b = colorful_path_count_dp(sym, k=k).collect()[0]
            assert a["colorful_paths"] == b["colorful_paths"], (k, a, b)
            assert a["est_paths"] == b["est_paths"], (k, a, b)
    finally:
        sym.unpersist()


def test_colorful_dp_multicoloring(spark):
    """R salted colorings in one plan: R=1 matches the un-salted DP
    bit for bit; R=4's averaged estimate is at least as close to the
    exact simple-path count as the worst single coloring, and each
    per-salt count matches a python brute force with the same salted
    colors."""
    import hashlib
    import math

    from graphminer_spark.algorithms.approx import (
        colorful_path_count,
        colorful_path_count_dp,
    )

    k = 4
    edges = _random_graph(35, 110, seed=19)
    canon = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    adj = {}
    for a, b in canon:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    def color(v, r):
        key = f"{r}:{v}" if r is not None else str(v)
        return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % k

    def colorful(r):
        cnt = 0
        stack = [(v,) for v in adj]
        while stack:
            walk = stack.pop()
            if len(walk) == k:
                if walk[0] < walk[-1] and len(
                    {color(x, r) for x in walk}
                ) == k:
                    cnt += 1
                continue
            for nxt in adj[walk[-1]]:
                if nxt not in walk:
                    stack.append(walk + (nxt,))
        return cnt

    sym = symmetrize(edges_df(spark, edges))
    base = colorful_path_count_dp(sym, k=k).collect()[0]
    assert base["colorful_paths"] == colorful(None)
    assert (
        base["colorful_paths"]
        == colorful_path_count(sym, k=k).collect()[0]["colorful_paths"]
    )

    R = 4
    row = colorful_path_count_dp(sym, k=k, n_colorings=R).collect()[0]
    total = sum(colorful(r) for r in range(R))
    assert row["colorful_paths"] == total
    num, den = 256, 24
    assert row["est_paths"] == total * num // (den * R)


def test_colorful_tree_dp(spark):
    """FASCIA rooted-tree DP: the path tree must reproduce the path
    DP exactly; star and chair trees match a python backtracking
    brute force using the same md5 colors."""
    import hashlib

    from graphminer_spark.algorithms.approx import (
        colorful_path_count_dp,
        colorful_tree_count,
        tree_automorphisms,
    )

    edges = _random_graph(35, 110, seed=23)
    canon = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    adj = {}
    for a, b in canon:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    def brute(tree_edges):
        nodes = sorted({v for e in tree_edges for v in e})
        k = len(nodes)

        def color(v):
            return int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) % k

        tadj = {v: set() for v in nodes}
        for a, b in tree_edges:
            tadj[a].add(b)
            tadj[b].add(a)
        order = [0]
        parent = {}
        for v in order:
            for u in sorted(tadj[v]):
                if u not in parent and u != 0:
                    parent[u] = v
                    order.append(u)
        maps = 0

        def extend(i, phi):
            nonlocal maps
            if i == k:
                maps += 1
                return
            t = order[i]
            for g in adj.get(phi[parent[t]], ()):
                if color(g) in {color(x) for x in phi.values()}:
                    continue
                phi[t] = g
                extend(i + 1, phi)
                del phi[t]

        for g0 in adj:
            extend(1, {0: g0})
        return maps // tree_automorphisms(tree_edges)

    sym = symmetrize(edges_df(spark, edges))
    sym = sym.persist()
    sym.count()
    try:
        # path tree == the specialized path DP
        path4 = ((0, 1), (1, 2), (2, 3))
        a = colorful_tree_count(sym, path4).collect()[0]
        b = colorful_path_count_dp(sym, k=4).collect()[0]
        assert a["colorful_trees"] == b["colorful_paths"]
        assert a["est_trees"] == b["est_paths"]

        for tree in (
            ((0, 1), (0, 2), (0, 3)),  # star4, |Aut| = 6
            ((0, 1), (1, 2), (2, 3), (1, 4)),  # chair, |Aut| = 2
        ):
            got = colorful_tree_count(sym, tree).collect()[0]
            assert got["colorful_trees"] == brute(tree), tree
    finally:
        sym.unpersist()


def test_colorful_dp_plans_stay_jvm_side(spark):
    """The color-coding DP plans are pure JVM expressions: no per-row
    Python (BatchEvalPython), and the color derivation (md5/conv/
    shiftleft) folds into the scans/joins."""
    from graphminer_spark.algorithms.approx import (
        colorful_path_count_dp,
        colorful_tree_count,
    )

    sym = symmetrize(edges_df(spark, _random_graph(30, 90, seed=5)))

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    p = plan(colorful_path_count_dp(sym, k=4))
    assert "BatchEvalPython" not in p
    assert "md5" in p and "shiftleft" in p

    # tree DP materializes eagerly (localCheckpoint) — assert on the
    # pre-aggregation state instead
    t = plan(colorful_tree_count(sym, ((0, 1), (0, 2), (0, 3))))
    assert "BatchEvalPython" not in t
