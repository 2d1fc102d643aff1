"""2D partitioning + block-local triangle counting
(``graph_partition.cc:138-226`` analogue; Suri & Vassilvitskii
triple-block scheme). Agreement vs the wedge-join plan and vs the
brute-force oracle, multiplicity math exactness, and hub skew."""

from __future__ import annotations

import random

import pytest

from graphminer_spark.algorithms.triangles import triangle_count
from graphminer_spark.graph.build import build_dag
from graphminer_spark.graph.partition2d import (
    assign_clusters,
    block_sizes,
    partition_2d,
    triangle_count_2d,
)
from graphminer_spark.oracles import brute_triangles
from tests.conftest import edges_df


def _random_graph(n: int, m: int, seed: int) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]


@pytest.mark.parametrize("nc", [3, 4, 6])
def test_2d_matches_brute_and_global(spark, nc):
    raw = _random_graph(60, 400, seed=nc)
    e = edges_df(spark, raw)
    dag = build_dag(e)
    expected, _ = brute_triangles(raw)
    assert triangle_count(dag).collect()[0][0] == expected
    assert triangle_count_2d(dag, nc=nc).collect()[0][0] == expected


def test_2d_on_hub_graph(spark):
    """A 2000-degree hub: every triangle goes through the hub's
    cluster, the worst balance case for 2D blocking. Count stays
    exact (replication multiplicities handle the mono-cluster and
    two-cluster triangles the hub concentrates)."""
    h = 2000
    raw = [(0, i) for i in range(1, h + 1)]
    raw += [(i, i + 1) for i in range(1, 300)]  # 299 hub triangles
    e = edges_df(spark, raw)
    dag = build_dag(e)
    assert triangle_count_2d(dag, nc=4).collect()[0][0] == 299


def test_2d_rejects_small_nc(spark):
    e = edges_df(spark, [(0, 1), (1, 2), (0, 2)])
    with pytest.raises(ValueError):
        triangle_count_2d(build_dag(e), nc=2).collect()


def test_partition_2d_blocks_cover_all_edges(spark):
    """Every edge lands in exactly one (c_src, c_dst) block and the
    flat pid matches the reference's ``src_cid * nc + dst_cid``
    layout (``graph_partition.cc:231-239``)."""
    raw = _random_graph(50, 300, seed=7)
    e = edges_df(spark, raw)
    nc = 5
    tagged = partition_2d(e, nc).collect()
    assert len(tagged) == e.count()
    for r in tagged:
        assert 0 <= r["c_src"] < nc and 0 <= r["c_dst"] < nc
        assert r["pid"] == r["c_src"] * nc + r["c_dst"]
    sizes = block_sizes(e, nc)
    assert sizes.agg({"n_edges": "sum"}).collect()[0][0] == e.count()


def test_cluster_assignment_deterministic(spark):
    """Stage retries / resumed runs must land identical blocks —
    cluster ids are a pure hash of the vertex id."""
    e = edges_df(spark, _random_graph(40, 150, seed=3))
    a = sorted(map(tuple, assign_clusters(e, 4).collect()))
    b = sorted(map(tuple, assign_clusters(e, 4).collect()))
    assert a == b
