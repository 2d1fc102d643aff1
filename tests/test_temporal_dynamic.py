"""Temporal triangle counting and incremental (delta) triangle
maintenance vs brute-force / recount oracles."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from graphminer_spark.algorithms.temporal import (
    incremental_triangles,
    temporal_triangle_count,
)
from graphminer_spark.algorithms.triangles import triangle_count
from graphminer_spark.graph.build import build_dag
from tests.conftest import edges_df


def _brute_temporal(tedges, delta):
    """O(m³) reference count of ordered δ-window temporal triangles."""
    n = 0
    for (u, v, t1), (x, w, t2), (a, b, t3) in itertools.product(
        tedges, repeat=3
    ):
        if x == v and a == u and b == w:
            if t1 < t2 < t3 <= t1 + delta:
                n += 1
    return n


def test_temporal_triangles_vs_brute(spark):
    rng = random.Random(5)
    tedges = sorted(
        {
            (min(a, b), max(a, b), rng.randrange(100))
            for a, b in (
                (rng.randrange(12), rng.randrange(12)) for _ in range(120)
            )
            if a != b
        }
    )
    df = spark.createDataFrame(tedges, "src long, dst long, t long")
    for delta in (5, 20, 100):
        got = temporal_triangle_count(df, delta).collect()[0][0]
        assert got == _brute_temporal(tedges, delta), delta


def test_temporal_window_monotone(spark):
    rng = random.Random(9)
    tedges = sorted(
        {
            (min(a, b), max(a, b), rng.randrange(1000))
            for a, b in (
                (rng.randrange(30), rng.randrange(30)) for _ in range(400)
            )
            if a != b
        }
    )
    df = spark.createDataFrame(tedges, "src long, dst long, t long")
    counts = [
        temporal_triangle_count(df, d).collect()[0][0] for d in (10, 100, 1000)
    ]
    assert counts == sorted(counts) and counts[-1] > 0


def test_incremental_matches_recount(spark):
    """delta count == full recount minus old-graph recount, for a
    hash-split insert batch (the production access pattern)."""
    rng = random.Random(3)
    canon = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randrange(60), rng.randrange(60)) for _ in range(700)
            )
            if a != b
        }
    )
    full = edges_df(spark, canon)
    key = F.md5(F.concat_ws(":", "src", "dst"))
    old, delta = full.filter(key >= "2"), full.filter(key < "2")

    t_full = triangle_count(build_dag(full)).collect()[0][0]
    t_old = triangle_count(build_dag(old)).collect()[0][0]
    row = incremental_triangles(old, delta).collect()[0]
    assert row["n_new_triangles"] == t_full - t_old > 0
    assert row["n_delta_edges"] == delta.count() > 0
