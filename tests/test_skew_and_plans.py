"""Hub/salt skew handling correctness + physical-plan quality gates.

Plan gates assert the *shape* Catalyst must produce at any scale:
filters pushed into the parquet scan, small-side broadcasts, no
row-at-a-time Python in JVM pipelines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from graphminer_spark.graph.build import (
    build_dag,
    degrees,
    salt_edges,
    split_hubs,
    symmetrize,
)
from graphminer_spark.graph.synthetic import synthetic_edges
from graphminer_spark.graph.tpch_edges import tpch_edges

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_salted_aggregation_matches_unsalted(spark):
    edges = symmetrize(synthetic_edges(spark, 50_000, 500, skew=3.0), dedup=False)
    deg = degrees(edges)
    hubs, tail = split_hubs(deg, threshold=200)
    assert hubs.count() > 0, "fixture must contain hubs"
    salted = salt_edges(edges, hubs, num_salts=8)
    # two-phase aggregate: per-(src, salt) partials, then re-aggregate
    partial = salted.groupBy("src", "salt").agg(F.count("*").alias("c"))
    two_phase = partial.groupBy("src").agg(F.sum("c").alias("deg"))
    direct = edges.groupBy("src").agg(F.count("*").alias("deg"))
    a = {r["src"]: r["deg"] for r in two_phase.collect()}
    b = {r["src"]: r["deg"] for r in direct.collect()}
    assert a == b


def test_salt_spreads_hub_rows(spark):
    edges = symmetrize(synthetic_edges(spark, 50_000, 500, skew=3.0), dedup=False)
    deg = degrees(edges)
    hubs, _ = split_hubs(deg, threshold=200)
    salted = salt_edges(edges, hubs, num_salts=8)
    hub_id = hubs.orderBy(F.desc("deg")).first()["id"]
    per_salt = (
        salted.filter(F.col("src") == hub_id)
        .groupBy("salt")
        .count()
        .collect()
    )
    assert len(per_salt) == 8  # hub fan-out actually spread
    counts = [r["count"] for r in per_salt]
    assert max(counts) < 2.5 * min(counts)  # roughly balanced
    # non-hub rows keep salt 0
    tail_salts = (
        salted.join(hubs.select(F.col("id").alias("src")), "src", "left_anti")
        .select("salt")
        .distinct()
        .collect()
    )
    assert [r["salt"] for r in tail_salts] == [0]


def test_filter_pushdown_reaches_scan(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.filter(F.col("l_orderkey") == 7).select("l_orderkey", "l_partkey")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,7)" in plan
    # column pruning: scan schema limited to the two referenced columns
    assert "l_extendedprice" not in plan.split("ReadSchema")[1][:200]


def test_dag_build_broadcasts_degrees(spark):
    plan = _plan(build_dag(tpch_edges(spark, SF)))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BatchEvalPython" not in plan  # no per-row python anywhere


def test_tc_plan_no_python_and_codegen(spark):
    from graphminer_spark.algorithms.triangles import triangle_count

    df = triangle_count(build_dag(tpch_edges(spark, SF)))
    df.collect()  # AQE: codegen spans only visible in the final plan
    plan = _plan(df)
    assert "isFinalPlan=true" in plan
    assert "BatchEvalPython" not in plan
    # codegen stages render as "*(n) Operator" in the final plan
    assert "*(" in plan
