"""Temporal and dynamic (incremental) graph pattern mining.

The reference keeps these as curated workload families
(``/root/reference/src/temporal/README.md``: temporal motif counting,
WSDM'17; ``/root/reference/src/dynamic/README.md``: pattern mining on
evolving graphs, Tesseract/TurboFlux). One representative operator per
family, Spark-first:

* ``temporal_triangle_count`` — δ-window ordered temporal triangles
  (the WSDM'17 motif-counting primitive): equi-joins on vertex keys do
  the heavy distribution, the time-window predicate is a cheap
  post-join filter, so the plan is the ordinary TC wedge join plus one
  comparison — no new shuffle structure at 100 TB.
* ``incremental_triangles`` — given a batch of newly-inserted edges
  ΔE, count the triangles that use ≥1 new edge WITHOUT recounting the
  old graph: join ΔE against the full adjacency (work ∝ |Δ|·deḡ, not
  |E|·deḡ), dedup multi-hit triangles by canonical triple. This is the
  per-batch delta a streaming pattern-mining pipeline maintains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deterministic per-lineitem timestamp (seconds within a day) — integer
# arithmetic only so the DuckDB oracle derives the identical value
TEMPORAL_T_SQL = "(l_orderkey * 7 + l_partkey * 3 + l_linenumber * 11) % 86400"


def temporal_edges_sql(divisor: int = 60) -> str:
    """Timestamped multi-edge CTE (``tedges(src, dst, t)``) shared by
    the Spark derivation and the DuckDB oracle."""
    return f"""
WITH _v AS (
  SELECT greatest(100, count(*) // {divisor}) AS nv FROM lineitem
),
tedges AS MATERIALIZED (
  SELECT DISTINCT least(a, b) AS src, greatest(a, b) AS dst, t
  FROM (
    SELECT l_orderkey % nv AS a,
           (l_partkey + 7 * l_suppkey + 13 * l_linenumber) % nv AS b,
           {TEMPORAL_T_SQL} AS t
    FROM lineitem CROSS JOIN _v
  ) WHERE a <> b
)
""".strip()


def temporal_edges(spark, sf_dir: str, divisor: int = 60) -> DataFrame:
    """Canonical timestamped edge list ``(src, dst, t)`` — the same
    derivation as ``tpch_edges`` but keeping one row per (edge,
    timestamp) so temporal multiplicity survives."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"
    )
    nv = max(100, li.count() // divisor)
    ln = F.col("l_linenumber").cast("long")
    a = F.col("l_orderkey") % F.lit(nv)
    b = (F.col("l_partkey") + 7 * F.col("l_suppkey") + 13 * ln) % F.lit(nv)
    t = (F.col("l_orderkey") * 7 + F.col("l_partkey") * 3 + ln * 11) % F.lit(
        86400
    )
    return (
        li.select(a.alias("a"), b.alias("b"), t.alias("t"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("src"),
            F.greatest("a", "b").alias("dst"),
            "t",
        )
        .distinct()
    )


def temporal_triangle_count(tedges: DataFrame, delta: int) -> DataFrame:
    """Ordered δ-window temporal triangles (WSDM'17 motif semantics,
    one fixed ordering σ): triples u<v<w with temporal edges
    (u,v,t1), (v,w,t2), (u,w,t3) such that t1 < t2 < t3 ≤ t1 + δ.

    Plan: two equi-joins on vertex keys (identical shape to the exact
    TC wedge join — the scalable part), then the strictly-ordered
    window predicate as a post-join filter. Multi-edges contribute one
    count per qualifying timestamp combination.

    Output: one row ``(n_temporal_triangles: long)``.
    """
    e1 = tedges.select(
        F.col("src").alias("u"), F.col("dst").alias("v"), F.col("t").alias("t1")
    )
    e2 = tedges.select(
        F.col("src").alias("v"), F.col("dst").alias("w"), F.col("t").alias("t2")
    )
    e3 = tedges.select(
        F.col("src").alias("u"), F.col("dst").alias("w"), F.col("t").alias("t3")
    )
    tri = (
        e1.join(e2, "v")
        .join(e3, ["u", "w"])
        .filter(
            (F.col("t1") < F.col("t2"))
            & (F.col("t2") < F.col("t3"))
            & (F.col("t3") <= F.col("t1") + delta)
        )
    )
    return tri.agg(F.count("*").alias("n_temporal_triangles"))


def temporal_tri_sql(delta: int, divisor: int = 60) -> str:
    """DuckDB oracle for ``temporal_triangle_count`` over the shared
    ``tedges`` CTE (canonical src<dst endpoints ⇒ the u<v<w triple is
    exactly the e1/e2/e3 join below)."""
    return f"""
{temporal_edges_sql(divisor)}
SELECT count(*) AS n_temporal_triangles
FROM tedges e1
JOIN tedges e2 ON e2.src = e1.dst
JOIN tedges e3 ON e3.src = e1.src AND e3.dst = e2.dst
WHERE e1.t < e2.t AND e2.t < e3.t AND e3.t <= e1.t + {delta}
""".strip()


def incremental_triangles(
    old_edges: DataFrame, delta_edges: DataFrame
) -> DataFrame:
    """Triangles gained by inserting ``delta_edges`` into the graph:
    count triangles of G∪Δ that use at least one Δ edge.

    Incremental plan (never recounts G): symmetrize the FULL adjacency
    once, join each Δ edge (u,v) against N(u) and N(v) to find common
    neighbors w, canonicalize the triple and dedup — a triangle with
    2–3 new edges is found once per new edge, ``distinct`` collapses
    it. Work is Σ_{(u,v)∈Δ} (deg u + deg v), so per-batch cost follows
    the batch, not the accumulated graph — the property a streaming
    miner needs (Tesseract's delta-enumeration argument).

    Output: one row ``(n_delta_edges: long, n_new_triangles: long)``.
    """
    full = old_edges.unionByName(delta_edges)
    sym = full.unionByName(
        full.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    nu = sym.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    nv = sym.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    cand = (
        delta_edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .join(nu, "u")
        .join(nv, ["v", "w"])
    )
    tri = cand.select(
        F.array_sort(F.array("u", "v", "w")).alias("abc")
    ).distinct()
    n_delta = delta_edges.count()
    return tri.agg(
        F.lit(n_delta).cast("long").alias("n_delta_edges"),
        F.count("*").alias("n_new_triangles"),
    )
