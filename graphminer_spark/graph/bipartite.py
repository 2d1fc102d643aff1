"""Bipartite graphs: two vertex classes and the butterfly workload.

The reference loads bipartite graphs as two vertex ranges
(``n_vert0`` / ``n_vert1``, ``/root/reference/src/common/graph.cc:24-27``,
``include/graph.h:25-26``); here the two classes are real entity key
spaces and the edge table carries one column per side — no interleaved
id range needed.

The derivation is the natural bipartite relation already in the
testdata: supplier u supplies part v (distinct ``(l_suppkey,
l_partkey)`` pairs of lineitem) — pure integer SQL, so DuckDB agrees
exactly.

Butterflies (2×2 bicliques — the bipartite analogue of the rectangle
kernel, ``src/sgl/cpu_kernels/rectangle.h``) are counted from
supplier-side wedges: each butterfly has exactly one supplier pair, so
``Σ_{u<u'} C(codeg(u,u'), 2)`` counts each exactly once. The wedge
join pivots on the part side; at web scale a hot part is rank-bounded
exactly like ``rectangle_count`` — here the supplier side is small and
the plan is a single groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphminer_spark.algorithms.motifs import _c2

BIP_SQL = """
bip AS MATERIALIZED (
  SELECT DISTINCT l_suppkey AS u, l_partkey AS v FROM lineitem
)
""".strip()


def bipartite_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct supplier→part edges ``(u, v)``."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.select(
        F.col("l_suppkey").cast("long").alias("u"),
        F.col("l_partkey").cast("long").alias("v"),
    ).distinct()


def bipartite_degrees(bip: DataFrame) -> DataFrame:
    """Per-vertex degree with its side → ``(side, id, deg)``; the
    relational form of the reference's per-class vertex ranges."""
    u = bip.groupBy(F.col("u").alias("id")).agg(F.count("*").alias("deg"))
    v = bip.groupBy(F.col("v").alias("id")).agg(F.count("*").alias("deg"))
    return (
        u.select(F.lit(0).alias("side"), "id", "deg")
        .unionByName(v.select(F.lit(1).alias("side"), "id", "deg"))
    )


def butterfly_count(bip: DataFrame) -> DataFrame:
    """Total butterflies (2×2 bicliques) → single row
    ``(n_butterflies: long)``."""
    e1 = bip.select(F.col("v").alias("p"), F.col("u").alias("a"))
    e2 = bip.select(F.col("v").alias("p"), F.col("u").alias("b"))
    codeg = (
        e1.join(e2, "p")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("c"))
    )
    return codeg.agg(
        F.coalesce(F.sum(_c2(F.col("c"))), F.lit(0)).alias("n_butterflies")
    )


BIP_DEGREES_SQL = f"""
WITH {BIP_SQL}
SELECT 0 AS side, u AS id, count(*) AS deg FROM bip GROUP BY u
UNION ALL
SELECT 1 AS side, v AS id, count(*) AS deg FROM bip GROUP BY v
""".strip()

BUTTERFLY_SQL = f"""
WITH {BIP_SQL},
codeg AS (
  SELECT e1.u AS a, e2.u AS b, count(*) AS c
  FROM bip e1 JOIN bip e2 ON e1.v = e2.v AND e1.u < e2.u
  GROUP BY 1, 2
)
SELECT coalesce(sum((c * (c - 1)) // 2), 0)::BIGINT AS n_butterflies
FROM codeg
""".strip()
