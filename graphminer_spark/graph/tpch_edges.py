"""Deterministic edge-table derivation from the driver's testdata.

The correctness gate compares our Spark queries against DuckDB SQL over
the same parquet tables, so the benchmark graph must be *derivable in
pure ANSI SQL*. We fold ``lineitem`` keys into a vertex id space whose
size scales with the data (constant average degree across scale
factors) — integer arithmetic only, so Spark and DuckDB agree exactly.

Edge rule (canonical undirected edge list, ``src < dst``)::

    V   = greatest(100, count(lineitem) / 60)          -- vertex universe
    a   = l_orderkey              % V
    b   = (l_partkey + 7*l_suppkey + 13*l_linenumber) % V
    keep a != b; src = least(a,b); dst = greatest(a,b); DISTINCT

This plays the role of the reference's external graph converters
(``/root/reference/README.md:104-116``: mtx/txt → CSR binary): an
ingest step producing the canonical edge table every algorithm consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VERTEX_DIVISOR = 60
# sparse variant: ~10x more vertices → mean degree ~11 instead of ~113.
# Used by the 5-vertex pattern queries (enumeration cost scales with
# deg^4) and k-core (a degree spread that actually peels).
SPARSE_DIVISOR = 6
MIN_VERTICES = 100


def edges_sql(
    divisor: int = VERTEX_DIVISOR,
    scramble: bool = False,
    sample_mod: int | None = None,
) -> str:
    """SQL fragment (ANSI, runs in DuckDB and Spark alike) producing the
    canonical undirected edge list (src BIGINT, dst BIGINT, src < dst).

    ``scramble=True`` mixes the line number into BOTH endpoints so the
    1-7 lines of an order no longer share a vertex — a near-uniform
    low-degree graph with no clustering hubs (used by the path-pattern
    queries, whose enumeration cost scales with Σ deg^(k-1)).
    ``sample_mod=s`` keeps only orders with ``l_orderkey % s = 0`` —
    a deterministic subsample for enumeration-heavy queries; the
    vertex universe scales with the SAMPLED row count so mean degree
    stays put.
    """
    if scramble:
        a_expr = "(l_orderkey * 131 + l_linenumber * 9973) % nv"
        b_expr = "(l_partkey * 7919 + l_suppkey * 13 + 101) % nv"
    else:
        a_expr = "l_orderkey % nv"
        b_expr = "(l_partkey + 7 * l_suppkey + 13 * l_linenumber) % nv"
    where = f" WHERE l_orderkey % {sample_mod} = 0" if sample_mod else ""
    return f"""
WITH _v AS (
  SELECT greatest({MIN_VERTICES}, count(*) // {divisor}) AS nv
  FROM lineitem{where}
),
_raw AS MATERIALIZED (
  SELECT {a_expr} AS a,
         {b_expr} AS b
  FROM lineitem CROSS JOIN _v{where}
),
edges AS MATERIALIZED (
  SELECT DISTINCT least(a, b) AS src, greatest(a, b) AS dst
  FROM _raw WHERE a <> b
)
""".strip()


EDGES_SQL = edges_sql()


def tpch_edges(
    spark: SparkSession,
    sf_dir: str,
    divisor: int = VERTEX_DIVISOR,
    scramble: bool = False,
    sample_mod: int | None = None,
) -> DataFrame:
    """Canonical undirected edge list from ``{sf_dir}/lineitem.parquet``.

    Uses integer-only expressions; ``//`` (integer division) matches
    DuckDB's BIGINT ``/`` on BIGINT inputs. See ``edges_sql`` for the
    ``scramble`` and ``sample_mod`` variants.
    """
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"
    )
    if sample_mod:
        li = li.filter(F.col("l_orderkey") % sample_mod == 0)
    n = li.count()  # single scalar aggregate; drives the id-space size
    nv = max(MIN_VERTICES, n // divisor)
    ln = F.col("l_linenumber").cast("long")
    if scramble:
        a = (F.col("l_orderkey") * 131 + ln * 9973) % F.lit(nv)
        b = (F.col("l_partkey") * 7919 + F.col("l_suppkey") * 13 + 101) % F.lit(nv)
    else:
        a = F.col("l_orderkey") % F.lit(nv)
        b = (F.col("l_partkey") + F.lit(7) * F.col("l_suppkey") + F.lit(13) * ln) % F.lit(nv)
    return (
        li.select(a.alias("a"), b.alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").cast("long").alias("src"),
            F.greatest("a", "b").cast("long").alias("dst"),
        )
        .distinct()
    )
