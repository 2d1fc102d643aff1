"""ANSI-SQL oracle statements (DuckDB dialect) mirroring each Spark
query in ``__spark_entry__.queries()``.

Every statement runs against the driver's pre-registered parquet views
(region nation customer supplier part orders lineitem events documents
embeddings) and must return the same rows/columns as the Spark query —
the driver compares row count, schema and an order-insensitive value
hash. All graph oracles build the edge table with the shared
``EDGES_SQL`` CTE (integer arithmetic only → exact agreement).
"""

from __future__ import annotations

from graphminer_spark.graph.tpch_edges import EDGES_SQL

# symmetric (both directions) view on top of the canonical edges CTE
SYM_SQL = (
    "sym AS (SELECT src, dst FROM edges "
    "UNION ALL SELECT dst AS src, src AS dst FROM edges)"
)

DEG_SQL = "deg AS (SELECT src AS id, count(*) AS deg FROM sym GROUP BY src)"

# degree-ordered DAG: keep u→v iff (deg(v), v) > (deg(u), u)
DAG_SQL = """
dag AS (
  SELECT CASE WHEN keep_fwd THEN src ELSE dst END AS src,
         CASE WHEN keep_fwd THEN dst ELSE src END AS dst
  FROM (
    SELECT e.src, e.dst,
           (dv.deg > du.deg OR (dv.deg = du.deg AND e.dst > e.src)) AS keep_fwd
    FROM edges e
    JOIN deg du ON du.id = e.src
    JOIN deg dv ON dv.id = e.dst
  )
)
""".strip()

TRI_SQL = """
tri AS (
  SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
  FROM dag e1
  JOIN dag e2 ON e1.dst = e2.src
  JOIN dag e3 ON e3.src = e1.src AND e3.dst = e2.dst
)
""".strip()

GRAPH_PREFIX = f"{EDGES_SQL}, {SYM_SQL}, {DEG_SQL}, {DAG_SQL}"


def graph_query(body: str, with_tri: bool = False) -> str:
    prefix = GRAPH_PREFIX + (", " + TRI_SQL if with_tri else "")
    return f"{prefix} {body}"
