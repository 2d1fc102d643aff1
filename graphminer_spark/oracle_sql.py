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

# CTE list WITHOUT the leading WITH keyword, so composers can choose
# WITH vs WITH RECURSIVE
GRAPH_CTES = f"{EDGES_SQL.removeprefix('WITH ')}, {SYM_SQL}, {DEG_SQL}, {DAG_SQL}"


def graph_query(body: str, with_tri: bool = False) -> str:
    ctes = GRAPH_CTES + (", " + TRI_SQL if with_tri else "")
    return f"WITH {ctes} {body}"


# --------------------------------------------------------------- iterative

# connected components: min-label fixpoint via recursive CTE (exact
# oracle for the large-star/small-star result)
CC_SQL = f"""
WITH RECURSIVE {GRAPH_CTES},
verts AS (SELECT id FROM deg),
reach(v, r) AS (
  SELECT id, id FROM verts
  UNION
  SELECT reach.v, s.dst FROM reach JOIN sym s ON s.src = reach.r
)
SELECT v AS id, min(r) AS component FROM reach GROUP BY v
""".strip()


def _lp_step(prev: str, step: str) -> str:
    """One synchronous LP superstep: argmax neighbor-label count, ties
    to the smallest label (matches algorithms.labelprop)."""
    return f"""
cnt_{step} AS (
  SELECT s.dst AS id, l.label, count(*) AS cnt
  FROM sym s JOIN {prev} l ON l.id = s.src
  GROUP BY s.dst, l.label
),
best_{step} AS (
  SELECT id, min(label) AS new_label FROM (
    SELECT id, label, cnt, max(cnt) OVER (PARTITION BY id) AS mx
    FROM cnt_{step}
  ) WHERE cnt = mx GROUP BY id
),
{step} AS (
  SELECT v.id, coalesce(b.new_label, v.id) AS label
  FROM verts v LEFT JOIN best_{step} b ON b.id = v.id
)
""".strip()


def lp_sql(n_iter: int) -> str:
    parts = [
        GRAPH_CTES,
        "verts AS (SELECT id FROM deg)",
        "lp0 AS (SELECT id, id AS label FROM verts)",
    ]
    for k in range(1, n_iter + 1):
        parts.append(_lp_step(f"lp{k - 1}", f"lp{k}"))
    return f"WITH {', '.join(parts)} SELECT id, label FROM lp{n_iter}"


def _pr_step(prev: str, step: str, damping: float) -> str:
    """One power-iteration superstep with dangling-mass redistribution
    over the *directed* canonical edges (src → dst)."""
    return f"""
dang_{step} AS (
  SELECT coalesce(sum(r.rank), 0.0) AS mass
  FROM {prev} r LEFT JOIN od ON od.id = r.id WHERE od.out_deg IS NULL
),
contrib_{step} AS (
  SELECT e.dst AS id, sum(r.rank / od.out_deg) AS c
  FROM edges e JOIN {prev} r ON r.id = e.src JOIN od ON od.id = e.src
  GROUP BY e.dst
),
{step} AS (
  SELECT v.id,
         (1.0 - {damping}) / nv.n + {damping} * (coalesce(c.c, 0.0) + d.mass / nv.n) AS rank
  FROM verts v CROSS JOIN nv CROSS JOIN dang_{step} d
  LEFT JOIN contrib_{step} c ON c.id = v.id
)
""".strip()


def pagerank_sql(n_iter: int, damping: float = 0.85, decimals: int = 6) -> str:
    parts = [
        GRAPH_CTES,
        "verts AS (SELECT id FROM deg)",
        "nv AS (SELECT cast(count(*) AS double) AS n FROM verts)",
        "od AS (SELECT src AS id, cast(count(*) AS double) AS out_deg FROM edges GROUP BY src)",
        "pr0 AS (SELECT id, 1.0 / nv.n AS rank FROM verts CROSS JOIN nv)",
    ]
    for k in range(1, n_iter + 1):
        parts.append(_pr_step(f"pr{k - 1}", f"pr{k}", damping))
    return (
        f"WITH {', '.join(parts)} "
        f"SELECT id, printf('%.{decimals}f', rank) AS rank_s FROM pr{n_iter}"
    )
