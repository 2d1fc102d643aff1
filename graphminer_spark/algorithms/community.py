"""Community quality metrics over a vertex labeling.

Newman modularity of a partition (labels from LP, CC, or any
``(id, label)`` table):

    Q = Σ_c [ m_c / m  −  (d_c / 2m)² ]

computed over the symmetric edge view as

    Q = intra / |sym|  −  Σ_c (d_c / |sym|)²

(intra = same-label rows of ``sym``, counted twice like |sym| = 2m,
so the ratio is exact; d_c = Σ deg over the community). This is the
standard convergence/quality metric a label-propagation pipeline
reports per sweep — the reference's LP kernel tracks changed-vertex
counts only; modularity is the publishable analogue.

Scale: two hash joins of labels onto the edge table (same shuffle key
as the LP superstep itself, so co-partitioning is reused), one
groupBy(label) — no step is heavier than one LP iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def modularity(sym_edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Single-row ``(q_s)`` — modularity at 6 decimals.

    ``labels`` is ``(id, label)`` covering every vertex of
    ``sym_edges``.
    """
    e = sym_edges.select("src", "dst")
    la = labels.select(F.col("id").alias("src"), F.col("label").alias("ls"))
    lb = labels.select(F.col("id").alias("dst"), F.col("label").alias("ld"))
    tagged = e.join(la, "src").join(lb, "dst")
    m2_intra = tagged.agg(
        F.count("*").alias("m2"),
        F.sum((F.col("ls") == F.col("ld")).cast("long")).alias("intra"),
    )
    deg = e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    dc = (
        deg.join(labels, "id")
        .groupBy("label")
        .agg(F.sum("deg").alias("dsum"))
    )
    # Σ_c dsum² is exact in integers; divide once at the end
    sq = dc.agg(F.sum(F.col("dsum") * F.col("dsum")).alias("sumsq"))
    return (
        m2_intra.crossJoin(sq)
        .select(
            F.format_string(
                "%.6f",
                F.col("intra").cast("double") / F.col("m2").cast("double")
                - F.col("sumsq").cast("double")
                / (F.col("m2").cast("double") * F.col("m2").cast("double")),
            ).alias("q_s")
        )
    )


def modularity_body_sql(labels_cte: str) -> str:
    """DuckDB body computing the same Q given a CTE name holding
    ``(id, label)``. Integer numerators (count / Σ dsum²) make the
    only float ops two divisions and one subtraction — engine-exact
    at 6 decimals."""
    return f"""
SELECT printf('%.6f',
  (SELECT sum(CASE WHEN a.label = b.label THEN 1 ELSE 0 END)::DOUBLE
   FROM sym s JOIN {labels_cte} a ON a.id = s.src
   JOIN {labels_cte} b ON b.id = s.dst)
  / (SELECT count(*)::DOUBLE FROM sym)
  - (SELECT sum(dsum * dsum)::DOUBLE FROM (
       SELECT l.label, sum(d.deg) AS dsum FROM deg d
       JOIN {labels_cte} l ON l.id = d.id GROUP BY l.label))
    / ((SELECT count(*)::DOUBLE FROM sym) * (SELECT count(*)::DOUBLE FROM sym))
) AS q_s
""".strip()
