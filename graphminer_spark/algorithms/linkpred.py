"""Neighborhood-based link prediction over the symmetric edge table.

For every non-adjacent vertex pair (u, v) that shares at least one
common neighbor, score the candidate edge with the four classic
similarity indices (Liben-Nowell & Kleinberg, CIKM'03):

  common_neighbors  |Γ(u) ∩ Γ(v)|
  jaccard           |Γ(u) ∩ Γ(v)| / |Γ(u) ∪ Γ(v)|
  adamic_adar       Σ_{w ∈ Γ(u)∩Γ(v)} 1 / ln(deg(w))
  resource_alloc    Σ_{w ∈ Γ(u)∩Γ(v)} 1 / deg(w)

This is the "which hrefs are missing" workload on a web link graph —
the candidate generator is the SAME open-wedge stream the triangle
counter consumes (reference kernel shape:
``/root/reference/src/triangle/omp_base.cc:15-30``), so every scale
property TC has carries over: one equi-join on the wedge midpoint,
partial-aggregatable groupBy, no driver state.

Scale: the wedge stream is Σ deg² rows. At 10^12-page scale the
unbounded all-pairs form is intractable BY DEFINITION (output itself
is Σ deg²); production use bounds it with ``max_deg`` — wedges are
only generated through midpoints with deg ≤ max_deg, which is both
the standard practice (hub midpoints contribute near-zero AA/RA
weight: 1/ln(deg) → 0) and what keeps the join skew-free. The
unbounded default is exact and is what the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def link_prediction_scores(
    sym_edges: DataFrame,
    top_n: int | None = None,
    max_deg: int | None = None,
) -> DataFrame:
    """Score non-adjacent pairs with ≥1 common neighbor.

    Returns ``(u, v, cn, jaccard_s, aa_s, ra_s)`` with u < v; floats
    rendered at 6 decimals for engine-exact comparison. ``top_n``
    keeps the strongest candidates by the integer-deterministic order
    (cn DESC, u, v). ``max_deg`` drops hub midpoints from the wedge
    stream (recall/latency knob for the 100 TB run; None = exact).
    """
    e = sym_edges.select("src", "dst")
    deg = e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    adj = e.join(deg, e["src"] == deg["id"]).select(
        F.col("src").alias("w"), "dst", F.col("deg").alias("wdeg")
    )
    if max_deg is not None:
        adj = adj.filter(F.col("wdeg") <= max_deg)
    a = adj.select("w", F.col("dst").alias("u"), "wdeg")
    b = adj.select(F.col("w").alias("w2"), F.col("dst").alias("v"))
    wedges = a.join(
        b, (F.col("w") == F.col("w2")) & (F.col("u") < F.col("v"))
    ).select("u", "v", "wdeg")
    # drop pairs already linked (canonical undirected form)
    exist = sym_edges.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    cand = wedges.join(exist, ["u", "v"], "left_anti")
    scores = cand.groupBy("u", "v").agg(
        F.count("*").alias("cn"),
        F.sum(F.lit(1.0) / F.log(F.col("wdeg").cast("double"))).alias("aa"),
        F.sum(F.lit(1.0) / F.col("wdeg").cast("double")).alias("ra"),
    )
    du = deg.select(F.col("id").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("deg").alias("dv"))
    out = (
        scores.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            "cn",
            F.format_string(
                "%.6f",
                F.col("cn").cast("double")
                / (F.col("du") + F.col("dv") - F.col("cn")).cast("double"),
            ).alias("jaccard_s"),
            F.format_string("%.6f", F.col("aa")).alias("aa_s"),
            F.format_string("%.6f", F.col("ra")).alias("ra_s"),
        )
    )
    if top_n is not None:
        out = out.orderBy(F.desc("cn"), "u", "v").limit(top_n)
    return out
