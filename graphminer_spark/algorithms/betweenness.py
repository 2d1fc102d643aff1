"""Seeded betweenness centrality (Brandes, J. Math. Soc. 2001).

Exact Brandes dependency accumulation from a deterministic pivot set
(md5(id) % seed_mod == 0 — the Brandes–Pich KDD'07 pivot-sampling
estimator with the repo's standard hash derandomization, so the SQL
oracle can replay every path count and dependency bit-for-bit):

  forward   per-level BFS keyed (seed, v) carrying σ(s,v) — the
            number of shortest s→v paths — as a map-side-combinable
            integer sum per frontier level;
  backward  δ(s,v) = Σ_{w ∈ succ(v)} σ(s,v)/σ(s,w) · (1 + δ(s,w)),
            levels processed deepest-first, one join per level;
  readout   bc(v) = Σ_s δ(s,v) over v ≠ s (pivot-sum estimator;
            the all-sources exact value divides by the pair count).

Superstep shape: every forward level is ONE equi-join of the frontier
against the adjacency plus one aggregate; every backward level is one
3-way equi-join (level_d ⋈ adjacency ⋈ level_{d+1}) plus one
aggregate. State is keyed (seed, vertex) so work scales linearly in
|seeds| and the whole thing shards by vertex like PR/CC/LP — at
10^12-edge scale the seed set IS the throughput knob (Brandes–Pich
show ~O(log n / ε²) pivots suffice).

Reference analogue: GraphMiner has no BC kernel; this completes the
centrality family (clustering/HITS/SALSA/harmonic) with the
shortest-path-based one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphminer_spark.checkpoint import CheckpointManager, superstep_planning


def betweenness_centrality(
    sym_edges: DataFrame,
    seed_mod: int = 2000,
    max_levels: int = 40,
    checkpointer: CheckpointManager | None = None,
    return_levels: bool = False,
) -> DataFrame:
    """``(id, bc_s)`` — pivot-summed Brandes dependency per vertex at
    6 decimals, every vertex present (unreached → 0).

    ``sym_edges`` must be symmetric, deduplicated and loop-free;
    seeds are vertices with ``md5(id) % seed_mod == 0``.
    """
    ckpt = checkpointer or CheckpointManager(None)
    spark = sym_edges.sparkSession
    adj = sym_edges.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    verts = sym_edges.select(F.col("src").alias("id")).distinct()
    seeds = verts.filter(
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % seed_mod
        == 0
    )
    # ---- forward: per-level frontiers carrying sigma ----
    lev = ckpt.save(
        seeds.select(
            F.col("id").alias("s"),
            F.col("id").alias("v"),
            F.lit(1).cast("long").alias("sigma"),
        ),
        0,
        {"algo": "bc", "kind": "fwd"},
    )
    levels = [lev]
    visited = lev.select("s", "v")
    with superstep_planning(spark, sym_edges.count()):
        for d in range(1, max_levels + 1):
            cand = (
                lev.join(adj, "v")
                .groupBy("s", F.col("w").alias("nv"))
                .agg(F.sum("sigma").alias("sigma"))
                .select("s", F.col("nv").alias("v"), "sigma")
            )
            lev = ckpt.save(
                cand.join(visited, ["s", "v"], "left_anti"),
                d,
                {"algo": "bc", "kind": "fwd"},
            )
            if lev.isEmpty():
                break
            levels.append(lev)
            visited = ckpt.save(
                visited.unionByName(lev.select("s", "v")),
                d,
                {"algo": "bc", "kind": "vis"},
            )
        # ---- backward: dependency accumulation, deepest level first ----
        deltas = []
        nxt = levels[-1].withColumn("delta", F.lit(0.0))
        for d in range(len(levels) - 2, -1, -1):
            succ = nxt.select(
                "s",
                F.col("v").alias("w"),
                F.col("sigma").alias("sigma_w"),
                F.col("delta").alias("delta_w"),
            )
            contrib = (
                levels[d]
                .join(adj, "v")
                .join(succ, ["s", "w"])
                .groupBy("s", "v", "sigma")
                .agg(
                    F.sum(
                        F.col("sigma").cast("double")
                        / F.col("sigma_w").cast("double")
                        * (F.lit(1.0) + F.col("delta_w"))
                    ).alias("delta")
                )
            )
            cur = levels[d].join(
                contrib.select("s", "v", "delta"), ["s", "v"], "left"
            ).select("s", "v", "sigma", F.coalesce("delta", F.lit(0.0)).alias("delta"))
            nxt = ckpt.save(cur, d, {"algo": "bc", "kind": "bwd"})
            deltas.append(nxt)
    zero = F.format_string("%.6f", F.lit(0.0)).alias("bc_s")
    if not deltas:  # no seeds, or no seed reaches past itself
        out = verts.select("id", zero)
        return (out, len(levels)) if return_levels else out
    acc = deltas[0].select("s", "v", "delta")
    for t in deltas[1:]:
        acc = acc.unionByName(t.select("s", "v", "delta"))
    bc = (
        acc.filter(F.col("v") != F.col("s"))
        .groupBy(F.col("v").alias("id"))
        .agg(F.sum("delta").alias("bc"))
    )
    out = verts.join(bc, "id", "left").select(
        "id",
        F.format_string("%.6f", F.coalesce("bc", F.lit(0.0))).alias("bc_s"),
    )
    return (out, len(levels)) if return_levels else out


def betweenness_sql(seed_mod: int = 2000, n_levels: int = 15) -> str:
    """DuckDB body (over the shared ``sym``/``deg`` CTEs) replaying
    :func:`betweenness_centrality` with forward and backward phases
    unrolled ``n_levels`` deep. BFS levels are a monotone frontier:
    past the true eccentricity the level CTEs are empty and the
    backward recurrences pass zero through, so a generous unroll is
    exact (pytest asserts the Spark loop's level count < unroll).
    ``sum(sigma)`` is cast ::BIGINT (DuckDB sums BIGINT into HUGEINT;
    Spark stays long)."""
    h = "(('0x' || substr(md5(id::VARCHAR), 1, 8))::BIGINT)"
    parts = [
        f"seeds AS (SELECT src AS id FROM (SELECT DISTINCT src FROM sym) "
        f"WHERE {h.replace('id::VARCHAR', 'src::VARCHAR')} % {seed_mod} = 0)",
        "lev0 AS MATERIALIZED (SELECT id AS s, id AS v, 1::BIGINT AS sigma FROM seeds)",
        "vis0 AS MATERIALIZED (SELECT s, v FROM lev0)",
    ]
    for d in range(1, n_levels + 1):
        parts.append(
            f"lev{d} AS MATERIALIZED ("
            f"SELECT c.s, c.v, c.sigma FROM ("
            f"  SELECT l.s, e.dst AS v, sum(l.sigma)::BIGINT AS sigma"
            f"  FROM lev{d - 1} l JOIN sym e ON e.src = l.v GROUP BY l.s, e.dst"
            f") c WHERE NOT EXISTS ("
            f"  SELECT 1 FROM vis{d - 1} x WHERE x.s = c.s AND x.v = c.v))"
        )
        parts.append(
            f"vis{d} AS MATERIALIZED (SELECT s, v FROM vis{d - 1} "
            f"UNION ALL SELECT s, v FROM lev{d})"
        )
    parts.append(
        f"del{n_levels} AS MATERIALIZED "
        f"(SELECT s, v, sigma, 0.0::DOUBLE AS delta FROM lev{n_levels})"
    )
    for d in range(n_levels - 1, -1, -1):
        parts.append(
            f"del{d} AS MATERIALIZED ("
            f"SELECT l.s, l.v, l.sigma, coalesce(c.delta, 0.0) AS delta "
            f"FROM lev{d} l LEFT JOIN ("
            f"  SELECT l2.s, l2.v, sum(l2.sigma::DOUBLE / n.sigma::DOUBLE"
            f"        * (1.0 + n.delta)) AS delta"
            f"  FROM lev{d} l2 JOIN sym e ON e.src = l2.v"
            f"  JOIN del{d + 1} n ON n.s = l2.s AND n.v = e.dst"
            f"  GROUP BY l2.s, l2.v"
            f") c ON c.s = l.s AND c.v = l.v)"
        )
    acc = " UNION ALL ".join(
        f"SELECT s, v, delta FROM del{d}" for d in range(n_levels + 1)
    )
    return (
        f"SELECT d.id, printf('%.6f', coalesce(b.bc, 0.0)) AS bc_s FROM deg d "
        f"LEFT JOIN (WITH {', '.join(parts)} "
        f"SELECT v AS id, sum(delta) AS bc FROM ({acc}) t "
        f"WHERE v <> s GROUP BY v) b ON b.id = d.id"
    )
