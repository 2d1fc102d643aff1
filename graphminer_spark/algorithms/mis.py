"""Maximal independent set via hash-priority Luby rounds.

Greedy-by-random-permutation MIS (Luby, STOC'85 / Blelloch et al.,
SPAA'12): every vertex gets a deterministic priority (md5 of its id —
the same DOULION-style derandomization the samplers and ``tc_approx``
use, so the result is bitwise identical at any parallelism AND the
DuckDB oracle can replay it exactly). Each round, an active vertex
joins the MIS iff its (priority, id) is a strict local minimum among
its active neighbors; winners and their neighbors deactivate. Expected
O(log n) rounds.

Superstep shape (the north-rule scale contract): one self-join of the
active edge set per round (min-neighbor-priority aggregate), one
semi/anti-join to shrink the frontier — no driver-side state beyond
the round counter, no collect. The active set shrinks geometrically,
so round cost is dominated by the first two rounds ≈ O(|E|).

Reference analogue: GraphMiner has no MIS kernel; this extends the
vertex-program family (PR/CC/LP, ``/root/reference/src/*``) with the
classic symmetry-breaking primitive a link-graph pipeline needs for
scheduling (e.g. one-crawl-per-neighborhood selection).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _prio(id_col: Column) -> Column:
    """Deterministic non-negative priority, replayable in DuckDB as
    ``('0x' || substr(md5(id::VARCHAR), 1, 8))::BIGINT``."""
    return F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast(
        "long"
    )


def maximal_independent_set(
    sym_edges: DataFrame,
    max_rounds: int = 40,
    checkpointer: "CheckpointManager | None" = None,
) -> tuple[DataFrame, int]:
    """MIS over a symmetric, deduplicated, loop-free edge table.

    Returns ``(mis_df, rounds)`` where ``mis_df`` is the single column
    ``(id)`` of selected vertices. Ties on the hash priority break by
    vertex id, so selection is a total order and fully deterministic.
    Round state is lineage-truncated through the shared
    :class:`CheckpointManager` (plans re-analyze whole iteration
    chains otherwise — the module-level failure every superstep loop
    here guards against).
    """
    from graphminer_spark.checkpoint import CheckpointManager

    ckpt = checkpointer or CheckpointManager(None)
    verts = sym_edges.select(F.col("src").alias("id")).distinct()
    active_v = ckpt.save(
        verts.withColumn("p", _prio(F.col("id"))), 0, {"algo": "mis", "kind": "v"}
    )
    active_e = sym_edges.select("src", "dst")
    mis_parts: list[DataFrame] = []
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        pr = active_v.select(
            F.col("id").alias("nid"), F.col("p").alias("np")
        )
        # strict minimum of (p, id) over active neighbors; vertices
        # with no active neighbor have a NULL min and win outright
        nb_min = (
            active_e.join(pr, active_e["dst"] == pr["nid"])
            .groupBy(F.col("src").alias("id"))
            .agg(F.min(F.struct("np", "nid")).alias("mn"))
        )
        winners = (
            active_v.join(nb_min, "id", "left")
            .filter(
                F.col("mn").isNull()
                | (
                    F.struct(
                        F.col("p").alias("np"), F.col("id").alias("nid")
                    )
                    < F.col("mn")
                )
            )
            .select("id")
        )
        winners = ckpt.save(winners, rounds, {"algo": "mis", "kind": "w"})
        if winners.isEmpty():
            break
        mis_parts.append(winners)
        # deactivate winners and their neighbors
        removed = winners.unionAll(
            active_e.join(
                winners, active_e["src"] == winners["id"], "left_semi"
            ).select(F.col("dst").alias("id"))
        ).distinct()
        active_v = ckpt.save(
            active_v.join(removed, "id", "left_anti"),
            rounds,
            {"algo": "mis", "kind": "v"},
        )
        if active_v.isEmpty():
            break
        active_e = ckpt.save(
            active_e.join(
                active_v, active_e["src"] == active_v["id"], "left_semi"
            ).join(
                active_v.select(F.col("id").alias("d2")),
                active_e["dst"] == F.col("d2"),
                "left_semi",
            ),
            rounds,
            {"algo": "mis", "kind": "e"},
        )
    if not mis_parts:
        return verts.limit(0), rounds
    out = mis_parts[0]
    for p in mis_parts[1:]:
        out = out.unionAll(p)
    return out, rounds


def mis_sql(n_rounds: int = 12) -> str:
    """DuckDB body replaying :func:`maximal_independent_set` with the
    rounds unrolled (over the shared ``sym``/``deg`` CTEs). MIS rounds
    are a monotone elimination: once the active set empties, further
    rounds are identity, so a generous fixed unroll is exact as long
    as it covers the true round count (pytest asserts the Spark loop
    finished in < ``n_rounds``)."""
    parts = [
        f"v0 AS (SELECT src AS id, (('0x' || substr(md5(src::VARCHAR), 1, 8))::BIGINT) AS p "
        f"FROM (SELECT DISTINCT src FROM sym))",
        "e0 AS (SELECT src, dst FROM sym)",
    ]
    wins = []
    for t in range(1, n_rounds + 1):
        p, e, w = f"v{t - 1}", f"e{t - 1}", f"w{t}"
        parts.append(
            f"{w} AS MATERIALIZED (SELECT a.id FROM {p} a LEFT JOIN ("
            f"  SELECT ee.src AS id, min(ROW(n.p, n.id)) AS mn"
            f"  FROM {e} ee JOIN {p} n ON n.id = ee.dst GROUP BY ee.src"
            f") m ON m.id = a.id "
            f"WHERE m.mn IS NULL OR ROW(a.p, a.id) < m.mn)"
        )
        parts.append(
            f"r{t} AS MATERIALIZED (SELECT id FROM {w} "
            f"UNION SELECT ee.dst FROM {e} ee JOIN {w} ON {w}.id = ee.src)"
        )
        parts.append(
            f"v{t} AS MATERIALIZED (SELECT * FROM {p} "
            f"WHERE id NOT IN (SELECT id FROM r{t}))"
        )
        parts.append(
            f"e{t} AS MATERIALIZED (SELECT ee.src, ee.dst FROM {e} ee "
            f"WHERE ee.src IN (SELECT id FROM v{t}) "
            f"AND ee.dst IN (SELECT id FROM v{t}))"
        )
        wins.append(f"SELECT id FROM w{t}")
    union = " UNION ALL ".join(wins)
    return f"SELECT id FROM (WITH {', '.join(parts)} {union}) t"
