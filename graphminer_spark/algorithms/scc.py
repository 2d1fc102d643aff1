"""Strongly connected components of a directed graph.

The bow-tie primitive of web-link analysis (Broder et al.,
"Graph structure in the web", WWW'00): the giant SCC plus IN/OUT
tendrils is THE structural decomposition of a crawl's link graph, and
none of the undirected machinery (``connected_components``) sees it.

Algorithm — iterated min-label forward/backward intersection (the
"coloring"/MultiPivot family; Orzan '04, Slota et al. '14):

1. ``F(v)`` = min vertex id that can REACH v: min-label propagation
   to fixpoint along edge direction (the CC hash-min loop, directed);
2. ``B(v)`` = min vertex id v can reach: the same loop on reversed
   edges;
3. every vertex with ``F(v) = B(v) = r`` is mutually reachable with
   ``r``, and the set ``{v : F(v) = B(v) = r}`` is exactly SCC(r) —
   assign those, drop them from the active subgraph, repeat.

Each outer round settles at least every SCC that is the minimum-id
"color root" of its reachability region (many per round in practice);
the expected outer-round count is logarithmic on web-like graphs.
Inner supersteps are one equi-join + one min-groupBy each — the CC
plan — with labels monotone non-increasing, so Σlabel is an exact
fixpoint witness and the check rides the materializing aggregate
(ONE driver action per superstep).

The DuckDB oracle is algorithm-independent: exact SCC ids via
recursive reachability, ``scc(v) = min{r : v→*r ∧ r→*v}`` — it cannot
inherit a bug from the Spark loop.

At 100 TB: forward/backward trimming of outdeg-0/indeg-0 vertices
(the classic FW-BW-Trim step) bolts onto the same loop as a cheap
degree filter per outer round; the substrate here keeps the plain
form, whose shuffle shape is already the scale-proven CC superstep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphminer_spark.checkpoint import CheckpointManager, superstep_planning


def _min_label_fixpoint(
    dedges: DataFrame,
    verts: DataFrame,
    ckpt: CheckpointManager,
    algo: str,
    max_iter: int = 100,
) -> DataFrame:
    """min-label propagation along edge direction to fixpoint →
    ``(id, lbl)`` where lbl = min id with a directed path TO id
    (including id itself)."""
    lbl = verts.select("id", F.col("id").alias("lbl"))
    lbl, row = ckpt.save_and_agg(
        lbl, 0, {"algo": algo}, [F.sum("lbl").alias("s")]
    )
    # frontier-restricted propagation: labels are monotone
    # non-increasing, so a push from an unchanged u repeats an offer
    # already applied — per-round label tables are IDENTICAL to the
    # full-relaxation loop (the oracle is reachability-based and
    # algorithm-independent anyway) while each round joins only the
    # out-edges of last round's changed vertices
    frontier = lbl
    for it in range(1, max_iter + 1):
        pushed = (
            frontier.join(
                dedges.select("src", "dst"), frontier["id"] == dedges["src"]
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("lbl").alias("in_lbl"))
        )
        new_lbl = (
            lbl.join(pushed.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                F.least(
                    "lbl", F.coalesce("in_lbl", F.col("lbl"))
                ).alias("lbl"),
                F.coalesce(
                    F.col("in_lbl") < F.col("lbl"), F.lit(False)
                ).alias("chg"),
            )
        )
        state, row = ckpt.save_and_agg(
            new_lbl, it, {"algo": algo},
            [F.sum(F.col("chg").cast("long")).alias("changed")],
        )
        lbl = state.select("id", "lbl")
        if not int(row["changed"] or 0):
            break
        frontier = state.filter("chg").select("id", "lbl")
    # the returned fixpoint outlives the NEXT fixpoint's loop (fwd is
    # joined with bwd after bwd finishes) — stop tracking it so the
    # shared manager's release chain can never free it
    ckpt.detach_chain()
    return lbl


def strongly_connected_components(
    dedges: DataFrame,
    checkpointer: CheckpointManager | None = None,
    max_outer: int = 20,
) -> DataFrame:
    """``(id, scc)`` — scc = min vertex id of each strongly connected
    component, over all vertices incident to ``dedges(src, dst)``."""
    ckpt = checkpointer or CheckpointManager(None, release_chain=True)
    spark = dedges.sparkSession
    edges = dedges.select("src", "dst").localCheckpoint(eager=True)
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    assigned = spark.createDataFrame([], "id long, scc long")
    with superstep_planning(spark, edges.count()):
        for outer in range(1, max_outer + 1):
            fwd = _min_label_fixpoint(
                edges, verts, ckpt, f"scc_f{outer}"
            ).withColumnRenamed("lbl", "f")
            rev = edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
            bwd = _min_label_fixpoint(
                rev, verts, ckpt, f"scc_b{outer}"
            ).withColumnRenamed("lbl", "b")
            both = fwd.join(bwd, "id")
            done = both.filter(F.col("f") == F.col("b")).select(
                "id", F.col("f").alias("scc")
            )
            assigned = assigned.unionByName(done).localCheckpoint(eager=True)
            remaining = both.filter(F.col("f") != F.col("b")).select("id")
            n_rem = remaining.count()
            if n_rem == 0:
                break
            verts = remaining.localCheckpoint(eager=True)
            edges = (
                edges.join(verts.withColumnRenamed("id", "src"), "src", "left_semi")
                .join(verts.withColumnRenamed("id", "dst"), "dst", "left_semi")
                .localCheckpoint(eager=True)
            )
    return assigned


# md5-parity orientation: deterministic directed view of a canonical
# (src < dst) edge table — the substrate synthesizer for SCC queries
# (random orientation of a sparse undirected graph reproduces the
# bow-tie shape: one giant SCC plus singleton tendrils).
def hash_orient(canonical_edges: DataFrame) -> DataFrame:
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("src").cast("string"),
                    F.col("dst").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    keep = (h % 2) == 0
    return canonical_edges.select(
        F.when(keep, F.col("src")).otherwise(F.col("dst")).alias("src"),
        F.when(keep, F.col("dst")).otherwise(F.col("src")).alias("dst"),
    )


HASH_ORIENT_SQL = (
    "dedges AS MATERIALIZED (SELECT "
    "CASE WHEN (('0x' || substr(md5(src::VARCHAR || ':' || dst::VARCHAR), "
    "1, 8))::BIGINT % 2) = 0 THEN src ELSE dst END AS src, "
    "CASE WHEN (('0x' || substr(md5(src::VARCHAR || ':' || dst::VARCHAR), "
    "1, 8))::BIGINT % 2) = 0 THEN dst ELSE src END AS dst FROM edges)"
)

# exact SCC by recursive reachability — algorithm-independent oracle:
# scc(v) = min{r : v reaches r AND r reaches v} (reach includes self).
# Composers must prepend WITH RECURSIVE and the graph CTEs.
SCC_BODY_SQL = (
    "verts AS (SELECT DISTINCT src AS id FROM "
    "(SELECT src FROM dedges UNION ALL SELECT dst FROM dedges)), "
    "reach(v, r) AS (SELECT id, id FROM verts "
    "UNION SELECT reach.v, d.dst FROM reach JOIN dedges d ON d.src = reach.r) "
    "SELECT a.v AS id, min(a.r) AS scc FROM reach a "
    "JOIN reach b ON b.v = a.r AND b.r = a.v GROUP BY a.v"
)
