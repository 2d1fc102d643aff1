"""Generic BFS-level mining engine — the Pangolin API analogue.

The reference's Pangolin engine (``include/pangolin_cpu/vertex_miner.h:
24-118``, level loop ``src/pangolin/clique/omp_base.cc:11-34``) is its
*generic* surface: grow embeddings one vertex per level
(``extend_vertex``), classify each embedding by its induced structure
(quick-pattern → canonical aggregation, ``miner.h``), and filter
levels by a predicate (FSM support). The specialized kernels
(AutoMine/SgL) stay the fast path; Pangolin trades speed for
generality. This module is the same trade re-expressed over
DataFrames:

* an *embedding level* is a DataFrame with one ``vs: array<long>``
  column — each row a SORTED connected vertex set (set semantics: one
  row per set, no orbit bookkeeping — dedup by value replaces the
  reference's canonical-extension test);
* :func:`extend_sets` = one join against the symmetric edge table +
  ``array_sort`` + ``distinct`` — the relational ``extend_vertex``
  (Pangolin's two-phase count/prefix-sum/materialize IS Spark's
  shuffle materialization);
* :func:`pattern_histogram` = the ``reduce`` step: probe each set's
  C(k,2) vertex pairs against the edge table, fold the hits into an
  induced-adjacency bitmask (the quick-pattern), then map bitmasks to
  canonical patterns with a driver-built atlas lookup (k ≤ 5, ≤ 1024
  masks — tiny broadcast dimension);
* a support/count predicate between levels gives FSM-style filtering.

Scale notes: each level shuffles O(level output) array rows — the same
output-bound growth as the reference engine; the bitmask probe joins
are per-pair equi-joins (no adjacency materialization). For
production counting the specialized plans (``motifs.py``,
``subgraph.py``) remain the default — pytest cross-checks this
engine's histogram against ``motif_counts_induced`` and the citeseer
goldens, mirroring the reference's Pangolin-vs-AutoMine agreement.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def initial_embeddings(sym_edges: DataFrame) -> DataFrame:
    """Level-2 embeddings: every undirected edge as a sorted 2-set."""
    return (
        sym_edges.filter(F.col("src") < F.col("dst"))
        .select(F.array("src", "dst").alias("vs"))
        .distinct()
    )


def extend_sets(embeddings: DataFrame, sym_edges: DataFrame) -> DataFrame:
    """One BFS level: extend every k-set by a neighbor of any member →
    all connected (k+1)-sets, exactly once each (``extend_vertex``,
    ``vertex_miner.h:24-118`` — the per-set dedup replaces the
    reference's canonical-extension check)."""
    ext = (
        embeddings.select("vs", F.explode("vs").alias("anchor"))
        .join(
            sym_edges.select(
                F.col("src").alias("anchor"), F.col("dst").alias("w")
            ),
            "anchor",
        )
        .filter(~F.array_contains("vs", F.col("w")))
    )
    return (
        ext.select(F.array_sort(F.concat("vs", F.array("w"))).alias("vs"))
        .distinct()
    )


def _pair_index_expr(k: int):
    """SQL expression for the rank of pair (i, j), i<j, in
    ``itertools.combinations(range(k), 2)`` order."""
    i, j = F.col("i"), F.col("j")
    return (i * (2 * k - i - 1) / 2 + (j - i - 1)).cast("int")


def _mask_atlas(k: int) -> dict[int, str]:
    """bitmask over C(k,2) position pairs → canonical pattern name
    (``connected_graphs`` naming), for connected masks only. Uses the
    SAME canonicalization/connectivity helpers as the atlas itself
    (``subgraph.canonical_edge_form``), so the lookup cannot drift."""
    from graphminer_spark.algorithms.subgraph import (
        canonical_edge_form,
        connected_graphs,
        edgeset_connected,
    )

    # the atlas is a driver-side 2^C(k,2) × k! enumeration — k=6 is
    # ~2^15 masks × 720 permutations and effectively hangs the driver
    if not 3 <= k <= 5:
        raise ValueError(
            f"pattern atlas supports k in 3..5 (got k={k}); "
            "larger k needs a distributed canonicalization"
        )
    pairs = list(combinations(range(k), 2))
    canon_name: dict[tuple, str] = {
        canonical_edge_form(spec.edges, k): spec.name
        for spec in connected_graphs(k)
    }
    out: dict[int, str] = {}
    for mask in range(1 << len(pairs)):
        edges = tuple(
            pairs[t] for t in range(len(pairs)) if mask & (1 << t)
        )
        if not edgeset_connected(edges, k):
            continue
        out[mask] = canon_name[canonical_edge_form(edges, k)]
    return out


def _set_masks(embeddings: DataFrame, sym_edges: DataFrame, k: int) -> DataFrame:
    """Quick-pattern bitmask per k-set → ``(vs, mask)``: probe each of
    the C(k,2) position pairs against the (deduplicated) edge table and
    fold hits into an induced-adjacency bitmask. Shared by
    :func:`pattern_histogram` and :func:`mine_frequent` so the probe
    semantics cannot diverge."""
    pos = embeddings.select("vs", F.posexplode("vs").alias("i", "va"))
    pairs = (
        pos.select("vs", "i", "va", F.posexplode("vs").alias("j", "vb"))
        .filter(F.col("i") < F.col("j"))
    )
    # distinct: a duplicate (or reciprocal-duplicate) edge row would
    # join twice and add 2·2^pidx to the sum, corrupting the mask —
    # the engine must accept non-canonical symmetric inputs
    e = (
        sym_edges.select(F.col("src").alias("va"), F.col("dst").alias("vb"))
        .distinct()
        .withColumn("is_e", F.lit(1))
    )
    probed = pairs.join(e, ["va", "vb"], "left").withColumn(
        "pidx", _pair_index_expr(k)
    )
    return probed.groupBy("vs").agg(
        F.sum(
            F.coalesce("is_e", F.lit(0)) * F.expr("shiftleft(1L, pidx)")
        ).alias("mask")
    )


def pattern_histogram(embeddings: DataFrame, sym_edges: DataFrame, k: int) -> DataFrame:
    """The ``reduce`` step: classify each k-set by its induced pattern
    → ``(pattern: string, n: long)`` rows (quick-pattern bitmask →
    canonical aggregation, ``miner.h`` role)."""
    spark = embeddings.sparkSession
    masks = _set_masks(embeddings, sym_edges, k)
    atlas = spark.createDataFrame(
        list(_mask_atlas(k).items()), "mask long, pattern string"
    )
    return (
        masks.join(atlas, "mask")
        .groupBy("pattern")
        .agg(F.count("*").alias("n"))
    )


def grow(sym_edges: DataFrame, k: int) -> DataFrame:
    """The level loop: edges → connected k-sets (k−2 extend levels).
    Shared by both mining entry points."""
    emb = initial_embeddings(sym_edges)
    for _ in range(k - 2):
        emb = extend_sets(emb, sym_edges)
    return emb


def mine_motifs(sym_edges: DataFrame, k: int) -> DataFrame:
    """End-to-end Pangolin-style k-motif census: level loop from edges
    to k-sets, then pattern reduction → ``(pattern, n)`` — the generic
    engine's answer to ``motif_counts_induced`` (cross-checked in
    pytest; the specialized formula/matcher plans stay the production
    path)."""
    return pattern_histogram(grow(sym_edges, k), sym_edges, k)


def mine_frequent(
    sym_edges: DataFrame,
    labeled_vertices: DataFrame,
    k: int,
    minsup: int,
) -> DataFrame:
    """Pangolin's FSM-mode filter step on the generic engine: grow to
    k-sets, classify by (induced mask, sorted member-label multiset)
    and keep classes whose MNI-style support (distinct vertex count
    per class, the set-semantics analogue) reaches ``minsup`` →
    ``(pattern, labels, support)``."""
    # the embedding level feeds TWO join branches (label multiset +
    # quick-pattern mask); Spark has no cross-branch common-subplan
    # reuse, so materialize the level once or the whole extend chain
    # runs twice
    emb = grow(sym_edges, k).localCheckpoint(eager=True)
    lv = labeled_vertices.select(
        F.col("id").alias("w"), F.col("vlabel")
    )
    labeled = (
        emb.select("vs", F.explode("vs").alias("w"))
        .join(lv, "w")
        .groupBy("vs")
        .agg(F.array_sort(F.collect_list("vlabel")).alias("labels"))
    )
    masks = _set_masks(emb, sym_edges, k)
    atlas = emb.sparkSession.createDataFrame(
        list(_mask_atlas(k).items()), "mask long, pattern string"
    )
    keyed = (
        masks.join(labeled, "vs")
        .join(atlas, "mask")
        .select("vs", "pattern", "labels")
    )
    support = (
        keyed.select("pattern", "labels", F.explode("vs").alias("v"))
        .groupBy("pattern", "labels")
        .agg(F.countDistinct("v").alias("support"))
    )
    return support.filter(F.col("support") >= minsup)
