"""2D graph partitioning and block-local triangle counting.

Reference parity: ``include/graph_partition.h:52`` / ``src/common/
graph_partition.cc:138-226`` — ``partition2D`` assigns every vertex a
cluster id and routes edge (v, u) to block ``(cid(v), cid(u))`` so each
of the nc x nc blocks is a self-contained CSR a worker can process
without touching the rest of the graph. The Spark-native re-expression
keeps the *blocking idea* (bound each task's working set to a few
blocks that fit in memory) but drops the hand-rolled scheduler: cluster
ids are a deterministic hash expression, block routing is a broadcast
join against a tiny triple map, and the per-block kernel is an
Arrow-batched ``applyInPandas`` local join.

Distributed triangle counting over the 2D blocks follows the
triple-partition scheme of Suri & Vassilvitskii, "Counting Triangles
and the Curse of the Last Reducer" (WWW 2011): with nc vertex clusters,
spawn one task per cluster triple (i<j<k); an edge whose endpoint
clusters are {a, b} is replicated to every triple containing both, so
any triangle's three DAG edges co-locate in every triple that contains
all three of its endpoint clusters. A triangle with exactly

* 3 distinct endpoint clusters appears in exactly 1 triple,
* 2 distinct clusters appears in (nc - 2) triples,
* 1 cluster appears in C(nc-1, 2) triples,

so each kernel tallies triangles into (c1, c2, c3) classes by local
cluster-id comparison and the driver-side combine divides the c2/c1
sums by their exact multiplicities — integer-exact, no floating point.

Scale analysis (the reason this path exists): the plain wedge-join TC
(``triangles.py``) shuffles the wedge stream globally; this path
replicates edges ~1.5*nc times but bounds EVERY task's resident set to
its triple's edges (~O(|E| / nc^2) for balanced blocks) plus a fixed
wedge-chunk budget — the kernel never materializes a block's full
O(sum deg^2) wedge list (see ``_count_block``) — the property the
reference's 2D partitioner buys its distributed kernels
(``src/triangle/dist_cpu.cpp``). Pick nc so a block triple fits the
executor: nc = 32 puts a 10^12-edge graph at ~6 GB/task of raw edges
with C(32,3) = 4960 independent tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def assign_clusters(edges: DataFrame, nc: int) -> DataFrame:
    """Tag ``edges(src, dst)`` with deterministic endpoint cluster ids
    ``(c_src, c_dst)`` in ``[0, nc)``.

    xxhash64-based (not modulo-of-id) so consecutive crawl-assigned ids
    spread across clusters; deterministic so stage retries and
    resumed runs land identical blocks (reference analogue: the
    explicit ``cluster_ids`` vector of ``graph_partition.cc:201``).
    """
    cid = lambda c: F.pmod(F.xxhash64(c), F.lit(nc)).cast("int")
    return edges.withColumn("c_src", cid(F.col("src"))).withColumn(
        "c_dst", cid(F.col("dst"))
    )


def partition_2d(edges: DataFrame, nc: int) -> DataFrame:
    """The reference's ``partition2D`` view: every edge tagged with its
    flat block id ``pid = c_src * nc + c_dst`` (``graph_partition.cc:
    231-239``). Downstream consumers repartition/bucket by ``pid`` to
    give each worker whole blocks."""
    return assign_clusters(edges, nc).withColumn(
        "pid", (F.col("c_src") * nc + F.col("c_dst")).cast("int")
    )


def block_sizes(edges: DataFrame, nc: int) -> DataFrame:
    """Per-block edge counts ``(c_src, c_dst, n_edges)`` — the
    ``nes_of_partitions`` audit of ``graph_partition.cc:243-252``,
    used to check balance before committing to an nc."""
    return (
        assign_clusters(edges, nc)
        .groupBy("c_src", "c_dst")
        .agg(F.count("*").alias("n_edges"))
    )


def _triples_table(spark: SparkSession, nc: int) -> DataFrame:
    """Replication map: one row per (unordered endpoint-cluster pair,
    containing triple). Size < nc^3 rows — driver-built, broadcast."""
    if nc < 3:
        raise ValueError(f"2D triangle counting needs nc >= 3, got {nc}")
    rows = []
    for t1 in range(nc):
        for t2 in range(t1 + 1, nc):
            for t3 in range(t2 + 1, nc):
                triple = (t1, t2, t3)
                for a in triple:
                    for b in triple:
                        if a <= b:
                            rows.append((a, b, t1, t2, t3))
    schema = StructType(
        [
            StructField("c_lo", IntegerType()),
            StructField("c_hi", IntegerType()),
            StructField("t1", IntegerType()),
            StructField("t2", IntegerType()),
            StructField("t3", IntegerType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


_BLOCK_COUNTS_SCHEMA = StructType(
    [
        StructField("c1", LongType()),
        StructField("c2", LongType()),
        StructField("c3", LongType()),
    ]
)


# wedge-batch budget per chunk: the kernel's transient memory is
# O(block edges + _WEDGE_CHUNK rows), NOT O(sum deg^2 of the block) —
# skewed hubs split across as many chunks as their degree demands
_WEDGE_CHUNK = 4_000_000


def _count_block(pdf):
    """Local kernel for one cluster triple: count DAG triangles among
    this triple's edges, classed by how many distinct endpoint
    clusters the triangle touches. Pure pandas/numpy — Arrow-batched,
    no per-row Python.

    The wedge build is CHUNKED per mid-vertex group: mids are packed
    into batches whose total wedge count (indeg * outdeg) stays under
    ``_WEDGE_CHUNK``, so a hub-heavy block never materializes its full
    O(sum deg^2) wedge list at once — only the per-chunk slice plus
    the block's edge frame is resident."""
    import numpy as np
    import pandas as pd

    e = pdf[["u", "v", "cu", "cv"]]
    close = e.rename(columns={"v": "w"})[["u", "w"]]
    mid = e.rename(columns={"u": "v", "v": "w", "cu": "cv", "cv": "cw"})

    # wedges through mid m = indeg(m) * outdeg(m); pack mids greedily
    indeg = e.groupby("v").size()
    outdeg = e.groupby("u").size()
    wpm = (indeg * outdeg.reindex(indeg.index).fillna(0)).astype(np.int64)
    wpm = wpm[wpm > 0]
    if len(wpm) == 0:
        return pd.DataFrame({"c1": [0], "c2": [0], "c3": [0]})
    order = wpm.index.to_numpy()
    cum = np.cumsum(wpm.to_numpy())
    # chunk boundaries: every _WEDGE_CHUNK wedges (a single mid larger
    # than the budget gets its own chunk — one hub's wedge list is the
    # irreducible unit; still far below the whole block's sum)
    chunk_ids = cum // _WEDGE_CHUNK

    c1 = c2 = c3 = 0
    for cid in np.unique(chunk_ids):
        mids = order[chunk_ids == cid]
        sel = pd.Index(mids)
        wedges = e[e["v"].isin(sel)].merge(
            mid[mid["v"].isin(sel)], on="v", how="inner"
        )
        closed = wedges.merge(close, on=["u", "w"], how="inner")
        if len(closed) == 0:
            continue
        cu = closed["cu"].to_numpy()
        cv = (
            closed["cv_x"].to_numpy()
            if "cv_x" in closed
            else closed["cv"].to_numpy()
        )
        cw = closed["cw"].to_numpy()
        pair_eq = (cu == cv).astype(np.int64) + (cv == cw) + (cu == cw)
        # pair_eq: 0 -> 3 distinct clusters, 1 -> 2 distinct, 3 -> 1
        c3 += int((pair_eq == 0).sum())
        c2 += int((pair_eq == 1).sum())
        c1 += int((pair_eq == 3).sum())
    return pd.DataFrame({"c1": [c1], "c2": [c2], "c3": [c3]})


# auto_nc's per-triple edge-volume target: one triple's edge frame
# (3 int64 columns in pandas, so ~24 B/row plus index) stays well
# under a few hundred MB of task memory while tasks remain coarse
# enough that scheduling overhead does not dominate
_TARGET_BLOCK_EDGES = 2_000_000


def auto_nc(
    n_edges: int,
    parallelism: int,
    target_block_edges: int = _TARGET_BLOCK_EDGES,
    nc_max: int = 64,
) -> int:
    """Pick the cluster count for :func:`triangle_count_2d` from the
    two constraints the knob actually trades off (measured in
    BENCH/BASELINE.md — nc=4 at sf0.1 made 4 fat tasks, 10x slower
    than nc=8):

    * MEMORY: expected edges per triple ≈ 6|E|/nc², so
      nc ≥ sqrt(6|E| / target_block_edges) keeps a triple's edge frame
      inside one task's budget. This is an EXPECTATION under the
      xxhash64 cluster assignment; per-block skew is bounded by the
      hash's balance, and the wedge kernel itself is chunked, so a hot
      block degrades to more chunks, not OOM.
    * PARALLELISM: C(nc,3) ≥ 4·parallelism so every core gets several
      independent triples and stragglers can be rebalanced (measured
      at sf0.1 on 32 cores: nc=8 → 13.9 s, nc=9 → 5.0 s, nc=12 →
      3.3 s best-of-2 — finer triples win until task launch overhead
      bites; the 4× floor lands in the flat part of that curve).

    Replication cost grows as ~nc·|E| rows shuffled, so take the
    SMALLEST nc satisfying both, capped at ``nc_max`` (C(64,3) ≈ 42k
    triples — beyond that task-launch overhead outruns the memory win;
    at 10^12 edges the target-block bound picks nc≈55, still under
    the cap)."""
    nc = 3
    while nc < nc_max and 6 * n_edges > target_block_edges * nc * nc:
        nc += 1
    while nc < nc_max and nc * (nc - 1) * (nc - 2) < 24 * parallelism:
        nc += 1
    return nc


def triangle_count_2d(
    dag: DataFrame, nc: int | None = 4, n_edges: int | None = None
) -> DataFrame:
    """Exact total triangle count via 2D cluster-triple blocks.

    Same answer as ``triangles.triangle_count`` (agreement-tested);
    different physical strategy: block-replicate + block-local kernel
    instead of a global wedge shuffle. One row ``(n_triangles: long)``.

    ``nc=None`` auto-picks the cluster count via :func:`auto_nc` from
    ``n_edges`` (pass it when known — pipelines usually just counted
    the DAG — otherwise one extra ``count()`` action runs here).
    """
    spark = dag.sparkSession
    if nc is None:
        if n_edges is None:
            n_edges = dag.count()
        nc = auto_nc(n_edges, spark.sparkContext.defaultParallelism)
    tagged = assign_clusters(dag.select("src", "dst"), nc).select(
        F.col("src").alias("u"),
        F.col("dst").alias("v"),
        F.col("c_src").alias("cu"),
        F.col("c_dst").alias("cv"),
        F.least("c_src", "c_dst").alias("c_lo"),
        F.greatest("c_src", "c_dst").alias("c_hi"),
    )
    triples = F.broadcast(_triples_table(spark, nc))
    replicated = tagged.join(triples, ["c_lo", "c_hi"])
    per_block = replicated.groupBy("t1", "t2", "t3").applyInPandas(
        _count_block, schema=_BLOCK_COUNTS_SCHEMA
    )
    m2 = nc - 2  # triples containing a fixed cluster pair
    m1 = (nc - 1) * (nc - 2) // 2  # triples containing a fixed cluster
    # integer `div`: the sums are exactly divisible by construction,
    # so the combine stays integer-exact at any scale
    return per_block.agg(
        F.expr(
            f"sum(c3) + (sum(c2) div {m2}) + (sum(c1) div {m1})"
        ).alias("n_triangles")
    )
