"""Graph construction / preprocessing operators.

The reference's ``Graph`` constructor pipeline (meta parse → CSR scan →
``sort_neighbors`` → ``orientation``; ``/root/reference/src/common/
graph.cc:4-124,138-146,233-279``) re-expressed over a canonical edge
DataFrame ``edges(src: long, dst: long)``.

Scale notes
-----------
* ``symmetrize``/``degrees`` are single-shuffle; degrees reuse the
  symmetric table's partitioning when executed back to back.
* ``build_dag`` is THE symmetry-breaking rewrite for triangle/clique
  counting: orient each undirected edge from the lower-(degree, id)
  endpoint to the higher, exactly like ``Graph::orientation``
  (``graph.cc:233-279``). On web graphs this bounds out-degree by
  O(sqrt(m)) for the long tail, which is what keeps the wedge join's
  skew manageable at 100 TB.
* The degree table is tiny relative to edges (one row per vertex) —
  broadcast it into the orientation join instead of shuffling edges
  twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symmetrize(edges: DataFrame, dedup: bool = True) -> DataFrame:
    """Undirected view: every edge in both directions, no self-loops.

    Mirrors ``Graph::init_edgelist``'s self-loop drop
    (``src/common/graph.cc:310``). ``dedup=False`` skips the distinct
    when the input is already a canonical ``src < dst`` edge list
    (union of two disjoint orientations needs no shuffle for dedup).
    """
    fwd = edges.select("src", "dst")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    sym = fwd.unionByName(rev).filter(F.col("src") != F.col("dst"))
    return sym.distinct() if dedup else sym


def degrees(sym_edges: DataFrame) -> DataFrame:
    """Per-vertex degree over a symmetric edge table → ``(id, deg)``.

    Reference: ``Graph::get_degree`` / ``compute_max_degree``
    (``include/graph.h:76``, ``src/common/graph.cc:219-231``).
    """
    return sym_edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))


def build_dag(canonical_edges: DataFrame, deg: DataFrame | None = None) -> DataFrame:
    """Degree-ordered orientation of an undirected graph.

    Input: canonical edge list (``src < dst``, one row per undirected
    edge). Output: one directed edge per undirected edge, u→v iff
    ``(deg(v), v) > (deg(u), u)`` — the total order used by the
    reference's ``Graph::orientation`` (``src/common/graph.cc:245-247``).

    Physical plan: two joins against the degree table, with the
    broadcast decision left to Catalyst/AQE — the degree table is one
    row per vertex, so at 10^9 vertices a *forced* broadcast would kill
    the driver; below the autoBroadcastJoinThreshold AQE converts both
    joins to broadcast hash joins at runtime (asserted in
    ``tests/test_skew_and_plans.py``), above it they fall back to
    shuffle joins on the same key.
    """
    if deg is None:
        deg = degrees(symmetrize(canonical_edges, dedup=False))
    deg_u = deg.select(F.col("id").alias("src"), F.col("deg").alias("deg_src"))
    deg_v = deg.select(F.col("id").alias("dst"), F.col("deg").alias("deg_dst"))
    e = canonical_edges.join(deg_u, "src").join(deg_v, "dst")
    keep_forward = (F.col("deg_dst") > F.col("deg_src")) | (
        (F.col("deg_dst") == F.col("deg_src")) & (F.col("dst") > F.col("src"))
    )
    return e.select(
        F.when(keep_forward, F.col("src")).otherwise(F.col("dst")).alias("src"),
        F.when(keep_forward, F.col("dst")).otherwise(F.col("src")).alias("dst"),
    )


def csr_blocks(
    sym_edges: DataFrame,
    num_blocks: int = 32,
    max_nbrs: int = 1 << 15,
) -> DataFrame:
    """Per-partition CSR blocks: ``(block, src, out_deg, nbrs)``.

    The distributed analogue of the reference's CSR segmenting
    (``src/common/graph_partition.cc:138-226``): vertices are hash-
    assigned to blocks; each row carries one (shard of a) vertex's
    sorted adjacency run, consumable by Arrow pandas UDFs as numpy
    (offsets, indices) pairs. Sorted order mirrors
    ``Graph::sort_neighbors`` (``graph.cc:138-146``).

    Hub handling (the matrix kernel's H/L-split precedent,
    ``src/matrix/triangle/omp_mm.cpp:137-155``): a web-scale hub with
    deg ~10^6 must NOT materialize one multi-GB array row, so each
    vertex's adjacency is sharded into ``ceil(deg / max_nbrs)`` rows
    keyed by ``hash(dst)`` — expected shard size ≈ ``max_nbrs``,
    tail vertices stay single-row. ``out_deg`` carries the TRUE full
    degree so consumers (``pagerank_csr``) divide by it, and per-dst
    partial sums re-aggregate across shards downstream.
    """
    assert max_nbrs & (max_nbrs - 1) == 0, "max_nbrs must be a power of 2"
    shift = max_nbrs.bit_length() - 1
    deg = sym_edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    # ceil(out_deg / max_nbrs) via shift — exact integer arithmetic
    nshards = F.shiftright(F.col("out_deg") - 1, shift) + 1
    e = sym_edges.join(deg, "src").withColumn(
        "shard", F.pmod(F.hash("dst"), nshards)
    )
    return (
        e.groupBy("src", "out_deg", "shard")
        .agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
        .withColumn("block", F.pmod(F.hash("src", "shard"), F.lit(num_blocks)))
        .select("block", "src", "out_deg", "nbrs")
    )


def split_hubs(deg: DataFrame, threshold: int) -> tuple[DataFrame, DataFrame]:
    """Hub/tail split at a degree threshold.

    Precedent: the reference's matrix kernel H/L split
    (``src/matrix/triangle/omp_mm.cpp:137-155``) — hubs get a different
    physical strategy (broadcast / salted replicas) than the long tail.
    Returns ``(hubs, tail)`` degree tables.
    """
    hubs = deg.filter(F.col("deg") > threshold)
    tail = deg.filter(F.col("deg") <= threshold)
    return hubs, tail


def salt_edges(edges: DataFrame, hubs: DataFrame, num_salts: int) -> DataFrame:
    """Add a ``salt`` column spreading hub-src rows across ``num_salts``
    shuffle keys; non-hub rows get salt 0. Aggregations over salted
    data must re-aggregate partial results over (src) afterwards.
    """
    hub_ids = F.broadcast(hubs.select(F.col("id").alias("src"), F.lit(True).alias("_is_hub")))
    return (
        edges.join(hub_ids, "src", "left")
        .withColumn(
            "salt",
            F.when(
                F.col("_is_hub").isNotNull(),
                F.pmod(F.hash("dst"), F.lit(num_salts)),
            ).otherwise(F.lit(0)),
        )
        .drop("_is_hub")
    )


def degree_assortativity(sym_edges: DataFrame) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002) over the
    symmetric edge table → one row ``(r: double)``.

    Computed from three INTEGER sums over directed edge endpoints
    (n = 2m rows): r = (n·Σjk − (Σj)²) / (n·Σj² − (Σj)²) with
    j = deg(src), k = deg(dst) — by symmetry the j and k moments
    coincide. Integer sums agree exactly across engines; the single
    final double division is bit-reproducible. Two broadcast-size
    degree joins + one global aggregate; no extra shuffle beyond the
    degree computation itself.
    """
    deg = degrees(sym_edges)
    j = deg.select(F.col("id").alias("src"), F.col("deg").alias("dj"))
    k = deg.select(F.col("id").alias("dst"), F.col("deg").alias("dk"))
    sums = (
        sym_edges.join(j, "src")
        .join(k, "dst")
        .agg(
            F.count("*").alias("n"),
            F.sum("dj").alias("s1"),
            F.sum(F.col("dj") * F.col("dj")).alias("s2"),
            F.sum(F.col("dj") * F.col("dk")).alias("sjk"),
        )
    )
    return sums.select(
        (
            (F.col("n") * F.col("sjk") - F.col("s1") * F.col("s1"))
            / (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
        ).alias("r")
    )
