"""Vertex-label operators: label frequency, NLF (neighborhood label
frequency), reverse label index.

Reference: label histogram ``src/common/graph.cc:593-612``, NLF build
``graph.cc:631-643``, reverse label index ``graph.cc:566-588`` — the
subgraph-query filter stage's auxiliary structures.

When the graph carries no labels, ``with_synthetic_labels`` derives a
deterministic label column (``id % n_classes``) so the operators stay
exercisable (the reference instead falls back to *random* labels,
``graph.cc:72-77`` — non-deterministic, deliberately not reproduced).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_CLASSES = 7
N_ELABELS = 5


def with_synthetic_labels(vertices: DataFrame, n_classes: int = N_CLASSES) -> DataFrame:
    return vertices.select(
        "id", (F.col("id") % n_classes).cast("int").alias("vlabel")
    )


def with_synthetic_elabels(
    edges: DataFrame, n_elabels: int = N_ELABELS
) -> DataFrame:
    """Deterministic per-edge label column → ``(src, dst, elabel)``.

    The reference carries an ``elabel_t`` per edge (``include/graph.h:
    38``, loaded ``src/common/graph.cc:56-115``) and FSM's DFS codes
    are edge-labeled tuples. ``(src + dst) % k`` is symmetric, so both
    directions of an undirected edge derive the SAME label — the
    labeling survives ``symmetrize`` applied before or after.
    """
    return edges.select(
        "src",
        "dst",
        ((F.col("src") + F.col("dst")) % n_elabels).cast("int").alias("elabel"),
    )


def label_frequency(labeled_vertices: DataFrame) -> DataFrame:
    """``(vlabel, n)`` histogram."""
    return labeled_vertices.groupBy("vlabel").agg(F.count("*").alias("n"))


def nlf(sym_edges: DataFrame, labeled_vertices: DataFrame) -> DataFrame:
    """Neighborhood label frequency → ``(id, vlabel, n)``: for each
    vertex, how many neighbors carry each label. The map form the
    reference stores per vertex is ``map_from_entries`` over these
    rows; the flat form is what joins/filters consume."""
    # plain equi-join — no broadcast hint: the label table has one row
    # per vertex, and a forced broadcast of an O(|V|) table is a driver
    # kill at web scale (AQE broadcasts it anyway when it's small)
    nbr_labels = sym_edges.join(
        labeled_vertices.select(F.col("id").alias("dst"), "vlabel"),
        "dst",
    )
    return (
        nbr_labels.groupBy(F.col("src").alias("id"), "vlabel")
        .agg(F.count("*").alias("n"))
    )


def nlf_map(sym_edges: DataFrame, labeled_vertices: DataFrame) -> DataFrame:
    """NLF in the reference's per-vertex map layout → ``(id,
    nlf: map<int,bigint>)`` via ``map_from_entries`` over the flat rows
    (``Graph::build_nlf`` stores exactly this shape, ``src/common/
    graph.cc:631-643``). The flat form (:func:`nlf`) is what joins and
    filters consume; the map form serves point lookups and checkpoint
    snapshots of the filter stage's auxiliary structure."""
    flat = nlf(sym_edges, labeled_vertices)
    return flat.groupBy("id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("vlabel"), F.col("n")))
        ).alias("nlf")
    )


def reverse_label_index(labeled_vertices: DataFrame) -> DataFrame:
    """``(vlabel, ids sorted array)`` — vertices grouped by label."""
    return (
        labeled_vertices.groupBy("vlabel")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
    )
