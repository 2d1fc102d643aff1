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


def with_synthetic_labels(vertices: DataFrame, n_classes: int = N_CLASSES) -> DataFrame:
    return vertices.select(
        "id", (F.col("id") % n_classes).cast("int").alias("vlabel")
    )


def label_frequency(labeled_vertices: DataFrame) -> DataFrame:
    """``(vlabel, n)`` histogram."""
    return labeled_vertices.groupBy("vlabel").agg(F.count("*").alias("n"))


def nlf(sym_edges: DataFrame, labeled_vertices: DataFrame) -> DataFrame:
    """Neighborhood label frequency → ``(id, vlabel, n)``: for each
    vertex, how many neighbors carry each label. The map form the
    reference stores per vertex is ``map_from_entries`` over these
    rows; the flat form is what joins/filters consume."""
    nbr_labels = sym_edges.join(
        F.broadcast(labeled_vertices.select(F.col("id").alias("dst"), "vlabel")),
        "dst",
    )
    return (
        nbr_labels.groupBy(F.col("src").alias("id"), "vlabel")
        .agg(F.count("*").alias("n"))
    )


def reverse_label_index(labeled_vertices: DataFrame) -> DataFrame:
    """``(vlabel, ids sorted array)`` — vertices grouped by label."""
    return (
        labeled_vertices.groupBy("vlabel")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
    )
