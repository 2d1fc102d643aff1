"""Streaming graph maintenance: incremental triangle counting over an
edge stream.

The streaming face of the dynamic-graph family (``src/dynamic``
README's evolving-graph setting; delta plan =
``temporal.incremental_triangles``, Tesseract-style): edge micro-batches
arrive via Structured Streaming, each ``foreachBatch`` joins ONLY the
new edges against the durable accumulated adjacency (per-batch work
follows the batch, not the graph), appends the batch to the
accumulated-edge parquet state, and records the per-batch triangle
delta. Because every triangle is completed by exactly one arriving
edge, the running sum of deltas IS the exact triangle count of the
accumulated graph — no recount, ever.

Restart/resume: the stream's checkpointLocation replays unprocessed
files only, and each micro-batch is IDEMPOTENT by batch_id — edges
land under a batch-keyed partition directory (``edges/b=<batch_id>``,
overwritten on replay) and the deltas row is written last as the
commit marker, so a replayed batch either fully redoes the work
(recomputing against the accumulated state *excluding* its own
partial write) or fully skips it (its batch_id already in deltas).
A kill between the two writes can therefore never under- or
over-count — the same durability story as ``CheckpointManager``.
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EDGE_SCHEMA = "src long, dst long"


def _accumulated(spark: SparkSession, edges_path: str) -> DataFrame:
    """Accumulated edge state ``(src, dst, b)`` — ``b`` is the writing
    batch_id (partition-directory column). Missing path (first batch)
    reads as empty; any OTHER read error propagates and fails the
    micro-batch so the stream retries instead of silently recounting
    against an empty graph."""
    try:
        return spark.read.parquet(edges_path)
    except AnalysisException:
        return spark.createDataFrame([], EDGE_SCHEMA + ", b long")


def _committed_batches(spark: SparkSession, deltas_path: str) -> set[int]:
    try:
        return {
            r["batch_id"]
            for r in spark.read.parquet(deltas_path)
            .select("batch_id")
            .collect()
        }
    except AnalysisException:
        return set()


def stream_triangle_maintenance(
    spark: SparkSession,
    src_dir: str,
    state_dir: str,
    query_name: str = "tri_maintenance",
):
    """Start the maintenance stream over canonical ``(src, dst)`` edge
    parquet files landing in ``src_dir``. State under ``state_dir``:
    ``edges/b=<batch_id>/`` (accumulated graph, batch-keyed), ``deltas/``
    rows ``(batch_id, n_delta_edges, n_new_triangles)`` (the commit
    marker, written last), ``ckpt/`` (stream offsets). Total triangles
    so far = ``sum(n_new_triangles)``."""
    from graphminer_spark.algorithms.temporal import incremental_triangles

    edges_path = os.path.join(state_dir, "edges")
    deltas_path = os.path.join(state_dir, "deltas")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        bid = int(batch_id)
        # replay of a fully committed batch: skip (delta row exists ⇒
        # the edges partition was committed before it)
        if bid in _committed_batches(spark, deltas_path):
            return
        batch = (
            batch_df.select("src", "dst")
            .filter(F.col("src") < F.col("dst"))
            .distinct()
        )
        # exclude this batch's own (possibly partial, uncommitted)
        # partition from the accumulated state so a replay recomputes
        # the exact same delta it would have on the first attempt
        acc = (
            _accumulated(spark, edges_path)
            .filter(F.col("b") != bid)
            .select("src", "dst")
        )
        # idempotent re-delivery: an edge already in the accumulated
        # graph contributes nothing and must not double-count
        batch = batch.join(acc, ["src", "dst"], "left_anti")
        row = incremental_triangles(acc, batch).collect()[0]
        if row["n_delta_edges"]:
            # overwrite (not append): a partial write from a killed
            # attempt is replaced wholesale
            batch.write.mode("overwrite").parquet(
                os.path.join(edges_path, f"b={bid}")
            )
        # the deltas row is the commit marker — written LAST
        spark.createDataFrame(
            [(bid, int(row["n_delta_edges"]), int(row["n_new_triangles"]))],
            "batch_id long, n_delta_edges long, n_new_triangles long",
        ).write.mode("append").parquet(deltas_path)

    return (
        spark.readStream.schema(EDGE_SCHEMA)
        .parquet(src_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(state_dir, "ckpt"))
        .queryName(query_name)
        .start()
    )
