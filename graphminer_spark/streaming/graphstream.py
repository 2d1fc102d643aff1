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
files only, and re-delivered edges are dropped with an anti-join
against the accumulated state, so the count survives a kill mid-stream
(the same durability story as ``CheckpointManager``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EDGE_SCHEMA = "src long, dst long"


def _accumulated(spark: SparkSession, edges_path: str) -> DataFrame:
    try:
        return spark.read.parquet(edges_path)
    except Exception:
        return spark.createDataFrame([], EDGE_SCHEMA)


def stream_triangle_maintenance(
    spark: SparkSession,
    src_dir: str,
    state_dir: str,
    query_name: str = "tri_maintenance",
):
    """Start the maintenance stream over canonical ``(src, dst)`` edge
    parquet files landing in ``src_dir``. State under ``state_dir``:
    ``edges/`` (accumulated graph), ``deltas/`` rows
    ``(batch_id, n_delta_edges, n_new_triangles)``, ``ckpt/`` (stream
    offsets). Total triangles so far = ``sum(n_new_triangles)``."""
    from graphminer_spark.algorithms.temporal import incremental_triangles

    edges_path = os.path.join(state_dir, "edges")
    deltas_path = os.path.join(state_dir, "deltas")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        batch = (
            batch_df.select("src", "dst")
            .filter(F.col("src") < F.col("dst"))
            .distinct()
        )
        acc = _accumulated(spark, edges_path)
        # idempotent re-delivery: an edge already in the accumulated
        # graph contributes nothing and must not double-count
        batch = batch.join(acc, ["src", "dst"], "left_anti")
        row = incremental_triangles(acc, batch).collect()[0]
        if row["n_delta_edges"]:
            batch.write.mode("append").parquet(edges_path)
        spark.createDataFrame(
            [
                (
                    int(batch_id),
                    int(row["n_delta_edges"]),
                    int(row["n_new_triangles"]),
                )
            ],
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
