"""Bucketed edge-table storage: co-located, shuffle-free repeated scans.

The reference pre-partitions the adjacency into blocks so workers
operate on owned ranges without re-shuffling per query
(``src/common/graph_partition.cc`` — 1D/2D CSR segmenting;
``src/triangle/dist_cpu.cpp:32-38`` — contiguous vertex-range
ownership). The Spark-native equivalent is NOT a hand-rolled block
scheduler — every equi-join/groupBy already hash-partitions its keys,
which IS the 2D block assignment for the closing (u,w) probe of the
triangle join — but *bucketing*: write the edge table hash-bucketed by
``src`` once, and every subsequent src-keyed aggregation or join reads
co-located buckets with NO exchange. At 100 TB this converts the
per-run edge shuffle (the dominant cost of degrees / orientation /
PageRank prep) into a one-time write-side cost amortized across every
query that follows — exactly what the reference's one-time
``graph_partition`` preprocessing buys its kernels.

Bucket pruning/co-location survives restarts (it's table metadata, not
session state); on a cluster the same ``saveAsTable`` lands on
HDFS/S3 with a Hive-compatible bucket spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed_edges(
    edges: DataFrame,
    name: str,
    n_buckets: int = 64,
    path: str | None = None,
) -> None:
    """Write ``edges(src, dst, ...)`` as a parquet table hash-bucketed
    by ``src`` and sorted by ``(src, dst)`` within buckets (the
    ``sort_neighbors`` invariant, ``src/common/graph.cc:138-146``,
    preserved on disk).

    ``n_buckets`` plays the role of the reference partitioner's block
    count: size it so one bucket's edges fit an executor core's memory
    at the target scale (e.g. 2^13 buckets for 10^12 edges).
    """
    w = (
        edges.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, "src")
        .sortBy("src", "dst")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


def load_bucketed_edges(spark: SparkSession, name: str) -> DataFrame:
    """Scan a bucketed edge table. Downstream ``groupBy("src")`` /
    src-keyed equi-joins consume the bucket distribution directly —
    ``.explain`` shows NO Exchange before the aggregate/join (asserted
    in ``tests/test_round3.py``)."""
    return spark.table(name)
