"""Deterministic synthetic graph generator (pure integer/float
arithmetic over ``spark.range`` — no RNG state, no I/O, identical at
any parallelism).

Used by the bench/scaling harness and skew tests. ``skew=2.0`` gives a
quadratic preferential bias toward low vertex ids — low ids become
high-degree hubs like a web graph's front pages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def synthetic_edges(
    spark: SparkSession,
    n_edges: int,
    n_vertices: int,
    skew: float = 2.0,
    partitions: int | None = None,
) -> DataFrame:
    """Canonical undirected edge list ``(src < dst)``, deduped, no
    self-loops; ~``n_edges`` rows before dedup."""
    i = F.col("id")
    mix1 = ((i * 2654435761) + 1013904223) % (2**31)
    mix2 = ((i * 22695477) + 12345) % (2**31)
    u = (mix2 % 1000000) / 1000000.0
    src = (mix1 % n_vertices).cast("long")
    dst = (F.pow(u, F.lit(skew)) * n_vertices).cast("long")
    return (
        spark.range(n_edges, numPartitions=partitions)
        .select(F.least(src, dst).alias("src"), F.greatest(src, dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
