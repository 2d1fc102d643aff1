"""Sequence packing for LM pretraining: concat-and-chunk layout.

Documents are concatenated in ``doc_id`` order into one token stream
and cut into fixed ``seq_len`` blocks (the standard GPT-style packing
that wastes zero tokens to padding). The operator emits the layout —
for every document, its absolute token offset and the span of blocks
it lands in — which is exactly what a downstream shard-writer needs to
materialize packed training rows.

Scale: a naive global window (``Window.orderBy(...)`` with no
partition key) would pull the whole corpus into ONE task — the classic
cumsum trap. Instead the prefix sum is two-phase, the Blelloch scan as
DataFrames: range-partition by ``doc_id``, per-partition running sums
(each task scans only its slice), then a driver-side prefix over the
per-partition totals (one row per partition — a scalar-sized collect)
broadcast back as the partition base offset. At 10^12 documents this
is one repartitionByRange shuffle + one map-side window, no single-
task stage.

The layout is a pure function of (doc_id order, token counts), so the
DuckDB oracle is the plain windowed cumsum over the same whitespace
token count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame, seq_len: int = 512, n_parts: int = 32
) -> DataFrame:
    """Packing layout → ``(doc_id, n_tokens, start_off, first_block,
    last_block, n_splits)``.

    ``n_splits`` counts the block boundaries that cut the document
    (0 = the doc lands whole inside one block) — the per-doc
    fragmentation a curriculum-sensitive pipeline monitors.
    """
    tc = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    parts = tc.repartitionByRange(n_parts, "doc_id").withColumn(
        "pid", F.spark_partition_id()
    )
    w = Window.partitionBy("pid").orderBy("doc_id")
    local = parts.withColumn(
        "local_end", F.sum("n_tokens").over(w)
    ).persist()
    totals = sorted(
        (r["pid"], r["tot"])
        for r in local.groupBy("pid")
        .agg(F.max("local_end").alias("tot"))
        .collect()
    )
    base = {}
    acc = 0
    for pid, tot in totals:
        base[pid] = acc
        acc += tot
    spark = docs.sparkSession
    base_df = spark.createDataFrame(
        [(int(p), int(b)) for p, b in base.items()], "pid int, base long"
    )
    out = (
        local.join(F.broadcast(base_df), "pid")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("base") + F.col("local_end") - F.col("n_tokens")).alias(
                "start_off"
            ),
        )
        .select(
            "doc_id",
            "n_tokens",
            "start_off",
            # `div` = exact integer division on longs (no double round
            # trip — safe past 2^53 tokens)
            F.expr(f"start_off div {seq_len}").alias("first_block"),
            F.expr(f"(start_off + n_tokens - 1) div {seq_len}").alias(
                "last_block"
            ),
        )
        .withColumn(
            "n_splits", (F.col("last_block") - F.col("first_block"))
        )
    )
    local.unpersist()
    return out


def pack_sequences_sql(seq_len: int = 512) -> str:
    """DuckDB oracle: the same layout via one windowed cumsum."""
    return f"""
WITH tc AS (
  SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens
  FROM documents
),
off AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0)::BIGINT AS start_off
  FROM tc
)
SELECT doc_id, n_tokens, start_off,
       (start_off // {seq_len})::BIGINT AS first_block,
       ((start_off + n_tokens - 1) // {seq_len})::BIGINT AS last_block,
       ((start_off + n_tokens - 1) // {seq_len}
        - start_off // {seq_len})::BIGINT AS n_splits
FROM off
""".strip()
