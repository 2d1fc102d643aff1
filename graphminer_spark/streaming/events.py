"""Event-stream operators: windowed aggregation, sessionization, and a
Structured-Streaming runner.

The reference has no streaming surface (its temporal dir is a reading
list, ``src/temporal/README.md``); these operators exist because a web
crawl is ingested continuously at 100 TB scale — the same windowed
aggregates run identically as a batch DataFrame program or under
``readStream`` with a watermark (see ``stream_windowed_counts``).

Batch variants are oracle-checked against DuckDB; the streaming runner
is smoke-tested via the in-memory sink with ``processAllAvailable``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SESSION_GAP_MIN = 30


def windowed_counts(events: DataFrame, minutes: int = 60) -> DataFrame:
    """Tumbling-window counts per event_type →
    ``(window_start, event_type, n, total_value_bp)``."""
    w = F.window("ts", f"{minutes} minutes")
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            # integer cents: exact cross-engine comparison
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("total_value_c"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value_c",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = SESSION_GAP_MIN) -> DataFrame:
    """Gap-based sessionization per user →
    ``(user_id, session_id, n_events, start_ts, end_ts)``.

    session boundary = gap > ``gap_minutes`` since previous event of
    the same user; session_id = per-user ordinal (1-based). The lag +
    cumulative-sum-over-window formulation is one shuffle (by user).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts may be TIMESTAMP_NTZ (parquet); route via TIMESTAMP (UTC
    # session) to epoch seconds
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    is_new = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    tagged = events.withColumn("_new", is_new).withColumn(
        "session_id", F.sum("_new").over(w)
    )
    return (
        tagged.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
        )
    )


def top_users_by_value(events: DataFrame, k: int = 10) -> DataFrame:
    """Top-k users by summed value (integer cents) →
    ``(user_id, total_value_c, rank)`` — ties break by user_id."""
    agg = events.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("total_value_c")
    )
    w = Window.orderBy(F.col("total_value_c").desc(), F.col("user_id"))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def stream_windowed_counts(
    spark: SparkSession,
    parquet_dir: str,
    schema: str,
    minutes: int = 60,
    watermark: str = "2 hours",
    query_name: str = "windowed_counts",
):
    """The same windowed aggregate as ``windowed_counts``, but as a
    Structured Streaming query over a parquet directory source with a
    watermark for late data. Returns the started StreamingQuery; caller
    drives it with ``processAllAvailable()`` and reads the in-memory
    sink table ``query_name``."""
    events = (
        spark.readStream.schema(schema).parquet(parquet_dir)
        # watermarks require TIMESTAMP (with zone); parquet NTZ → UTC
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
    )
    agg = windowed_counts(events, minutes)
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def stream_dedup_events(
    spark: SparkSession,
    parquet_dir: str,
    schema: str,
    watermark: str = "2 hours",
    query_name: str = "dedup_events",
):
    """Streaming exact dedup on ``event_id`` with bounded state:
    ``dropDuplicatesWithinWatermark`` keyed on event_id ALONE, so a
    re-emission of the same event_id with a different timestamp inside
    the watermark horizon is still dropped (plain ``dropDuplicates``
    on (event_id, ts) would keep it). The watermark lets the engine
    EVICT seen-keys older than the horizon — the property that makes
    streaming dedup possible at 100 TB/day (an unbounded seen-set
    would OOM any cluster). First occurrence wins."""
    events = (
        spark.readStream.schema(schema).parquet(parquet_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
    )
    deduped = events.dropDuplicatesWithinWatermark(["event_id"])
    return (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def stream_enriched_events(
    spark: SparkSession,
    events_dir: str,
    sessions_dir: str,
    schema: str,
    query_name: str = "enriched_events",
):
    """Stream-stream interval join: enrich each event with the session
    marker the same user opened within the preceding hour. Both sides
    carry watermarks and the join has a time-range predicate, so state
    for either side is evicted once the watermark passes — the bounded-
    state pattern for joining two unbounded streams."""
    ev = (
        spark.readStream.schema(schema).parquet(events_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "2 hours")
        .select("event_id", "user_id", "ts", "event_type")
    )
    marks = (
        spark.readStream.schema(schema).parquet(sessions_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("m_user"),
            F.col("ts").alias("m_ts"),
            F.col("event_id").alias("mark_id"),
        )
    )
    joined = ev.join(
        marks,
        (F.col("user_id") == F.col("m_user"))
        & (F.col("m_ts") <= F.col("ts"))
        & (F.col("m_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR")),
    ).select("event_id", "user_id", "ts", "event_type", "mark_id", "m_ts")
    return (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def funnel_counts(events: DataFrame, stages: tuple[str, ...] = ("view", "click", "purchase")) -> DataFrame:
    """Ordered funnel: users whose first occurrence of each stage
    strictly follows the previous stage's first occurrence → one row
    of per-stage completion counts ``(n_<stage1>, n_<stage1>_<stage2>,
    ...)``. Each stage is a filter + min-aggregate + join keyed on
    user_id — no window over the full event stream, so the plan is a
    chain of co-keyed shuffles that scales with users, not events."""
    prev = None
    counts = []
    for i, stage in enumerate(stages):
        cur = (
            events.filter(F.col("event_type") == stage)
            .select("user_id", "ts")
        )
        if prev is not None:
            cur = cur.join(prev, "user_id").filter(
                F.col("ts") > F.col("t_prev")
            )
        cur = cur.groupBy("user_id").agg(F.min("ts").alias("t_prev"))
        name = "n_" + "_".join(stages[: i + 1])
        counts.append(cur.agg(F.count("*").alias(name)))
        prev = cur
    out = counts[0]
    for c in counts[1:]:
        out = out.crossJoin(c)
    return out
