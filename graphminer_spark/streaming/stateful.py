"""Custom stateful streaming operator: running per-user session state
via ``applyInPandasWithState``.

Demonstrates the arbitrary-stateful-processing path the simpler
windowed aggregates can't express: per-key state (open session start,
event count, running value) carried across micro-batches, emitting a
row per closed session. Batch-mode equivalent for testing:
``sessionize`` in ``streaming.events``.

Timeout semantics: with ``use_timeout=True`` idle users' open sessions
are flushed after the gap via ``ProcessingTimeTimeout``. NOTE
``processAllAvailable()`` then blocks until pending state timers fire —
fine for a long-lived production query, wrong for drain-and-assert
tests, which use the default ``use_timeout=False`` (open sessions stay
in state until more data arrives).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)
STATE_SCHEMA = "start long, last long, n long, total double"

SESSION_GAP_SEC = 30 * 60


def _make_update(gap_sec: int, use_timeout: bool):
    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                start, last, n, total = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "session_start": [pd.Timestamp(start, unit="s")],
                        "session_end": [pd.Timestamp(last, unit="s")],
                        "n_events": [n],
                        "total_value": [total],
                    }
                )
            return

        events = pd.concat(list(batches)).sort_values("ts")
        # datetime64 resolution differs by pandas/Arrow version (ns vs
        # us): normalize before integer conversion
        ts = (
            events["ts"].astype("datetime64[ns]").astype("int64")
            // 1_000_000_000
        ).to_numpy()
        vals = events["value"].to_numpy()

        out_rows = []
        if state.exists:
            start, last, n, total = state.get
        else:
            start, last, n, total = int(ts[0]), int(ts[0]), 0, 0.0
        for t, v in zip(ts, vals):
            t = int(t)
            if t - last > gap_sec:
                out_rows.append((user_id, start, last, n, total))
                start, n, total = t, 0, 0.0
            last = t
            n += 1
            total += float(v)
        state.update((start, last, n, total))
        if use_timeout:
            state.setTimeoutDuration(gap_sec * 1000)
        if out_rows:
            yield pd.DataFrame(
                {
                    "user_id": [r[0] for r in out_rows],
                    "session_start": [
                        pd.Timestamp(r[1], unit="s") for r in out_rows
                    ],
                    "session_end": [
                        pd.Timestamp(r[2], unit="s") for r in out_rows
                    ],
                    "n_events": [r[3] for r in out_rows],
                    "total_value": [r[4] for r in out_rows],
                }
            )

    return update


def stream_sessions(
    spark,
    parquet_dir: str,
    schema: str,
    gap_sec: int = SESSION_GAP_SEC,
    use_timeout: bool = False,
    query_name: str = "sessions",
):
    """Streaming gap-sessionization over a parquet directory source.
    Returns the started query; read closed sessions from the in-memory
    sink table ``query_name``."""
    events = (
        spark.readStream.schema(schema).parquet(parquet_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .select("user_id", "ts", "value")
    )
    out = events.groupBy("user_id").applyInPandasWithState(
        _make_update(gap_sec, use_timeout),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if use_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )
    return (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
