"""Custom stateful streaming operators (SURVEY.md §2.9).

The reference's continuous queries keep per-key state inside its store
(stream table + PUT INTO upsert loop); the Structured-Streaming-native
equivalent is `applyInPandasWithState` — Arrow-batched per-key state kept
by Spark's state store, checkpointed, and partitioned by the grouping key
(so state never concentrates on one executor; at 100 TB the state store
shards with the shuffle partitioning).

Two operators:

- ``running_totals``: per-key running count/sum across batches — the
  stateful upgrade of the reference's CQ-into-PUT-INTO accumulation loop
  (SnappyStreamingContext.registerCQ + put; SnappySinkCallback.scala
  upsert path :325-351).
- ``sessionize_stream``: gap-based session tracking with custom state —
  the operator the reference lacks (it has processing-time sliding
  windows only, WindowPhysicalPlan.scala:28); batch twin in
  operators/events.py ``ev_sessionize``.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def running_totals(stream: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-key running (count, total) emitted every batch (update mode).

    State = (count: long, total: double); output rows carry the running
    values, so a downstream sink (e.g. SnappySink put-into) sees the
    latest aggregate per key exactly like the reference's CQ+PUT loop.
    """
    out_schema = StructType(
        [
            StructField(key_col, StringType()),
            StructField("cnt", LongType()),
            StructField("total", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("cnt", LongType()), StructField("total", DoubleType())]
    )

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            cnt, total = state.get
        else:
            cnt, total = 0, 0.0
        for pdf in pdfs:
            cnt += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((cnt, total))
        yield pd.DataFrame({key_col: [key[0]], "cnt": [cnt], "total": [total]})

    return (
        stream.selectExpr(f"CAST({key_col} AS STRING) AS {key_col}", value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def sessionize_stream(
    stream: DataFrame, key_col: str, ts_col: str, gap_seconds: int = 1800
) -> DataFrame:
    """Gap-based sessionization with custom state: emits the current
    session (start, end, events) for each key on every batch; a new
    session starts when an event arrives more than ``gap_seconds`` after
    the previous one.  State = (session_start, last_ts, n_events) as
    FRACTIONAL epoch seconds (timestamp→double keeps microseconds;
    unix_timestamp truncation made the stream disagree with the batch
    twin ev_sessionize on gap-boundary sessions).  State store columns
    must be Spark-serializable scalars — doubles are."""
    out_schema = StructType(
        [
            StructField(key_col, StringType()),
            StructField("session_start", DoubleType()),
            StructField("session_end", DoubleType()),
            StructField("n_events", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("session_start", DoubleType()),
            StructField("last_ts", DoubleType()),
            StructField("n_events", LongType()),
        ]
    )

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        rows = []
        ts_all: list[float] = []
        for pdf in pdfs:
            ts_all.extend(float(t) for t in pdf["__ts_epoch"].tolist())
        for ts in sorted(ts_all):
            if last is not None and ts - last > gap_seconds:
                rows.append((key[0], start, last, n))  # closed session
                start, n = ts, 0
            if start is None:
                start = ts
            # a LATE event (out of order across micro-batches: ts < last)
            # merges into the current session by widening its bounds —
            # regressing `last` to the late timestamp emitted sessions
            # with end < start and made the NEXT gap check measure from
            # the stale late event, splitting sessions the batch twin
            # (ev_sessionize over totally-ordered data) keeps whole
            start = min(start, ts)
            last = ts if last is None else max(last, ts)
            n += 1
        state.update((start, last, n))
        rows.append((key[0], start, last, n))  # open session snapshot
        yield pd.DataFrame(
            rows, columns=[key_col, "session_start", "session_end", "n_events"]
        )

    return (
        stream.selectExpr(
            f"CAST({key_col} AS STRING) AS {key_col}",
            f"CAST({ts_col} AS DOUBLE) AS __ts_epoch",
        )
        # a NULL/unparseable timestamp would arrive as NaN and int(NaN)
        # would fail the task (killing the whole streaming query) — drop
        # such rows before they reach the state function
        .filter(F.col("__ts_epoch").isNotNull())
        .groupBy(key_col)
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def stream_dedup(
    stream: DataFrame,
    keys: list[str],
    event_time_col: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact-dedup — the ingest-side dedup stage of a
    training-data pipeline (batch twin: dedup/dedup_exact): emit only the
    FIRST row seen per key tuple (e.g. a content fingerprint).

    With `event_time_col`, dedup state is watermark-bounded
    (`dropDuplicatesWithinWatermark`): keys older than the watermark are
    evicted, so state size is bounded by the watermark window — the only
    form that survives an unbounded 100 TB/day stream.  Without it, state
    grows with distinct keys forever (exact global dedup — fine for
    bounded backfills, documented trade-off)."""
    if event_time_col is not None:
        return stream.withWatermark(event_time_col, watermark)\
            .dropDuplicatesWithinWatermark(keys)
    return stream.dropDuplicates(keys)
