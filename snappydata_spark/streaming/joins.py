"""Stream-stream interval join — the two-stream CQ shape (the reference
joins stream relations inside CQs via DStream windows, SchemaDStream +
WindowLogicalPlan; SURVEY §2.9).  Structured Streaming's upgrade is the
watermarked interval join: both sides declare event-time watermarks and
the join condition bounds the time skew, so state for either side is
evicted once the watermark passes — bounded state on unbounded streams,
which processing-time DStream windows never guaranteed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | tuple[str, ...],
    left_ts: str,
    right_ts: str,
    lower_seconds: int = 0,
    upper_seconds: int = 600,
    watermark: str = "1 minute",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on equality keys + a time interval:
    right_ts ∈ [left_ts + lower, left_ts + upper].

    Column contract: `on` names exist on both sides; every other column
    name must be disjoint (rename upstream otherwise — explicit beats
    silent suffixing).  Returns the joined stream; state size is bounded
    by (upper_seconds - lower_seconds) + watermark per key.

    Scale: each side shuffles once on the key columns (co-partitioned
    stateful join); watermark eviction keeps per-executor state
    proportional to the interval width × per-key arrival rate, never to
    stream history.
    """
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must have distinct names")
    overlap = (set(left.columns) & set(right.columns)) - set(on)
    if overlap:
        raise ValueError(
            f"ambiguous non-key columns on both sides: {sorted(overlap)} — "
            "rename before joining"
        )
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = None
    for k in on:
        eq = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = eq if cond is None else cond & eq
    lo = F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {int(lower_seconds)} SECONDS")
    hi = F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {int(upper_seconds)} SECONDS")
    interval = (F.col(f"r.{right_ts}") >= lo) & (F.col(f"r.{right_ts}") <= hi)
    # on=[] is a pure time-interval join: `None & interval` would build a
    # NULL condition that silently filters every row
    cond = interval if cond is None else cond & interval
    joined = l.join(r, cond, how)
    # drop the duplicated key columns from the right side
    keep = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{c}") for c in right.columns if c not in set(on)
    ]
    return joined.select(*keep)
