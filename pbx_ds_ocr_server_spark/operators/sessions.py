"""Gap-based sessionization over event streams (batch form).

The classic two-window composition — no UDF, fully codegen:
  1. ``lag(ts)`` per user (ordered by ts, event_id for determinism)
  2. session-start flag when the gap exceeds the threshold
  3. running sum of flags → session_id
  4. aggregate per (user, session)

The same semantics run incrementally under Structured Streaming with
``applyInPandasWithState`` when true streaming sessionization is needed;
batch-over-history is the shape analytics pipelines actually use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(user_id, session_id, n_events, session_start, duration_sec)."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    gap = F.unix_timestamp(ts_col) - F.unix_timestamp(F.lag(ts_col).over(w))
    flagged = events.withColumn(
        "is_start",
        F.when(gap.isNull() | (gap > gap_seconds), F.lit(1)).otherwise(F.lit(0)),
    )
    run = Window.partitionBy(user_col).orderBy(
        F.col(ts_col), F.col(id_col)
    ).rowsBetween(Window.unboundedPreceding, 0)
    sessions = flagged.withColumn(
        "session_id", F.sum("is_start").over(run).cast("bigint")
    )
    return sessions.groupBy(
        F.col(user_col).alias("user_id"), "session_id"
    ).agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("session_start"),
        (
            F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
        ).cast("bigint").alias("duration_sec"),
    )
