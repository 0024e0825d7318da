"""Custom stateful streaming operator: incremental gap-based sessionization
via ``applyInPandasWithState``.

The batch twin is ``operators/sessions.sessionize`` (pure windows); this
variant maintains one open session per user across micro-batches and emits a
session row the moment a gap closes it. State per user: (last event epoch,
running session ordinal, session start epoch, event count). Closed sessions
are emitted exactly once; the final open session per user stays in state
(a terminal flush would need a processing-time timeout — deliberate, since
"the stream never ends" is the semantic).

Determinism: events within a micro-batch are sorted by (ts, event_id) —
ACROSS the iterator's Arrow chunks, not per chunk (a group bigger than
``spark.sql.execution.arrow.maxRecordsPerBatch`` arrives as several
chunks in arbitrary order; tenth-review fix); the emitted (user_id,
session ordinal, counts, duration) match the batch sessionizer for every
closed session.

Late-data contract: there is no watermark, so an event arriving in a
LATER micro-batch with an EARLIER timestamp than state's last event
cannot be re-sorted into its session (the batch twin, which sees the
whole log, would have). Such an event joins the current session if
within the gap (and ``last_epoch`` is CLAMPED monotone so durations can
never go negative) or honestly opens a new session if beyond it;
replaying the log through the batch sessionizer is the reconciliation
path, exactly-once per closed session either way.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id bigint, session_id bigint, n_events bigint,"
    " session_start timestamp, duration_sec bigint"
)
STATE_SCHEMA = (
    "last_epoch bigint, session_id bigint, start_epoch bigint, n_events bigint"
)


def make_session_updater(gap_seconds: int = 1800):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            last_epoch, session_id, start_epoch, n_events = state.get
        else:
            last_epoch, session_id, start_epoch, n_events = None, 0, None, 0
        closed: list[tuple] = []
        # one sort over the WHOLE group's micro-batch: the iterator yields
        # Arrow chunks (maxRecordsPerBatch-sized) in no guaranteed order,
        # and a per-chunk sort would process chunk 2's earlier timestamps
        # after chunk 1's later ones — false splits, wrong durations
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            whole = (
                pd.concat(chunks, ignore_index=True)
                if len(chunks) > 1
                else chunks[0]
            ).sort_values(["ts", "event_id"])
            for ts in whole["ts"]:
                ep = int(pd.Timestamp(ts).timestamp())
                if last_epoch is None:
                    session_id += 1
                    start_epoch, n_events = ep, 1
                elif ep - last_epoch > gap_seconds:
                    closed.append(
                        (
                            user_id,
                            session_id,
                            n_events,
                            pd.to_datetime(start_epoch, unit="s"),
                            last_epoch - start_epoch,
                        )
                    )
                    session_id += 1
                    start_epoch, n_events = ep, 1
                else:
                    n_events += 1
                # clamp monotone: a cross-batch late event must never
                # rewind state (negative durations, premature gap closes)
                last_epoch = ep if last_epoch is None else max(last_epoch, ep)
        state.update((last_epoch, session_id, start_epoch, n_events))
        yield pd.DataFrame(
            closed,
            columns=[
                "user_id",
                "session_id",
                "n_events",
                "session_start",
                "duration_sec",
            ],
        )

    return update


def sessionize_stream(
    events: DataFrame, gap_seconds: int = 1800
) -> DataFrame:
    """Streaming DataFrame (user_id, event_id, ts, ...) → closed-session rows.
    Works only on streaming inputs (applyInPandasWithState requirement)."""
    from pyspark.sql import functions as F

    src = events.withColumn("ts", F.col("ts").cast("timestamp")).select(
        "user_id", "event_id", "ts"
    )
    return src.groupBy("user_id").applyInPandasWithState(
        make_session_updater(gap_seconds),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
