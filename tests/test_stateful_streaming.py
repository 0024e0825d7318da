"""applyInPandasWithState sessionizer vs the batch window sessionizer:
every CLOSED session must match the batch result exactly; the trailing open
session per user stays in state."""

import pytest
from pyspark.sql import functions as F

from pbx_ds_ocr_server_spark.operators.sessions import sessionize
from pbx_ds_ocr_server_spark.streaming.stateful import sessionize_stream


@pytest.fixture(scope="module")
def stream_result(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stateful")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "user_id", "event_id", "ts"
    )
    inp = str(base / "in")
    ev.write.parquet(inp)
    stream = spark.readStream.schema(ev.schema).parquet(inp)
    q = (
        sessionize_stream(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("closed_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(base / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("select * from closed_sessions").cache()
    got.count()
    return ev, got


def test_closed_sessions_match_batch(spark, stream_result):
    ev, got = stream_result
    batch = sessionize(ev, gap_seconds=1800)
    # drop the LAST (still-open) session per user from the batch result
    last = batch.groupBy("user_id").agg(F.max("session_id").alias("session_id"))
    closed_batch = batch.join(last, ["user_id", "session_id"], "left_anti")
    a = got.select("user_id", "session_id", "n_events", "duration_sec")
    b = closed_batch.select("user_id", "session_id", "n_events", "duration_sec")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    assert got.count() > 0


def test_no_duplicate_sessions(stream_result):
    _, got = stream_result
    dups = got.groupBy("user_id", "session_id").count().filter("count > 1")
    assert dups.count() == 0


class _StubState:
    """Minimal GroupState stand-in for driving the updater directly."""

    def __init__(self, value=None):
        self._v = value

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def _run_updater(state, *chunks, gap=1800):
    import pandas as pd

    from pbx_ds_ocr_server_spark.streaming.stateful import (
        make_session_updater,
    )

    update = make_session_updater(gap)
    frames = [
        pd.DataFrame(
            {
                "ts": [pd.Timestamp(t, unit="s") for t, _ in c],
                "event_id": [e for _, e in c],
            }
        )
        for c in chunks
    ]
    (out,) = list(update((7,), iter(frames), state))
    return out


def test_group_sorted_across_arrow_chunks():
    """Tenth-review fix: a group larger than maxRecordsPerBatch arrives as
    SEVERAL Arrow chunks in arbitrary order — a per-chunk sort processed
    chunk 2's earlier timestamps after chunk 1's later ones, splitting
    sessions that the batch twin keeps whole."""
    state = _StubState()
    # chunk 1 holds the LATER half, chunk 2 the earlier half; every
    # consecutive gap in the true order is 600 s (< gap) -> ONE session
    later = [(10_000 + 600 * i, i) for i in range(5, 10)]
    earlier = [(10_000 + 600 * i, i) for i in range(5)]
    out = _run_updater(state, later, earlier)
    assert len(out) == 0  # nothing closed: it is all one open session
    last, sid, start, n = state.get
    assert (sid, n) == (1, 10)  # one session, all ten events
    assert start == 10_000 and last == 10_000 + 600 * 9


def test_cross_batch_late_event_never_rewinds_state():
    """Tenth-review fix: a late event in a later micro-batch must not
    regress last_epoch (negative durations, premature gap closes)."""
    state = _StubState()
    _run_updater(state, [(10_000, 0)])
    _run_updater(state, [(9_500, 1)])  # late, within gap: joins session
    last, sid, start, n = state.get
    assert (last, sid, n) == (10_000, 1, 2)  # clamped, not rewound
    # the next event 1700s after the TRUE last must not close the session
    out = _run_updater(state, [(11_700, 2)])
    assert len(out) == 0
    last, sid, start, n = state.get
    assert (sid, n) == (1, 3)
