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
