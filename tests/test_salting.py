"""Salting helpers: spread quality and result-invariance."""

from pyspark.sql import functions as F

from pbx_ds_ocr_server_spark.operators.extract import extract
from pbx_ds_ocr_server_spark.operators.salting import (
    salt_partitions,
    salt_partitions_by_size,
)


def test_salt_spreads_hot_host(spark):
    # 400 urls from ONE host (the crawl-clustered worst case)
    rows = [(f"https://hot.example/{i}", b"<p>x</p>") for i in range(400)]
    df = spark.createDataFrame(rows, "url string, html binary").coalesce(1)
    salted = salt_partitions(df, num_partitions=8)
    sizes = (
        salted.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    assert len(sizes) == 8  # every partition got rows
    assert max(r["count"] for r in sizes) < 400 * 0.5  # no single hot partition


def test_salt_by_size_separates_giants(spark):
    rows = [(f"https://h/{i}", b"x" * 100) for i in range(64)] + [
        (f"https://h/g{i}", b"y" * 200_000) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "url string, html binary").coalesce(1)
    salted = salt_partitions_by_size(df, giant_bytes=100_000, num_partitions=8)
    per = (
        salted.withColumn("pid", F.spark_partition_id())
        .withColumn("giant", F.octet_length("html") > 100_000)
        .groupBy("pid")
        .agg(F.sum(F.col("giant").cast("int")).alias("giants"))
        .collect()
    )
    assert max(r["giants"] for r in per) <= 2  # giants spread, not stacked


def test_salting_never_changes_results(spark, corpus):
    plain = extract(corpus, salted=False).select("url", "text", "status")
    salted = extract(corpus, salted=True).select("url", "text", "status")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_ensure_min_partitions_fans_out_scans_not_shuffled_plans(spark, tmp_path):
    """Eleventh-review fix: probing df.rdd under AQE finalizes the
    adaptive plan and EXECUTES upstream shuffle stages (which the real
    action then re-runs). Plans already containing a shuffle-producing
    node pass through unprobed; pure scans still fan out."""
    from pbx_ds_ocr_server_spark.partitioning import ensure_min_partitions

    p = str(tmp_path / "one_group")
    spark.range(1000).selectExpr(
        "id", "cast(id as string) as text"
    ).coalesce(1).write.parquet(p)
    scan = spark.read.parquet(p)
    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    fanned = ensure_min_partitions(scan)
    assert fanned.rdd.getNumPartitions() >= target  # scan: fanned out

    agged = scan.groupBy("text").count()
    out = ensure_min_partitions(agged)
    assert out is agged  # shuffle-bearing plan: passed through untouched


def test_ensure_min_partitions_ignores_identifier_lookalikes(spark, tmp_path):
    """Round-8 fix: node-name matching is anchored to plan-tree positions.
    Column names are printed in the same plan string, so a scan whose
    columns are called `Sorted` / `joinId` must NOT be mistaken for a
    shuffle-bearing plan (which would silently skip the fan-out and
    reintroduce the 1-of-32-cores trap); a real Sort node must still
    pass through untouched."""
    from pbx_ds_ocr_server_spark.partitioning import ensure_min_partitions

    p = str(tmp_path / "lookalike")
    spark.range(1000).selectExpr(
        "id",
        "cast(id as string) as Sorted",
        "cast(id as string) as joinId",
        "cast(id as string) as WindowedAggregateExceptJoin",
    ).coalesce(1).write.parquet(p)
    scan = spark.read.parquet(p)
    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert ensure_min_partitions(scan).rdd.getNumPartitions() >= target

    ordered = scan.orderBy("id")  # real Sort node, at a tree position
    assert ensure_min_partitions(ordered) is ordered
