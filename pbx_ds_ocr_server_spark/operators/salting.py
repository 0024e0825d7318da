"""Skew handling: explicit salting + size-aware partitioning (SURVEY.md §4).

The reference serializes all work through ≤max_workers threads
(``/root/reference/app/config.py:48``), so a giant document just takes long;
at 10^12-doc scale, hot hosts and giant blobs create stragglers. Strategy:

  * ``salt_partitions`` — repartition on ``xxhash64(url, salt_seed)`` so rows
    from one hot host spread uniformly over all partitions (the input table is
    typically clustered by crawl host/time, which is exactly the skew).
  * ``salt_partitions_by_size`` — two-tier variant: documents above
    ``giant_bytes`` are range-distributed alone (one giant per task slot
    at a time), the rest hash-spread. Use when blob-size variance is extreme.
  * Batch-level balance comes from ``arrow.maxRecordsPerBatch`` (session.py)
    so one Arrow batch never accumulates many giants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salt_partitions(
    df: DataFrame, num_partitions: int | None = None, salt_seed: int = 42
) -> DataFrame:
    n = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    # repartition on the FULL 64-bit hash, not pmod(hash, n): Spark hashes
    # the key again, so n distinct salt values collide into ~0.63n partitions
    # (balls-in-bins) — full entropy keys spread uniformly.
    return df.repartition(n, F.xxhash64(F.col("url"), F.lit(salt_seed)))


def salt_partitions_by_size(
    df: DataFrame,
    payload_col: str = "html",
    giant_bytes: int = 8 * 1024 * 1024,
    num_partitions: int | None = None,
) -> DataFrame:
    n = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    is_giant = F.octet_length(F.col(payload_col)) > F.lit(giant_bytes)
    # giants: spread by their own full-entropy hash (distinct seed) so they
    # land independently of the normal-row distribution; normals: salted hash
    key = F.when(
        is_giant, F.xxhash64(F.col("url"), F.lit(1))
    ).otherwise(F.xxhash64(F.col("url"), F.lit(42)))
    return df.repartition(n, key)
