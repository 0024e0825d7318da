"""Deterministic k-means / IVF: cluster recovery, partition-invariance,
probe recall on separable data."""

import pytest
from pyspark.sql import functions as F

from pbx_ds_ocr_server_spark.operators.kmeans import (
    assign_clusters,
    ivf_kmeans_topk,
    kmeans_fit,
)
from pbx_ds_ocr_server_spark.operators.similarity import brute_force_topk


@pytest.fixture(scope="module")
def clustered(spark):
    """Three well-separated blobs in 4-D, deterministic offsets."""
    rows = []
    for c, base in enumerate(([10.0, 0, 0, 0], [0, 10.0, 0, 0], [0, 0, 10.0, 0])):
        for j in range(40):
            jit = [((i * 7 + j * 13) % 5) / 10.0 for i in range(4)]
            rows.append((c * 100 + j, [b + e for b, e in zip(base, jit)]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_kmeans_recovers_separated_clusters(clustered):
    cents = kmeans_fit(clustered, k=3, iters=5)
    # each centroid should sit near one blob center: its max component ≈ 10
    majors = sorted(c.index(max(c)) for c in cents)
    assert majors == [0, 1, 2]
    assert all(max(c) > 8.0 for c in cents)


def test_assignment_partition_invariant(clustered):
    cents = kmeans_fit(clustered, k=3, iters=3)
    a = assign_clusters(clustered.repartition(2), cents).select("vec_id", "cluster")
    b = assign_clusters(clustered.repartition(13), cents).select("vec_id", "cluster")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_clusters_are_pure(clustered):
    cents = kmeans_fit(clustered, k=3, iters=5)
    assigned = assign_clusters(clustered, cents)
    impure = (
        assigned.groupBy((F.col("vec_id") / 100).cast("int").alias("truth"))
        .agg(F.countDistinct("cluster").alias("n"))
        .filter("n > 1")
    )
    assert impure.count() == 0


def test_ivf_topk_matches_bruteforce_on_probed_list(clustered):
    query = [10.0, 0.3, 0.1, 0.2]
    ivf = ivf_kmeans_topk(clustered, query, k_clusters=3, iters=3, k=5)
    brute = brute_force_topk(clustered, query, k=5)
    # the query sits inside blob 0; probing one list must find the same top-5
    assert [r.neighbor for r in ivf.collect()] == [
        r.neighbor for r in brute.collect()
    ]
