"""Approximate-nearest-neighbor search over embedding columns.

Two paths:
  * ``brute_force_topk``    — exact cosine top-k (the correctness baseline;
    one scan + a k-row ordered take; at scale, per-partition top-k then
    driver merge — Spark's sort-limit already does exactly that).
  * ``with_lsh_bucket`` / ``lsh_topk`` — random-hyperplane LSH: bucket id =
    sign bits of the embedding against deterministic pseudo-hyperplanes
    derived from md5 (reproducible in ANSI SQL — no RNG, no model state).
    Queries probe only their bucket: the scale path (candidate set shrinks
    ~2^planes), trading recall for a bounded, shuffle-free scan.

Both are pure column expressions — JVM-side, no Python per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pbx_ds_ocr_server_spark.operators.dedup import cosine


def as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def hyperplane(plane: int, dims: int) -> Column:
    """Deterministic ±1 pseudo-hyperplane: component i is +1 when the first
    hex digit of md5('<plane>:<i>') is 0-7, else −1."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dims - 1)),
        lambda i: F.when(
            F.substring(
                F.md5(F.concat(F.lit(str(plane) + ":"), i.cast("string"))), 1, 1
            ).rlike("[0-7]"),
            F.lit(1.0),
        ).otherwise(F.lit(-1.0)),
    )


def lsh_bucket(vec_col: Column | str, n_planes: int, dims: int) -> Column:
    """Bucket id in [0, 2^n_planes): bit p set when dot(vec, plane_p) > 0."""
    v = as_double_array(vec_col)
    bucket = F.lit(0).cast("bigint")
    for p in range(n_planes):
        dot = F.aggregate(
            F.zip_with(v, hyperplane(p, dims), lambda x, h: x * h),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0)).cast(
            "bigint"
        )
    return bucket


def with_lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 8,
    dims: int | None = None,
) -> DataFrame:
    if dims is None:
        dims = len(df.select(vec_col).first()[0])
    return df.withColumn("bucket", lsh_bucket(vec_col, n_planes, dims))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """Exact top-k by cosine vs a literal query vector; deterministic
    tie-break on (rounded score, id) so results are engine-comparable."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col).alias("neighbor"),
        F.round(cosine(as_double_array(vec_col), q), round_dp).alias("cos"),
    )
    return scored.orderBy(F.desc("cos"), F.asc("neighbor")).limit(k)


def label_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    round_dp: int = 5,
) -> DataFrame:
    """Per-label elementwise mean vectors, long form (label, dim, centroid).

    posexplode keeps the math mirror-able in ANSI SQL (unnest + group by
    index); the long form doubles as the IVF coarse-quantizer table."""
    exploded = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(as_double_array(vec_col)).alias("dim", "v"),
    )
    return exploded.groupBy("label", "dim").agg(
        F.round(F.avg("v"), round_dp).alias("centroid")
    )


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_dp: int = 6,
) -> DataFrame:
    """IVF-style ANN: pick the nearest coarse-quantizer centroid (here the
    per-label means), then exact-search only that list — the classic
    inverted-file trade: cost drops to |list|, recall bounded by the
    quantizer. Runs as two tiny jobs + one filtered scan; no shuffle of
    vectors beyond the centroid agg."""
    cents = label_centroids(df, vec_col, label_col, round_dp=round_dp)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cvec = cents.groupBy("label").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("dim"), F.col("centroid")))
        ).alias("dims")
    ).select(
        "label", F.expr("transform(dims, d -> d.centroid)").alias("cvec")
    )
    scored = cvec.select(
        "label", F.round(cosine(F.col("cvec"), q), round_dp).alias("ccos")
    )
    best = scored.orderBy(F.desc("ccos"), F.asc("label")).first()
    cand = df.filter(F.col(label_col) == best["label"])
    return brute_force_topk(cand, query_vec, k, id_col, vec_col, round_dp)


def lsh_topk(
    df_bucketed: DataFrame,
    query_vec: list[float],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
) -> DataFrame:
    """ANN: score only rows in the query's bucket (1/2^planes of the data in
    expectation). df_bucketed must carry the 'bucket' column."""
    dims = len(query_vec)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qbucket = (
        df_bucketed.sparkSession.range(1)
        .select(lsh_bucket(q, n_planes, dims).alias("b"))
        .first()[0]
    )
    cand = df_bucketed.filter(F.col("bucket") == qbucket)
    return (
        cand.select(
            F.col(id_col).alias("neighbor"),
            F.round(cosine(as_double_array(vec_col), q), 6).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("neighbor"))
        .limit(k)
    )
