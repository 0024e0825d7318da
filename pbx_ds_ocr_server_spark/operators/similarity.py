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

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from pbx_ds_ocr_server_spark.operators.dedup import cosine


def as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def hyperplane(plane: int, dims: int) -> Column:
    """Deterministic ±1 pseudo-hyperplane: component i is +1 when the first
    hex digit of md5('<plane>:<i>') is 0-7, else −1.

    Materialized driver-side as a LITERAL array: the md5 rule runs dims
    times per plane on the driver, zero times per row (the first-cut column
    form evaluated dims×planes md5s per ROW — the whole reason impl='expr'
    was slow). Values are bit-identical to the SQL mirror's per-row rule."""
    signs = [
        1.0
        if hashlib.md5(f"{plane}:{i}".encode()).hexdigest()[0] in "01234567"
        else -1.0
        for i in range(dims)
    ]
    return F.array(*[F.lit(s) for s in signs])


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


def hyperplane_matrix(n_planes: int, dims: int) -> np.ndarray:
    """dims × n_planes ±1 matrix — the SAME md5 rule as :func:`hyperplane`,
    materialized once on the driver (tiny: dims × planes bytes)."""
    H = np.empty((dims, n_planes), dtype=np.float64)
    for p in range(n_planes):
        for i in range(dims):
            first = hashlib.md5(f"{p}:{i}".encode()).hexdigest()[0]
            H[i, p] = 1.0 if first in "01234567" else -1.0
    return H


def _bucket_of(vecs: np.ndarray, H: np.ndarray) -> np.ndarray:
    pows = (1 << np.arange(H.shape[1], dtype=np.int64)).astype(np.int64)
    return ((vecs @ H) > 0).astype(np.int64) @ pows


def lsh_bucket_pandas(n_planes: int, dims: int):
    """Arrow-batched bucket computation: one float64 matmul per batch
    against the constant hyperplane matrix — measured ~5× over the nested
    JVM aggregate/zip_with lambdas, which stay outside whole-stage codegen.
    Same md5 determinism, so the ANSI-SQL oracle mirror is unchanged (sign
    decisions can differ from sequential summation only when a dot product
    sits within ~1e-13 of zero — measure-zero for real embeddings)."""
    H = hyperplane_matrix(n_planes, dims)

    @pandas_udf("long")
    def _bucket(v: pd.Series) -> pd.Series:
        vals = v.tolist()
        # NULL or wrong-length embeddings must bucket to 0 like the expr
        # path (whose when(dot>0) falls through on NULL) instead of
        # raising an object-dtype matmul error that kills the whole stage
        # — the two documented-interchangeable impls must agree on
        # exactly the rows that used to crash this one (eleventh review)
        dims_n = H.shape[0]
        clean = [
            x if x is not None and len(x) == dims_n else [0.0] * dims_n
            for x in vals
        ]
        if not clean:
            return pd.Series(np.empty(0, dtype=np.int64))
        return pd.Series(_bucket_of(np.array(clean, dtype=np.float64), H))

    return _bucket


def with_lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 8,
    dims: int | None = None,
    impl: str = "pandas",
) -> DataFrame:
    """Add the LSH 'bucket' column. ``impl='pandas'`` (default) uses the
    Arrow-batched matmul — the production path. ``impl='expr'`` is the pure
    column-expression form whose sequential left-to-right fold matches the
    ANSI-SQL mirror's summation ORDER bit-for-bit; use it wherever results
    are hash-gated against the oracle (numpy's blocked/SIMD summation can
    flip a sign bit when a dot product sits within float ulps of zero —
    measure-zero for real embeddings, but 'almost always equal' is the
    wrong property for an exactness gate). With literal hyperplane arrays
    the expr path is within ~2× of the matmul."""
    if dims is None:
        # one tiny probe job per call — pass dims explicitly in loops
        first = df.select(vec_col).first()
        if first is None or first[0] is None:
            raise ValueError(
                "cannot infer dims from an empty frame or NULL first"
                f" {vec_col!r}; pass dims= explicitly"
            )
        dims = len(first[0])
    if impl == "pandas":
        return df.withColumn("bucket", lsh_bucket_pandas(n_planes, dims)(vec_col))
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


def label_centroid_vectors(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    round_dp: int = 5,
) -> DataFrame:
    """(label, cvec): the long-form :func:`label_centroids` table folded
    back to one rounded mean vector per label — the coarse-quantizer table
    in the shape search-time ranking wants. Tiny by construction (one row
    per inverted list)."""
    cents = label_centroids(df, vec_col, label_col, round_dp=round_dp)
    return cents.groupBy("label").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("dim"), F.col("centroid")))
        ).alias("dims")
    ).select(
        "label", F.expr("transform(dims, d -> d.centroid)").alias("cvec")
    )


def ivf_probe_labels(
    df: DataFrame,
    query_vec: list[float],
    nprobe: int = 1,
    vec_col: str = "embedding",
    label_col: str = "label",
    round_dp: int = 6,
) -> list:
    """The IVF coarse stage, generalized to multiprobe: the ``nprobe``
    labels whose per-label centroids have the highest ROUNDED cosine to
    the query, ordered best-first, ties → lowest label. Raises on an empty
    frame (a coarse quantizer over nothing is a caller bug, not an empty
    result)."""
    cvec = label_centroid_vectors(df, vec_col, label_col, round_dp)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = cvec.select(
        "label", F.round(cosine(F.col("cvec"), q), round_dp).alias("ccos")
    )
    rows = scored.orderBy(F.desc("ccos"), F.asc("label")).take(nprobe)
    if not rows:
        raise ValueError("IVF coarse stage over an empty frame")
    return [r["label"] for r in rows]


def ivf_best_label(
    df: DataFrame,
    query_vec: list[float],
    vec_col: str = "embedding",
    label_col: str = "label",
    round_dp: int = 6,
):
    """nprobe=1 :func:`ivf_probe_labels`, shared by :func:`ivf_topk` and
    `operators/pq.ivf_pq_topk` so the selection rule cannot drift."""
    return ivf_probe_labels(
        df, query_vec, 1, vec_col, label_col, round_dp
    )[0]


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
    best = ivf_best_label(df, query_vec, vec_col, label_col, round_dp)
    cand = df.filter(F.col(label_col) == best)
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
    # query bucket: same matmul math as lsh_bucket_pandas, driver-side
    # (no Spark job for one vector)
    qbucket = int(
        _bucket_of(
            np.asarray([query_vec], dtype=np.float64),
            hyperplane_matrix(n_planes, dims),
        )[0]
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
