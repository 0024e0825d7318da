"""Resumable checkpointed job: crash injection, resume, no double-writes
(K2/K3, SURVEY.md §2.6; north rule 'resumable from checkpoint')."""

import pytest
from pyspark.sql import functions as F

from pbx_ds_ocr_server_spark.operators.extract import extract
from pbx_ds_ocr_server_spark.sources.writer import (
    CheckpointManifest,
    read_lineage,
    read_output,
    run_extract_job,
)

N_BUCKETS = 4


@pytest.fixture(scope="module")
def outdir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("job_out"))


@pytest.fixture(scope="module")
def crashed_then_resumed(spark, corpus, outdir):
    first = run_extract_job(
        spark, corpus, outdir, run_id="r1", n_buckets=N_BUCKETS, fail_after=2
    )
    second = run_extract_job(
        spark, corpus, outdir, run_id="r2", n_buckets=N_BUCKETS
    )
    return first, second


def test_crash_leaves_partial_manifest(crashed_then_resumed, outdir):
    first, _ = crashed_then_resumed
    assert len(first.buckets_done) == 2


def test_resume_skips_completed_buckets(crashed_then_resumed):
    first, second = crashed_then_resumed
    assert sorted(second.buckets_skipped) == sorted(first.buckets_done)
    assert len(second.buckets_done) == N_BUCKETS - 2


def test_no_double_writes_and_complete(spark, crashed_then_resumed, corpus, outdir):
    out = read_output(spark, outdir)
    assert out.count() == corpus.count()
    assert out.groupBy("url").count().filter("count > 1").count() == 0


def test_output_matches_direct_extract(spark, crashed_then_resumed, corpus, outdir):
    via_job = read_output(spark, outdir).select("url", "text", "status")
    direct = extract(corpus).select("url", "text", "status")
    assert via_job.exceptAll(direct).count() == 0
    assert direct.exceptAll(via_job).count() == 0


def test_lineage_rows_cover_all_buckets(spark, crashed_then_resumed, outdir):
    lin = read_lineage(spark, outdir)
    assert {r.bucket for r in lin.collect()} == set(range(N_BUCKETS))
    runs = {r.run_id for r in lin.collect()}
    assert runs == {"r1", "r2"}
    # counts are consistent
    tot = lin.agg(F.sum("n_urls")).first()[0]
    assert tot == read_output(spark, outdir).count()


def test_metrics_written_on_completion(spark, crashed_then_resumed, outdir):
    import os

    m = spark.read.parquet(os.path.join(outdir, "_metrics"))
    row = m.orderBy(F.desc("finished_at")).first()
    assert row.docs_per_sec > 0


def test_manifest_corruption_is_tolerated(tmp_path):
    p = tmp_path / "manifest.json"
    p.write_text("{not json")
    m = CheckpointManifest(str(p))
    assert m.completed() == set()
    m.mark(3, 8, "rX")
    assert m.completed() == {3}


def test_rerun_of_complete_job_is_noop(spark, crashed_then_resumed, corpus, outdir):
    third = run_extract_job(spark, corpus, outdir, run_id="r3", n_buckets=N_BUCKETS)
    assert third.buckets_done == []
    assert len(third.buckets_skipped) == N_BUCKETS


def test_restage_with_different_n_buckets_raises(spark, corpus, tmp_path):
    out = str(tmp_path / "mismatch")
    run_extract_job(spark, corpus, out, run_id="rA", n_buckets=4)
    with pytest.raises(ValueError, match="n_buckets"):
        run_extract_job(spark, corpus, out, run_id="rB", n_buckets=2)


def test_concurrent_buckets_complete_and_match(spark, corpus, tmp_path):
    # concurrency > default: all buckets land, no double-writes, lineage
    # complete — the serialized lineage/manifest section keeps durability
    out = str(tmp_path / "conc")
    res = run_extract_job(
        spark, corpus, out, run_id="rc", n_buckets=4, concurrency=3
    )
    assert sorted(res.buckets_done) == list(range(4))
    got = read_output(spark, out)
    assert got.count() == corpus.count()
    assert got.groupBy("url").count().filter("count > 1").count() == 0
    lin = read_lineage(spark, out)
    assert {r.bucket for r in lin.collect()} == set(range(4))


def test_legacy_empty_staging_marker_resumes_with_warning(spark, corpus, tmp_path):
    import os
    import warnings

    out = str(tmp_path / "legacy")
    run_extract_job(spark, corpus, out, run_id="r1", n_buckets=4, fail_after=1)
    # simulate a staging dir written before the marker recorded a count
    marker = os.path.join(out, "staging", "_STAGED")
    open(marker, "w").close()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        res = run_extract_job(spark, corpus, out, run_id="r2", n_buckets=4)
    assert any("legacy" in str(x.message) for x in w)
    assert len(res.buckets_done) == 3  # resumed, not re-staged


def test_legacy_marker_tolerates_empty_top_buckets(spark, corpus, tmp_path):
    """Layout-derived counts are a LOWER bound (top hash buckets can be
    empty on small inputs): a legacy resume with the true original count
    must not be bricked when bucket=N-1 happens to be missing (round-3
    review finding)."""
    import os
    import shutil
    import warnings

    out = str(tmp_path / "legacy_gap")
    run_extract_job(spark, corpus, out, run_id="r1", n_buckets=4, fail_after=1)
    shutil.rmtree(os.path.join(out, "staging", "bucket=3"), ignore_errors=True)
    open(os.path.join(out, "staging", "_STAGED"), "w").close()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        res = run_extract_job(spark, corpus, out, run_id="r2", n_buckets=4)
    assert any("legacy" in str(x.message) for x in w)
    assert len(res.buckets_done) == 3  # resumed with the original count


def test_legacy_marker_with_wrong_n_buckets_still_raises(spark, corpus, tmp_path):
    """The legacy path derives the TRUE count from the bucket=K layout and
    must NOT trust the caller's argument — resuming an 8-bucket staging
    with n_buckets=4 would silently drop half the corpus (round-3 review
    finding)."""
    import os
    import warnings

    out = str(tmp_path / "legacy_bad")
    run_extract_job(spark, corpus, out, run_id="r1", n_buckets=8, fail_after=1)
    open(os.path.join(out, "staging", "_STAGED"), "w").close()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        with pytest.raises(ValueError, match="n_buckets"):
            run_extract_job(spark, corpus, out, run_id="r2", n_buckets=4)


def test_write_table_parquet_and_iceberg_seam(spark, tmp_path):
    from pbx_ds_ocr_server_spark.sources.writer import write_table

    df = spark.range(10).withColumnRenamed("id", "x")
    out = str(tmp_path / "wt")
    write_table(df, out, fmt="parquet", mode="overwrite")
    assert spark.read.parquet(out).count() == 10
    # jar absent in this sandbox: the error must be ACTIONABLE — name the
    # runtime artifact to add and point at the catalog-config recipe
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime") as ei:
        write_table(df, "nocat.db.t", fmt="iceberg")
    assert "spark.sql.catalog" in str(ei.value)
    with pytest.raises(ValueError, match="unknown sink format"):
        write_table(df, out, fmt="orcish")


def _has_iceberg_runtime(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def test_write_table_iceberg_e2e_append_readback(spark, tmp_path):
    """Runs ONLY when the iceberg-spark-runtime jar is on the classpath
    (absent in this sandbox — the seam test above pins the actionable
    error instead): real createOrReplace + append + read-back + snapshot
    count through the same write_table seam, no code changes."""
    if not _has_iceberg_runtime(spark):
        pytest.skip("iceberg-spark-runtime jar not on the classpath")
    from pbx_ds_ocr_server_spark.sources.writer import write_table

    spark.conf.set(
        "spark.sql.catalog.lakeci", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.lakeci.type", "hadoop")
    spark.conf.set(
        "spark.sql.catalog.lakeci.warehouse", str(tmp_path / "warehouse")
    )
    df = spark.range(5).withColumnRenamed("id", "x")
    write_table(df, "lakeci.db.t", fmt="iceberg", mode="replace")
    write_table(df, "lakeci.db.t", fmt="iceberg", mode="append")
    assert spark.table("lakeci.db.t").count() == 10
    snaps = spark.sql(
        "SELECT count(*) FROM lakeci.db.t.snapshots"
    ).first()[0]
    assert snaps >= 2  # one per commit — expiry would prune these


def test_noop_rerun_appends_no_metrics_row(spark, crashed_then_resumed, corpus, outdir):
    """Tenth-review fix: re-running an already-complete job must not
    append a zero-docs row to _metrics on every invocation."""
    import os

    metrics_dir = os.path.join(outdir, "_metrics")
    before = spark.read.parquet(metrics_dir).count()
    run_extract_job(spark, corpus, outdir, run_id="rX", n_buckets=N_BUCKETS)
    assert spark.read.parquet(metrics_dir).count() == before


def test_corrupt_staging_marker_raises_diagnostic(spark, corpus, tmp_path):
    """Tenth-review fix: a garbage marker gets a diagnostic, and a torn
    plausible-but-smaller count is caught against the bucket layout
    before any resume trusts it."""
    import os

    out = str(tmp_path / "corrupt_marker")
    run_extract_job(spark, corpus, out, run_id="r1", n_buckets=4)
    marker = os.path.join(out, "staging", "_STAGED")
    with open(marker, "w", encoding="utf-8") as f:
        f.write("not-a-number")
    with pytest.raises(ValueError, match="corrupt"):
        run_extract_job(spark, corpus, out, run_id="r2", n_buckets=4)
    with open(marker, "w", encoding="utf-8") as f:
        f.write("1")  # torn prefix of a larger legacy count
    with pytest.raises(ValueError, match="corrupt marker"):
        run_extract_job(spark, corpus, out, run_id="r3", n_buckets=1)
