"""Shared fixtures. One Spark session per test run (startup ~12s).

Env isolation mirrors the reference's conftest pattern
(/root/reference/tests/conftest.py:20-40): config is set before the session
is built, and the extraction kernel is exercised through its public surface.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from pbx_ds_ocr_server_spark.session import get_spark

    s = get_spark(
        app_name="pbx-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus(spark):
    from pbx_ds_ocr_server_spark.corpus import synthesize_corpus_df

    df = synthesize_corpus_df(spark, f"{SF_DIR}/documents.parquet").cache()
    df.count()  # materialize once
    return df
