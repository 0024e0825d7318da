"""URL canonicalization rules (functions/urls.py frozen spec)."""

import pytest
from pyspark.sql import functions as F

from pbx_ds_ocr_server_spark.functions.urls import (
    url_host,
    url_normalize,
    url_scheme,
)


@pytest.fixture(scope="module")
def norm(spark):
    def run(url: str) -> dict:
        row = spark.range(1).select(
            url_normalize(F.lit(url)).alias("n"),
            url_host(F.lit(url)).alias("h"),
            url_scheme(F.lit(url)).alias("s"),
        ).first()
        return {"n": row.n, "h": row.h, "s": row.s}

    return run


def test_lowercases_scheme_and_host(norm):
    assert norm("HTTP://Example.COM/Path")["n"] == "http://example.com/Path"


def test_path_case_preserved(norm):
    assert norm("https://a.com/CaseD?Q=V")["n"] == "https://a.com/CaseD?Q=V"


def test_strips_fragment(norm):
    assert norm("https://a.com/p#frag")["n"] == "https://a.com/p"


def test_strips_userinfo(norm):
    assert norm("https://user:pw@a.com/p")["n"] == "https://a.com/p"
    assert norm("https://user:pw@a.com/p")["h"] == "a.com"


def test_strips_default_ports_only(norm):
    assert norm("http://a.com:80/p")["n"] == "http://a.com/p"
    assert norm("https://a.com:443/p")["n"] == "https://a.com/p"
    assert norm("http://a.com:8080/p")["n"] == "http://a.com:8080/p"
    assert norm("https://a.com:80/p")["n"] == "https://a.com:80/p"


def test_empty_path_becomes_slash(norm):
    assert norm("https://a.com")["n"] == "https://a.com/"
    assert norm("https://a.com#f")["n"] == "https://a.com/"


def test_non_url_passes_through(norm):
    assert norm("not a url at all")["n"] == "not a url at all"


def test_host_excludes_port(norm):
    assert norm("https://A.Com:8443/x")["h"] == "a.com"


def test_empty_authority_preserves_path(norm):
    assert norm("file:///etc/passwd")["n"] == "file:///etc/passwd"
    assert norm("file:///var/log")["n"] == "file:///var/log"
    assert norm("file:///etc/passwd")["h"] == ""


def test_empty_path_with_query_gets_slash(spark):
    """Eleventh-review fix: 'http://a.com?q=1' and 'http://a.com/?q=1' are
    RFC-equivalent spellings and must share one canonical key."""
    from pbx_ds_ocr_server_spark.functions.urls import url_normalize

    df = spark.createDataFrame(
        [("http://A.com?q=1",), ("http://a.com/?q=1",)], "url string"
    )
    out = {r.c for r in df.select(url_normalize("url").alias("c")).collect()}
    assert out == {"http://a.com/?q=1"}
