"""Text-analysis column functions — semantics beyond the oracle gate."""

from pyspark.sql import functions as F

from pbx_ds_ocr_server_spark.functions.text import token_count, token_count_cjk


def _counts(spark, texts, fn):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id bigint, text string"
    )
    rows = df.select("id", fn("text").alias("n")).collect()
    return [r.n for r in sorted(rows, key=lambda r: r.id)]


def test_token_count_cjk_counts_chars_as_tokens(spark):
    texts = [
        "hello world",          # pure latin: same as whitespace count
        "你好世界",              # pure Han: 4 chars = 4 tokens (1 whitespace token!)
        "你好 world 世界",       # mixed: 4 CJK + 1 latin
        "こんにちは",            # kana: 5
        "안녕하세요 hello",      # hangul 5 + latin 1
        "",                     # empty
        "   ",                  # whitespace only
    ]
    assert _counts(spark, texts, token_count_cjk) == [2, 4, 5, 5, 6, 0, 0]
    # the whitespace counter undercounts CJK — that's the gap this closes
    assert _counts(spark, texts, token_count) == [2, 1, 3, 1, 2, 0, 0]


def test_token_count_cjk_equals_whitespace_on_latin(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    diff = docs.select(
        (token_count_cjk("text") != token_count("text")).alias("d")
    ).filter(F.col("d")).count()
    assert diff == 0  # no CJK in the synthetic tables: identical counts
