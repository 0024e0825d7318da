"""Op F3 — exact parity with the reference's _parse_page_ranges
(/root/reference/app/services/dsocr_model.py:106-141)."""

import pytest

from pbx_ds_ocr_server_spark.kernels import parse_page_ranges


@pytest.mark.parametrize(
    ("spec", "total", "expected"),
    [
        (None, 3, [1, 2, 3]),
        ("", 3, [1, 2, 3]),
        ("1-3,5,7-8", 10, [1, 2, 3, 5, 7, 8]),
        ("3-1", 5, [1, 2, 3]),          # reversed → ascending
        ("0,999", 5, [1, 5]),           # clamped to [1, total]
        ("2,2,2", 5, [2]),              # de-duped, order kept
        ("5,1", 5, [5, 1]),             # processing order preserved
        ("x,,", 5, [1, 2, 3, 4, 5]),    # garbage-only → all pages
        ("2,x,4", 5, [2, 4]),           # garbage parts skipped
        (" 1 - 2 ,  4 ", 5, [1, 2, 4]),  # whitespace tolerated
        ("9-7", 5, [5]),                # both ends clamp to total → [5,5]
        ("1-999", 3, [1, 2, 3]),
        ("-2", 5, [1, 2, 3, 4, 5]),     # int("") fails → part skipped → all pages
    ],
)
def test_parse_page_ranges(spec, total, expected):
    assert parse_page_ranges(spec, total) == expected


def test_negative_range_part_skipped():
    # "-2" splits to ("", "2"): int("") raises → part skipped → all pages
    assert parse_page_ranges("-2,3", 5) == [3]
