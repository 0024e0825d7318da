"""Pure, deterministic per-document extraction kernels.

No Spark imports here — every function is a pure function of its byte/string
arguments so results are bit-stable across partitions and parallelism levels
(SURVEY.md §7 hard-part 1). The Spark layer wraps these in Arrow-batched
``mapInPandas`` stages (operators/extract.py).
"""

from pbx_ds_ocr_server_spark.kernels.charset import sniff_decode
from pbx_ds_ocr_server_spark.kernels.content_type import detect_content_type
from pbx_ds_ocr_server_spark.kernels.page_ranges import parse_page_ranges
from pbx_ds_ocr_server_spark.kernels.html_extract import extract_html
from pbx_ds_ocr_server_spark.kernels.pdf_extract import (
    extract_pdf,
    pdf_page_count,
)

__all__ = [
    "sniff_decode",
    "detect_content_type",
    "parse_page_ranges",
    "extract_html",
    "extract_pdf",
    "pdf_page_count",
]
