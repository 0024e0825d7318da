"""Plan-inspection helpers: assert the physical plans we designed for."""

from pbx_ds_ocr_server_spark.plans.inspect import (
    explain_str,
    scan_read_schema,
    count_exchanges,
    has_pushed_filters,
)

__all__ = [
    "explain_str",
    "scan_read_schema",
    "count_exchanges",
    "has_pushed_filters",
]
