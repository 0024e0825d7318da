"""Job configuration — the analog of the reference's env-driven Settings.

Mirrors the capacity limits of ``/root/reference/app/config.py`` (max upload
200 MB @ :62, max pages 500 @ :63, batch page size 50 @ :64-65, image bounds
@ :68-69) as plain dataclass fields. Everything here is job-level config, not
per-row state (SURVEY.md §1.1).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class ExtractConfig:
    # --- limits (reference: app/config.py:62-65) ---
    max_bytes: int = 200 * 1024 * 1024  # F1 size predicate (200 MB)
    max_pages: int = 500                # F2 page-count predicate
    # --- page selection (reference: dsocr_model.py:106-141) ---
    page_ranges: str | None = None      # "1-3,5,7-8" spec, None → all pages
    # --- bounded-work guards (analog of image clamp, dsocr_model.py:33-55) ---
    max_block_chars: int = 1 << 20      # cap text accumulated per block
    max_blocks_per_doc: int = 50_000    # cap DOM blocks scanned per document
    # --- boilerplate scoring thresholds (our frozen spec, SURVEY.md §7 risk 2) ---
    link_density_max: float = 0.5       # blocks above this are boilerplate
    # --- scale / skew knobs (north_rule: explicit salting + AQE) ---
    salt_buckets: int = 0               # 0 → auto: 2 * shuffle partitions
    arrow_max_records: int = 256        # spark.sql.execution.arrow.maxRecordsPerBatch
                                        # (tune to 64-128 for multi-MB blob corpora)
    # --- merge rule constants (reference: pipeline.py:205) ---
    page_separator: str = "\n\n"        # full.md join separator (byte-identity!)
    # --- output rendering (reference full.md is markdown: pipeline.py:189-205
    #     merges model markdown; 'markdown' renders the kernel's span
    #     classifications as ## heading / - list_item / fenced pre) ---
    mode: str = "plain"                 # 'plain' | 'markdown'
    # --- backend selection (reference op U2: kernel plug + fallback) ---
    html_backend: str = "fast"          # 'fast' (regex tokenizer) | 'strict'
                                        # (html.parser events); recorded in
                                        # job lineage (sources/writer.py)
    # --- parity-only options: accepted but inert in the reference prompt
    #     build too (dsocr_model.py:459-468 ignores them) ---
    enable_formula: bool = True
    enable_table: bool = True
    language: str = "ch"
    extra: dict = field(default_factory=dict, compare=False)


DEFAULT_CONFIG = ExtractConfig()
