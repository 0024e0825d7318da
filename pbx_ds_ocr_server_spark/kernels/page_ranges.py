"""Page-range pruning (op F3, SURVEY.md §2.2).

Reimplements, byte-for-byte in behavior, the semantics of the reference's
``_parse_page_ranges`` (``/root/reference/app/services/dsocr_model.py:106-141``):

  * ``None``/empty spec → all pages ``[1..total]``
  * comma-separated parts; blank parts skipped
  * ``a-b`` ranges: endpoints clamped to ``[1, total]`` *before* ordering;
    reversed ranges (``"3-1"``) normalized to ascending
  * bare numbers clamped to ``[1, total]``
  * non-numeric garbage parts silently skipped
  * de-duplicated preserving first-seen order
  * empty result after parsing → all pages

These rules affect which pages exist in the output and therefore the
byte-identity of the merged document text — they must match exactly.
"""

from __future__ import annotations


def parse_page_ranges(spec: str | None, total_pages: int) -> list[int]:
    if not spec:
        return list(range(1, total_pages + 1))
    pages: list[int] = []
    for part in str(spec).split(","):
        part = part.strip()
        if not part:
            continue
        if "-" in part:
            a, _, b = part.partition("-")
            try:
                start = max(1, min(total_pages, int(a)))
                end = max(1, min(total_pages, int(b)))
            except ValueError:
                continue
            lo, hi = (start, end) if start <= end else (end, start)
            pages.extend(range(lo, hi + 1))
        else:
            try:
                pages.append(max(1, min(total_pages, int(part))))
            except ValueError:
                continue
    seen: set[int] = set()
    out: list[int] = []
    for p in pages:
        if p not in seen:
            out.append(p)
            seen.add(p)
    return out or list(range(1, total_pages + 1))
