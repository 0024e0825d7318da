"""WARC source: read Common-Crawl-style WARC files into the page table.

``spark.read.format("binaryFile")`` brings whole WARC files (plain or
gzip, including the per-record-gzip-member layout real Common Crawl uses —
multi-member streams decompress transparently) onto executors; an
Arrow-batched ``mapInPandas`` stage parses records into
``(url, warc_ts, html)`` rows, the extraction pipeline's input schema.

Only ``response`` (and ``resource``) records yield rows; request/metadata
records are skipped. HTTP envelope headers are stripped — ``html`` is the
entity body bytes, exactly what the corpus generator wrote.

Scale note: one task per WARC file (binaryFile is not splittable, matching
real WARC practice where the per-file ~1GB granularity IS the split);
``maxPartitionBytes`` does not apply. For 100 TB, list many files.
"""

from __future__ import annotations

import zlib
from email.utils import parsedate_to_datetime
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = "url string, warc_ts timestamp, html binary"


def _gunzip_multi(data: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream, tolerating trailing
    garbage — the real-world WARC.gz shape."""
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n and data[pos : pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out += d.decompress(data[pos:])
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return bytes(out)


def parse_warc(data: bytes) -> list[dict]:
    """Parse WARC bytes → rows. Pure function; malformed records skipped."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_multi(data)
    rows: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start == -1:
            break
        hdr_end = data.find(b"\r\n\r\n", start)
        if hdr_end == -1:
            break
        headers: dict[str, str] = {}
        for line in data[start:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1"
            )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            # no usable Content-Length → the body extent is unknown, so
            # re-scan only from the next RECORD BOUNDARY (blank line +
            # magic). A bare find(b"WARC/") from here would scan INSIDE
            # this record's body and could fabricate records from body
            # bytes that merely mention the WARC format (tenth-review fix)
            nxt = data.find(b"\r\n\r\nWARC/", hdr_end + 4)
            if nxt == -1:
                break
            pos = nxt + 4
            continue
        body = data[hdr_end + 4 : hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        rtype = headers.get("warc-type", "")
        if rtype not in ("response", "resource"):
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        ts = None
        raw_ts = headers.get("warc-date", "")
        if raw_ts:
            try:
                ts = pd.Timestamp(raw_ts).tz_localize(None)
            except ValueError:
                try:
                    ts = pd.Timestamp(parsedate_to_datetime(raw_ts)).tz_localize(None)
                except Exception:
                    ts = None
        payload = body
        if rtype == "response" and body[:5] in (b"HTTP/", b"http/"):
            # strip the HTTP envelope: entity body after the blank line
            split = body.find(b"\r\n\r\n")
            if split != -1:
                payload = body[split + 4 :]
        rows.append({"url": url, "warc_ts": ts, "html": payload})
    return rows


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC files (``path`` may be a glob) → DataFrame(url, warc_ts, html)."""
    files = spark.read.format("binaryFile").load(path).select("content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: list[dict] = []
            for r in b.itertuples():
                rows.extend(parse_warc(bytes(r.content)))
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html"])

    return files.mapInPandas(run, schema=WARC_SCHEMA)


def write_warc(df: DataFrame, out_dir: str, gzip_members: bool = True) -> int:
    """WARC sink: (url, warc_ts, html) rows → one WARC file per partition
    under ``out_dir`` (per-record gzip members by default — the real
    Common-Crawl layout read_warc understands).

    The inverse of :func:`read_warc`: lets a pipeline EXPORT a curated
    subset back into the crawl interchange format (deterministic record ids
    derived from the url hash — no uuids, no clock, so the round trip is
    byte-stable). Per-partition imperative file I/O is the legitimate
    mapPartitions case: WARC is a custom container no DataFrame writer
    speaks; each task writes its own file (no committer races), STREAMING
    one record at a time so peak memory is O(one record) even at the real
    ~1 GB-per-WARC file sizing. File sizes follow the input partitioning —
    size it UPSTREAM, before the payload column is attached (the job
    runner's bucketed staging write); repartitioning a frame that already
    carries `html` shuffles the raw payload bytes (~3× slowdown, see
    CLAUDE.md). Paths must be visible to executors (local dir in local
    mode, shared FS on a cluster). Returns the file count."""
    import os

    from pbx_ds_ocr_server_spark.corpus import warc_record_bytes

    os.makedirs(out_dir, exist_ok=True)
    suffix = ".warc.gz" if gzip_members else ".warc"

    def dump(pid: int, it):
        from pyspark import TaskContext

        path = os.path.join(out_dir, f"part-{pid:05d}{suffix}")
        # tmp name carries the task ATTEMPT id: under speculative
        # execution (or a zombie attempt after a perceived failure) two
        # attempts of this partition run concurrently — a shared tmp path
        # would interleave their records and rename the corrupt mixture
        # into place (tenth-review fix). Distinct tmps keep the final
        # os.replace atomic and last-writer-consistent.
        ctx = TaskContext.get()
        attempt = ctx.taskAttemptId() if ctx is not None else 0
        tmp = f"{path}.{attempt}.tmp"
        wrote = False
        renamed = False
        opened = False
        f = None
        try:
            for r in it:
                if f is None:
                    f = open(tmp, "wb")
                    opened = True
                f.write(
                    warc_record_bytes(
                        {
                            "url": r.url,
                            "warc_ts": r.warc_ts,
                            # null payload → empty body (the row's url/ts
                            # survive the export; a None would otherwise
                            # fail the whole partition task)
                            "html": bytes(r.html) if r.html is not None else b"",
                        },
                        gzip_member=gzip_members,
                    )
                )
                wrote = True
            if wrote:
                f.close()
                f = None
                os.replace(tmp, path)  # atomic, like the manifest writes
                renamed = True
        finally:
            if f is not None:
                f.close()
            # attempt-suffixed tmp names mean a retry never overwrites a
            # failed attempt's leftover — without this unlink, every failed
            # or losing-speculative attempt would permanently litter
            # out_dir (twelfth-review fix). Gate on the file having been
            # CREATED, not on `wrote`: if warc_record_bytes or the first
            # write raises right after open(tmp), the empty orphan must
            # still be removed (round-9 advice fix). Best-effort: a tmp on
            # a dying node is unreachable anyway; the committed `path` is
            # what readers see.
            if opened and not renamed:
                try:
                    os.remove(tmp)
                except OSError:
                    pass
        if not renamed:
            return iter(())
        return iter((path,))

    written = (
        df.select("url", "warc_ts", "html")
        .rdd.mapPartitionsWithIndex(dump)
        .count()
    )
    return written
