"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns. What IS implemented for real:
magic sniffing and header-level metadata (PNG IHDR and JPEG SOF dimensions,
byte length, md5) — pure byte parsing, Arrow-batched via ``mapInPandas``, no
image libraries needed. What is STUBBED (decode libs absent in this
environment, by design): pixel decode / resize / frame-sample raise
``NotImplementedError`` behind a clearly-marked seam, with a deterministic
fake (``fake_feature``) so the Spark-side plumbing — schema, batching,
partitioning — is fully testable.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

META_SCHEMA = (
    "id bigint, n_bytes bigint, kind string, width int, height int,"
    " digest string"
)


def png_dimensions(payload: bytes) -> tuple[int, int] | None:
    # IHDR is always the first chunk: 8B magic + 4B len + b'IHDR' + W,H (BE)
    if len(payload) >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        return w, h
    return None


def jpeg_dimensions(payload: bytes) -> tuple[int, int] | None:
    if len(payload) < 4 or payload[:3] != b"\xff\xd8\xff":
        return None
    i = 2
    n = len(payload)
    while i + 9 < n:
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if marker == 0xFF:  # 0xFF fill-byte padding before a marker
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
            return w, h
        i += 2 + seg_len
    return None


def sniff_kind(payload: bytes) -> str:
    if not payload:
        return "empty"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:5] == b"%PDF-":
        return "pdf"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[4:8] == b"ftyp":
        return "mp4"
    return "binary"


def decode_image(payload: bytes):  # pragma: no cover - intentional stub
    """STUB: pixel decode requires an image library not present in this
    container. The seam is here; swap in PIL/libvips on a real cluster."""
    raise NotImplementedError(
        "pixel decode not available in this environment — "
        "binary_metadata() provides header-level metadata instead"
    )


def fake_feature(payload: bytes, dims: int = 8) -> list[float]:
    """Deterministic stand-in for a decode→embed step: md5-derived floats in
    [0,1). Lets pipelines exercise the full schema without decode libs."""
    d = hashlib.md5(payload or b"").digest()
    return [b / 255.0 for b in d[:dims]]


def binary_metadata(
    df: DataFrame, id_col: str = "id", bin_col: str = "payload"
) -> DataFrame:
    """(id, payload:binary) → (id, n_bytes, kind, width, height, digest).
    One Arrow-batched pass; pure byte parsing."""
    src = df.selectExpr(f"{id_col} as id", f"{bin_col} as payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples():
                p = bytes(r.payload) if r.payload is not None else b""
                dims = png_dimensions(p) or jpeg_dimensions(p)
                rows.append(
                    {
                        "id": r.id,
                        "n_bytes": len(p),
                        "kind": sniff_kind(p),
                        "width": dims[0] if dims else None,
                        "height": dims[1] if dims else None,
                        "digest": hashlib.md5(p).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows, columns=[
                "id", "n_bytes", "kind", "width", "height", "digest"
            ])

    return src.mapInPandas(run, schema=META_SCHEMA)
