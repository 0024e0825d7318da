"""Audio/video container metadata — pure byte parsing, no media libs.

The multimodal mandate treats audio/video as opaque ``binary`` columns
with TYPED metadata; pixel/PCM decode stays out of scope (the sample data
is opaque payload), but the container headers are plain public structures
this module parses for real:

  * WAV (RIFF/WAVE, RFC 2361 / the original IBM-Microsoft spec): chunk
    walk → ``fmt `` (PCM format tag, channels, sample rate, bits) +
    ``data`` size → exact duration.
  * MP4 / ISO base media (ISO/IEC 14496-12): top-level box walk with
    32-bit, 64-bit (``largesize``) and to-end-of-file sizes → ``ftyp``
    major brand, ``moov``/``mvhd`` (version 0 and 1) timescale+duration.

Both parsers follow the raster codecs' conventions: bounded work (the
walk advances at least one header per step and box counts are capped),
strict typed declines (:class:`AvUnsupported`, a ValueError the operators
catch) for truncation, contradictory sizes, and structure bombs — never a
struct.error/IndexError that would kill a Spark task.

Reference analog: the reference whitelists document/image uploads only
(`/root/reference/app/storage/local.py:34-37`); audio/video metadata is
part of this repo's training-data-pipeline surface, not a port.
"""

from __future__ import annotations

import struct

# one box/chunk header is >= 8 bytes, so a 1 MB payload cannot contain
# more than ~131k of them; the cap exists for size-0/size-to-EOF
# pathologies and keeps the walk trivially bounded
MAX_BOXES = 4096


class AvUnsupported(ValueError):
    """Valid-magic audio/video container that contradicts its own
    framing, or an out-of-scope variant."""


def wav_info(payload: bytes) -> dict:
    """→ {codec, channels, sample_rate, bits_per_sample, n_samples,
    duration_ms, n_bytes}. Raises ``ValueError`` for non-RIFF/WAVE bytes
    and :class:`AvUnsupported` for malformed chunk structure.

    duration_ms uses INTEGER floor math (n_samples * 1000 // rate) so the
    value is bit-stable across engines — the DuckDB oracle mirrors the
    same expression."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    (riff_size,) = struct.unpack("<I", payload[4:8])
    if riff_size + 8 != len(payload):
        # header-vs-bytes mismatch — same honesty rule as the raster
        # codecs' tail strictness (truncated or garbage-appended files
        # must not produce confident metadata)
        raise AvUnsupported("RIFF size does not match payload")
    fmt = None
    data_len = None
    i = 12
    n = len(payload)
    boxes = 0
    while i + 8 <= n:
        boxes += 1
        if boxes > MAX_BOXES:
            raise AvUnsupported("chunk bomb")
        cid = payload[i : i + 4]
        (clen,) = struct.unpack("<I", payload[i + 4 : i + 8])
        body = payload[i + 8 : i + 8 + clen]
        if len(body) < clen:
            raise AvUnsupported("truncated chunk")
        if cid == b"fmt ":
            if clen < 16:
                raise AvUnsupported("short fmt chunk")
            tag, ch, rate, _brate, _align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if ch == 0 or rate == 0:
                raise AvUnsupported("zero channels / sample rate")
            fmt = (tag, ch, rate, bits)
        elif cid == b"data":
            data_len = clen
        # chunks are word-aligned: odd sizes carry a pad byte
        i += 8 + clen + (clen & 1)
    if i != n:
        raise AvUnsupported("trailing bytes after final chunk")
    if fmt is None or data_len is None:
        raise AvUnsupported("missing fmt / data chunk")
    tag, ch, rate, bits = fmt
    if bits % 8 or bits == 0:
        raise AvUnsupported(f"bits_per_sample {bits}")
    frame = ch * (bits // 8)
    if data_len % frame:
        raise AvUnsupported("data size not a whole number of frames")
    n_samples = data_len // frame
    return {
        "codec": f"pcm_{tag}" if tag == 1 else f"wave_fmt_{tag}",
        "channels": ch,
        "sample_rate": rate,
        "bits_per_sample": bits,
        "n_samples": n_samples,
        "duration_ms": n_samples * 1000 // rate,
        "n_bytes": len(payload),
    }


def mp4_info(payload: bytes) -> dict:
    """→ {codec (major brand), timescale, duration_units, duration_ms,
    n_bytes}. Raises ``ValueError`` for non-ISO-BMFF bytes and
    :class:`AvUnsupported` for malformed/out-of-scope box structure
    (mvhd version > 1, zero timescale, box bombs)."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF stream")
    brand = None
    mvhd = None
    boxes = 0

    def walk(lo: int, hi: int, depth: int) -> None:
        nonlocal brand, mvhd, boxes
        i = lo
        while i < hi:
            boxes += 1
            if boxes > MAX_BOXES:
                raise AvUnsupported("box bomb")
            if i + 8 > hi:
                raise AvUnsupported("truncated box header")
            (size,) = struct.unpack(">I", payload[i : i + 4])
            btype = payload[i + 4 : i + 8]
            body = i + 8
            if size == 1:  # 64-bit largesize
                if i + 16 > hi:
                    raise AvUnsupported("truncated largesize")
                (size,) = struct.unpack(">Q", payload[i + 8 : i + 16])
                body = i + 16
            elif size == 0:  # to end of enclosing container
                size = hi - i
            if size < body - i or i + size > hi:
                raise AvUnsupported("box size contradicts container")
            if btype == b"ftyp":
                if size - (body - i) < 4:
                    raise AvUnsupported("short ftyp")
                brand = payload[body : body + 4].decode("latin-1")
            elif btype == b"moov" and depth == 0:
                walk(body, i + size, 1)
            elif btype == b"mvhd" and depth == 1:
                # mvhd is only valid INSIDE moov (ISO-BMFF 8.2.2); a
                # top-level one is ignored like any unknown box, so a
                # moov-less file still declines via the missing-moov
                # check below instead of yielding confident metadata
                version = payload[body]
                if version == 0:
                    if size - (body - i) < 24:
                        raise AvUnsupported("short mvhd")
                    ts, dur = struct.unpack(
                        ">II", payload[body + 12 : body + 20]
                    )
                elif version == 1:
                    if size - (body - i) < 32:
                        raise AvUnsupported("short mvhd")
                    (ts,) = struct.unpack(
                        ">I", payload[body + 20 : body + 24]
                    )
                    (dur,) = struct.unpack(
                        ">Q", payload[body + 24 : body + 32]
                    )
                else:
                    raise AvUnsupported(f"mvhd version {version}")
                if ts == 0:
                    raise AvUnsupported("zero timescale")
                mvhd = (ts, dur)
            i += size

    try:
        walk(0, len(payload), 0)
    except (struct.error, IndexError):
        raise AvUnsupported("malformed box structure") from None
    if brand is None:
        raise AvUnsupported("missing ftyp brand")
    if mvhd is None:
        raise AvUnsupported("missing moov/mvhd")
    ts, dur = mvhd
    return {
        "codec": brand,
        "timescale": ts,
        "duration_units": dur,
        "duration_ms": dur * 1000 // ts,
        "n_bytes": len(payload),
    }


# --- deterministic synthesis (the media-variant builders) ---


def wav_encode(
    sample_rate: int, channels: int, samples: bytes, bits: int = 16
) -> bytes:
    """Minimal canonical PCM WAV: RIFF + fmt(16) + data. ``samples`` is
    the raw little-endian PCM payload (opaque here — metadata is the
    contract)."""
    if len(samples) % (channels * bits // 8):
        raise ValueError("samples not a whole number of frames")
    byte_rate = sample_rate * channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate,
        channels * bits // 8, bits,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", len(samples)) + samples
    if len(samples) & 1:
        body += b"\x00"  # RIFF chunks are word-aligned (odd sizes pad)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def mp4_encode(
    timescale: int, duration_units: int, mdat: bytes,
    brand: str = "isom",
) -> bytes:
    """Minimal ISO-BMFF file: ftyp + moov(mvhd v0) + mdat."""
    b = brand.encode("latin-1")
    if len(b) != 4:
        # the ftyp size field below is a constant 20 — a short brand
        # would silently shift every subsequent box boundary
        raise ValueError(f"brand must be exactly 4 bytes, got {brand!r}")
    ftyp = struct.pack(">I", 20) + b"ftyp" + b + struct.pack(">I", 0) + b
    mvhd = (
        struct.pack(">I", 108) + b"mvhd" + bytes(4)  # version 0 + flags
        + bytes(8)  # creation/modification
        + struct.pack(">II", timescale, duration_units)
        + bytes(108 - 8 - 4 - 8 - 8)
    )
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    mdat_box = struct.pack(">I", 8 + len(mdat)) + b"mdat" + mdat
    return ftyp + moov + mdat_box
