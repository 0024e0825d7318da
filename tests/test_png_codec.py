"""PNG pixel codec + png_pixel_features — the round-6 decode layer."""

import math
import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pbx_ds_ocr_server_spark.kernels.png_codec import (
    MAX_PIXELS,
    PngUnsupported,
    png_decode,
    png_encode,
    png_pixel_stats,
)
from pbx_ds_ocr_server_spark.operators.multimodal import (
    decode_image,
    png_pixel_features,
    synthetic_gradient_png,
    with_synthetic_png_payloads,
)


def _gradient(w, h, base=0):
    return bytes(base + x + y for y in range(h) for x in range(w))


@pytest.mark.parametrize("color_type,ch", [(0, 1), (2, 3), (6, 4)])
@pytest.mark.parametrize("cycle", [False, True])
def test_round_trip_all_color_types_and_filters(color_type, ch, cycle):
    import random

    rng = random.Random(color_type * 10 + cycle)
    w, h = 19, 11  # >5 rows so the filter cycle hits every filter type
    px = bytes(rng.randrange(256) for _ in range(w * h * ch))
    got = png_decode(png_encode(w, h, px, color_type, filter_cycle=cycle))
    assert got == (w, h, ch, px)


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 23),
    h=st.integers(1, 17),
    ct=st.sampled_from([0, 2, 6]),
    data=st.data(),
)
def test_round_trip_fuzz(w, h, ct, data):
    ch = {0: 1, 2: 3, 6: 4}[ct]
    px = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255),
                min_size=w * h * ch,
                max_size=w * h * ch,
            )
        )
    )
    assert png_decode(png_encode(w, h, px, ct)) == (w, h, ch, px)


def test_stats_match_closed_form():
    w, h, base = 12, 9, 30
    st_ = png_pixel_stats(png_encode(w, h, _gradient(w, h, base), 0))
    assert st_["px_width"] == w and st_["px_height"] == h
    assert st_["n_px"] == w * h and st_["channels"] == 1
    assert st_["luma_mean"] == base + (w - 1) / 2 + (h - 1) / 2
    n, ent = w * h, 0.0
    for t in range(w + h - 1):
        p = (min(t, w - 1, h - 1, w + h - 2 - t) + 1) / n
        ent -= p * math.log2(p)
    assert abs(st_["luma_entropy"] - ent) < 1e-12


def test_rgb_equal_channels_match_grey_stats():
    w, h, base = 10, 8, 4
    vals = _gradient(w, h, base)
    rgb = bytes(v for v in vals for _ in range(3))
    grey = png_pixel_stats(png_encode(w, h, vals, 0))
    col = png_pixel_stats(png_encode(w, h, rgb, 2))
    assert col["channels"] == 3
    assert col["luma_mean"] == grey["luma_mean"]
    assert col["luma_entropy"] == grey["luma_entropy"]


def _set_ihdr_byte(png: bytes, off_in_ihdr: int, value: int) -> bytes:
    b = bytearray(png)
    b[16 + off_in_ihdr] = value  # IHDR data starts at byte 16
    return bytes(b)


def test_out_of_scope_forms_decline_typed():
    base = png_encode(4, 3, bytes(12), 0)
    for mut in (
        _set_ihdr_byte(base, 8, 16),  # bit depth 16
        _set_ihdr_byte(base, 9, 3),  # palette colour type
        _set_ihdr_byte(base, 12, 1),  # Adam7 interlace
    ):
        with pytest.raises(PngUnsupported):
            png_decode(mut)
    with pytest.raises(ValueError):
        png_decode(b"not a png at all")


def test_truncated_idat_declines():
    full = png_encode(8, 8, _gradient(8, 8), 0)
    # drop the IEND and half the IDAT payload
    cut = full[: len(full) - 12 - 10]
    with pytest.raises(PngUnsupported):
        png_decode(cut)


def test_header_stream_mismatch_declines():
    """A bombed stream cannot masquerade: header says 2x2 but the IDAT
    carries 64x64 worth of scanlines — inflate is bounded and the length
    check declines."""
    big = png_encode(64, 64, bytes(64 * 64), 0)
    small_hdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    forged = (
        big[:8]
        + struct.pack(">I", 13)
        + b"IHDR"
        + small_hdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + small_hdr) & 0xFFFFFFFF)
        + big[33:]  # original IDAT + IEND
    )
    with pytest.raises(PngUnsupported):
        png_decode(forged)


def test_dimension_bomb_refused_before_allocation():
    huge = struct.pack(">IIBBBBB", 1 << 24, 1 << 24, 8, 0, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + huge
        + struct.pack(">I", zlib.crc32(b"IHDR" + huge) & 0xFFFFFFFF)
    )
    assert (1 << 24) ** 2 > MAX_PIXELS
    with pytest.raises(PngUnsupported):
        png_decode(payload)


def test_decode_image_dispatch():
    png = png_encode(3, 2, bytes(6), 0)
    assert decode_image(png) == (3, 2, 1, bytes(6))
    with pytest.raises(ValueError, match="kind='jpeg'"):
        decode_image(b"\xff\xd8\xff\xe0rest")
    with pytest.raises(ValueError, match="kind='empty'"):
        decode_image(b"")


def test_png_pixel_features_mixed_payloads(spark):
    rows = [
        (0, bytearray(synthetic_gradient_png(0))),
        (3, bytearray(synthetic_gradient_png(3))),
        (1, bytearray(b"plain text payload")),
        (2, bytearray(png_encode(4, 3, bytes(12), 0)[:20])),  # truncated
    ]
    df = spark.createDataFrame(rows, "id bigint, payload binary")
    out = {r.id: r.asDict() for r in png_pixel_features(df).collect()}
    assert out[0]["px_width"] == 8 and out[0]["px_height"] == 8
    assert out[0]["decode_ok"] is True and out[0]["channels"] == 1
    assert out[3]["channels"] == 3  # odd seed -> RGB
    assert out[3]["luma_mean"] == (3 % 64) + (8 + 3 % 9 - 1) / 2 + (8 + 3 % 7 - 1) / 2
    for bad in (1, 2):  # non-png and truncated: null features, not a drop
        assert out[bad]["px_width"] is None and out[bad]["decode_ok"] is None


def test_with_synthetic_png_payloads_split(spark):
    df = spark.createDataFrame(
        [(i, f"text {i}") for i in range(9)], "doc_id bigint, text string"
    )
    out = {r.id: bytes(r.payload) for r in
           with_synthetic_png_payloads(df, every=3).collect()}
    for i in range(9):
        if i % 3 == 0:
            assert out[i][:8] == b"\x89PNG\r\n\x1a\n"
            assert out[i] == synthetic_gradient_png(i)
        else:
            assert out[i] == f"text {i}".encode()


def test_truncated_final_crc_declines():
    """A payload cut inside the LAST chunk's CRC is as truncated as one
    cut inside its data — both decline typed."""
    full = png_encode(4, 4, bytes(16), 0)
    with pytest.raises(PngUnsupported):
        png_decode(full[:-2])  # 2 bytes of IEND's CRC missing


def test_missing_iend_declines():
    full = png_encode(4, 4, bytes(16), 0)
    with pytest.raises(PngUnsupported):
        png_decode(full[: len(full) - 12])  # whole IEND chunk dropped


def test_duplicate_ihdr_forgery_declines():
    """IHDR must appear once (spec 11.2.2): a second header claiming
    different dimensions is a forgery vector, not a bigger image."""
    full = png_encode(4, 4, bytes(16), 0)
    ihdr2 = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    from pbx_ds_ocr_server_spark.kernels.png_codec import png_chunk

    forged = full[:33] + png_chunk(b"IHDR", ihdr2) + full[33:]
    with pytest.raises(PngUnsupported, match="duplicate IHDR"):
        png_decode(forged)


def test_encode_rejects_zero_dimensions():
    with pytest.raises(ValueError, match="positive"):
        png_encode(0, 5, b"")


def test_null_text_payload_propagates_null(spark):
    df = spark.createDataFrame(
        [(1, None), (3, None)], "doc_id bigint, text string"
    )
    out = {r.id: r.payload for r in
           with_synthetic_png_payloads(df, every=3).collect()}
    assert out[1] is None  # NOT the fabricated b"None"
    assert bytes(out[3])[:8] == b"\x89PNG\r\n\x1a\n"  # png ids unaffected
