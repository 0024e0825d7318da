"""Baseline-sequential grayscale JPEG codec — the round-7 decode layer.

The independent reference for the Huffman+dequant+IDCT chain is a numpy
matrix IDCT computed IN THE TEST (not the codec's own loops), so a broken
zigzag, EXTEND, predictor, or basis table cannot cancel itself out.
"""

import math
import struct

import numpy as np
import pytest

from pbx_ds_ocr_server_spark.kernels.jpeg_codec import (
    STD_LUMA_QUANT,
    ZIGZAG,
    JpegUnsupported,
    encode_flat_blocks,
    jpeg_decode_gray,
    jpeg_encode_gray_coefs,
    jpeg_pixel_stats,
)


def _reference_idct(coef_nat: list[int], qtable: list[int]) -> np.ndarray:
    """Independent dequant + 2D IDCT + level shift + clamp via numpy."""
    F = np.array(coef_nat, dtype=np.float64).reshape(8, 8) * np.array(
        qtable, dtype=np.float64
    ).reshape(8, 8)
    C = np.array(
        [
            [
                (math.sqrt(0.5) if u == 0 else 1.0)
                * math.cos((2 * x + 1) * u * math.pi / 16.0)
                for x in range(8)
            ]
            for u in range(8)
        ]
    )
    # f = (1/4) C^T F C  with F indexed [v][u], spatial [y][x]
    f = 0.25 * C.T @ F @ C
    return np.clip(np.floor(f + 128.0 + 0.5), 0, 255).astype(np.int64)


def _rand_blocks(rng, n, max_mag=60, density=0.2):
    blocks = []
    for _ in range(n):
        blk = [0] * 64
        blk[0] = rng.randrange(-200, 201)
        for k in range(1, 64):
            if rng.random() < density:
                v = rng.randrange(1, max_mag)
                blk[k] = v if rng.random() < 0.5 else -v
        blocks.append(blk)
    return blocks


def test_flat_blocks_decode_exactly():
    vals = [17, 18, 18, 19]
    payload = encode_flat_blocks(2, 2, vals)
    w, h, raw = jpeg_decode_gray(payload)
    assert (w, h) == (16, 16)
    for by in range(2):
        for bx in range(2):
            v = vals[by * 2 + bx]
            for yy in range(8):
                for xx in range(8):
                    assert raw[(by * 8 + yy) * 16 + bx * 8 + xx] == v


def test_flat_block_extremes_decode_exactly():
    payload = encode_flat_blocks(2, 1, [0, 255])
    _, _, raw = jpeg_decode_gray(payload)
    assert set(raw[:8]) == {0} and set(raw[8:16]) == {255}


@pytest.mark.parametrize("qtable", [None, [1] * 64])
def test_random_coefs_match_numpy_reference(qtable):
    import random

    rng = random.Random(7)
    bw, bh = 3, 2
    blocks = _rand_blocks(rng, bw * bh)
    payload = jpeg_encode_gray_coefs(bw * 8, bh * 8, blocks, qtable=qtable)
    w, h, raw = jpeg_decode_gray(payload)
    assert (w, h) == (bw * 8, bh * 8)
    got = np.frombuffer(raw, dtype=np.uint8).reshape(h, w).astype(np.int64)
    q = qtable if qtable is not None else STD_LUMA_QUANT
    for by in range(bh):
        for bx in range(bw):
            ref = _reference_idct(blocks[by * bw + bx], q)
            tile = got[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            # float64 summation-order noise can flip a half-away round by
            # at most one code value; typically the match is exact
            assert np.abs(tile - ref).max() <= 1


def test_non_multiple_of_8_dimensions_crop():
    import random

    rng = random.Random(3)
    w, h = 12, 10  # 2x2 blocks, right/bottom edges cropped
    blocks = _rand_blocks(rng, 4)
    payload = jpeg_encode_gray_coefs(w, h, blocks)
    gw, gh, raw = jpeg_decode_gray(payload)
    assert (gw, gh) == (w, h) and len(raw) == w * h
    got = np.frombuffer(raw, dtype=np.uint8).reshape(h, w).astype(np.int64)
    ref00 = _reference_idct(blocks[0], STD_LUMA_QUANT)
    assert np.abs(got[:8, :8] - ref00).max() <= 1
    ref11 = _reference_idct(blocks[3], STD_LUMA_QUANT)
    assert np.abs(got[8:10, 8:12] - ref11[:2, :4]).max() <= 1


def test_restart_markers_reset_predictor():
    import random

    rng = random.Random(11)
    blocks = _rand_blocks(rng, 8, density=0.1)
    plain = jpeg_encode_gray_coefs(64, 8, blocks)
    with_rst = jpeg_encode_gray_coefs(64, 8, blocks, restart_interval=2)
    assert b"\xff\xd0" in with_rst or b"\xff\xd1" in with_rst
    assert jpeg_decode_gray(with_rst) == jpeg_decode_gray(plain)


def test_16bit_dqt_path():
    """Re-frame the quant table as a Pq=1 (16-bit) DQT; decode must agree."""
    payload = encode_flat_blocks(1, 1, [70])
    (dqt_len,) = struct.unpack(">H", payload[4:6])
    assert payload[2:4] == b"\xff\xdb" and dqt_len == 67
    zz_vals = payload[7 : 7 + 64]
    wide = b"\x10" + b"".join(struct.pack(">H", v) for v in zz_vals)
    reframed = (
        payload[:2]
        + b"\xff\xdb"
        + struct.pack(">H", len(wide) + 2)
        + wide
        + payload[6 + dqt_len - 2 :]
    )
    assert jpeg_decode_gray(reframed) == jpeg_decode_gray(payload)


def test_declines_are_typed():
    good = encode_flat_blocks(1, 1, [50])
    with pytest.raises(ValueError, match="not a JPEG"):
        jpeg_decode_gray(b"\x89PNG\r\n\x1a\nnope")
    # SOF0 -> SOF2: progressive DECODES since round 8, but a baseline
    # scan header (Ss=0, Se=63) under SOF2 is a scan-script violation
    prog = good.replace(b"\xff\xc0", b"\xff\xc2")
    with pytest.raises(JpegUnsupported, match="Se"):
        jpeg_decode_gray(prog)
    # lossless (SOF3) stays a typed non-baseline decline
    lossless = good.replace(b"\xff\xc0", b"\xff\xc3")
    with pytest.raises(JpegUnsupported, match="non-baseline"):
        jpeg_decode_gray(lossless)
    # 2-component: out of scope (1 = gray, 3 = YCbCr since round 8)
    i = good.index(b"\xff\xc0")
    multi = bytearray(good)
    multi[i + 9] = 2
    with pytest.raises(JpegUnsupported, match="component"):
        jpeg_decode_gray(bytes(multi))
    # truncated entropy data
    with pytest.raises(JpegUnsupported, match="truncated"):
        jpeg_decode_gray(good[:-6])
    # missing DHT: excise the segment
    j = good.index(b"\xff\xc4")
    (dht_len,) = struct.unpack(">H", good[j + 2 : j + 4])
    with pytest.raises(JpegUnsupported, match="missing DHT"):
        jpeg_decode_gray(good[:j] + good[j + 2 + dht_len :])


def test_dimension_bomb_declines():
    from pbx_ds_ocr_server_spark.kernels.jpeg_codec import JPEG_MAX_PIXELS

    good = encode_flat_blocks(1, 1, [50])
    i = good.index(b"\xff\xc0")
    bomb = bytearray(good)
    bomb[i + 5 : i + 9] = struct.pack(">HH", 30000, 30000)
    assert 30000 * 30000 > JPEG_MAX_PIXELS
    with pytest.raises(JpegUnsupported, match="dimensions"):
        jpeg_decode_gray(bytes(bomb))
    # JPEG's own cap is TIGHTER than the PNG-derived MAX_PIXELS: per-pixel
    # decode cost (Huffman + two 8-tap IDCT passes) is ~10x the unfilter
    # loop the PNG bound was derived from
    from pbx_ds_ocr_server_spark.kernels.png_codec import MAX_PIXELS

    assert JPEG_MAX_PIXELS <= MAX_PIXELS
    px1024 = bytearray(good)
    px1024[i + 5 : i + 9] = struct.pack(">HH", 1024, 1024)
    assert 1024 * 1024 > JPEG_MAX_PIXELS <= MAX_PIXELS
    with pytest.raises(JpegUnsupported, match="dimensions"):
        jpeg_decode_gray(bytes(px1024))


def test_malformed_segments_decline_typed_not_crash():
    """Adversarial byte streams with the JPEG magic must raise
    JpegUnsupported (a ValueError the operators catch), never
    struct.error/IndexError that would kill the Spark task — the four
    shapes below all escaped before the round-7 review fix."""
    cases = [
        b"\xff\xd8\xff\xc0\x00\x04\x08\x00",  # short SOF segment
        b"\xff\xd8\xff\xdd\x00\x02",  # empty-body DRI
        # short SOS (ns byte only)
        b"\xff\xd8\xff\xc0\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00"
        b"\xff\xda\x00\x03\x01",
        # short 16-bit DQT (Pq=1 but only 4 payload bytes)
        b"\xff\xd8\xff\xdb\x00\x07\x10\x00\x01\x00\x02",
    ]
    for payload in cases:
        with pytest.raises(JpegUnsupported):
            jpeg_decode_gray(payload)


def test_zrl_past_block_end_declines():
    """A ZRL landing past coefficient 63 would silently desync the scan
    (next symbols misread as the following block's DC) and return
    deterministic-but-wrong pixels with decode_ok — must decline typed."""
    from pbx_ds_ocr_server_spark.kernels.jpeg_codec import (
        AC_LUMA_BITS,
        AC_LUMA_VALS,
        DC_LUMA_BITS,
        DC_LUMA_VALS,
        _BitWriter,
        _encode_table,
    )

    good = encode_flat_blocks(1, 1, [5])
    sos = good.rindex(b"\xff\xda")
    (sos_len,) = struct.unpack(">H", good[sos + 2 : sos + 4])
    prefix = good[: sos + 2 + sos_len]
    dc_enc = _encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_enc = _encode_table(AC_LUMA_BITS, AC_LUMA_VALS)
    w = _BitWriter()
    code, length = dc_enc[0]
    w.write(code, length)  # DC diff 0
    for _ in range(4):  # k: 1 -> 17 -> 33 -> 49 -> 65 (past block end)
        code, length = ac_enc[0xF0]
        w.write(code, length)
    w.flush()
    with pytest.raises(JpegUnsupported, match="ZRL"):
        jpeg_decode_gray(prefix + bytes(w.out) + b"\xff\xd9")


def test_stats_closed_form_flat_gradient():
    """The driver slot's shape: block (bx,by) = base + bx + by → block-space
    trapezoid histogram, mean = base + (bw-1)/2 + (bh-1)/2."""
    bw, bh, base = 3, 2, 40
    vals = [base + bx + by for by in range(bh) for bx in range(bw)]
    st = jpeg_pixel_stats(encode_flat_blocks(bw, bh, vals))
    assert st["px_width"] == bw * 8 and st["px_height"] == bh * 8
    assert st["channels"] == 1 and st["n_px"] == bw * bh * 64
    assert st["luma_mean"] == base + (bw - 1) / 2 + (bh - 1) / 2
    n, ent = bw * bh, 0.0
    for t in range(bw + bh - 1):
        p = (min(t, bw - 1, bh - 1, bw + bh - 2 - t) + 1) / n
        ent -= p * math.log2(p)
    assert abs(st["luma_entropy"] - ent) < 1e-12


def test_zigzag_is_an_involution_on_indices():
    assert sorted(ZIGZAG) == list(range(64))
    # spot-check the spec anchors
    assert ZIGZAG[0] == 0 and ZIGZAG[1] == 1 and ZIGZAG[2] == 8
    # index 35 ends the down-left diagonal at (7,0): natural 56
    assert ZIGZAG[63] == 63 and ZIGZAG[35] == 56 and ZIGZAG[9] == 24


def test_non_baseline_scan_progression_declines():
    """An Ss!=0 scan header (AC-only, per B.2.3) has no DC entropy data;
    decoding it with baseline semantics would misread the first Huffman
    symbol via the DC table — deterministic wrong pixels with decode_ok.
    Eighth-review fix: decline any (Ss, Se, AhAl) != (0, 63, 0)."""
    good = encode_flat_blocks(1, 1, [50])
    sos = good.rindex(b"\xff\xda")
    for off, val in ((5, 1), (6, 62), (7, 0x10)):  # Ss / Se / Ah
        bad = bytearray(good)
        bad[sos + 2 + off] = val
        with pytest.raises(JpegUnsupported, match="progression"):
            jpeg_decode_gray(bytes(bad))


def test_duplicate_sof_declines():
    """Two frame headers = the JPEG shape of the PNG codec's duplicate-
    IHDR forgery decline (second header silently rebinding dimensions)."""
    good = encode_flat_blocks(1, 1, [50])
    i = good.index(b"\xff\xc0")
    (ln,) = struct.unpack(">H", good[i + 2 : i + 4])
    dup = good[: i + 2 + ln] + good[i : i + 2 + ln] + good[i + 2 + ln :]
    with pytest.raises(JpegUnsupported, match="duplicate SOF"):
        jpeg_decode_gray(dup)


def test_missing_eoi_and_trailing_garbage_decline():
    """Tail strictness parity with the PNG codec: entropy data must be
    followed by exactly the EOI marker — a truncation that lost EOI or an
    appended-garbage payload must not get decode_ok."""
    good = encode_flat_blocks(1, 1, [50])
    assert good.endswith(b"\xff\xd9")
    with pytest.raises(JpegUnsupported, match="EOI"):
        jpeg_decode_gray(good[:-2] + b"GARBAGE!")
    with pytest.raises(JpegUnsupported, match="trailing"):
        jpeg_decode_gray(good + b"\x00\x01")
    # and the well-formed stream still decodes after the strictness
    w, h, px = jpeg_decode_gray(good)
    assert (w, h) == (8, 8)


# --- color (3-component YCbCr) decode — round 8 ---


def _ref_ycbcr_to_rgb(y, cb, cr):
    """Independent JFIF/T.871 conversion (numpy arrays, full resolution)."""
    r = np.floor(y + 1.402 * (cr - 128.0) + 0.5)
    g = np.floor(
        y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0) + 0.5
    )
    b = np.floor(y + 1.772 * (cb - 128.0) + 0.5)
    return [np.clip(c, 0, 255).astype(np.int64) for c in (r, g, b)]


def test_color_flat_444_exact():
    from pbx_ds_ocr_server_spark.kernels.jpeg_codec import (
        encode_flat_blocks_color,
        jpeg_decode,
    )

    p = encode_flat_blocks_color(1, 1, [80], [116], [136], y_sampling=(1, 1))
    w, h, c, raw = jpeg_decode(p)
    assert (w, h, c) == (8, 8, 3)
    # offsets from the docstring algebra: (+11, -2, -21) at dCb=-12, dCr=8
    assert set(raw[0::3]) == {91}
    assert set(raw[1::3]) == {78}
    assert set(raw[2::3]) == {59}


def test_color_420_checkerboard_chroma_placement():
    """2x2 MCUs with per-MCU Cr values: a chroma block landed on the wrong
    MCU (interleave/placement bug) changes exactly those 256 pixels."""
    from pbx_ds_ocr_server_spark.kernels.jpeg_codec import (
        encode_flat_blocks_color,
        jpeg_decode,
    )

    yv = [50] * 16  # flat luma isolates the chroma placement
    cr = [136, 138, 138, 136]  # checkerboard over the 2x2 MCU grid
    p = encode_flat_blocks_color(2, 2, yv, [116] * 4, cr)
    w, h, c, raw = jpeg_decode(p)
    assert (w, h, c) == (32, 32, 3)
    img = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
    # dCr=8 -> R=y+11; dCr=10 -> R=y+14 (docstring algebra)
    for my in range(2):
        for mx in range(2):
            tile = img[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16, 0]
            expect = 50 + (11 if (mx + my) % 2 == 0 else 14)
            assert (tile == expect).all(), (mx, my)


def test_color_444_random_coefs_match_numpy_reference():
    import random

    from pbx_ds_ocr_server_spark.kernels.jpeg_codec import (
        STD_CHROMA_QUANT,
        jpeg_decode,
        jpeg_encode_color_coefs,
    )

    rng = random.Random(13)
    bw, bh = 2, 2
    yb = _rand_blocks(rng, 4)
    cbb = _rand_blocks(rng, 4, max_mag=20, density=0.1)
    crb = _rand_blocks(rng, 4, max_mag=20, density=0.1)
    p = jpeg_encode_color_coefs(16, 16, yb, cbb, crb, y_sampling=(1, 1))
    w, h, c, raw = jpeg_decode(p)
    assert (w, h, c) == (16, 16, 3)
    got = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3).astype(np.int64)
    planes = []
    for blocks, q in ((yb, STD_LUMA_QUANT), (cbb, STD_CHROMA_QUANT),
                      (crb, STD_CHROMA_QUANT)):
        plane = np.zeros((16, 16))
        for by in range(bh):
            for bx in range(bw):
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _reference_idct(blocks[by * bw + bx], q)
                )
        planes.append(plane)
    r, g, b = _ref_ycbcr_to_rgb(*planes)
    # +-1 IDCT summation noise per component can shift a converted
    # channel by at most ~2 code values
    assert np.abs(got[:, :, 0] - r).max() <= 2
    assert np.abs(got[:, :, 1] - g).max() <= 2
    assert np.abs(got[:, :, 2] - b).max() <= 2


def test_color_420_upsample_replication_and_crop():
    """Odd (non-MCU-multiple) dims: 20x12 at 4:2:0 needs 2x1 MCUs, crops
    the padded 32x16 luma plane, and every pixel must read the chroma
    sample at (x//2, y//2) — checked against a hand-built reference."""
    from pbx_ds_ocr_server_spark.kernels.jpeg_codec import (
        jpeg_decode,
        jpeg_encode_color_coefs,
    )

    # luma: flat-DC blocks with distinct values per block on the 4x2 grid
    yvals = [40, 42, 44, 46, 48, 50, 52, 54]
    yb = [[8 * (v - 128)] + [0] * 63 for v in yvals]
    # chroma: DC-only with per-block values (one block per MCU)
    cbb = [[8 * (116 - 128)] + [0] * 63 for _ in range(2)]
    crb = [[8 * (136 - 128)] + [0] * 63, [8 * (138 - 128)] + [0] * 63]
    p = jpeg_encode_color_coefs(
        20, 12, yb, cbb, crb, y_sampling=(2, 2),
        qtable_luma=[1] * 64, qtable_chroma=[1] * 64,
    )
    w, h, c, raw = jpeg_decode(p)
    assert (w, h, c) == (20, 12, 3)
    img = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
    for yy in range(12):
        for xx in range(20):
            y = yvals[(yy // 8) * 4 + (xx // 8)]
            dcr = 8 if xx < 16 else 10  # MCU 0 vs MCU 1 Cr
            assert img[yy, xx, 0] == y + (11 if dcr == 8 else 14), (xx, yy)
            assert img[yy, xx, 2] == y - 21


def test_color_422_sampling():
    from pbx_ds_ocr_server_spark.kernels.jpeg_codec import (
        encode_flat_blocks_color,
        jpeg_decode,
    )

    # one 16x8 MCU: two luma blocks side by side, one chroma block
    p = encode_flat_blocks_color(
        1, 1, [60, 62], [116], [136], y_sampling=(2, 1)
    )
    w, h, c, raw = jpeg_decode(p)
    assert (w, h, c) == (16, 8, 3)
    img = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
    assert (img[:, :8, 0] == 71).all() and (img[:, 8:, 0] == 73).all()


def test_color_restart_markers():
    from pbx_ds_ocr_server_spark.kernels.jpeg_codec import (
        encode_flat_blocks_color,
        jpeg_decode,
        jpeg_encode_color_coefs,
    )

    yv = [40 + i for i in range(16)]
    cb = [110 + i for i in range(4)]
    cr = [130 + i for i in range(4)]
    plain = encode_flat_blocks_color(2, 2, yv, cb, cr)
    yb = [[8 * (v - 128)] + [0] * 63 for v in yv]
    cbb = [[8 * (v - 128)] + [0] * 63 for v in cb]
    crb = [[8 * (v - 128)] + [0] * 63 for v in cr]
    with_rst = jpeg_encode_color_coefs(
        32, 32, yb, cbb, crb, qtable_luma=[1] * 64,
        qtable_chroma=[1] * 64, restart_interval=1,
    )
    assert b"\xff\xd0" in with_rst
    assert jpeg_decode(with_rst) == jpeg_decode(plain)


def test_color_declines_are_typed():
    from pbx_ds_ocr_server_spark.kernels.jpeg_codec import (
        encode_flat_blocks_color,
        jpeg_decode,
    )

    good = encode_flat_blocks_color(1, 1, [80, 80, 80, 80], [116], [136])
    i = good.index(b"\xff\xc0")
    # CMYK (4-component) claim
    cmyk = bytearray(good)
    cmyk[i + 9] = 4
    with pytest.raises(JpegUnsupported, match="component"):
        jpeg_decode(bytes(cmyk))
    # subsampled-luma-with-sampled-chroma: set Cb sampling to 2x1
    bad = bytearray(good)
    bad[i + 14] = 0x21  # component 2 H=2 V=1
    with pytest.raises(JpegUnsupported, match="sampling"):
        jpeg_decode(bytes(bad))
    # non-YCbCr component ids (Adobe RGB-coded streams use 'R','G','B')
    ids = bytearray(good)
    ids[i + 10], ids[i + 13], ids[i + 16] = 0x52, 0x47, 0x42
    with pytest.raises(JpegUnsupported, match="component ids"):
        jpeg_decode(bytes(ids))
    # Adobe APP14 transform=0 (RGB) on otherwise-normal ids
    app14 = (
        b"\xff\xee" + struct.pack(">H", 14)
        + b"Adobe" + bytes([0, 100, 0, 0, 0, 0, 0])
    )
    rgb = good[:2] + app14 + good[2:]
    with pytest.raises(JpegUnsupported, match="Adobe RGB"):
        jpeg_decode(rgb)
    # transform=1 (YCbCr) APP14 still decodes
    app14_ycc = (
        b"\xff\xee" + struct.pack(">H", 14)
        + b"Adobe" + bytes([0, 100, 0, 0, 0, 0, 1])
    )
    assert jpeg_decode(good[:2] + app14_ycc + good[2:]) == jpeg_decode(good)
    # scan component order mismatch: swap Cb/Cr ids in SOS
    sos = good.rindex(b"\xff\xda")
    swapped = bytearray(good)
    swapped[sos + 7], swapped[sos + 9] = swapped[sos + 9], swapped[sos + 7]
    with pytest.raises(JpegUnsupported, match="order"):
        jpeg_decode(bytes(swapped))
    # non-interleaved color (1-component scan of a 3-component frame):
    # shrink SOS to ns=1 — must decline, not decode Y silently
    ns1 = (
        good[:sos]
        + b"\xff\xda" + struct.pack(">H", 8)
        + bytes([1, 1, 0x00, 0, 63, 0])
        + good[sos + 2 + struct.unpack(">H", good[sos + 2 : sos + 4])[0]:]
    )
    with pytest.raises(JpegUnsupported, match="non-interleaved"):
        jpeg_decode(ns1)


def test_color_sampling_weighted_work_cap():
    """4:4:4 triples decoded samples: a dimension that is fine in gray
    must decline in 4:4:4 once w*h*3 exceeds the cap — the color path
    cannot buy 3x the block budget the grayscale cap was derived from."""
    from pbx_ds_ocr_server_spark.kernels.jpeg_codec import (
        JPEG_MAX_PIXELS,
        encode_flat_blocks,
        encode_flat_blocks_color,
        jpeg_decode,
    )

    good = encode_flat_blocks_color(1, 1, [80], [116], [136],
                                    y_sampling=(1, 1))
    i = good.index(b"\xff\xc0")
    w = h = 600
    assert w * h <= JPEG_MAX_PIXELS < 3 * w * h
    color = bytearray(good)
    color[i + 5 : i + 9] = struct.pack(">HH", h, w)
    with pytest.raises(JpegUnsupported, match="dimensions"):
        jpeg_decode(bytes(color))
    # the same dims in GRAY pass the cap check (fails later in the
    # entropy decode — the frame only carries one block, so the reader
    # runs into the EOI marker)
    gray = bytearray(encode_flat_blocks(1, 1, [80]))
    j = gray.index(b"\xff\xc0")
    gray[j + 5 : j + 9] = struct.pack(">HH", h, w)
    with pytest.raises(JpegUnsupported,
                       match="truncated|marker inside|invalid Huffman"):
        jpeg_decode(bytes(gray))


def test_jpeg_pixel_stats_color_closed_form():
    """The m=7 slot variant's algebra end-to-end: luma bin y-4 on both
    MCU parities, mean = exact integer ratio (docstring of
    multimodal.synthetic_flat_color_jpeg)."""
    from pbx_ds_ocr_server_spark.operators.multimodal import (
        synthetic_flat_color_jpeg,
    )

    # seeds spanning all (mw, mh, base) combos; the closed form holds for
    # ANY seed (only id 21 of these is an actual m=7 slot id — the slot
    # schedule is (id//3) % 9 == 7, i.e. id ≡ 21 mod 27)
    for seed in (21, 45, 69, 93, 117, 141):
        mw, mh = 1 + (seed % 9) // 3, 1 + (seed % 6) // 3
        base = 32 + seed % 32
        ew, eh = 2 * mw, 2 * mh
        st = jpeg_pixel_stats(synthetic_flat_color_jpeg(seed))
        assert st["channels"] == 3
        assert (st["px_width"], st["px_height"]) == (8 * ew, 8 * eh)
        n_mcu = mw * mh
        n_odd = n_mcu // 2
        sum_y = 64 * (ew * eh * base + eh * (ew * (ew - 1) // 2)
                      + ew * (eh * (eh - 1) // 2))
        total3 = 3 * sum_y - 256 * (12 * (n_mcu - n_odd) + 10 * n_odd)
        assert st["luma_mean"] == total3 / (3 * 64 * ew * eh)
        n, ent = ew * eh, 0.0
        for t in range(ew + eh - 1):
            p = (min(t, ew - 1, eh - 1, ew + eh - 2 - t) + 1) / n
            ent -= p * math.log2(p)
        assert abs(st["luma_entropy"] - ent) < 1e-12


# --- progressive (SOF2) decode — round 8 ---


def _prog_roundtrip_gray(blocks, w, h, **kw):
    from pbx_ds_ocr_server_spark.kernels.jpeg_codec import (
        jpeg_decode,
        jpeg_encode_progressive,
    )

    return jpeg_decode(jpeg_encode_progressive(w, h, [blocks], **kw))


def test_progressive_equals_baseline_gray():
    """The core equivalence: a progressive scan script (DC first +
    refinements + per-band AC first + refinements) must reconstruct the
    EXACT coefficients the baseline encoding carries — decoded pixels
    bit-identical. The baseline decoder is the independent reference, so
    a sign/shift/EOBRUN bug in either progressive codec half shows as a
    pixel diff."""
    import random

    from pbx_ds_ocr_server_spark.kernels.jpeg_codec import jpeg_decode

    for seed in range(6):
        rng = random.Random(seed)
        blocks = _rand_blocks(rng, 6, density=0.35)
        base = jpeg_decode(jpeg_encode_gray_coefs(24, 16, blocks))
        for al in (0, 1, 3):
            assert _prog_roundtrip_gray(blocks, 24, 16, al=al) == base, (
                seed, al,
            )


def test_progressive_equals_baseline_color_420():
    import random

    from pbx_ds_ocr_server_spark.kernels.jpeg_codec import (
        jpeg_decode,
        jpeg_encode_color_coefs,
        jpeg_encode_progressive,
    )

    rng = random.Random(99)
    yb = _rand_blocks(rng, 8)
    cbb = _rand_blocks(rng, 2, max_mag=20, density=0.1)
    crb = _rand_blocks(rng, 2, max_mag=20, density=0.1)
    # 20x12: odd dims — Y's non-interleaved AC grid (3x2) is SMALLER than
    # its padded DC grid (4x2); padded-edge blocks get DC but no AC
    base = jpeg_decode(jpeg_encode_color_coefs(20, 12, yb, cbb, crb))
    for al in (0, 1):
        prog = jpeg_decode(
            jpeg_encode_progressive(20, 12, [yb, cbb, crb], al=al)
        )
        assert prog == base, al


def test_progressive_restart_intervals():
    import random

    from pbx_ds_ocr_server_spark.kernels.jpeg_codec import jpeg_decode

    blocks = _rand_blocks(random.Random(3), 6, density=0.3)
    base = jpeg_decode(jpeg_encode_gray_coefs(24, 16, blocks))
    for ri in (1, 2, 5):
        got = _prog_roundtrip_gray(
            blocks, 24, 16, al=2, restart_interval=ri
        )
        assert got == base, ri


def test_progressive_eobrun_spans_blocks():
    """Mostly-empty blocks force multi-block EOB runs in both first and
    refinement AC scans (the EOBn path the Annex K tables can't even
    express — the progressive encoder ships its own table)."""
    from pbx_ds_ocr_server_spark.kernels.jpeg_codec import jpeg_decode

    blocks = [[0] * 64 for _ in range(8)]
    blocks[0][0] = 80
    blocks[7][9] = 3  # one lone AC coefficient in the last block
    base = jpeg_decode(jpeg_encode_gray_coefs(64, 8, blocks))
    for al in (0, 1):
        assert _prog_roundtrip_gray(blocks, 64, 8, al=al) == base


def test_progressive_scan_script_violations_decline():
    from pbx_ds_ocr_server_spark.kernels.jpeg_codec import (
        jpeg_decode,
        jpeg_encode_progressive,
    )

    good = jpeg_encode_progressive(8, 8, [[[40] + [0] * 63]], al=1)
    w, h, c, raw = jpeg_decode(good)
    assert (w, h, c) == (8, 8, 1)

    def scans(payload):
        out, i = [], 2
        while i < len(payload) - 2:
            if payload[i] == 0xFF and payload[i + 1] == 0xDA:
                out.append(i)
            i += 1
        return out

    sos_list = scans(good)
    assert len(sos_list) == 4  # DC first, DC refine, AC first, AC refine
    # drop the DC first scan: the DC refinement then has no band to
    # continue (and the AC scans would arrive before any DC data)
    dc_first, dc_ref = sos_list[0], sos_list[1]
    no_dc = good[:dc_first] + good[dc_ref:]
    with pytest.raises(JpegUnsupported, match="band|DC scan"):
        jpeg_decode(no_dc)
    # drop BOTH DC scans: the AC first scan arrives before any DC scan
    no_dc2 = good[:dc_first] + good[sos_list[2]:]
    with pytest.raises(JpegUnsupported, match="before the component"):
        jpeg_decode(no_dc2)
    # break the Ah chain: make the DC refinement claim Ah=2 (Al=1)
    bad = bytearray(good)
    ah_off = dc_ref + 2 + 2 + 1 + 2 * 1 + 2  # seg hdr + ns + comps + Ss,Se
    assert bad[ah_off] == 0x10
    bad[ah_off] = 0x21
    with pytest.raises(JpegUnsupported, match="approximation|refinement"):
        jpeg_decode(bytes(bad))
    # truncation inside a scan
    with pytest.raises(JpegUnsupported, match="truncated"):
        jpeg_decode(good[: sos_list[2] + 12])
    # trailing garbage after EOI still declines
    with pytest.raises(JpegUnsupported, match="trailing"):
        jpeg_decode(good + b"!!")


def test_progressive_block_budget_declines():
    """A scan script revisiting blocks past PROG_MAX_BLOCK_PASSES is a
    work bomb — decline typed. Build one by repeating the (legal-looking)
    DC refinement scan beyond the budget; it trips the band-state check
    OR the budget, both typed."""
    from pbx_ds_ocr_server_spark.kernels.jpeg_codec import (
        PROG_MAX_BLOCK_PASSES,
        jpeg_decode,
        jpeg_encode_progressive,
    )

    assert PROG_MAX_BLOCK_PASSES >= 4  # the canonical script fits
    good = jpeg_encode_progressive(8, 8, [[[40] + [0] * 63]], al=1)
    # al=13 would make the canonical script 1 + 13 + 1 + 13 = 28 passes
    # at one block per pass — over the budget of 12
    with pytest.raises(JpegUnsupported, match="budget"):
        jpeg_decode(
            jpeg_encode_progressive(8, 8, [[[40] + [0] * 63]], al=13)
        )
    assert jpeg_decode(good)[2] == 1


def test_progressive_pixel_stats_and_dispatch():
    """jpeg_pixel_stats / multimodal decode_image accept SOF2 streams."""
    from pbx_ds_ocr_server_spark.kernels.jpeg_codec import (
        jpeg_encode_progressive,
    )
    from pbx_ds_ocr_server_spark.operators.multimodal import (
        decode_image,
        jpeg_dimensions,
    )

    blocks = [[8 * (v - 128)] + [0] * 63 for v in (30, 31, 32, 33)]
    p = jpeg_encode_progressive(
        16, 16, [blocks], qtable_luma=[1] * 64, al=1
    )
    assert jpeg_dimensions(p) == (16, 16)
    w, h, c, raw = decode_image(p)
    assert (w, h, c) == (16, 16, 1)
    assert set(raw[:8]) == {30} and raw[8] == 31
    st = jpeg_pixel_stats(p)
    assert st["luma_mean"] == (30 + 31 + 32 + 33) / 4


def test_gray_wrapper_declines_color_at_frame_header():
    """Round-8 review fix: jpeg_decode_gray must decline a color stream
    at the SOF parse, not after paying the full capped decode. Proof: a
    color stream TRUNCATED right after its SOF (undecodable) still gets
    the 'color stream' decline — the scan was never attempted."""
    from pbx_ds_ocr_server_spark.kernels.jpeg_codec import (
        encode_flat_blocks_color,
        jpeg_decode,
    )

    good = encode_flat_blocks_color(1, 1, [80], [116], [136],
                                    y_sampling=(1, 1))
    i = good.index(b"\xff\xc0")
    (ln,) = struct.unpack(">H", good[i + 2 : i + 4])
    header_only = good[: i + 2 + ln]
    with pytest.raises(JpegUnsupported, match="color stream"):
        jpeg_decode_gray(header_only)
    # and jpeg_decode still decodes the full stream
    assert jpeg_decode(good)[2] == 3


def test_baseline_ac_category_over_10_declines():
    """T.81 F.1.2.2.1 caps baseline AC SSSS at 10; a custom DHT smuggling
    an SSSS=11 symbol must decline typed, not decode a huge coefficient
    (round-8 review fix — the progressive path already declined it)."""
    from pbx_ds_ocr_server_spark.kernels.jpeg_codec import (
        DC_LUMA_BITS,
        DC_LUMA_VALS,
        JpegUnsupported,
        _BitReader,
        _BitWriter,
        _decode_block,
        _encode_table,
        build_huffman,
    )

    dc_table = build_huffman(DC_LUMA_BITS, DC_LUMA_VALS)
    dc_enc = _encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_table = {(1, 0): 0x0B}  # SSSS=11 at a 1-bit code
    w = _BitWriter()
    code, length = dc_enc[0]
    w.write(code, length)  # DC diff 0
    w.write(0, 1)  # the s=11 AC symbol
    w.write(0x7FF, 11)  # its magnitude bits
    w.flush()
    reader = _BitReader(bytes(w.out) + b"\xff\xd9", 0)
    with pytest.raises(JpegUnsupported, match="AC category 11"):
        _decode_block(reader, [1] * 64, dc_table, ac_table, 0)


def test_refinement_zrl_past_band_declines():
    """Round-8 review fix: an AC-refinement ZRL whose 16 zero-history
    positions do not fit before Se is the same silent-desync vector the
    first-scan/baseline ZRL checks decline — unit-tested against the
    refinement block decoder directly."""
    from pbx_ds_ocr_server_spark.kernels.jpeg_codec import (
        _PROG_AC_BITS,
        _PROG_AC_VALS,
        _ac_refine_block,
        _BitReader,
        _BitWriter,
        _encode_table,
        build_huffman,
    )

    ac_table = build_huffman(_PROG_AC_BITS, _PROG_AC_VALS)
    ac_enc = _encode_table(_PROG_AC_BITS, _PROG_AC_VALS)
    w = _BitWriter()
    code, length = ac_enc[0xF0]  # ZRL with only 4 band positions left
    w.write(code, length)
    w.flush()
    reader = _BitReader(bytes(w.out) + b"\xff\xd9", 0)
    coef = [0] * 64
    with pytest.raises(JpegUnsupported, match="ZRL run past band end"):
        _ac_refine_block(reader, coef, 60, 63, 0, ac_table, 0)


def test_color_and_progressive_mutation_fuzz_declines_typed():
    """Every single-byte mutation of a valid color/progressive stream
    must either decode (harmless bit flip in entropy data) or raise a
    ValueError subtype — never struct.error/IndexError/KeyError that
    would kill a Spark task, and never hang. 300 deterministic mutations
    across both new round-8 stream shapes."""
    import random

    from pbx_ds_ocr_server_spark.kernels.jpeg_codec import (
        encode_flat_blocks_color,
        jpeg_decode,
        jpeg_encode_progressive,
    )

    color = encode_flat_blocks_color(2, 1, [60, 61, 62, 63, 64, 65, 66,
                                            67], [116, 117], [136, 138])
    prog = jpeg_encode_progressive(
        16, 16, [[[8 * (v - 128)] + [0] * 63 for v in (30, 40, 50, 60)]],
        qtable_luma=[1] * 64, al=1,
    )
    rng = random.Random(42)
    for base in (color, prog):
        for _ in range(150):
            buf = bytearray(base)
            pos = rng.randrange(2, len(buf))  # keep the SOI magic
            buf[pos] ^= 1 << rng.randrange(8)
            try:
                jpeg_decode(bytes(buf))
            except ValueError:
                pass  # JpegUnsupported is a ValueError — typed decline


def test_progressive_every_truncation_declines_typed():
    """A progressive stream cut at EVERY byte offset must decline typed
    (EOI is mandatory, so no prefix is a valid stream) — exhaustive, not
    sampled."""
    from pbx_ds_ocr_server_spark.kernels.jpeg_codec import (
        jpeg_decode,
        jpeg_encode_progressive,
    )

    prog = jpeg_encode_progressive(
        16, 8, [[[8 * (v - 128)] + [0] * 63 for v in (30, 60)]],
        qtable_luma=[1] * 64, al=1, restart_interval=1,
    )
    for cut in range(2, len(prog)):
        with pytest.raises(ValueError):
            jpeg_decode(prog[:cut])


def test_stray_markers_between_segments_decline():
    """Thirteenth-review repro: a stray FF 00 between a progressive scan
    and EOI must NOT parse as a length-bearing pseudo-segment smuggling
    attacker-controlled junk into a decode_ok=true stream; same for TEM,
    out-of-scan RSTn and a second SOI."""
    from pbx_ds_ocr_server_spark.kernels.jpeg_codec import (
        jpeg_decode,
        jpeg_encode_progressive,
    )

    good = jpeg_encode_progressive(
        8, 8, [[[40] + [0] * 63]], qtable_luma=[1] * 64, al=0
    )
    assert good.endswith(b"\xff\xd9")
    body, eoi = good[:-2], good[-2:]
    # FF 00 + bogus length + junk, spliced before EOI
    smuggle = b"\xff\x00" + struct.pack(">H", 6) + b"JUNK"
    with pytest.raises(JpegUnsupported, match="stray marker"):
        jpeg_decode(body + smuggle + eoi)
    for stray in (b"\xff\x01", b"\xff\xd3", b"\xff\xd8"):
        with pytest.raises(JpegUnsupported, match="stray marker"):
            jpeg_decode(body + stray + struct.pack(">H", 6) + b"JUNK" + eoi)
    assert jpeg_decode(good)[2] == 1  # the unspliced stream still decodes
