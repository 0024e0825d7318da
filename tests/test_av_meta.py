"""Audio/video container metadata kernels (round 8) — real RIFF/ISO-BMFF
parsing with the raster codecs' strictness conventions."""

import struct

import pytest

from pbx_ds_ocr_server_spark.kernels.av_meta import (
    MAX_BOXES,
    AvUnsupported,
    mp4_encode,
    mp4_info,
    wav_encode,
    wav_info,
)


def test_wav_round_trip_and_closed_forms():
    for seed in (0, 21, 27, 510, 9999):
        sr = 8000 + (seed % 8) * 1000
        ch = 1 + seed % 2
        ns = 400 + seed % 512
        pcm = bytes((i * 7 + seed) % 256 for i in range(ns * ch * 2))
        info = wav_info(wav_encode(sr, ch, pcm))
        assert info["codec"] == "pcm_1"
        assert info["channels"] == ch and info["sample_rate"] == sr
        assert info["bits_per_sample"] == 16
        assert info["n_samples"] == ns
        assert info["duration_ms"] == ns * 1000 // sr
        assert info["n_bytes"] == 44 + len(pcm)


def test_wav_odd_data_chunk_is_word_padded():
    # 8-bit mono with an odd sample count: the encoder must emit the RIFF
    # word-alignment pad byte its own parser's walk skips (14th-review
    # fix — the encoder previously failed its own round trip here)
    info = wav_info(wav_encode(8000, 1, bytes(7), bits=8))
    assert info["n_samples"] == 7 and info["bits_per_sample"] == 8


def test_mp4_mvhd_outside_moov_declines():
    """14th-review fix: a top-level mvhd (invalid per ISO-BMFF 8.2.2)
    must not yield confident metadata — the file still lacks moov."""
    m = mp4_encode(600, 50, bytes(4))
    moov_start = 20
    mvhd_only = m[:20] + m[moov_start + 8 : moov_start + 116] + m[136:]
    with pytest.raises(AvUnsupported, match="missing moov"):
        mp4_info(mvhd_only)


def test_mp4_encode_rejects_short_brand():
    with pytest.raises(ValueError, match="4 bytes"):
        mp4_encode(600, 50, b"", brand="iso")


def test_wav_declines_typed():
    good = wav_encode(8000, 1, bytes(16))
    with pytest.raises(ValueError, match="not a RIFF"):
        wav_info(b"RIFX" + good[4:])
    # truncation breaks the RIFF-size invariant
    with pytest.raises(AvUnsupported, match="RIFF size"):
        wav_info(good[:-1])
    # garbage appended after the final chunk
    fat = good + b"!"
    fat = fat[:4] + struct.pack("<I", len(fat) - 8) + fat[8:]
    with pytest.raises(AvUnsupported, match="trailing|truncated"):
        wav_info(fat)
    # zero sample rate
    zr = bytearray(good)
    zr[24:28] = struct.pack("<I", 0)
    with pytest.raises(AvUnsupported, match="zero"):
        wav_info(bytes(zr))
    # data not a whole number of frames (stereo 16-bit, 2 bytes)
    with pytest.raises(AvUnsupported, match="frames"):
        stereo = wav_encode(8000, 2, bytes(4))
        bad = bytearray(stereo)
        bad[40:44] = struct.pack("<I", 2)  # shrink data chunk len
        bad[4:8] = struct.pack("<I", len(bad) - 8 - 2)
        wav_info(bytes(bad[:-2]))
    # missing data chunk
    nodata = good[:36]
    nodata = nodata[:4] + struct.pack("<I", len(nodata) - 8) + nodata[8:]
    with pytest.raises(AvUnsupported, match="missing"):
        wav_info(nodata)


def test_mp4_round_trip_and_versions():
    m = mp4_encode(600, 1234, bytes(10))
    info = mp4_info(m)
    assert info["codec"] == "isom"
    assert (info["timescale"], info["duration_units"]) == (600, 1234)
    assert info["duration_ms"] == 1234 * 1000 // 600
    assert info["n_bytes"] == len(m) == 144 + 10
    # hand-build an mvhd VERSION 1 (64-bit duration) moov
    mvhd1 = (
        struct.pack(">I", 120) + b"mvhd" + bytes([1, 0, 0, 0])
        + bytes(16)  # 64-bit creation/modification
        + struct.pack(">I", 90000) + struct.pack(">Q", 3 << 32)
        + bytes(120 - 8 - 4 - 16 - 12)
    )
    moov = struct.pack(">I", 8 + len(mvhd1)) + b"moov" + mvhd1
    v1 = m[:20] + moov + m[20 + 116 :]
    info1 = mp4_info(v1)
    assert info1["timescale"] == 90000
    assert info1["duration_units"] == 3 << 32
    assert info1["duration_ms"] == (3 << 32) * 1000 // 90000


def test_mp4_largesize_and_size_zero():
    m = mp4_encode(600, 50, bytes(4))
    # rewrite mdat with a 64-bit largesize header
    mdat = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + 4) \
        + bytes(4)
    big = m[: 20 + 116] + mdat
    assert mp4_info(big)["duration_ms"] == 50 * 1000 // 600
    # size 0 = to end of file on the last box
    tail = struct.pack(">I", 0) + b"mdat" + bytes(9)
    zero = m[: 20 + 116] + tail
    assert mp4_info(zero)["n_bytes"] == len(zero)


def test_mp4_declines_typed():
    m = mp4_encode(600, 50, bytes(4))
    with pytest.raises(ValueError, match="not an ISO"):
        mp4_info(b"\x00\x00\x00\x14abcd" + m[8:])
    with pytest.raises(AvUnsupported, match="contradicts|truncated"):
        mp4_info(m[:-1])
    # zero timescale
    zt = bytearray(m)
    zt[20 + 8 + 8 + 12 : 20 + 8 + 8 + 16] = struct.pack(">I", 0)
    with pytest.raises(AvUnsupported, match="timescale"):
        mp4_info(bytes(zt))
    # mvhd version 2 out of scope
    v2 = bytearray(m)
    v2[20 + 8 + 8] = 2
    with pytest.raises(AvUnsupported, match="mvhd version"):
        mp4_info(bytes(v2))
    # box bomb: thousands of 8-byte free boxes
    bomb = m[:20] + (struct.pack(">I", 8) + b"free") * (MAX_BOXES + 2)
    with pytest.raises(AvUnsupported, match="bomb"):
        mp4_info(bomb)
    # missing moov
    with pytest.raises(AvUnsupported, match="missing moov"):
        mp4_info(m[:20] + struct.pack(">I", 8) + b"free")


def test_binary_pixel_metadata_av_rows(spark):
    """WAV rows carry channels/sample_rate/duration_ms, MP4 rows
    duration_ms; decode_ok stays NULL (it asserts pixel decode); a
    corrupt WAV yields NULL metadata, never a task failure."""
    from pbx_ds_ocr_server_spark.operators.multimodal import (
        binary_pixel_metadata,
    )

    wav = wav_encode(16000, 2, bytes(64))
    mp4 = mp4_encode(600, 1200, bytes(3))
    rows = [
        (1, bytearray(wav)),
        (2, bytearray(mp4)),
        (3, bytearray(wav[:-5])),  # truncated: metadata stays NULL
    ]
    df = spark.createDataFrame(rows, "id bigint, payload binary")
    out = {r.id: r.asDict() for r in binary_pixel_metadata(df).collect()}
    assert out[1]["kind"] == "wav" and out[1]["channels"] == 2
    assert out[1]["sample_rate"] == 16000
    assert out[1]["duration_ms"] == 16 * 1000 // 16000
    assert out[1]["decode_ok"] is None
    assert out[2]["kind"] == "mp4"
    assert out[2]["duration_ms"] == 1200 * 1000 // 600
    assert out[2]["sample_rate"] is None
    assert out[3]["kind"] == "wav" and out[3]["duration_ms"] is None
