"""Adversarial/bounded-work kernel behavior: the T3/T4 analogs and the
inputs a 100-TB crawl inevitably contains."""

import time

from pbx_ds_ocr_server_spark.config import ExtractConfig
from pbx_ds_ocr_server_spark.kernels import extract_html


def test_giant_single_block_is_capped_not_hung():
    giant = b"<html><body><p>" + b"word " * 2_000_000 + b"</p></body></html>"
    t0 = time.time()
    r = extract_html(giant)
    assert time.time() - t0 < 10
    assert 0 < len(r.text) <= ExtractConfig().max_block_chars


def test_unclosed_quote_attr_no_redos():
    payload = b'<html><body><p attr="' + b'"a' * 100_000 + b">x</p></body></html>"
    t0 = time.time()
    extract_html(payload)
    assert time.time() - t0 < 5


def test_deep_nesting_linear():
    deep = b"<body>" + b"<div>" * 50_000 + b"x" + b"</div>" * 50_000 + b"</body>"
    t0 = time.time()
    r = extract_html(deep)
    assert time.time() - t0 < 5 and r.text == "x"


def test_nested_boiler_skip():
    nested = b"<body><nav>" + b"<nav>x</nav>" * 10_000 + b"</nav><p>real</p></body>"
    t0 = time.time()
    r = extract_html(nested)
    assert time.time() - t0 < 5 and r.text == "real"


def test_unterminated_boiler_consumes_to_eof():
    r = extract_html(b"<body><p>before</p><nav><li>lost forever")
    assert r.text == "before"


def test_head_implicitly_closed_at_body():
    # malformed head (no </head>) must not swallow the document
    r = extract_html(b"<html><head><meta charset=utf-8><body><p>kept</p></body></html>")
    assert r.text == "kept"


def test_block_count_cap():
    many = b"<body>" + b"<p>x</p>" * 1000 + b"</body>"
    r = extract_html(many, ExtractConfig(max_blocks_per_doc=10))
    assert len(r.spans) <= 10


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=2000))
def test_lzw_decode_round_trips_any_bytes(payload):
    from tests.test_pdf_kernel import _lzw_encode

    from pbx_ds_ocr_server_spark.kernels.pdf_extract import _lzw_decode

    assert _lzw_decode(_lzw_encode(payload)) == payload


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=500))
def test_lzw_decode_never_crashes_on_garbage(payload):
    from pbx_ds_ocr_server_spark.kernels.pdf_extract import _lzw_decode

    try:
        _lzw_decode(payload)
    except ValueError:
        pass  # 'bad LZW code' is the accepted failure mode


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=500))
def test_runlength_decode_never_crashes(payload):
    from pbx_ds_ocr_server_spark.kernels.pdf_extract import _runlength_decode

    _runlength_decode(payload)


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=800))
def test_parse_tounicode_never_crashes(payload):
    from pbx_ds_ocr_server_spark.kernels.pdf_fonts import parse_tounicode

    cmap, width = parse_tounicode(payload)
    assert width in (1, 2) or width > 0
    assert all(isinstance(v, str) for v in cmap.values())


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=800))
def test_parse_differences_never_crashes(payload):
    from pbx_ds_ocr_server_spark.kernels.pdf_fonts import parse_differences

    d = parse_differences(payload)
    assert d is None or isinstance(d, dict)


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=800))
def test_font_decoders_never_crash(payload):
    from pbx_ds_ocr_server_spark.kernels.pdf_fonts import FontDecoder

    for dec in (
        FontDecoder("default"),
        FontDecoder("cid_unknown"),
        FontDecoder("cmap", cmap={65: "A"}, width=2),
        FontDecoder("differences", diffs={65: "A", 66: None}),
    ):
        s, lost = dec.decode(payload)
        assert isinstance(s, str) and isinstance(lost, bool)


@settings(max_examples=75, deadline=None)
@given(st.binary(min_size=0, max_size=1500))
def test_pdf_decryptor_never_crashes_on_garbage(payload):
    """pdf_decryptor must be a total function of bytes: random payloads
    (possibly containing /Encrypt-shaped fragments) either yield None or a
    working decryptor, never an exception."""
    from pbx_ds_ocr_server_spark.kernels.pdf_extract import pdf_decryptor

    d = pdf_decryptor(b"%PDF-1.4\n" + payload + b"\n/Encrypt 1 0 R\n%%EOF")
    if d is not None:
        d(1, b"some bytes")


@given(st.binary(max_size=512))
@settings(max_examples=200, deadline=None)
def test_embedded_font_parsers_never_raise_on_arbitrary_bytes(data):
    """The round-5 embedded-font parsers run inside the extraction kernel
    on attacker-controlled crawl bytes: any input must parse or decline,
    never raise."""
    from pbx_ds_ocr_server_spark.kernels.pdf_fonts import (
        cff_simple_code_map,
        parse_type1_builtin_encoding,
        sfnt_cmap_subtables,
        truetype_gid_to_unicode,
        truetype_simple_code_map,
    )

    sfnt_cmap_subtables(data)
    truetype_gid_to_unicode(data)
    truetype_simple_code_map(data)
    parse_type1_builtin_encoding(data)
    cff_simple_code_map(data)


@given(st.integers(0, 10_000), st.binary(min_size=1, max_size=16))
@settings(max_examples=100, deadline=None)
def test_valid_truetype_with_mutations_never_raises(pos, patch):
    """Byte-level mutations of a VALID font program (truncation, splice)
    exercise the bounds checks the pure-random strategy rarely reaches."""
    from pbx_ds_ocr_server_spark.corpus import make_truetype_cmap_font
    from pbx_ds_ocr_server_spark.kernels.pdf_fonts import (
        truetype_gid_to_unicode,
        truetype_simple_code_map,
    )

    base = make_truetype_cmap_font(set("The quick brown fox 0123"))
    p = pos % (len(base) + 1)
    for mutated in (
        base[:p],                                  # truncation
        base[:p] + patch + base[p + len(patch):],  # splice
        base[:p] + patch,                          # truncate + garbage tail
    ):
        truetype_gid_to_unicode(mutated)
        truetype_simple_code_map(mutated)
