"""Charset sniff precedence: BOM > meta > utf-8 > latin-1 (FIXTURES.md §3a)."""

from pbx_ds_ocr_server_spark.kernels.charset import declared_charset, sniff_decode


def test_plain_utf8():
    text, enc = sniff_decode("héllo wörld".encode("utf-8"))
    assert (text, enc) == ("héllo wörld", "utf-8")


def test_utf8_bom():
    text, enc = sniff_decode(b"\xef\xbb\xbf" + "héllo".encode("utf-8"))
    assert text == "héllo" and enc == "utf-8-sig"


def test_utf16_le_bom():
    text, enc = sniff_decode("héllo".encode("utf-16"))  # BOM + LE on x86
    assert text == "héllo" and enc.startswith("utf-16")


def test_meta_charset_gb18030():
    body = '<html><head><meta charset="gb18030"></head><body>中文内容</body></html>'
    text, enc = sniff_decode(body.encode("gb18030"))
    assert "中文内容" in text and enc == "gb18030"


def test_meta_http_equiv():
    body = (
        '<html><head><meta http-equiv="Content-Type" '
        'content="text/html; charset=iso-8859-1"></head><body>caf\xe9</body></html>'
    )
    text, enc = sniff_decode(body.encode("latin-1"))
    assert "café" in text and enc == "latin-1"


def test_mislabeled_meta_falls_through():
    # declared codec that ERRORS on these bytes (utf-32 needs len%4==0 and
    # sane code points) → precedence falls through to strict utf-8
    body = '<html><head><meta charset="utf-32"></head><body>héllo</body></html>'
    text, enc = sniff_decode(body.encode("utf-8"))
    assert "héllo" in text and enc == "utf-8"


def test_mislabeled_but_decodable_declared_wins():
    # frozen spec: a declared codec that decodes successfully wins even if
    # "wrong" (latin-1 never fails) — deterministic beats clever
    body = '<html><head><meta charset="iso-8859-1"></head><body>café</body></html>'
    text, enc = sniff_decode(body.encode("utf-8"))
    assert enc == "latin-1" and "cafÃ©" in text


def test_unknown_label_falls_through():
    body = '<html><head><meta charset="no-such-codec"></head><body>x</body></html>'
    text, enc = sniff_decode(body.encode("utf-8"))
    assert enc == "utf-8"


def test_binary_garbage_never_raises():
    text, enc = sniff_decode(b"\xff\xfe\xfd\x00\x01" * 7)  # not valid utf-16 length? still decodes
    assert isinstance(text, str)


def test_latin1_fallback():
    text, enc = sniff_decode(b"caf\xe9 <p>")  # invalid utf-8 → latin-1
    assert text == "café <p>" and enc == "latin-1"


def test_declared_charset_scans_first_4k():
    body = b" " * 5000 + b'<meta charset="gb18030">'
    assert declared_charset(body) is None


def test_empty():
    assert sniff_decode(b"") == ("", "utf-8")


def test_determinism():
    payload = "héllo wörld 中文".encode("utf-8")
    assert all(sniff_decode(payload) == sniff_decode(payload) for _ in range(3))


def test_cjk_labels_decode_through_whatwg_codecs():
    """shift_jis/euc-jp/big5/euc-kr labels (and variants) decode the page;
    the Shift_JIS family maps to cp932 (windows-31j) per the WHATWG table —
    the NEC/IBM extension chars real pages carry prove it's not the strict
    JIS X 0208 codec."""
    cases = [
        ("shift_jis", "cp932", "日本語 テスト ① ㈱"),  # ①/㈱ = NEC extensions
        ("Shift-JIS", "cp932", "日本語 テスト"),
        ("x-sjis", "cp932", "日本語"),
        ("euc-jp", "euc-jp", "日本語 解析 文書"),
        ("big5", "big5", "中文 測試 文件"),
        ("euc-kr", "cp949", "한국어 문서"),
    ]
    for label, codec, s in cases:
        body = (
            f'<html><head><meta charset="{label}"></head>'
            f"<body><p>{s}</p></body></html>"
        )
        text, enc = sniff_decode(body.encode(codec))
        assert enc == codec, label
        assert s in text, label


def test_strict_sjis_label_still_wins_when_decodable():
    # a page whose bytes happen to be plain 7-bit ASCII under any CJK label
    body = b'<html><head><meta charset="sjis"></head><body>ok</body></html>'
    text, enc = sniff_decode(body)
    assert enc == "cp932" and "ok" in text


def test_thai_turkish_label_variants_resolve():
    """Every WHATWG label variant of the Thai/Turkish families must hit
    the superset codec — a missing alias silently falls through to
    utf-8/latin-1 mojibake, and Python's OWN iso-8859-9 codec would decode
    0x80-0x9F as C1 controls instead of cp1254's text block."""
    thai = "ภาษาไทย"
    for label in ("tis-620", "iso-8859-11", "iso8859-11", "iso885911",
                  "dos-874", "windows-874"):
        body = (f'<html><head><meta charset="{label}"></head>'
                f"<body>{thai}</body></html>").encode("cp874")
        text, enc = sniff_decode(body)
        assert enc == "cp874" and thai in text, label
    tr = "Türkçe ğış œŒ"  # œ/Œ exist in cp1254, NOT in ISO 8859-9
    for label in ("iso-8859-9", "iso8859-9", "iso88599", "latin5", "l5",
                  "csisolatin5"):
        body = (f'<html><head><meta charset="{label}"></head>'
                f"<body>{tr}</body></html>").encode("cp1254")
        text, enc = sniff_decode(body)
        assert enc == "cp1254" and tr in text, label
