"""Charset sniffing for raw HTML payload bytes.

The reference delegates decoding to PIL/model internals; for the web-page
rebuild we define a frozen, deterministic precedence (SURVEY.md §7 hard-part 1,
FIXTURES.md §3a "charset variants"):

  1. Unicode BOM (UTF-8 / UTF-16 LE / UTF-16 BE / UTF-32)
  2. ``<meta charset=...>`` / ``<meta http-equiv=Content-Type ...>`` declared
     encoding, scanned ASCII-wise in the first 4096 bytes
  3. strict UTF-8 attempt
  4. latin-1 fallback (never fails; preserves every byte deterministically)

A declared-but-wrong charset (meta says latin-1, bytes are valid UTF-8 with
non-ASCII) falls through 2→3 only when the declared codec *errors*; if the
declared codec decodes successfully it wins — the precedence itself is part of
the frozen spec, mirrored in the golden fixtures.
"""

from __future__ import annotations

import codecs
import re

_META_RE = re.compile(
    rb"""<meta[^>]+?(?:
        charset\s*=\s*["']?\s*([A-Za-z0-9._:-]+)      # <meta charset=...>
        |
        content\s*=\s*["'][^"']*charset=([A-Za-z0-9._:-]+)  # http-equiv form
    )""",
    re.IGNORECASE | re.VERBOSE,
)

_BOMS: tuple[tuple[bytes, str], ...] = (
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF8, "utf-8-sig"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
)

# Common label aliases (WHATWG encoding-ish, minimal deterministic subset).
# The CJK rows follow the WHATWG Encoding Standard's label→decoder table:
# every Shift_JIS-family label decodes as windows-31j (cp932 — the strict
# JIS X 0208 codec rejects the NEC/IBM extensions real pages use), euc-kr
# decodes as windows-949 (cp949, the uhc superset), big5 labels keep the
# stdlib big5 (Python has no big5+HKSCS-fallback combined table; pages
# declaring hkscs explicitly get big5hkscs).
_ALIASES = {
    "iso-8859-1": "latin-1",
    "iso8859-1": "latin-1",
    "windows-1252": "cp1252",
    "gb2312": "gb18030",  # WHATWG maps gb2312 label to gb18030 decoder
    "gbk": "gb18030",
    "utf8": "utf-8",
    # Japanese
    "shift_jis": "cp932",
    "shift-jis": "cp932",
    "sjis": "cp932",
    "x-sjis": "cp932",
    "ms_kanji": "cp932",
    "ms932": "cp932",
    "windows-31j": "cp932",
    "euc-jp": "euc-jp",
    "euc_jp": "euc-jp",
    "x-euc-jp": "euc-jp",
    # Traditional Chinese
    "big5": "big5",
    "big-5": "big5",
    "cn-big5": "big5",
    "x-x-big5": "big5",
    "big5-hkscs": "big5hkscs",
    # Thai (WHATWG: all Thai labels decode as windows-874)
    "tis-620": "cp874",
    "iso-8859-11": "cp874",
    "iso8859-11": "cp874",
    "iso885911": "cp874",
    "dos-874": "cp874",
    "windows-874": "cp874",
    # Turkish (WHATWG: every iso-8859-9/latin5 label decodes as
    # windows-1254 — Python's own iso-8859-9 codec would map 0x80-0x9F
    # to C1 controls instead of cp1254's œ/Ÿ block)
    "iso-8859-9": "cp1254",
    "iso8859-9": "cp1254",
    "iso88599": "cp1254",
    "latin5": "cp1254",
    "l5": "cp1254",
    "csisolatin5": "cp1254",
    # Korean
    "euc-kr": "cp949",
    "euc_kr": "cp949",
    "korean": "cp949",
    "ks_c_5601-1987": "cp949",
    "ksc5601": "cp949",
    "windows-949": "cp949",
}


def declared_charset(payload: bytes) -> str | None:
    """Return the charset label declared in a <meta> tag, lowercased."""
    m = _META_RE.search(payload[:4096])
    if not m:
        return None
    label = (m.group(1) or m.group(2) or b"").decode("ascii", "ignore").strip().lower()
    return label or None


def sniff_decode(payload: bytes) -> tuple[str, str]:
    """Decode HTML payload bytes → ``(text, encoding_used)``.

    Deterministic: identical bytes always produce identical output.
    """
    if not payload:
        return "", "utf-8"
    for bom, enc in _BOMS:
        if payload.startswith(bom):
            try:
                if enc == "utf-8-sig":
                    return payload.decode("utf-8-sig"), enc
                return payload[len(bom):].decode(enc), enc
            except (UnicodeDecodeError, LookupError):
                break  # corrupt BOM'd payload → fall through to meta/utf-8
    label = declared_charset(payload)
    if label:
        codec = _ALIASES.get(label, label)
        try:
            return payload.decode(codec), codec
        except (UnicodeDecodeError, LookupError):
            pass
    try:
        return payload.decode("utf-8"), "utf-8"
    except UnicodeDecodeError:
        return payload.decode("latin-1"), "latin-1"
