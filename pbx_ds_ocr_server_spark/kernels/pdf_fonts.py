"""PDF font text-decoding: ToUnicode CMaps, /Differences, CID honesty.

Real crawl PDFs overwhelmingly use embedded fonts whose show-text bytes are
GLYPH INDICES, not character codes: Type0 composite fonts with /Identity-H
CID encodings, or simple fonts with /Differences-remapped codes. Decoding
those bytes as Latin-1-ish text (the round-2 kernel) emits mojibake with
``status='succeeded'`` — the reference never sees this because it rasterizes
with PyMuPDF and OCRs the pixels (``/root/reference/app/services/
dsocr_model.py:144-174``), so the font layer is solved for it. This module
restores the honesty contract for a text-first parser:

  * fonts carrying a /ToUnicode CMap (ISO 32000-1 §9.10.3) are decoded
    EXACTLY: ``bfchar`` and ``bfrange`` (both scalar-increment and array
    destination forms) map glyph codes to UTF-16BE text;
  * /Differences-encoded simple fonts decode through the Adobe Glyph List
    naming convention (a compact embedded subset + ``uniXXXX``/``uXXXXXX``);
  * everything else that is provably glyph-indexed (Type0 / Identity-H with
    no usable ToUnicode) decodes to NOTHING and flags the show op as LOST —
    the page surfaces as ``succeeded_empty``, never mojibake-as-success.

Pure functions of bytes; no dependencies.
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------- mini-AGL
# Compact Adobe Glyph List subset: ASCII names + the Latin-1 accents that
# dominate western crawl PDFs. Letters/digits are generated; unknown names
# fall through to the uniXXXX/uXXXX rules, then to None (= lost).
_AGL: dict[str, str] = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "endash": "–", "emdash": "—", "bullet": "•",
    "ellipsis": "…", "fi": "ﬁ", "fl": "ﬂ",
    "degree": "°", "copyright": "©", "registered": "®",
    "trademark": "™", "sterling": "£", "euro": "€",
    "yen": "¥", "cent": "¢", "section": "§",
    "paragraph": "¶", "middot": "·", "periodcentered": "·",
    "aacute": "á", "agrave": "à", "acircumflex": "â",
    "adieresis": "ä", "atilde": "ã", "aring": "å",
    "ae": "æ", "ccedilla": "ç", "eacute": "é",
    "egrave": "è", "ecircumflex": "ê", "edieresis": "ë",
    "iacute": "í", "igrave": "ì", "icircumflex": "î",
    "idieresis": "ï", "ntilde": "ñ", "oacute": "ó",
    "ograve": "ò", "ocircumflex": "ô", "odieresis": "ö",
    "otilde": "õ", "oslash": "ø", "uacute": "ú",
    "ugrave": "ù", "ucircumflex": "û", "udieresis": "ü",
    "yacute": "ý", "ydieresis": "ÿ", "germandbls": "ß",
    "Aacute": "Á", "Agrave": "À", "Adieresis": "Ä",
    "Ccedilla": "Ç", "Eacute": "É", "Ntilde": "Ñ",
    "Oacute": "Ó", "Odieresis": "Ö", "Uacute": "Ú",
    "Udieresis": "Ü",
}
for _c in "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz":
    _AGL[_c] = _c
for _i, _name in enumerate(
    ("zero", "one", "two", "three", "four", "five", "six", "seven",
     "eight", "nine")
):
    _AGL[_name] = str(_i)

# Round-5 widening (published AGL entries beyond uniXXXX):
#   * the f-ligature family + long s + dotless i/j
#   * the Cyrillic afii10017-10049 / afii10065-10097 runs (А..Я / а..я with
#     Ё/ё interleaved after Е/е — the AGL's own ordering), plus the two
#     common standalone afii names (horizontal bar, numero sign)
# gNN/cidNN glyph-INDEX names stay unmapped on purpose: they carry no
# Unicode semantics, so they must keep flowing to the lost path.
_AGL.update({
    "ff": "ﬀ", "ffi": "ﬃ", "ffl": "ﬄ",
    "longs": "ſ", "dotlessi": "ı", "dotlessj": "ȷ",
    "afii00208": "―", "afii61352": "№",
    # the Macintosh standard glyph order's non-MacRoman tail (also plain
    # AGL names, so /Differences arrays using them decode too)
    "Lslash": "Ł", "lslash": "ł", "Scaron": "Š", "scaron": "š",
    "Zcaron": "Ž", "zcaron": "ž", "brokenbar": "¦", "Eth": "Ð",
    "eth": "ð", "Yacute": "Ý", "Thorn": "Þ", "currency": "¤",
    "thorn": "þ", "minus": "−", "multiply": "×", "onesuperior": "¹",
    "twosuperior": "²", "threesuperior": "³", "onehalf": "½",
    "onequarter": "¼", "threequarters": "¾", "franc": "₣",
    "Gbreve": "Ğ", "gbreve": "ğ", "Idotaccent": "İ", "Scedilla": "Ş",
    "scedilla": "ş", "Cacute": "Ć", "cacute": "ć", "Ccaron": "Č",
    "ccaron": "č", "dcroat": "đ",
})
for _base, _cps in (
    (10017, list(range(0x410, 0x416)) + [0x401] + list(range(0x416, 0x430))),
    (10065, list(range(0x430, 0x436)) + [0x451] + list(range(0x436, 0x450))),
):
    for _i, _cp in enumerate(_cps):
        _AGL[f"afii{_base + _i}"] = chr(_cp)

_UNI_RE = re.compile(r"uni((?:[0-9A-Fa-f]{4})+)$")
_U_RE = re.compile(r"u([0-9A-Fa-f]{4,6})$")


# ------------------------------------------------------- base encodings
# ISO 32000-1 Annex D tables, built from Python's codec machinery instead
# of a 224-row literal: WinAnsiEncoding is cp1252 over codes 32..255 minus
# the five unassigned codes, with the Annex D footnote overrides (octal
# 240 = space, octal 255 = hyphen — NOT nbsp/soft-hyphen); MacRomanEncoding
# is mac-roman with octal 312 = space and 0xDB = currency (Adobe's table
# predates the Mac OS 8.5 euro revision Python's codec implements).
def _build_win_ansi() -> dict[int, str]:
    t: dict[int, str] = {}
    for b in range(32, 256):
        if b in (0x7F, 0x81, 0x8D, 0x8F, 0x90, 0x9D):
            continue  # 0x7F (DEL) + five cp1252 holes: unassigned in Annex D
        t[b] = bytes([b]).decode("cp1252")
    t[0xA0] = " "
    t[0xAD] = "-"
    return t


def _build_mac_roman() -> dict[int, str]:
    t = {
        b: bytes([b]).decode("mac-roman")
        for b in range(32, 256)
        if b != 0x7F  # DEL — unassigned in the Annex D MacRoman table
    }
    t[0xCA] = " "
    t[0xDB] = "¤"
    return t


WIN_ANSI = _build_win_ansi()
MAC_ROMAN = _build_mac_roman()


def _build_standard() -> dict[int, str]:
    """Adobe StandardEncoding (ISO 32000-1 Annex D / PLRM appendix E):
    ASCII identity EXCEPT 0x27 = quoteright and 0x60 = quoteleft, plus the
    Adobe-ordered punctuation/ligature/accent block in 0xA1-0xFB. No
    stdlib codec exists for it, so the non-ASCII rows are a literal table
    (keys in octal to match the published tables)."""
    t = {b: chr(b) for b in range(32, 127)}
    t[0x27] = "’"  # quoteright
    t[0x60] = "‘"  # quoteleft
    high = {
        0o241: "¡", 0o242: "¢", 0o243: "£", 0o244: "⁄", 0o245: "¥",
        0o246: "ƒ", 0o247: "§", 0o250: "¤", 0o251: "'", 0o252: "“",
        0o253: "«", 0o254: "‹", 0o255: "›", 0o256: "ﬁ",
        0o257: "ﬂ", 0o261: "–", 0o262: "†", 0o263: "‡", 0o264: "·",
        0o266: "¶", 0o267: "•", 0o270: "‚", 0o271: "„",
        0o272: "”", 0o273: "»", 0o274: "…", 0o275: "‰", 0o277: "¿",
        0o301: "`", 0o302: "´", 0o303: "ˆ", 0o304: "˜", 0o305: "¯",
        0o306: "˘", 0o307: "˙", 0o310: "¨", 0o312: "˚", 0o313: "¸",
        0o315: "˝", 0o316: "˛", 0o317: "ˇ", 0o320: "—", 0o341: "Æ",
        0o343: "ª", 0o350: "Ł", 0o351: "Ø", 0o352: "Œ", 0o353: "º",
        0o361: "æ", 0o365: "ı", 0o370: "ł", 0o371: "ø", 0o372: "œ",
        0o373: "ß",
    }
    t.update(high)
    return t


STANDARD = _build_standard()

_BASE_ENCODINGS = {
    b"WinAnsiEncoding": WIN_ANSI,
    b"MacRomanEncoding": MAC_ROMAN,
    b"StandardEncoding": STANDARD,
}


def base_encoding_table(name: bytes) -> dict[int, str] | None:
    """Named simple-font base encoding (WinAnsi / MacRoman / Standard) →
    {code → text}, or None when the name is not one we decode
    (MacExpertEncoding and symbol-font encodings fall to the caller's
    default path)."""
    return _BASE_ENCODINGS.get(name)


# --------------------------------------------------- predefined CID CMaps
# ISO 32000-1 §9.7.5.2 Table 118 names. Three decodable families:
#   * Identity-H/V        — code = CID = glyph index: NOT text; only a
#                           /ToUnicode CMap recovers it (honest empty else)
#   * Uni*-UCS2/UTF16-*   — the show-string bytes ARE big-endian Unicode:
#                           directly decodable with no ToUnicode at all
#   * legacy charset maps — the show-string bytes are text in the CMap's
#                           source charset (GBK-EUC = GBK bytes, 90ms-RKSJ
#                           = Shift-JIS/cp932, ETen-B5 = Big5, KSCms-UHC =
#                           UHC/cp949...): decodable through the stdlib
#                           codec for that charset
# Anything else (pure-CID orderings like Adobe-Japan1-6's RKSJ variants we
# don't list) stays honest-empty.
_CMAP_CODECS: dict[bytes, str] = {
    b"GB-EUC": "gb18030", b"GBpc-EUC": "gb18030", b"GBK-EUC": "gb18030",
    b"GBKp-EUC": "gb18030", b"GBK2K": "gb18030",
    b"90ms-RKSJ": "cp932", b"90msp-RKSJ": "cp932", b"90pv-RKSJ": "cp932",
    b"83pv-RKSJ": "cp932", b"Add-RKSJ": "cp932", b"Ext-RKSJ": "cp932",
    b"EUC": "euc-jp",
    b"B5pc": "big5", b"ETen-B5": "big5", b"ETenms-B5": "big5",
    b"HKscs-B5": "big5hkscs",
    b"KSC-EUC": "euc-kr", b"KSCpc-EUC": "euc-kr",
    b"KSCms-UHC": "cp949", b"KSCms-UHC-HW": "cp949",
}
_UCS2_RE = re.compile(rb"Uni[A-Za-z0-9]+-(UCS2|UTF16)(-HW)?$")
_HV_RE = re.compile(rb"-(H|V)$")


def classify_predefined_cmap(name: bytes) -> str | None:
    """Predefined CMap name → decode strategy: 'identity' (CID == code, no
    text without ToUnicode), 'utf16' (codes are UTF-16BE text), a Python
    codec name (codes are text in that legacy charset), or None (unknown —
    caller keeps the honest-empty path)."""
    if name in (b"Identity-H", b"Identity-V"):
        return "identity"
    stem = _HV_RE.sub(b"", name)
    if _UCS2_RE.fullmatch(stem):
        return "utf16"
    return _CMAP_CODECS.get(stem)


# The classic Adobe character collections all open with the same Latin
# prefix: their published *-UCS2 CMap resources (Adobe-Japan1-UCS2,
# Adobe-GB1-UCS2, Adobe-CNS1-UCS2, Adobe-Korea1-UCS2) map CIDs 1-95 to the
# proportional-Latin set U+0020..U+007E in code order. That prefix is the
# dependency-free recoverable slice of a CID-keyed font with no ToUnicode:
# beyond it the mapping needs the full ordering tables (tens of thousands
# of CJK entries) and stays honestly unmapped.
CID_LATIN_ORDERINGS = frozenset((b"Japan1", b"GB1", b"CNS1", b"Korea1"))


def cid_latin_cmap() -> dict[int, str]:
    """CID → text for the shared Latin prefix (CIDs 1-95 = U+0020..U+007E)
    of the :data:`CID_LATIN_ORDERINGS` character collections."""
    return {i: chr(i + 31) for i in range(1, 96)}


# --- deploy-time CID→Unicode tables beyond the Latin prefix (round 7) ---
#
# The full ordering tables (tens of thousands of CJK entries per
# collection) are PUBLIC data — Adobe publishes cid2code.txt for each
# character collection in its cmap-resources repository — but they are
# not bundled here and this sandbox has no network to fetch them
# (env-blocked, same standing as the Iceberg runtime jar). The seam below
# is the real extension point: parse the published file with
# :func:`load_cid2code`, register per ordering with
# :func:`register_cid_table`, and Identity-H CIDFontType0 text beyond
# CIDs 1-95 decodes through exactly the code path the Latin prefix uses
# today. The plumbing is exercised end-to-end in tests by a clearly-
# synthetic table registered through this same seam — no fabricated
# "Adobe" data is shipped.

_CID_TABLES: dict[bytes, dict[int, str]] = {}


def register_cid_table(ordering: bytes | str, mapping: dict[int, str]) -> None:
    """Register CID→text entries for an Adobe character-collection
    ordering (e.g. ``b"Japan1"``). Entries MERGE over the built-in Latin
    prefix (registered values win on overlap — real cid2code data
    contains the prefix anyway and must be authoritative). Registering an
    ordering outside :data:`CID_LATIN_ORDERINGS` enables recovery for it."""
    key = ordering.encode("ascii") if isinstance(ordering, str) else ordering
    _CID_TABLES.setdefault(key, {}).update(
        {int(c): str(t) for c, t in mapping.items()}
    )


def unregister_cid_table(ordering: bytes | str) -> None:
    key = ordering.encode("ascii") if isinstance(ordering, str) else ordering
    _CID_TABLES.pop(key, None)


def cid_tables_snapshot() -> dict[bytes, dict[int, str]]:
    """Driver-side snapshot of every registered table. Registration is a
    module global, and Spark's Python workers import this module FRESH —
    driver-side register_cid_table alone would silently never reach the
    executors. The extraction operator captures this snapshot at plan
    time and replays it worker-side via :func:`restore_cid_tables`, so
    the deploy seam works through the real Spark path, not just direct
    kernel calls. (The tables ship in the task closure: the full
    published collections are a few hundred KB — fine; anything larger
    belongs in a broadcast variable feeding restore_cid_tables.)"""
    return {k: dict(v) for k, v in _CID_TABLES.items()}


def restore_cid_tables(snapshot: dict[bytes, dict[int, str]]) -> None:
    """Executor-side replay of :func:`cid_tables_snapshot` — REPLACE, not
    merge: Spark reuses Python workers across jobs, so a table restored
    by an earlier plan would otherwise survive into a later plan whose
    driver had since unregistered it (an empty snapshot must mean "no
    tables"). The plan-time snapshot is authoritative."""
    _CID_TABLES.clear()
    for key, mapping in snapshot.items():
        _CID_TABLES[key] = dict(mapping)


def cid_ordering_cmap(ordering: bytes) -> dict[int, str] | None:
    """The effective CID→text table for an Adobe ordering: the shared
    Latin prefix for the classic collections, overlaid by any
    :func:`register_cid_table` data. ``None`` when the ordering is
    neither classic nor registered (caller declines, honest-empty)."""
    registered = _CID_TABLES.get(ordering)
    if ordering in CID_LATIN_ORDERINGS:
        table = cid_latin_cmap()
        if registered:
            table.update(registered)
        return table
    return dict(registered) if registered else None


def load_cid2code(
    text: str, column: str, comment: str = "#"
) -> dict[int, str]:
    """Parse the published ``cid2code.txt`` shape (Adobe cmap-resources):
    ``comment``-prefixed header lines, then a tab-separated table whose
    first column is the CID and whose named ``column`` (e.g.
    ``UniJIS-UCS2``) holds hex Unicode values. Tolerant of the published
    conventions: ``*`` = no mapping, ``x,y`` alternates (first taken),
    trailing letter suffixes on variant forms (entry skipped — a variant
    gloss is not the base character). Returns {cid: char}; feed the
    result to :func:`register_cid_table`."""
    lines = [
        ln for ln in text.splitlines() if ln and not ln.startswith(comment)
    ]
    if not lines:
        return {}
    header = lines[0].split("\t")
    try:
        col = header.index(column)
    except ValueError:
        raise ValueError(
            f"column {column!r} not in cid2code header {header}"
        ) from None
    out: dict[int, str] = {}
    for ln in lines[1:]:
        fields = ln.split("\t")
        if col >= len(fields) or not fields[0].isdigit():
            continue
        raw = fields[col].split(",")[0].strip()
        if not raw or raw == "*":
            continue
        try:
            cp = int(raw, 16)
        except ValueError:
            continue  # variant-suffixed forms ("3013v") stay unmapped
        if 0 < cp <= 0x10FFFF:
            out[int(fields[0])] = chr(cp)
    return out


def glyph_to_unicode(name: str) -> str | None:
    """AGL glyph name → text, or None when unknown (caller flags as lost)."""
    if name in _AGL:
        return _AGL[name]
    m = _UNI_RE.fullmatch(name)
    if m:
        hx = m.group(1)
        return "".join(
            chr(int(hx[i : i + 4], 16)) for i in range(0, len(hx), 4)
        )
    m = _U_RE.fullmatch(name)
    if m:
        try:
            return chr(int(m.group(1), 16))
        except ValueError:
            return None
    return None


# ----------------------------------------------------------- ToUnicode CMap
_CSR_RE = re.compile(
    rb"begincodespacerange(.*?)endcodespacerange", re.DOTALL
)
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.DOTALL)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.DOTALL)
_HEX_TOK_RE = re.compile(rb"<([0-9A-Fa-f]+)>|(\[)|(\])")


def _utf16be(hx: bytes) -> str:
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii")).decode("utf-16-be", "replace")


# a bfrange wider than 16 bits of codes is structurally bogus (codes are
# byte sequences; ranges may not cross the low-byte boundary per spec) —
# cap instead of materializing millions of entries from a corrupt CMap
_MAX_BFRANGE = 0x10000


def parse_tounicode(
    data: bytes, default_width: int = 2
) -> tuple[dict[int, str], int]:
    """CMap stream bytes → ({glyph code → text}, code byte-width).

    Width comes from the first codespacerange's low bound (``<00>`` → 1,
    ``<0000>`` → 2); when the CMap omits codespacerange (nonconforming but
    seen in the wild) ``default_width`` applies — callers pass 2 for Type0
    fonts (the Identity-H norm) and 1 for simple fonts, whose show-string
    codes are single bytes. bfrange scalar destinations increment the LAST
    UTF-16 code unit, per spec (skipping increments that would leave the
    Unicode range or land in surrogates — corrupt-CMap hardening);
    array destinations map positionally."""
    width = default_width
    m = _CSR_RE.search(data)
    if m:
        toks = re.findall(rb"<([0-9A-Fa-f]+)>", m.group(1))
        if toks:
            width = max(1, len(toks[0]) // 2)
    cmap: dict[int, str] = {}
    for sect in _BFCHAR_RE.finditer(data):
        toks = re.findall(rb"<([0-9A-Fa-f]+)>", sect.group(1))
        for src, dst in zip(toks[0::2], toks[1::2]):
            cmap[int(src, 16)] = _utf16be(dst)
    for sect in _BFRANGE_RE.finditer(data):
        toks = [
            m.group(0) for m in _HEX_TOK_RE.finditer(sect.group(1))
        ]
        i = 0
        while i + 2 < len(toks):
            lo_t, hi_t, third = toks[i], toks[i + 1], toks[i + 2]
            if not (lo_t.startswith(b"<") and hi_t.startswith(b"<")):
                i += 1
                continue
            lo = int(lo_t[1:-1], 16)
            hi = min(int(hi_t[1:-1], 16), lo + _MAX_BFRANGE - 1)
            if third == b"[":
                j = i + 3
                k = 0
                while j < len(toks) and toks[j] != b"]":
                    if toks[j].startswith(b"<") and lo + k <= hi:
                        cmap[lo + k] = _utf16be(toks[j][1:-1])
                    k += 1
                    j += 1
                i = j + 1
            else:
                dst_hex = third[1:-1]
                base = _utf16be(dst_hex)
                for k in range(hi - lo + 1):
                    if not base:
                        continue
                    cp = ord(base[-1]) + k
                    # corrupt destinations can walk past U+10FFFF or into
                    # the surrogate block — skip those codes (they stay
                    # unmapped -> lost) instead of crashing the document
                    if cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
                        continue
                    cmap[lo + k] = base[:-1] + chr(cp)
                i += 3
    return cmap, width


# ------------------------------------------------------------- Differences
_DIFF_RE = re.compile(rb"/Differences\s*\[(.*?)\]", re.DOTALL)
_DIFF_TOK_RE = re.compile(rb"(\d+)|/([A-Za-z0-9.#_-]+)")


def parse_differences(enc_body: bytes) -> dict[int, str | None] | None:
    """/Differences array → {code → text or None (unknown glyph name)}.
    Returns None when the encoding dict carries no /Differences."""
    m = _DIFF_RE.search(enc_body)
    if not m:
        return None
    out: dict[int, str | None] = {}
    code = 0
    for tm in _DIFF_TOK_RE.finditer(m.group(1)):
        if tm.group(1) is not None:
            code = int(tm.group(1))
        else:
            out[code] = glyph_to_unicode(tm.group(2).decode("ascii", "replace"))
            code += 1
    return out


# ------------------------------------------------------------ font decoder
class FontDecoder:
    """Decode one font's show-text bytes → (text, lost).

    ``lost=True`` whenever any byte/code could not be decoded honestly —
    the caller marks the page as a parser blind spot (``succeeded_empty``)
    instead of emitting mojibake as a success.

    Kinds:
      * 'default'     — the simple-font byte path (utf-8 with replacement,
                        byte-identical to the round-2 behavior)
      * 'cmap'        — /ToUnicode decoding at the declared code width
      * 'differences' — /Differences + AGL over an optional named base
                        encoding (WinAnsi/MacRoman); non-remapped bytes
                        fall back to the base table when one is named,
                        else printable-ASCII identity; anything else lost
      * 'utf16'       — predefined Uni*-UCS2/UTF16 CMap: show bytes are
                        big-endian Unicode text
      * 'codec'       — predefined legacy-charset CMap: show bytes decode
                        through the named stdlib codec (cp932, big5, ...)
      * 'cid_unknown' — provably glyph-indexed with no map: all text lost
    """

    __slots__ = ("kind", "cmap", "width", "diffs", "base", "codec")

    def __init__(self, kind: str, cmap=None, width: int = 1, diffs=None,
                 base=None, codec: str | None = None):
        self.kind = kind
        self.cmap = cmap or {}
        self.width = width
        self.diffs = diffs or {}
        self.base = base
        self.codec = codec

    def decode(self, raw: bytes) -> tuple[str, bool]:
        if self.kind == "default":
            return raw.decode("utf-8", errors="replace"), False
        if self.kind == "cid_unknown":
            return "", bool(raw)
        if self.kind == "utf16":
            lost = bool(len(raw) % 2)
            even = raw[: len(raw) - len(raw) % 2]
            try:
                return even.decode("utf-16-be"), lost
            except UnicodeDecodeError:
                # unpaired surrogates in a corrupt stream: keep the
                # decodable units, flag the rest as lost — never U+FFFD
                return even.decode("utf-16-be", "ignore"), True
        if self.kind == "codec":
            try:
                return raw.decode(self.codec), False
            except (UnicodeDecodeError, LookupError):
                try:
                    return raw.decode(self.codec, "ignore"), True
                except LookupError:
                    return "", bool(raw)
        if self.kind == "cmap":
            out: list[str] = []
            lost = False
            w = self.width
            n = len(raw) - len(raw) % w
            if n != len(raw):
                lost = True
            for i in range(0, n, w):
                code = int.from_bytes(raw[i : i + w], "big")
                s = self.cmap.get(code)
                if s is None:
                    lost = True
                else:
                    out.append(s)
            return "".join(out), lost
        # differences (with optional named base encoding)
        out = []
        lost = False
        base = self.base
        for b in raw:
            if b in self.diffs:
                s = self.diffs[b]
                if s is None:
                    lost = True
                else:
                    out.append(s)
            elif base is not None:
                s = base.get(b)
                if s is not None:
                    out.append(s)
                elif b in (9, 10, 13):
                    out.append(chr(b))  # whitespace controls pass through
                else:
                    lost = True
            elif 32 <= b < 127:
                out.append(chr(b))
            elif b in (9, 10, 13):
                out.append(chr(b))
            else:
                lost = True
        return "".join(out), lost


DEFAULT_FONT = FontDecoder("default")


# ------------------------------------------------ embedded font programs
# Round 5: when a font dict carries NO /ToUnicode and no usable /Encoding,
# the mapping often still lives in the embedded font program itself — a
# TrueType 'cmap' table (/FontFile2) or a Type1 builtin /Encoding array
# (/FontFile). The reference recovers these classes by rasterizing + OCR
# (/root/reference/app/services/dsocr_model.py:144-174); a text-first
# parser recovers them by reading the tables. Pure functions of bytes,
# hardened against truncated/corrupt programs (return None, never raise).

_MAX_CMAP_ENTRIES = 0x20000  # corrupt-font cap (same spirit as _MAX_BFRANGE)


def _u16(b: bytes, i: int) -> int:
    return int.from_bytes(b[i : i + 2], "big")


def _u32(b: bytes, i: int) -> int:
    return int.from_bytes(b[i : i + 4], "big")


def _sfnt_table(font: bytes, tag: bytes, min_len: int = 4) -> bytes | None:
    """Bytes of one table from an sfnt directory, or None when absent /
    out of bounds / shorter than ``min_len``. Accepts the 0x00010000 and
    'true' scaler types (plain TrueType; 'OTTO'/CFF programs carry the
    same directory shape, so they parse too). The shared hardening for
    every table consumer: 512-table cap, record bounds, length-capped
    slice with a to-end fallback for a zero/overlong declared length."""
    if len(font) < 12:
        return None
    num_tables = _u16(font, 4)
    if num_tables > 512:
        return None
    for t in range(num_tables):
        rec = 12 + 16 * t
        if rec + 16 > len(font):
            return None
        if font[rec : rec + 4] == tag:
            off = _u32(font, rec + 8)
            length = _u32(font, rec + 12)
            if off + min_len > len(font):
                return None
            return font[off : min(off + (length or 0), len(font))] or (
                font[off:]
            )
    return None


def sfnt_cmap_subtables(font: bytes) -> dict[tuple[int, int], bytes]:
    """sfnt font program → {(platformID, encodingID): subtable bytes} for
    every 'cmap' encoding record whose offset is in bounds. Returns {} on
    anything unparseable."""
    out: dict[tuple[int, int], bytes] = {}
    cmap = _sfnt_table(font, b"cmap")
    if cmap is None:
        return out
    n_sub = _u16(cmap, 2)
    if n_sub > 64:
        return out
    for s in range(n_sub):
        rec = 4 + 8 * s
        if rec + 8 > len(cmap):
            break
        plat, enc = _u16(cmap, rec), _u16(cmap, rec + 2)
        off = _u32(cmap, rec + 4)
        if off < len(cmap):
            out[(plat, enc)] = cmap[off:]
    return out


def _parse_cmap_format4(sub: bytes) -> dict[int, int] | None:
    """Format 4 (segment mapping to delta values) → {code → glyph id},
    zero glyphs omitted. Handles both idDelta and glyphIdArray segments."""
    if len(sub) < 14 or _u16(sub, 0) != 4:
        return None
    seg_x2 = _u16(sub, 6)
    seg = seg_x2 // 2
    if seg == 0:
        return None  # bounds: the ro_base check below covers all lengths
    end_base = 14
    start_base = end_base + seg_x2 + 2  # + reservedPad
    delta_base = start_base + seg_x2
    ro_base = delta_base + seg_x2
    if ro_base + seg_x2 > len(sub):
        return None
    out: dict[int, int] = {}
    scanned = 0  # bound WORK, not just entries: a crafted font can declare
    # thousands of overlapping segments whose codes all miss (out-of-bounds
    # idRangeOffset / zero glyphs), so an entries-only cap never triggers
    # and the loop pins an executor core — cap codes visited instead
    for k in range(seg):
        if scanned >= _MAX_CMAP_ENTRIES:
            break
        end = _u16(sub, end_base + 2 * k)
        start = _u16(sub, start_base + 2 * k)
        if start > end or (start == 0xFFFF and end == 0xFFFF):
            continue
        delta = _u16(sub, delta_base + 2 * k)
        ro = _u16(sub, ro_base + 2 * k)
        if end - start + 1 > _MAX_CMAP_ENTRIES - scanned:
            end = start + (_MAX_CMAP_ENTRIES - scanned) - 1
        scanned += end - start + 1
        for c in range(start, end + 1):
            if c == 0xFFFF:
                continue
            if ro == 0:
                g = (c + delta) & 0xFFFF
            else:
                # offset is in bytes from THIS idRangeOffset entry
                pos = ro_base + 2 * k + ro + 2 * (c - start)
                if pos + 2 > len(sub):
                    continue
                g = _u16(sub, pos)
                if g != 0:
                    g = (g + delta) & 0xFFFF
            if g != 0:
                out[c] = g
    return out or None


def _parse_cmap_format12(sub: bytes) -> dict[int, int] | None:
    """Format 12 (segmented coverage, 32-bit) → {codepoint → glyph id}."""
    if len(sub) < 16 or _u16(sub, 0) != 12:
        return None
    n_groups = _u32(sub, 12)
    if n_groups > _MAX_CMAP_ENTRIES:
        n_groups = _MAX_CMAP_ENTRIES
    out: dict[int, int] = {}
    for g in range(n_groups):
        rec = 16 + 12 * g
        if rec + 12 > len(sub):
            break
        start, end, gid0 = _u32(sub, rec), _u32(sub, rec + 4), _u32(sub, rec + 8)
        if start > end or end > 0x10FFFF:
            continue
        span = min(end - start + 1, _MAX_CMAP_ENTRIES - len(out))
        for i in range(span):
            # omit glyph 0 (.notdef) like the format 0/4 parsers — an
            # inverted map must never decode "no glyph" as real text
            if gid0 + i != 0:
                out[start + i] = gid0 + i
        if len(out) >= _MAX_CMAP_ENTRIES:
            break
    return out or None


def _parse_cmap_format0(sub: bytes) -> dict[int, int] | None:
    """Format 0 (byte encoding table) → {code 0..255 → glyph id}, zero
    glyphs omitted."""
    if len(sub) < 6 + 256 or _u16(sub, 0) != 0:
        return None
    return {c: sub[6 + c] for c in range(256) if sub[6 + c] != 0} or None


def _unicode_subtable(font: bytes) -> dict[int, int] | None:
    """Best Unicode cmap subtable of an sfnt program → {codepoint → gid}:
    (3,10) and (0,4+) format 12 first (full Unicode), then (3,1)/(0,*)
    format 4 (BMP)."""
    subs = sfnt_cmap_subtables(font)
    for key in ((3, 10), (0, 4), (0, 6), (0, 5)):
        if key in subs:
            m = _parse_cmap_format12(subs[key]) or _parse_cmap_format4(
                subs[key]
            )
            if m:
                return m
    for key in ((3, 1), (0, 3), (0, 2), (0, 1), (0, 0)):
        if key in subs:
            m = _parse_cmap_format4(subs[key]) or _parse_cmap_format12(
                subs[key]
            )
            if m:
                return m
    return None


def truetype_gid_to_unicode(font: bytes) -> dict[int, str] | None:
    """Reverse Unicode cmap: {glyph id → text}. The recovery map for
    Type0/Identity-H composite fonts whose show codes are glyph ids (CID ==
    GID under /CIDToGIDMap /Identity) with NO /ToUnicode: the embedded
    program's own unicode→gid table, inverted. When several codepoints
    share a glyph the LOWEST codepoint wins (deterministic; the typical
    collisions are case pairs in decorative fonts). A program with no
    Unicode cmap subtable at all falls back to the 'post' table's glyph
    NAMES (standard-order indices or custom names through the AGL) —
    symbol-cmap-only subset fonts often still carry full post names."""
    uni = _unicode_subtable(font)
    if not uni:
        return parse_post_names(font)
    out: dict[int, str] = {}
    for cp in sorted(uni):
        gid = uni[cp]
        if gid not in out and not (0xD800 <= cp <= 0xDFFF):
            out[gid] = chr(cp)
    return out or None


def truetype_simple_code_map(font: bytes) -> dict[int, str | None] | None:
    """Byte-code → text map for a SIMPLE (1-byte-code) TrueType font with
    no /Encoding entry, per the ISO 32000-1 §9.6.6.4 lookup order:

      * a (3,1) Microsoft Unicode subtable: the code is looked up AS its
        Unicode value — mapped codes decode to chr(code), unmapped to None
        (lost);
      * else a (1,0) Macintosh subtable (format 0): the code indexes the
        table directly; the glyph's 'post' NAME (when the table has one)
        is authoritative, else the code carries MacRomanEncoding
        semantics — the Annex D MacRoman table;
      * else a (3,0) symbol subtable: glyphs live at 0xF000+code (or bare
        code) and carry NO Unicode semantics of their own — but the
        'post' table's glyph names recover them when present; without
        names every code maps to None (the honest all-lost map), which
        the caller surfaces as succeeded_empty.

    Returns None when the program has no usable subtable at all (caller
    keeps the default byte path). Control whitespace (9/10/13) is left
    unmapped so it passes through the decoder's whitespace branch, and
    0x20 always decodes as a space even when the subset cmap omits the
    space glyph — subset fonts routinely draw word gaps with TJ offsets
    and leave U+0020 unmapped, and losing every space would glue words
    together where the pre-recovery default path preserved them."""
    subs = sfnt_cmap_subtables(font)
    ws = (9, 10, 13)
    if (3, 1) in subs:
        m = _parse_cmap_format4(subs[(3, 1)])
        if m:
            return {
                c: (chr(c) if c in m or c == 0x20 else None)
                for c in range(256)
                if c not in ws
            }
    if (1, 0) in subs:
        m = _parse_cmap_format0(subs[(1, 0)]) or _parse_cmap_format4(
            subs[(1, 0)]
        )
        if m:
            post = parse_post_names(font) or {}

            def _mac(c: int) -> str | None:
                if c in m:
                    return post.get(m[c]) or MAC_ROMAN.get(c)
                return " " if c == 0x20 else None

            return {c: _mac(c) for c in range(256) if c not in ws}
    if (3, 0) in subs:
        m = _parse_cmap_format4(subs[(3, 0)])
        if m:
            post = parse_post_names(font) or {}

            def _sym(c: int) -> str | None:
                gid = m.get(0xF000 + c, m.get(c))
                if gid is not None and gid in post:
                    return post[gid]
                return " " if c == 0x20 else None

            return {c: _sym(c) for c in range(256) if c not in ws}
    return None


# -------------------------------------------------------- 'post' glyph names
# Macintosh standard glyph order (OpenType 'post' format 1.0/2.0): index
# 0-2 are .notdef/.null/nonmarkingreturn, 3-97 ARE ASCII 0x20-0x7E in
# order, 98-225 ARE MacRoman bytes 0x80-0xFF in order, and 226-257 are the
# 32 documented tail names (resolved through the AGL entries above).
_STD_ORDER_TAIL = (
    "Lslash", "lslash", "Scaron", "scaron", "Zcaron", "zcaron",
    "brokenbar", "Eth", "eth", "Yacute", "yacute", "Thorn", "thorn",
    "minus", "multiply", "onesuperior", "twosuperior", "threesuperior",
    "onehalf", "onequarter", "threequarters", "franc", "Gbreve", "gbreve",
    "Idotaccent", "Scedilla", "scedilla", "Cacute", "cacute", "Ccaron",
    "ccaron", "dcroat",
)


def _build_std_order() -> tuple[str | None, ...]:
    """Index → text for the full 258-entry standard order, computed ONCE
    at import (the mapInPandas hot path must not rebuild codec tables per
    font). Index 189 is 'currency' (¤): the standard order predates the
    Mac OS 8.5 euro revision Python's mac-roman codec implements — the
    same divergence _build_mac_roman patches at byte 0xDB."""
    out: list[str | None] = [None, None, "\r"]  # .notdef/.null/nonmarking
    out += [chr(0x20 + i) for i in range(95)]  # 3..97 = ASCII
    out += [
        bytes([b]).decode("mac-roman") for b in range(0x80, 0x100)
    ]  # 98..225 = MacRoman high bytes
    out[189] = "¤"  # 'currency' — pre-euro table (98 + 0xDB - 0x80)
    out += [glyph_to_unicode(n) for n in _STD_ORDER_TAIL]  # 226..257
    return tuple(out)


_STD_ORDER_UNICODE = _build_std_order()


def _std_order_unicode(idx: int) -> str | None:
    if 0 <= idx < len(_STD_ORDER_UNICODE):
        return _STD_ORDER_UNICODE[idx]
    return None


def parse_post_names(font: bytes) -> dict[int, str] | None:
    """sfnt 'post' table → {glyph id → text}: the glyph-NAME route to
    Unicode for fonts whose cmap carries no Unicode subtable at all.
    Format 1.0 (glyph order == the Macintosh standard order) and format
    2.0 (per-glyph indices into the standard order or custom pascal-string
    names resolved through the AGL). Unmapped/unknown names are omitted —
    the caller's lost path keeps them honest."""
    tbl = _sfnt_table(font, b"post")
    if tbl is None:
        return None  # v1.0 needs only the version word; v2.0 checks below
    version = _u32(tbl, 0)
    out: dict[int, str] = {}
    if version == 0x00010000:
        return {
            gid: s
            for gid, s in enumerate(_STD_ORDER_UNICODE)
            if s is not None
        }
    if version != 0x00020000 or len(tbl) < 34:
        return None
    n_glyphs = min(_u16(tbl, 32), 0xFFFF)
    idx_end = 34 + 2 * n_glyphs
    if idx_end > len(tbl):
        return None
    # custom pascal-string names follow the index array, in order
    names: list[str] = []
    p = idx_end
    while p < len(tbl) and len(names) < n_glyphs:
        ln = tbl[p]
        if p + 1 + ln > len(tbl):
            # truncated name: a prefix could BE a valid AGL name ('e' of
            # 'eacute') and decode to the wrong char — stop, stay lost
            break
        names.append(tbl[p + 1 : p + 1 + ln].decode("latin-1", "replace"))
        p += 1 + ln
    for gid in range(n_glyphs):
        idx = _u16(tbl, 34 + 2 * gid)
        if idx < 258:
            s = _std_order_unicode(idx)
        else:
            ci = idx - 258
            s = glyph_to_unicode(names[ci]) if ci < len(names) else None
        if s is not None:
            out[gid] = s
    return out or None


# ----------------------------------------------------- CFF (Type1C) fonts
# /FontFile3 /Subtype /Type1C: the compact font format (Adobe TN #5176).
# For TEXT recovery only the structural tables matter: INDEX walks, the
# Top DICT's charset/Encoding/CharStrings offsets, charset gid→SID, and
# SID→text through the standard-strings order (generated — SIDs 1..95 are
# ASCII in order, 96..149 are the StandardEncoding high block in code
# order, exactly the STANDARD table read ascending) or the String INDEX's
# custom names through the AGL. Glyph programs are never interpreted.


def _build_cff_standard_sids() -> tuple[str | None, ...]:
    out: list[str | None] = [None]  # SID 0 = .notdef
    # SIDs 1..95 are the StandardEncoding NAMES for codes 0x20..0x7E in
    # order — NOT raw ASCII: SID 8 is quoteright (U+2019) and SID 65
    # quoteleft (U+2018), the same two overrides the STANDARD table
    # carries, so build from it rather than chr()
    out += [STANDARD[c] for c in range(0x20, 0x7F)]
    for code in range(0o241, 0o400):
        s = STANDARD.get(code)
        if s is not None:
            out.append(s)  # SIDs 96..149 in StandardEncoding code order
    return tuple(out)


_CFF_STANDARD_SIDS = _build_cff_standard_sids()


def _build_text_to_sid() -> dict[str, int]:
    """First-occurrence reverse lookup for the Standard-default encoding
    path (a per-font linear scan would cost ~38k comparisons in the hot
    path)."""
    out: dict[str, int] = {}
    for sid, txt in enumerate(_CFF_STANDARD_SIDS):
        if txt is not None and txt not in out:
            out[txt] = sid
    return out


_CFF_TEXT_TO_SID = _build_text_to_sid()


def _cff_index(data: bytes, pos: int):
    """One CFF INDEX at ``pos`` → (items, next_pos) or None on corruption."""
    if pos + 2 > len(data):
        return None
    count = _u16(data, pos)
    if count == 0:
        return [], pos + 2
    if count > 0x4000 or pos + 3 > len(data):
        return None
    off_size = data[pos + 2]
    if not (1 <= off_size <= 4):
        return None
    off_base = pos + 3
    data_base = off_base + (count + 1) * off_size - 1
    if data_base > len(data):
        return None
    offs = []
    for i in range(count + 1):
        o = int.from_bytes(
            data[off_base + i * off_size : off_base + (i + 1) * off_size],
            "big",
        )
        offs.append(o)
    if offs[0] != 1 or any(
        offs[i] > offs[i + 1] for i in range(count)
    ) or data_base + offs[-1] > len(data):
        return None
    items = [
        data[data_base + offs[i] : data_base + offs[i + 1]]
        for i in range(count)
    ]
    return items, data_base + offs[-1]


def _cff_top_dict(body: bytes) -> dict[int, list[int]]:
    """Top DICT bytes → {operator: operands} (integer operands only; reals
    are parsed but discarded — the offsets we need are integers)."""
    out: dict[int, list[int]] = {}
    operands: list[int] = []
    i = 0
    n = len(body)
    while i < n:
        b0 = body[i]
        if 32 <= b0 <= 246:
            operands.append(b0 - 139)
            i += 1
        elif 247 <= b0 <= 250 and i + 1 < n:
            operands.append((b0 - 247) * 256 + body[i + 1] + 108)
            i += 2
        elif 251 <= b0 <= 254 and i + 1 < n:
            operands.append(-(b0 - 251) * 256 - body[i + 1] - 108)
            i += 2
        elif b0 == 28 and i + 2 < n:
            operands.append(
                int.from_bytes(body[i + 1 : i + 3], "big", signed=True)
            )
            i += 3
        elif b0 == 29 and i + 4 < n:
            operands.append(
                int.from_bytes(body[i + 1 : i + 5], "big", signed=True)
            )
            i += 5
        elif b0 == 30:  # real: nibble-encoded, terminated by 0xF nibble
            i += 1
            while i < n:
                byte = body[i]
                i += 1
                if (byte & 0x0F) == 0x0F or (byte >> 4) == 0x0F:
                    break
            operands.append(0)
        elif b0 == 12 and i + 1 < n:
            out[0x0C00 | body[i + 1]] = operands
            operands = []
            i += 2
        elif b0 <= 21:
            out[b0] = operands
            operands = []
            i += 1
        else:
            return out  # corrupt operand byte: keep what parsed
    return out


def _cff_sid_text(sid: int, strings: list[bytes]) -> str | None:
    if 0 <= sid < len(_CFF_STANDARD_SIDS):
        return _CFF_STANDARD_SIDS[sid]
    if sid < 391:
        return None  # ISOAdobe extended block we do not table: honest lost
    ci = sid - 391
    if ci < len(strings):
        return glyph_to_unicode(strings[ci].decode("latin-1", "replace"))
    return None


def cff_simple_code_map(data: bytes) -> dict[int, str | None] | None:
    """Byte-code → text for a SIMPLE (non-CID) Type1C font: code→gid via
    the font's Encoding (format 0/1 or the Standard default), gid→SID via
    charset (format 0/1/2 or the ISOAdobe identity default), SID→text via
    the standard strings / String INDEX + AGL. Returns None when the
    program is unusable (caller keeps the default path); CID-keyed CFFs
    (ROS present) return None — their charset maps to CIDs, not names."""
    try:
        if len(data) < 4 or data[0] != 1:
            return None
        pos = data[2]  # hdrSize
        r = _cff_index(data, pos)  # Name INDEX
        if r is None:
            return None
        _, pos = r
        r = _cff_index(data, pos)  # Top DICT INDEX
        if r is None or not r[0]:
            return None
        tops, pos = r
        r = _cff_index(data, pos)  # String INDEX
        if r is None:
            return None
        strings, pos = r
        top = _cff_top_dict(tops[0])
        if 0x0C1E in top:  # ROS → CID-keyed: charset is CIDs, decline
            return None
        cs_off = top.get(17, [0])[-1] if top.get(17) else 0
        # negative/absurd DICT offsets would WRAP via Python negative
        # indexing and read the buffer tail as a table — reject outright
        if not (4 <= cs_off < len(data)):
            return None
        r = _cff_index(data, cs_off)  # CharStrings INDEX → glyph count
        if r is None:
            return None
        n_glyphs = len(r[0])
        if n_glyphs == 0:
            return None
        # gid → SID via charset
        charset_off = top.get(15, [0])[-1] if top.get(15) else 0
        gid_sid: dict[int, int] = {}
        if charset_off == 0:
            for g in range(min(n_glyphs, 229)):
                gid_sid[g] = g  # ISOAdobe: SID == gid
        elif charset_off in (1, 2):
            return None  # Expert charsets: glyphs we do not table
        else:
            if not (4 <= charset_off < len(data)):
                return None  # negative offsets must not wrap to the tail
            fmt = data[charset_off]
            p = charset_off + 1
            gid = 1
            if fmt == 0:
                while gid < n_glyphs and p + 2 <= len(data):
                    gid_sid[gid] = _u16(data, p)
                    p += 2
                    gid += 1
            elif fmt in (1, 2):
                step = 3 if fmt == 1 else 4
                while gid < n_glyphs and p + step <= len(data):
                    first = _u16(data, p)
                    n_left = (
                        data[p + 2] if fmt == 1 else _u16(data, p + 2)
                    )
                    for k in range(n_left + 1):
                        if gid >= n_glyphs:
                            break
                        gid_sid[gid] = first + k
                        gid += 1
                    p += step
            else:
                return None
        # code → gid via Encoding (supplements map code → SID directly)
        enc_off = top.get(16, [0])[-1] if top.get(16) else 0
        code_gid: dict[int, int] = {}
        code_sid_sup: dict[int, int] = {}
        if enc_off == 0:  # Standard encoding: code→name==STANDARD text;
            # keep only codes whose glyph actually exists in the charset
            sid_gids = {s: g for g, s in gid_sid.items()}
            for code in range(256):
                s = STANDARD.get(code)
                if s is None:
                    continue
                sid = _CFF_TEXT_TO_SID.get(s)
                if sid is not None and sid in sid_gids:
                    code_gid[code] = sid_gids[sid]
        elif enc_off == 1:
            return None  # Expert encoding
        else:
            if not (4 <= enc_off < len(data)):
                return None  # negative offsets must not wrap to the tail
            raw_fmt = data[enc_off]
            fmt = raw_fmt & 0x7F  # high bit = supplements follow
            p = enc_off + 1
            if fmt == 0:
                if p >= len(data):
                    return None
                n_codes = data[p]
                p += 1
                for i in range(n_codes):
                    if p + i >= len(data):
                        break
                    code_gid[data[p + i]] = i + 1
                p += n_codes
            elif fmt == 1:
                if p >= len(data):
                    return None
                n_ranges = data[p]
                p += 1
                gid = 1
                for _ in range(n_ranges):
                    if p + 2 > len(data):
                        break
                    first, n_left = data[p], data[p + 1]
                    for k in range(n_left + 1):
                        code_gid[first + k] = gid
                        gid += 1
                    p += 2
            else:
                return None
            if raw_fmt & 0x80 and p < len(data):
                # Supplement array: nSups × (Card8 code, SID) — the
                # standard way accented duplicate codes share a glyph.
                # Only SIDs the charset actually defines count: every
                # other path requires the glyph to exist (a renderer
                # would show .notdef), so the honest-lost rule applies
                # to dangling supplement SIDs too.
                font_sids = set(gid_sid.values())
                n_sups = data[p]
                p += 1
                for _ in range(n_sups):
                    if p + 3 > len(data):
                        break
                    sup_sid = _u16(data, p + 1)
                    if sup_sid in font_sids:
                        code_sid_sup[data[p]] = sup_sid
                    p += 3
        if not code_gid and not code_sid_sup:
            return None
        ws = (9, 10, 13)
        out: dict[int, str | None] = {}
        for c in range(256):
            if c in ws:
                continue
            if c in code_sid_sup:
                t = _cff_sid_text(code_sid_sup[c], strings)
            else:
                gid = code_gid.get(c)
                t = (
                    _cff_sid_text(gid_sid.get(gid, -1), strings)
                    if gid is not None
                    else None
                )
            # the space guarantee holds even when 0x20 maps to a glyph
            # whose SID we cannot decode — spaces must never glue words
            out[c] = t if t is not None else (" " if c == 0x20 else None)
        return out
    except (IndexError, ValueError):
        return None


# --------------------------------------------------- Type1 builtin encoding
_T1_STD_ENC_RE = re.compile(rb"/Encoding\s+StandardEncoding\s+def")
_T1_DUP_RE = re.compile(rb"dup\s+(\d+)\s*/([A-Za-z0-9._-]+)\s+put")


def parse_type1_builtin_encoding(
    font: bytes,
) -> dict[int, str | None] | str | None:
    """Builtin /Encoding of an embedded Type1 program (/FontFile): the
    cleartext portion (everything before ``eexec``; PFB segment headers
    stripped) either declares ``/Encoding StandardEncoding def`` (returns
    the string 'standard') or builds a custom array via ``dup <code>
    </name> put`` entries (returns {code → text-or-None} through the AGL).
    Returns None when no /Encoding is found (caller keeps the default
    path)."""
    if font[:1] == b"\x80":
        # PFB: strip 6-byte segment headers (type 1/2 data segments)
        out = bytearray()
        i = 0
        while i + 6 <= len(font) and font[i] == 0x80:
            seg_type = font[i + 1]
            if seg_type == 3:
                break
            seg_len = int.from_bytes(font[i + 2 : i + 6], "little")
            out += font[i + 6 : i + 6 + seg_len]
            i += 6 + seg_len
        font = bytes(out)
    clear = font.split(b"eexec", 1)[0]
    enc_at = clear.find(b"/Encoding")
    if enc_at < 0:
        return None
    tail = clear[enc_at:]
    if _T1_STD_ENC_RE.match(tail):
        return "standard"
    # the array form ends at 'readonly def' / 'def'; bound the scan there
    end = tail.find(b" def")
    body = tail if end < 0 else tail[: end + 4]
    out_map: dict[int, str | None] = {}
    for m in _T1_DUP_RE.finditer(body):
        code = int(m.group(1))
        if 0 <= code <= 255:
            out_map[code] = glyph_to_unicode(
                m.group(2).decode("ascii", "replace")
            )
    return out_map or None
