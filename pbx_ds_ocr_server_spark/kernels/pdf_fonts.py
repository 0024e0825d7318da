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
