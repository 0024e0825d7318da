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
      * 'differences' — /Differences + AGL; non-remapped bytes fall back to
                        printable-ASCII identity, anything else is lost
      * 'cid_unknown' — provably glyph-indexed with no map: all text lost
    """

    __slots__ = ("kind", "cmap", "width", "diffs")

    def __init__(self, kind: str, cmap=None, width: int = 1, diffs=None):
        self.kind = kind
        self.cmap = cmap or {}
        self.width = width
        self.diffs = diffs or {}

    def decode(self, raw: bytes) -> tuple[str, bool]:
        if self.kind == "default":
            return raw.decode("utf-8", errors="replace"), False
        if self.kind == "cid_unknown":
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
        # differences
        out = []
        lost = False
        for b in raw:
            if b in self.diffs:
                s = self.diffs[b]
                if s is None:
                    lost = True
                else:
                    out.append(s)
            elif 32 <= b < 127:
                out.append(chr(b))
            elif b in (9, 10, 13):
                out.append(chr(b))
            else:
                lost = True
        return "".join(out), lost


DEFAULT_FONT = FontDecoder("default")
