"""PDF standard security handler — empty-user-password decryption.

The most common "encrypted" PDF in a web crawl is owner-password-only: the
document opens for reading with the EMPTY user password and every viewer
decrypts it silently (the reference gets this for free from PyMuPDF's lenient
open, ``/root/reference/app/services/dsocr_model.py:376-390``). This module
implements the full revision matrix from the published specs:

  * R 2-3 (/V 1-2): RC4-40/128 — ISO 32000-1 §7.6.3 Algorithms 2-6
    (file-key derivation, /O and /U computation, per-object key salting);
  * R 4 (/V 4): crypt filters — /CFM /AESV2 (AES-128-CBC, the extra
    'sAlT' object-key suffix, the /EncryptMetadata derivation step) or
    /CFM /V2 (RC4);
  * R 6 (/V 5): AES-256, PDF 2.0 — ISO 32000-2 Algorithm 2.B password
    KDF (iterative SHA-256/384/512 with AES-CBC mixing, memoized) and the
    /UE file-key unwrap (Algorithms 2.A / 8).

The AES core is pure Python (no crypto library in this environment): the
S-box is GENERATED from its GF(2^8) definition, MixColumns is table-driven,
and the FIPS-197 appendix C.1 (AES-128) and C.3 (AES-256) known-answer
vectors are pinned in the tests. Everything the matrix does not cover
(a real user password, unknown crypt filters) stays a typed rejection
upstream in kernels/pdf_extract.pdf_decryptor.

Pure functions of bytes — usable by both the parser (kernels/pdf_extract) and
the synthetic corpus generator (corpus.make_pdf), which is how the pytest
suite proves the round trip.
"""

from __future__ import annotations

import hashlib

# the 32-byte padding string from ISO 32000-1 Table bag (Algorithm 2 step a)
PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 stream cipher (KSA + PRGA). Symmetric: encrypt == decrypt."""
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = b ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


def _padded(pwd: bytes) -> bytes:
    return (pwd + PAD)[:32]


def file_key(
    user_pwd: bytes, o_entry: bytes, p: int, file_id: bytes,
    length_bits: int, r: int, encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: the file encryption key from a user password. For
    revision 4 handlers with /EncryptMetadata false, four 0xFF bytes join
    the digest input (step f)."""
    n = length_bits // 8 if r >= 3 else 5
    md = hashlib.md5(
        _padded(user_pwd)
        + o_entry[:32]
        + (p & 0xFFFFFFFF).to_bytes(4, "little")
        + file_id
    )
    if r >= 4 and not encrypt_metadata:
        md.update(b"\xff\xff\xff\xff")
    h = md.digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    return h[:n]


def compute_o(owner_pwd: bytes, user_pwd: bytes, r: int, length_bits: int) -> bytes:
    """Algorithm 3: the /O entry (owner password hash)."""
    n = length_bits // 8 if r >= 3 else 5
    h = hashlib.md5(_padded(owner_pwd)).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    key = h[:n]
    o = rc4(key, _padded(user_pwd))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def compute_u(key: bytes, file_id: bytes, r: int) -> bytes:
    """Algorithm 4 (r=2) / Algorithm 5 (r≥3): the /U entry."""
    if r == 2:
        return rc4(key, PAD)
    u = hashlib.md5(PAD + file_id).digest()
    u = rc4(key, u)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u + b"\x00" * 16


def object_key(key: bytes, obj_num: int, gen_num: int) -> bytes:
    """Algorithm 1: per-object RC4 key (file key + obj/gen salt)."""
    h = hashlib.md5(
        key
        + (obj_num & 0xFFFFFFFF).to_bytes(4, "little")[:3]
        + (gen_num & 0xFFFFFFFF).to_bytes(4, "little")[:2]
    ).digest()
    return h[: min(len(key) + 5, 16)]


# ------------------------------------------------------------- AES-128-CBC
# Pure-Python AES (FIPS-197) for the /V 4 /CFM /AESV2 handler — the modern
# encrypted-PDF shape (PDF 1.6+). No crypto library exists in this sandbox;
# streams are small (KBs), so a table-driven pure implementation is fine.
# The S-box is GENERATED from its definition (multiplicative inverse in
# GF(2^8) + affine transform) rather than transcribed, and the module's
# tests pin the FIPS-197 known-answer vector.


def _gf_mul(a: int, b: int) -> int:
    r = 0
    while b:
        if b & 1:
            r ^= a
        a <<= 1
        if a & 0x100:
            a ^= 0x11B
        b >>= 1
    return r


def _make_sbox() -> list[int]:
    # multiplicative inverses via exponentiation tables (x^254 = x^-1)
    sbox = [0] * 256
    for x in range(256):
        inv = 0
        if x:
            inv = x
            for _ in range(253):  # x^254
                inv = _gf_mul(inv, x)
        res = 0
        for i in range(8):
            bit = (
                (inv >> i)
                ^ (inv >> ((i + 4) % 8))
                ^ (inv >> ((i + 5) % 8))
                ^ (inv >> ((i + 6) % 8))
                ^ (inv >> ((i + 7) % 8))
                ^ (0x63 >> i)
            ) & 1
            res |= bit << i
        sbox[x] = res
    return sbox


_SBOX = _make_sbox()
_INV_SBOX = [0] * 256
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_v] = _i
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]


def _expand_key(key: bytes) -> list[list[int]]:
    """AES key schedule (FIPS-197 §5.2) for 128- or 256-bit keys →
    Nr+1 round keys of 16 bytes each (Nr = Nk + 6)."""
    nk = len(key) // 4
    if nk not in (4, 8):
        raise ValueError("AES key must be 16 or 32 bytes")
    nr = nk + 6
    w = [list(key[i : i + 4]) for i in range(0, len(key), 4)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk == 8 and i % nk == 4:
            t = [_SBOX[b] for b in t]  # the AES-256 extra SubWord step
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    return [sum(w[4 * r : 4 * r + 4], []) for r in range(nr + 1)]


def _add_rk(s: list[int], rk: list[int]) -> list[int]:
    return [a ^ b for a, b in zip(s, rk)]


# state is the 16-byte block in FIPS column-major order: s[r + 4c] is
# handled implicitly by indexing block bytes directly (byte i = row i%4,
# col i//4)
_SHIFT = [0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11]
_INV_SHIFT = [0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3]


# precomputed GF(2^8) multiplication tables for the MixColumns
# coefficients — the per-block hot spot (the 2.B KDF encrypts ~24k blocks
# per derivation; bit-loop _gf_mul there dominated the whole kernel)
_MUL = {c: [_gf_mul(x, c) for x in range(256)] for c in (1, 2, 3, 9, 11, 13, 14)}


def _mix_columns(s: list[int], inv: bool) -> list[int]:
    out = [0] * 16
    m = (14, 11, 13, 9) if inv else (2, 3, 1, 1)
    t0, t1, t2, t3 = (_MUL[m[0]], _MUL[m[1]], _MUL[m[2]], _MUL[m[3]])
    for c in range(0, 16, 4):
        a, b, d, e = s[c], s[c + 1], s[c + 2], s[c + 3]
        out[c] = t0[a] ^ t1[b] ^ t2[d] ^ t3[e]
        out[c + 1] = t3[a] ^ t0[b] ^ t1[d] ^ t2[e]
        out[c + 2] = t2[a] ^ t3[b] ^ t0[d] ^ t1[e]
        out[c + 3] = t1[a] ^ t2[b] ^ t3[d] ^ t0[e]
    return out


def _aes_encrypt_block(rks: list[list[int]], block: bytes) -> bytes:
    nr = len(rks) - 1
    s = _add_rk(list(block), rks[0])
    for rnd in range(1, nr):
        s = [_SBOX[b] for b in s]
        s = [s[_SHIFT[i]] for i in range(16)]
        s = _mix_columns(s, inv=False)
        s = _add_rk(s, rks[rnd])
    s = [_SBOX[b] for b in s]
    s = [s[_SHIFT[i]] for i in range(16)]
    return bytes(_add_rk(s, rks[nr]))


def _aes_decrypt_block(rks: list[list[int]], block: bytes) -> bytes:
    nr = len(rks) - 1
    s = _add_rk(list(block), rks[nr])
    for rnd in range(nr - 1, 0, -1):
        s = [s[_INV_SHIFT[i]] for i in range(16)]
        s = [_INV_SBOX[b] for b in s]
        s = _add_rk(s, rks[rnd])
        s = _mix_columns(s, inv=True)
    s = [s[_INV_SHIFT[i]] for i in range(16)]
    s = [_INV_SBOX[b] for b in s]
    return bytes(_add_rk(s, rks[0]))


def _cbc_raw(key: bytes, iv: bytes, data: bytes, encrypt: bool) -> bytes:
    """CBC without padding (data must be a block multiple)."""
    rks = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = data[i : i + 16]
        if encrypt:
            prev = _aes_encrypt_block(
                rks, bytes(a ^ b for a, b in zip(block, prev))
            )
            out += prev
        else:
            out += bytes(
                a ^ b for a, b in zip(_aes_decrypt_block(rks, block), prev)
            )
            prev = block
    return bytes(out)


def aes128_cbc_encrypt(key: bytes, plain: bytes, iv: bytes) -> bytes:
    """IV || CBC ciphertext with PKCS#7 padding — the PDF AESV2/AESV3
    stream layout (works for 16- or 32-byte keys; the name keeps the
    original AESV2 call sites readable)."""
    pad = 16 - len(plain) % 16
    return iv + _cbc_raw(key, iv, plain + bytes([pad]) * pad, encrypt=True)


def aes128_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """PDF AESV2/AESV3 stream layout: first 16 bytes are the IV, the rest
    is CBC ciphertext with PKCS#7 padding. Malformed input → b'' (the
    caller surfaces the page as a blind spot, never a crash)."""
    if len(data) < 32 or len(data) % 16:
        return b""
    out = bytearray(_cbc_raw(key, data[:16], data[16:], encrypt=False))
    pad = out[-1]
    if not 1 <= pad <= 16 or out[-pad:] != bytes([pad]) * pad:
        return b""
    return bytes(out[:-pad])


# --------------------------------------------- revision 6 (AES-256, PDF 2.0)
import functools


@functools.lru_cache(maxsize=256)
def hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B: the revision-6 password KDF. Iterative
    SHA-256/384/512 selected by an AES-CBC mixing step; runs ≥64 rounds and
    stops when the last mix byte ≤ round − 32. Memoized: the KDF is a pure
    function of its byte inputs and deliberately slow (that IS the KDF's
    job), and one document derives the same (password, salt) several times
    (availability check, extraction, title)."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = _cbc_raw(k[:16], k[16:32], k1, encrypt=True)
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[
            sum(e[:16]) % 3
        ](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def r6_make_u_ue(
    file_key: bytes, password: bytes, vsalt: bytes, ksalt: bytes,
    udata: bytes = b"",
) -> tuple[bytes, bytes]:
    """Algorithm 8 (writer side): the 48-byte /U (or /O when ``udata`` is
    the /U string) and the 32-byte /UE (or /OE) wrapping ``file_key``."""
    u = hash_2b(password, vsalt, udata) + vsalt + ksalt
    ik = hash_2b(password, ksalt, udata)
    ue = _cbc_raw(ik, b"\x00" * 16, file_key, encrypt=True)
    return u, ue


def r6_verify_and_key(
    u_entry: bytes, ue_entry: bytes, password: bytes = b""
) -> bytes | None:
    """Algorithms 2.A/8 (reader side): validate ``password`` against the
    48-byte /U and unwrap the 32-byte file key from /UE. None when the
    password (here: the empty user password) does not open the file."""
    if len(u_entry) < 48 or len(ue_entry) < 32:
        return None
    uhash, vsalt, ksalt = u_entry[:32], u_entry[32:40], u_entry[40:48]
    if hash_2b(password, vsalt) != uhash:
        return None
    ik = hash_2b(password, ksalt)
    return _cbc_raw(ik, b"\x00" * 16, ue_entry[:32], encrypt=False)


def object_key_aes(key: bytes, obj_num: int, gen_num: int) -> bytes:
    """Algorithm 1 for AESV2: the per-object md5 salt gains the constant
    'sAlT' suffix (ISO 32000-1 §7.6.2 step b)."""
    h = hashlib.md5(
        key
        + (obj_num & 0xFFFFFFFF).to_bytes(4, "little")[:3]
        + (gen_num & 0xFFFFFFFF).to_bytes(4, "little")[:2]
        + b"sAlT"
    ).digest()
    return h[: min(len(key) + 5, 16)]


def empty_password_key(
    o_entry: bytes, u_entry: bytes, p: int, file_id: bytes,
    length_bits: int, r: int, encrypt_metadata: bool = True,
) -> bytes | None:
    """Derive the file key for the EMPTY user password and verify it against
    /U (Algorithm 6). Returns the key, or None when the document really needs
    a user password (then the caller keeps the typed rejection)."""
    key = file_key(b"", o_entry, p, file_id, length_bits, r, encrypt_metadata)
    expect = compute_u(key, file_id, r)
    got = u_entry[:16] if r >= 3 else u_entry[:32]
    want = expect[:16] if r >= 3 else expect[:32]
    return key if got == want else None
