"""PDF standard security handler (RC4, revisions 2-3) — empty user password.

The most common "encrypted" PDF in a web crawl is owner-password-only: the
document opens for reading with the EMPTY user password and every viewer
decrypts it silently (the reference gets this for free from PyMuPDF's lenient
open, ``/root/reference/app/services/dsocr_model.py:376-390``). This module
implements just that case from the published PDF 1.7 spec (ISO 32000-1 §7.6.3,
Algorithms 2-5): derive the file key from the empty user password, verify it
against /U, and hand back a per-object RC4 decryptor. Anything else (a real
user password, /V ≥ 4 crypt filters, AES) stays a typed rejection upstream.

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
    length_bits: int, r: int,
) -> bytes:
    """Algorithm 2: the file encryption key from a user password."""
    n = length_bits // 8 if r >= 3 else 5
    h = hashlib.md5(
        _padded(user_pwd)
        + o_entry[:32]
        + (p & 0xFFFFFFFF).to_bytes(4, "little")
        + file_id
    ).digest()
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


def empty_password_key(
    o_entry: bytes, u_entry: bytes, p: int, file_id: bytes,
    length_bits: int, r: int,
) -> bytes | None:
    """Derive the file key for the EMPTY user password and verify it against
    /U (Algorithm 6). Returns the key, or None when the document really needs
    a user password (then the caller keeps the typed rejection)."""
    key = file_key(b"", o_entry, p, file_id, length_bits, r)
    expect = compute_u(key, file_id, r)
    got = u_entry[:16] if r >= 3 else u_entry[:32]
    want = expect[:16] if r >= 3 else expect[:32]
    return key if got == want else None
