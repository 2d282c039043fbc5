"""PDF standard security handler (RC4, /V 1-2, /R 2-3) on the stdlib.

From-scratch implementation of the public PDF 1.7 spec (ISO 32000-1 §7.6.2-
7.6.3) encryption algorithms the reference exercises through PyMuPDF
(``core_pdf_processor.py:220-354``: ``doc.needs_pass`` / ``doc.authenticate``
inside the <=3-attempt password loop):

- Algorithm 2: file encryption key from the (padded) user password.
- Algorithm 3: the /O (owner) entry — also used by the fixture writer.
- Algorithms 4/5: the /U (user) entry for /R 2 and /R 3.
- Algorithms 6/7: user / owner password verification.
- Per-object keys: md5(file_key + objnum[0:3] + gennum[0:2]) truncated to
  min(len+5, 16) — applied to stream bytes BEFORE the /Filter chain.

Both sides (the parser's decrypt and ``synth.make_pdf``'s encrypt) use these
same pure functions, so fixture round-trips are exact by construction.
RC4 here is a 25-line stdlib implementation — fine for fixtures and for the
per-document data sizes this engine decrypts; it is a *legacy* cipher kept
for format compatibility (the PDF spec itself deprecates it), not a security
recommendation. AES (/V 4-5) is outside the supported subset and surfaces as
a counted ``unsupported encryption`` parse failure, never junk text.

Passwords are encoded latin-1 (PDFDocEncoding approximation — exact for the
ASCII passwords real queues carry and the fixtures emit).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Optional

# The 32-byte standard padding string (ISO 32000-1 Table 1, §7.6.3.3).
PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (symmetric: encrypt == decrypt)."""
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


def pad_password(password: bytes) -> bytes:
    """Truncate-or-pad to exactly 32 bytes (Algorithm 2 step a)."""
    return (password + PAD)[:32]


def compute_encryption_key(
    password: bytes, o_entry: bytes, p: int, id0: bytes, key_len: int, r: int
) -> bytes:
    """Algorithm 2: the file encryption key.

    ``password`` is the raw (unpadded) user password — or an already-padded
    32-byte string recovered from /O during owner authentication (padding a
    32-byte input is the identity, so both call shapes work).
    """
    h = hashlib.md5()
    h.update(pad_password(password))
    h.update(o_entry[:32])
    h.update(struct.pack("<i", p))
    h.update(id0)
    digest = h.digest()
    if r >= 3:
        for _ in range(50):
            digest = hashlib.md5(digest[:key_len]).digest()
    return digest[:key_len]


def compute_o_entry(owner_pw: bytes, user_pw: bytes, key_len: int, r: int) -> bytes:
    """Algorithm 3: the /O dictionary entry (fixture-writer side)."""
    digest = hashlib.md5(pad_password(owner_pw or user_pw)).digest()
    if r >= 3:
        for _ in range(50):
            digest = hashlib.md5(digest).digest()
    key = digest[:key_len]
    o = rc4(key, pad_password(user_pw))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def compute_u_entry(file_key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithm 4 (/R 2) or 5 (/R 3): the /U dictionary entry."""
    if r == 2:
        return rc4(file_key, PAD)
    digest = hashlib.md5(PAD + id0).digest()
    u = rc4(file_key, digest)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in file_key), u)
    return u + b"\x00" * 16  # 16 bytes of arbitrary padding per the spec


def authenticate_user_password(
    password: bytes, o_entry: bytes, u_entry: bytes, p: int, id0: bytes,
    key_len: int, r: int,
) -> Optional[bytes]:
    """Algorithm 6: verify a user password; return the file key on success."""
    key = compute_encryption_key(password, o_entry, p, id0, key_len, r)
    expect = compute_u_entry(key, id0, r)
    if r == 2:
        ok = expect[:32] == u_entry[:32]
    else:
        ok = expect[:16] == u_entry[:16]
    return key if ok else None


def authenticate_owner_password(
    password: bytes, o_entry: bytes, u_entry: bytes, p: int, id0: bytes,
    key_len: int, r: int,
) -> Optional[bytes]:
    """Algorithm 7: verify an owner password by recovering the padded user
    password from /O, then running user verification on it."""
    digest = hashlib.md5(pad_password(password)).digest()
    if r >= 3:
        for _ in range(50):
            digest = hashlib.md5(digest).digest()
    rc4_key = digest[:key_len]
    if r == 2:
        user_padded = rc4(rc4_key, o_entry)
    else:
        user_padded = o_entry
        for i in range(19, -1, -1):
            user_padded = rc4(bytes(b ^ i for b in rc4_key), user_padded)
    return authenticate_user_password(
        user_padded, o_entry, u_entry, p, id0, key_len, r
    )


def object_key(file_key: bytes, num: int, gen: int) -> bytes:
    """Per-object RC4 key (§7.6.2 Algorithm 1, steps a-c)."""
    ext = (
        file_key
        + struct.pack("<i", num)[:3]
        + struct.pack("<i", gen)[:2]
    )
    return hashlib.md5(ext).digest()[: min(len(file_key) + 5, 16)]


def crypt_object_bytes(file_key: bytes, num: int, gen: int, data: bytes) -> bytes:
    """Encrypt/decrypt one object's stream (or string) bytes."""
    return rc4(object_key(file_key, num, gen), data)
