"""Unit tests for the standard-security-handler crypto (functions/pdf_crypt.py)."""

import pytest

from service1_text_extraction_ray.functions.pdf_crypt import (
    PAD,
    authenticate_owner_password,
    authenticate_user_password,
    compute_encryption_key,
    compute_o_entry,
    compute_u_entry,
    crypt_object_bytes,
    object_key,
    pad_password,
    rc4,
)


class TestRC4:
    # Public RC4 test vectors (widely published reference values).
    @pytest.mark.parametrize(
        "key,plain,cipher_hex",
        [
            (b"Key", b"Plaintext", "bbf316e8d940af0ad3"),
            (b"Wiki", b"pedia", "1021bf0420"),
            (b"Secret", b"Attack at dawn", "45a01f645fc35b383552544b9bf5"),
        ],
    )
    def test_known_vectors(self, key, plain, cipher_hex):
        assert rc4(key, plain).hex() == cipher_hex

    def test_symmetric(self):
        data = bytes(range(256)) * 3
        assert rc4(b"k" * 5, rc4(b"k" * 5, data)) == data


class TestPadding:
    def test_pad_short(self):
        assert pad_password(b"ab") == b"ab" + PAD[:30]

    def test_pad_exact_32_identity(self):
        p = bytes(range(32))
        assert pad_password(p) == p

    def test_pad_truncates(self):
        assert pad_password(b"x" * 40) == b"x" * 32


class TestHandler:
    def _entries(self, user, owner, key_len, r):
        p = -44
        id0 = b"0123456789abcdef"
        o = compute_o_entry(owner, user, key_len, r)
        key = compute_encryption_key(user, o, p, id0, key_len, r)
        u = compute_u_entry(key, id0, r)
        return o, u, p, id0, key

    @pytest.mark.parametrize("key_len,r", [(5, 2), (16, 3)])
    def test_user_auth_roundtrip(self, key_len, r):
        o, u, p, id0, key = self._entries(b"user-pw", b"owner-pw", key_len, r)
        got = authenticate_user_password(b"user-pw", o, u, p, id0, key_len, r)
        assert got == key
        assert authenticate_user_password(b"wrong", o, u, p, id0, key_len, r) is None

    @pytest.mark.parametrize("key_len,r", [(5, 2), (16, 3)])
    def test_owner_auth_recovers_key(self, key_len, r):
        o, u, p, id0, key = self._entries(b"user-pw", b"owner-pw", key_len, r)
        got = authenticate_owner_password(b"owner-pw", o, u, p, id0, key_len, r)
        assert got == key
        assert authenticate_owner_password(b"wrong", o, u, p, id0, key_len, r) is None

    def test_empty_user_password_authenticates_as_empty(self):
        o, u, p, id0, key = self._entries(b"", b"owner", 5, 2)
        assert authenticate_user_password(b"", o, u, p, id0, 5, 2) == key

    def test_u_entry_r3_length(self):
        _, u, *_ = self._entries(b"x", b"y", 16, 3)
        assert len(u) == 32  # 16 significant + 16 padding

    def test_object_key_truncation(self):
        # RC4-40: 5-byte file key -> 10-byte object key; RC4-128 caps at 16.
        assert len(object_key(b"12345", 7, 0)) == 10
        assert len(object_key(b"0123456789abcdef", 7, 0)) == 16

    def test_object_crypt_roundtrip_and_key_separation(self):
        fk = b"0123456789abcdef"
        data = b"BT /F1 12 Tf (hello) Tj ET" * 10
        enc = crypt_object_bytes(fk, 4, 0, data)
        assert crypt_object_bytes(fk, 4, 0, enc) == data
        # a different object number must not decrypt
        assert crypt_object_bytes(fk, 5, 0, enc) != data
