"""Fiat-Shamir cross-validation against the ACTUAL GMP library.

The reference derives the UltraGroth challenge with raw GMP calls
(/root/reference/src/ultra_groth.cpp:33-58):

    mpz_export(buffer +  0, NULL, 1, 8, 1, 0, x_coord)   # word-granular BE
    mpz_export(buffer + 32, NULL, 1, 8, 1, 0, y_coord)
    keccak256(buffer, 64) -> challenge
    mpz_import(x, 32, /*order=*/0, /*size=*/1, /*endian=*/-1, 0, challenge)

order=0 is not a documented mpz_import value; GMP executes it through the
order >= 0 branch, i.e. BIG-endian (first byte most significant).  Rather
than trusting a reading of the GMP docs, this test executes the very same
calls through libgmp via ctypes and pins derive_challenge byte-for-byte
against them.

Known reference quirk (documented, not reproduced): mpz_export pads to
whole 64-bit WORDS only, so a coordinate < 2^192 (probability ~2^-62)
writes fewer than 32 bytes and leaves stack garbage in the buffer; the repo
always uses fixed 32-byte big-endian.  For all practically occurring
coordinates the two agree.
"""
from __future__ import annotations

import ctypes
import ctypes.util

import pytest

from ultragroth_tpu.constants import FR_MODULUS as R
from ultragroth_tpu.keccak import keccak256
from ultragroth_tpu.protocol.ultragroth import derive_challenge


def _load_gmp():
    for name in ("libgmp.so.10", "libgmp.so", ctypes.util.find_library("gmp")):
        if not name:
            continue
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    return None


GMP = _load_gmp()


def _gmp(name):
    return getattr(GMP, name)
pytestmark = pytest.mark.skipif(GMP is None, reason="libgmp not available")


class _Mpz:
    """Minimal mpz_t wrapper (opaque 32-byte buffer is oversized/safe)."""

    def __init__(self):
        self.buf = ctypes.create_string_buffer(32)
        _gmp("__gmpz_init")(self.buf)

    @property
    def ptr(self):
        return self.buf

    def to_int(self) -> int:
        _gmp("__gmpz_get_str").restype = ctypes.c_char_p
        s = _gmp("__gmpz_get_str")(None, 16, self.buf)
        return int(s, 16)

    def set_int(self, v: int):
        _gmp("__gmpz_set_str")(self.buf, b"%x" % v, 16)


def gmp_import(data: bytes, count: int, order: int, size: int,
               endian: int) -> int:
    z = _Mpz()
    _gmp("__gmpz_import")(z.ptr, ctypes.c_size_t(count), ctypes.c_int(order),
                      ctypes.c_size_t(size), ctypes.c_int(endian),
                      ctypes.c_size_t(0), data)
    return z.to_int()


def gmp_export_words_be(v: int) -> bytes:
    """mpz_export(..., order=1, size=8, endian=1, nails=0) as the reference
    calls it: most-significant 64-bit word first, big-endian bytes, NO
    padding to a fixed width."""
    z = _Mpz()
    z.set_int(v)
    out = ctypes.create_string_buffer(64)
    count = ctypes.c_size_t(0)
    _gmp("__gmpz_export")(out, ctypes.byref(count), ctypes.c_int(1),
                      ctypes.c_size_t(8), ctypes.c_int(1),
                      ctypes.c_size_t(0), z.ptr)
    return out.raw[:count.value * 8]


DIGESTS = [
    keccak256(b"\x00" * 64),
    keccak256(b"\x01" + b"\xfe" * 63),
    keccak256(bytes(range(64))),
    b"\x00" + keccak256(b"x")[1:],          # leading zero byte
    keccak256(b"y")[:31] + b"\x00",         # trailing zero byte
]


def test_mpz_import_order0_is_big_endian():
    """Pins the undocumented order=0: GMP runs it as order>=0 (MSB-first)."""
    for d in DIGESTS:
        got0 = gmp_import(d, 32, 0, 1, -1)
        got_be = gmp_import(d, 32, 1, 1, -1)
        assert got0 == got_be == int.from_bytes(d, "big"), d.hex()


def test_mpz_export_matches_fixed_32byte_big_endian():
    """For coordinates >= 2^192 (all but ~2^-62 of them), the reference's
    word-granular export equals the repo's fixed 32-byte big-endian."""
    from ultragroth_tpu.constants import FQ_MODULUS
    samples = [FQ_MODULUS - 1, FQ_MODULUS >> 1, (1 << 255) % FQ_MODULUS,
               int.from_bytes(keccak256(b"coord"), "big") % FQ_MODULUS]
    for x in samples:
        assert x >= 1 << 192  # sample in the agreeing regime
        assert gmp_export_words_be(x) == x.to_bytes(32, "big")
    # the documented divergence below 2^192: GMP writes fewer bytes
    assert len(gmp_export_words_be(1 << 64)) == 16


def test_derive_challenge_matches_gmp_pipeline():
    """Full pipeline: buffer assembly + keccak + order=0 import, all GMP."""
    from ultragroth_tpu.constants import FQ_MODULUS
    for seed in (b"a", b"b", b"c"):
        x = int.from_bytes(keccak256(seed + b"x"), "big") % FQ_MODULUS
        y = int.from_bytes(keccak256(seed + b"y"), "big") % FQ_MODULUS
        assert x >= 1 << 192 and y >= 1 << 192
        buf = bytearray(64)
        bx = gmp_export_words_be(x)
        by = gmp_export_words_be(y)
        buf[0:len(bx)] = bx
        buf[32:32 + len(by)] = by
        digest = keccak256(bytes(buf))
        expect = gmp_import(digest, 32, 0, 1, -1) % R
        assert derive_challenge((x, y)) == expect
