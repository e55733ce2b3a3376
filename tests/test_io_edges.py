"""Host-side edge cases: container validation, keccak vectors, encodings.

These mirror the reference's defensive checks (binfile bounds checking at
src/binfile_utils.cpp:32-80, prime/witness validation at
src/prover.cpp:190-199) and cost no device compiles.
"""
import numpy as np
import pytest

from ultragroth_tpu import constants as C
from ultragroth_tpu.io.binfile import BinFile, BinFileError, pack_binfile
from ultragroth_tpu.io.fieldenc import (ints_to_array, array_to_ints,
                                        words_to_int, int_to_words)
from ultragroth_tpu.io.zkey import parse_groth16_zkey, ZKeyError
from ultragroth_tpu.keccak import keccak256
from ultragroth_tpu.ops import limbs as lb


def test_binfile_rejects_bad_magic():
    data = pack_binfile(b"nope", 1, [(1, b"\x01\x00\x00\x00")])
    with pytest.raises(BinFileError):
        BinFile.parse(data, b"zkey")


def test_binfile_rejects_truncated():
    good = pack_binfile(C.ZKEY_MAGIC, 1, [(1, b"\x01\x00\x00\x00" * 4)])
    with pytest.raises(BinFileError):
        BinFile.parse(good[:len(good) - 3], C.ZKEY_MAGIC)
    with pytest.raises(BinFileError):
        BinFile.parse(b"zk", C.ZKEY_MAGIC)


def test_binfile_rejects_future_version():
    data = pack_binfile(C.WTNS_MAGIC, 9, [(1, b"")])
    with pytest.raises(BinFileError):
        BinFile.parse(data, C.WTNS_MAGIC, max_version=2)


def test_zkey_rejects_wrong_protocol(golden_zkey_bytes):
    from ultragroth_tpu.io.zkey import parse_ultragroth_zkey
    with pytest.raises(ZKeyError):
        parse_ultragroth_zkey(np.frombuffer(golden_zkey_bytes, np.uint8))


def test_keccak_vectors():
    # Ethereum Keccak-256 (0x01 padding), not SHA3
    assert keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    # multi-block (> 136-byte rate)
    long = bytes(range(256))
    assert len(keccak256(long)) == 32
    # python fallback agrees with native (when built)
    from ultragroth_tpu import native
    if native.available():
        for msg in (b"", b"x" * 135, b"x" * 136, b"x" * 137, long):
            assert native.keccak256(msg) == keccak256(msg)


def test_word_encodings_roundtrip():
    vals = [0, 1, C.FR_MODULUS - 1, 123456789 ** 3]
    arr = ints_to_array(vals)
    assert array_to_ints(arr) == vals
    for v in vals:
        assert words_to_int(int_to_words(v)) == v
    planes = lb.ints_to_planes(vals)
    assert lb.planes_to_ints(planes) == vals
    assert np.array_equal(lb.words_to_planes(lb.planes_to_words(planes)),
                          planes)


def test_golden_zkey_header(golden_zkey_bytes):
    zk = parse_groth16_zkey(np.frombuffer(golden_zkey_bytes, np.uint8))
    assert zk.n_vars == 1003
    assert zk.domain_size == 1024
    assert zk.n_public == 1
    assert zk.q_prime == C.FQ_MODULUS
    assert zk.r_prime == C.FR_MODULUS
    assert zk.points_a.shape == (1003, 2, 8)
    assert zk.points_b2.shape == (1003, 4, 8)
    assert zk.points_h.shape == (1024, 2, 8)
