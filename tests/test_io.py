"""Container format tests against the golden testdata files."""
import numpy as np
import pytest

from ultragroth_tpu.constants import FQ_MODULUS, FR_MODULUS
from ultragroth_tpu.io.binfile import BinFile, BinFileError, pack_binfile
from ultragroth_tpu.io.fieldenc import words_to_int, int_to_words, ints_to_array, array_to_ints
from ultragroth_tpu.io.wtns import parse_wtns, pack_wtns
from ultragroth_tpu.io.zkey import parse_groth16_zkey
from ultragroth_tpu.oracle import curve
from ultragroth_tpu.protocol.groth16 import decode_g1, decode_g2, decode_g1_batch


def test_binfile_roundtrip():
    data = pack_binfile(b"test", 7, [(1, b"abc"), (2, b"\x00" * 10), (1, b"xy")])
    bf = BinFile.parse(data, b"test", 7)
    assert bf.version == 7
    assert bytes(bf.section(1, 0)) == b"abc"
    assert bytes(bf.section(1, 1)) == b"xy"
    assert bf.section_size(2) == 10
    with pytest.raises(BinFileError):
        bf.section(9)
    with pytest.raises(BinFileError):
        BinFile.parse(data, b"zkey", 7)


def test_fieldenc_roundtrip():
    vals = [0, 1, FR_MODULUS - 1, 123456789123456789123456789]
    arr = ints_to_array(vals)
    assert array_to_ints(arr) == vals
    assert words_to_int(int_to_words(FQ_MODULUS - 5)) == FQ_MODULUS - 5


def test_golden_zkey_header(golden_zkey_bytes):
    zk = parse_groth16_zkey(golden_zkey_bytes)
    assert zk.n_vars == 1003
    assert zk.n_public == 1
    assert zk.domain_size == 1024
    assert zk.q_prime == FQ_MODULUS
    assert zk.r_prime == FR_MODULUS
    assert zk.ic.shape == (2, 2, 8)
    assert zk.points_a.shape == (1003, 2, 8)
    assert zk.points_b2.shape == (1003, 4, 8)
    assert zk.points_c.shape == (1001, 2, 8)
    assert zk.points_h.shape == (1024, 2, 8)
    assert len(zk.coef_m) == 2002


def test_golden_zkey_points_on_curve(golden_zkey_bytes):
    zk = parse_groth16_zkey(golden_zkey_bytes)
    assert curve.g1_is_on_curve(decode_g1(zk.alpha1))
    assert curve.g2_is_on_curve(decode_g2(zk.beta2))
    assert curve.g2_is_on_curve(decode_g2(zk.gamma2))
    assert curve.g2_is_on_curve(decode_g2(zk.delta2))
    for p in decode_g1_batch(zk.points_h[::101]):
        assert curve.g1_is_on_curve(p)
    for i in range(0, zk.n_vars, 149):
        assert curve.g1_is_on_curve(decode_g1(zk.points_a[i]))
        assert curve.g2_is_on_curve(decode_g2(zk.points_b2[i]))


def test_golden_vk_matches_zkey(golden_zkey_bytes, golden_vk_json):
    zk = parse_groth16_zkey(golden_zkey_bytes)
    vk = golden_vk_json
    assert decode_g1(zk.alpha1) == (int(vk["vk_alpha_1"][0]), int(vk["vk_alpha_1"][1]))
    ic0 = decode_g1(zk.ic[0])
    assert [str(ic0[0]), str(ic0[1])] == vk["IC"][0][:2]


def test_golden_wtns(golden_wtns_bytes):
    w = parse_wtns(golden_wtns_bytes)
    assert w.n_vars == 1003
    assert w.prime == FR_MODULUS
    assert words_to_int(w.values[0]) == 1  # circom signal 0 is the constant 1
    assert w.chunks is None


def test_wtns_roundtrip():
    vals = [1, 42, FR_MODULUS - 1]
    data = pack_wtns(vals)
    w = parse_wtns(data)
    assert w.n_vars == 3
    assert array_to_ints(w.values) == vals
