"""Oracle sanity: keccak vectors, tower fields, curve group law, pairing."""
import random

import pytest

from ultragroth_tpu.constants import FR_MODULUS, FQ_MODULUS
from ultragroth_tpu.keccak import keccak256
from ultragroth_tpu.oracle import curve, pairing
from ultragroth_tpu.oracle import field as F


def test_keccak_known_vectors():
    # Ethereum-style Keccak-256 (0x01 padding), not SHA3.
    assert keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    # multi-block absorb
    assert keccak256(b"\xab" * 300) == keccak256(bytes([0xAB] * 300))


def test_fq2_field_axioms():
    rng = random.Random(0)
    for _ in range(20):
        a = (rng.randrange(FQ_MODULUS), rng.randrange(FQ_MODULUS))
        b = (rng.randrange(FQ_MODULUS), rng.randrange(FQ_MODULUS))
        assert F.fq2_mul(a, b) == F.fq2_mul(b, a)
        assert F.fq2_mul(a, F.fq2_inv(a)) == F.FQ2_ONE
        assert F.fq2_square(a) == F.fq2_mul(a, a)


def test_fq12_tower():
    rng = random.Random(1)

    def rand12():
        def r2():
            return (rng.randrange(FQ_MODULUS), rng.randrange(FQ_MODULUS))
        return ((r2(), r2(), r2()), (r2(), r2(), r2()))

    a, b = rand12(), rand12()
    assert F.fq12_mul(a, b) == F.fq12_mul(b, a)
    assert F.fq12_mul(a, F.fq12_inv(a)) == F.FQ12_ONE
    # frobenius is the q-power map
    assert F.fq12_frobenius(a, 1) == F.fq12_pow(a, FQ_MODULUS)


def test_curve_group_law():
    g = curve.G1
    assert curve.g1_is_on_curve(g)
    assert curve.g1_add(curve.g1_mul(g, 17), curve.g1_mul(g, 25)) == curve.g1_mul(g, 42)
    assert curve.g1_mul(g, FR_MODULUS) is None
    assert curve.g1_add(g, curve.g1_neg(g)) is None

    h = curve.G2
    assert curve.g2_is_on_curve(h)
    assert curve.g2_add(curve.g2_mul(h, 3), curve.g2_mul(h, 4)) == curve.g2_mul(h, 7)
    assert curve.g2_mul(h, FR_MODULUS) is None


def test_msm_matches_naive():
    rng = random.Random(2)
    pts = [curve.g1_mul(curve.G1, rng.randrange(1, 10**6)) for _ in range(17)]
    scl = [rng.randrange(FR_MODULUS) for _ in range(17)]
    assert curve.g1_msm_fast(pts, scl) == curve.g1_msm(pts, scl)


def test_pairing_bilinearity():
    a, b = 6353, 991
    e_ab = pairing.pairing(curve.g1_mul(curve.G1, a), curve.g2_mul(curve.G2, b))
    e_1 = pairing.pairing(curve.G1, curve.G2)
    assert e_ab == F.fq12_pow(e_1, a * b)
    assert e_1 != F.FQ12_ONE


def test_pairing_check():
    assert pairing.pairing_check(
        [curve.G1, curve.g1_neg(curve.G1)], [curve.G2, curve.G2])
    assert not pairing.pairing_check([curve.G1, curve.G1], [curve.G2, curve.G2])
    # infinities skipped, parity with reference pairingCheck
    assert pairing.pairing_check([None], [curve.G2])
