"""Property tests: batched limb-plane field ops vs the Python-int oracle."""
import random

import numpy as np
import pytest

from ultragroth_tpu.constants import FQ_MODULUS, FR_MODULUS
from ultragroth_tpu.ops import limbs as lb
from ultragroth_tpu.ops.field import fr, fq

RNG = random.Random(1234)


def sample_vals(p, n):
    edge = [0, 1, 2, p - 1, p - 2, (p - 1) // 2, 1 << 255 % p]
    vals = [v % p for v in edge] + [RNG.randrange(p) for _ in range(n - len(edge))]
    return vals[:n]


@pytest.mark.parametrize("F,p", [(fr(), FR_MODULUS), (fq(), FQ_MODULUS)])
def test_limb_roundtrip(F, p):
    vals = sample_vals(p, 17)
    planes = lb.ints_to_planes(vals)
    assert lb.planes_to_ints(planes) == vals
    words = lb.planes_to_words(planes)
    back = lb.words_to_planes(words)
    np.testing.assert_array_equal(back, planes)


@pytest.mark.parametrize("F,p", [(fr(), FR_MODULUS), (fq(), FQ_MODULUS)])
def test_add_sub_neg(F, p):
    n = 64
    a = sample_vals(p, n)
    b = list(reversed(sample_vals(p, n)))
    A, B = lb.ints_to_planes(a), lb.ints_to_planes(b)
    got_add = lb.planes_to_ints(np.asarray(F.add(A, B)))
    got_sub = lb.planes_to_ints(np.asarray(F.sub(A, B)))
    got_neg = lb.planes_to_ints(np.asarray(F.neg(A)))
    got_half = lb.planes_to_ints(np.asarray(F.half(A)))
    inv2 = pow(2, -1, p)
    for i in range(n):
        assert got_add[i] == (a[i] + b[i]) % p
        assert got_sub[i] == (a[i] - b[i]) % p
        assert got_neg[i] == (-a[i]) % p
        assert got_half[i] == a[i] * inv2 % p


@pytest.mark.parametrize("F,p", [(fr(), FR_MODULUS), (fq(), FQ_MODULUS)])
def test_mont_mul(F, p):
    n = 64
    R = 1 << 256
    a = sample_vals(p, n)
    b = list(reversed(sample_vals(p, n)))
    A, B = lb.ints_to_planes(a), lb.ints_to_planes(b)
    got = lb.planes_to_ints(np.asarray(F.mont_mul(A, B)))
    rinv = pow(R, -1, p)
    for i in range(n):
        assert got[i] == a[i] * b[i] * rinv % p, i


@pytest.mark.parametrize("F,p", [(fr(), FR_MODULUS), (fq(), FQ_MODULUS)])
def test_mont_roundtrip_and_domain(F, p):
    n = 32
    a = sample_vals(p, n)
    A = lb.ints_to_planes(a)
    am = F.to_mont(A)
    back = lb.planes_to_ints(np.asarray(F.from_mont(am)))
    assert back == a
    # mont-domain product maps to plain product
    got = lb.planes_to_ints(np.asarray(F.from_mont(F.mont_mul(am, am))))
    for i in range(n):
        assert got[i] == a[i] * a[i] % p


@pytest.mark.parametrize("F,p", [(fr(), FR_MODULUS), (fq(), FQ_MODULUS)])
def test_inv(F, p):
    n = 16
    a = [0] + sample_vals(p, n)[1:]  # include zero -> maps to zero
    A = F.to_mont(lb.ints_to_planes(a))
    got = lb.planes_to_ints(np.asarray(F.from_mont(F.inv_mont(A))))
    for i in range(n):
        if a[i] == 0:
            assert got[i] == 0
        else:
            assert got[i] == pow(a[i], -1, p)


@pytest.mark.parametrize("F,p", [(fr(), FR_MODULUS), (fq(), FQ_MODULUS)])
def test_redc_carry(F, p):
    # simulate a segment_sum: 500 canonical values accumulated limb-wise
    n_seg, k = 8, 500
    vals = [[RNG.randrange(p) for _ in range(k)] for _ in range(n_seg)]
    wide = np.zeros((16, n_seg), dtype=np.uint64)
    for s in range(n_seg):
        planes = lb.ints_to_planes(vals[s])
        wide[:, s] = planes.astype(np.uint64).sum(axis=1)
    assert wide.max() < (1 << 32) - (1 << 16)
    got = lb.planes_to_ints(np.asarray(F.redc_carry(wide.astype(np.uint32))))
    for s in range(n_seg):
        assert got[s] == sum(vals[s]) % p


def test_pow_const():
    F, p = fr(), FR_MODULUS
    a = sample_vals(p, 8)
    A = F.to_mont(lb.ints_to_planes(a))
    e = 0xDEADBEEF12345
    got = lb.planes_to_ints(np.asarray(F.from_mont(F.pow_const(A, e))))
    for i in range(8):
        assert got[i] == pow(a[i], e, p)
