"""Device NTT / quotient / MSM vs the Python oracles."""
import random

import jax
import numpy as np
import pytest

from ultragroth_tpu.constants import FR_MODULUS as R
from ultragroth_tpu.ops import limbs as lb
from ultragroth_tpu.ops import msm as dmsm
from ultragroth_tpu.ops import ntt as dntt
from ultragroth_tpu.ops.field import fr
from ultragroth_tpu.oracle import curve as oc
from ultragroth_tpu.protocol import quotient as oq
from ultragroth_tpu.protocol.transcript import root_of_unity

from tests.test_curve_ops import (g1_batch_to_planes, g2_batch_to_planes,
                                  g1_affine_from_device, g2_affine_from_device)

RNG = random.Random(7)
FR = fr()


def test_ntt_roundtrip_and_oracle():
    log_n = 6
    n = 1 << log_n
    vals = [RNG.randrange(R) for _ in range(n)]
    a = FR.to_mont(lb.ints_to_planes(vals))
    w = root_of_unity(log_n)

    fwd = np.asarray(FR.from_mont(dntt.ntt(a, log_n)))
    assert lb.planes_to_ints(fwd) == oq.ntt(vals, w)

    back = np.asarray(FR.from_mont(dntt.ntt(dntt.ntt(a, log_n), log_n, inverse=True)))
    assert lb.planes_to_ints(back) == vals


def test_quotient_pipeline_vs_oracle():
    log_n = 5
    n = 1 << log_n
    a_vals = [RNG.randrange(R) for _ in range(n)]
    b_vals = [RNG.randrange(R) for _ in range(n)]
    a = FR.to_mont(lb.ints_to_planes(a_vals))
    b = FR.to_mont(lb.ints_to_planes(b_vals))
    got = lb.planes_to_ints(np.asarray(dntt.quotient_scalars(a, b, log_n)))
    expected = oq.quotient_evals(a_vals, b_vals, n)
    assert got == expected


def test_scatter_coefs_vs_oracle():
    domain, n_vars, n_coefs = 16, 10, 200
    wit = [RNG.randrange(R) for _ in range(n_vars)]
    m = np.array([RNG.randrange(2) for _ in range(n_coefs)], np.uint32)
    c = np.array([RNG.randrange(domain) for _ in range(n_coefs)], np.uint32)
    s = np.array([RNG.randrange(n_vars) for _ in range(n_coefs)], np.uint32)
    coef_vals = [RNG.randrange(R) for _ in range(n_coefs)]

    wm = FR.to_mont(lb.ints_to_planes(wit))
    cv = FR.to_mont(lb.ints_to_planes(coef_vals))
    a_dev, b_dev = dntt.scatter_coefs(wm, cv, m, c, s, domain)
    got_a = lb.planes_to_ints(np.asarray(FR.from_mont(a_dev)))
    got_b = lb.planes_to_ints(np.asarray(FR.from_mont(b_dev)))
    exp_a, exp_b = oq.scatter_coefs(m, c, s, coef_vals, wit, domain)
    assert got_a == exp_a
    assert got_b == exp_b


@pytest.mark.parametrize("n,c", [(97, 8), (256, 8), (33, 12)])
def test_msm_g1_vs_oracle(n, c):
    pts = [oc.g1_mul(oc.G1, RNG.randrange(1, R)) for _ in range(n - 2)]
    pts += [None, pts[0]]  # infinity base + repeated base
    scalars = [RNG.randrange(R) for _ in range(n - 3)] + [0, 5, 7]
    x, y, inf = g1_batch_to_planes(pts)
    sc = lb.ints_to_planes(scalars)
    out = dmsm.msm_g1(x, y, inf, sc, c=c)
    got = g1_affine_from_device(*jax.jit(dmsm.g1_ops().to_affine)(out))[0]
    assert got == oc.g1_msm(pts, scalars)


def test_msm_g2_vs_oracle():
    n, c = 17, 8
    pts = [oc.g2_mul(oc.G2, RNG.randrange(1, R)) for _ in range(n)]
    scalars = [RNG.randrange(R) for _ in range(n)]
    x, y, inf = g2_batch_to_planes(pts)
    sc = lb.ints_to_planes(scalars)
    out = dmsm.msm_g2(x, y, inf, sc, c=c)
    got = g2_affine_from_device(*jax.jit(dmsm.g2_ops().to_affine)(out))[0]
    assert got == oc.g2_msm(pts, scalars)


def test_msm_all_equal_digits():
    """Every point in the same bucket: stresses the segmented scan."""
    n, c = 64, 8
    pts = [oc.g1_mul(oc.G1, i + 1) for i in range(n)]
    scalars = [3] * n
    x, y, inf = g1_batch_to_planes(pts)
    sc = lb.ints_to_planes(scalars)
    out = dmsm.msm_g1(x, y, inf, sc, c=c)
    got = g1_affine_from_device(*jax.jit(dmsm.g1_ops().to_affine)(out))[0]
    assert got == oc.g1_msm(pts, scalars)


def test_msm_two_phase_extreme_skew():
    """c=12 -> 45056 lanes -> the TWO-PHASE accumulation path; all-equal
    scalars put every point in one bucket per window, so nearly all the
    work drains through phase B's compacted heavy-lane loop, and the
    repeated point exercises the flagged complete-madd fallback."""
    n, c = 60, 12        # pads to 64: shares the (33,12) test's compile
    pts = [oc.g1_mul(oc.G1, i + 1) for i in range(n - 1)]
    pts.append(pts[0])                     # duplicate -> doubling flag
    scalars = [(1 << 200) + 12345] * n
    x, y, inf = g1_batch_to_planes(pts)
    sc = lb.ints_to_planes(scalars)
    out = dmsm.msm_g1(x, y, inf, sc, c=c)
    got = g1_affine_from_device(*jax.jit(dmsm.g1_ops().to_affine)(out))[0]
    assert got == oc.g1_msm(pts, scalars)


@pytest.mark.parametrize("n,c", [(97, 8), (33, 12)])
def test_msm_g1_fixed_vs_oracle(n, c):
    """Fixed-base path (precomputed 2^(cw)*P table, one shared bucket
    space) against the oracle, incl. infinity base, repeated base, and a
    zero scalar."""
    pts = [oc.g1_mul(oc.G1, RNG.randrange(1, R)) for _ in range(n - 2)]
    pts += [None, pts[0]]
    scalars = [RNG.randrange(R) for _ in range(n - 3)] + [0, 5, R - 1]
    x, y, inf = g1_batch_to_planes(pts)
    sc = lb.ints_to_planes(scalars)
    packed, inf_p, c = dmsm.msm_fixed_table("g1", x, y, inf, c=c)
    out = dmsm.msm_g1_fixed(packed, inf_p, sc, c)
    got = g1_affine_from_device(*jax.jit(dmsm.g1_ops().to_affine)(out))[0]
    assert got == oc.g1_msm(pts, scalars)


def test_msm_g2_fixed_vs_oracle():
    n, c = 17, 8
    pts = [oc.g2_mul(oc.G2, RNG.randrange(1, R)) for _ in range(n)]
    scalars = [RNG.randrange(R) for _ in range(n)]
    x, y, inf = g2_batch_to_planes(pts)
    sc = lb.ints_to_planes(scalars)
    packed, inf_p, c = dmsm.msm_fixed_table("g2", x, y, inf, c=c)
    out = dmsm.msm_g2_fixed(packed, inf_p, sc, c)
    got = g2_affine_from_device(*jax.jit(dmsm.g2_ops().to_affine)(out))[0]
    assert got == oc.g2_msm(pts, scalars)


def test_batch_inv_mont_vs_fermat():
    """Montgomery-trick batch inversion == per-element Fermat, inv(0)=0."""
    F = fr()
    vals = [RNG.randrange(R) for _ in range(30)] + [0, 1]
    a = lb.ints_to_planes(vals)
    got = np.asarray(F.batch_inv_mont(a))
    want = np.asarray(F.inv_mont(a))
    np.testing.assert_array_equal(got, want)
