"""The flat (Pallas-kernel-mode) math must equal the rolled XLA math.

On the CPU test mesh fused_map falls back to plain XLA, so this is the test
that keeps the kernel_view (unroll=True) formulations honest.
"""
import random

import jax
import numpy as np
import pytest

from ultragroth_tpu.constants import FQ_MODULUS, FR_MODULUS
from ultragroth_tpu.ops import limbs as lb
from ultragroth_tpu.ops.curve import CurveOps
from ultragroth_tpu.ops.field import fr, fq
from ultragroth_tpu.ops.fq2 import Fq2Ops
from ultragroth_tpu.oracle import curve as oc

RNG = random.Random(5)


@pytest.mark.parametrize("F,p", [(fr(), FR_MODULUS), (fq(), FQ_MODULUS)])
def test_kernel_view_field_ops(F, p):
    kv = F.kernel_view()
    n = 32
    a = [RNG.randrange(p) for _ in range(n)]
    b = [RNG.randrange(p) for _ in range(n)]
    a[0], b[0] = 0, 0
    a[1], b[1] = p - 1, p - 1
    A, B = lb.ints_to_planes(a), lb.ints_to_planes(b)
    mm = jax.jit(kv.mont_mul)
    np.testing.assert_array_equal(np.asarray(mm(A, B)),
                                  np.asarray(F.mont_mul(A, B)))
    np.testing.assert_array_equal(np.asarray(jax.jit(kv.add)(A, B)),
                                  np.asarray(F.add(A, B)))
    np.testing.assert_array_equal(np.asarray(jax.jit(kv.sub)(A, B)),
                                  np.asarray(F.sub(A, B)))
    np.testing.assert_array_equal(np.asarray(jax.jit(kv.neg)(A)),
                                  np.asarray(F.neg(A)))


def test_kernel_view_curve_madd():
    from tests.test_curve_ops import (g1_batch_to_planes,
                                      g1_affine_from_device)
    kops = CurveOps(fq().kernel_view())
    pts = [oc.g1_mul(oc.G1, RNG.randrange(1, 1 << 64)) for _ in range(6)]
    qts = [oc.g1_mul(oc.G1, RNG.randrange(1, 1 << 64)) for _ in range(4)]
    qts += [pts[4], oc.g1_neg(pts[5])]      # double + cancel cases
    px, py, pinf = g1_batch_to_planes(pts)
    qx, qy, qinf = g1_batch_to_planes(qts)
    fn = jax.jit(lambda *a: kops.to_affine(
        kops.madd_unified(kops.affine_to_xyzz(a[0], a[1], a[2]),
                          a[3], a[4], a[5])))
    got = g1_affine_from_device(*fn(px, py, pinf, qx, qy, qinf))
    assert got == [oc.g1_add(p, q) for p, q in zip(pts, qts)]
