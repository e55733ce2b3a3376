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
def test_kernel_view_field_ops(F, p, monkeypatch):
    # canonical-domain bit-parity: ULTRAGROTH_LAZY defaults ON (round 4),
    # under which the Fq kernel view legitimately emits [0, 2p)
    # representatives — that mode is value-checked in test_lazy_field
    monkeypatch.setenv("ULTRAGROTH_LAZY", "0")
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


# NOTE: a curve-level kernel-view test (madd_unified over kernel_view) is
# deliberately NOT compiled here: the flat unrolled graph (~30k ops) takes
# XLA-CPU tens of minutes to compile, which is exactly why that form exists
# only for Mosaic.  CurveOps is the same code over either field facade, the
# facade itself is covered above, and the composed kernel path is validated
# against the oracle on real TPU (MSM spot check; see PERF.md).
