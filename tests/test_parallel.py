"""Mesh-sharded MSM / NTT on the 8-device virtual CPU mesh."""
import random

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from ultragroth_tpu.constants import FR_MODULUS as R
from ultragroth_tpu.ops import limbs as lb
from ultragroth_tpu.ops.field import fr
from ultragroth_tpu.oracle import curve as oc
from ultragroth_tpu.parallel.msm import msm_g1_sharded
from ultragroth_tpu.parallel.ntt import ntt_sharded
from ultragroth_tpu.protocol import quotient as oq
from ultragroth_tpu.protocol.transcript import root_of_unity

from tests.test_curve_ops import g1_batch_to_planes, g1_affine_from_device

RNG = random.Random(42)
FR = fr()


def _mesh():
    devs = np.array(jax.devices())
    assert devs.size >= 8, devs
    return Mesh(devs[:8], ("data",))


def test_sharded_ntt_vs_oracle():
    log_n = 8
    n = 1 << log_n
    vals = [RNG.randrange(R) for _ in range(n)]
    a = FR.to_mont(lb.ints_to_planes(vals))
    w = root_of_unity(log_n)
    with _mesh() as mesh:
        got = np.asarray(FR.from_mont(ntt_sharded(a, log_n, mesh)))
        assert lb.planes_to_ints(got) == oq.ntt(vals, w)

        back = FR.from_mont(ntt_sharded(
            FR.to_mont(lb.ints_to_planes(oq.ntt(vals, w))), log_n, mesh,
            inverse=True))
        assert lb.planes_to_ints(np.asarray(back)) == vals


def test_sharded_msm_vs_oracle():
    n = 96
    pts = [oc.g1_mul(oc.G1, RNG.randrange(1, R)) for _ in range(n)]
    scalars = [RNG.randrange(R) for _ in range(n - 1)] + [0]
    x, y, inf = g1_batch_to_planes(pts)
    sc = lb.ints_to_planes(scalars)
    with _mesh() as mesh:
        out = msm_g1_sharded(x, y, inf, sc, mesh, c=8)
    from ultragroth_tpu.ops.curve import g1_ops
    got = g1_affine_from_device(*jax.jit(g1_ops().to_affine)(out))[0]
    assert got == oc.g1_msm(pts, scalars)
