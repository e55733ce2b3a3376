"""ntt_fast (constant-geometry VMEM kernel + Bailey splitting) vs the
per-stage reference path, including the interpret-mode kernel.

The constant-geometry schedule was derived constructively: with
sigma_1 = bitrev and sigma_{s+1}(2i) = sigma_s(i),
sigma_{s+1}(2i+1) = sigma_s(i + M/2), the network
  out[2i] = a[i] + tw_s[i]*a[i+M/2], out[2i+1] = a[i] - tw_s[i]*a[i+M/2]
with tw_s[i] = w^((sigma_s(i) mod 2^(s-1))*(M>>s)) computes the DFT of a
natural-order input into a bit-reversed layout (verified against the DFT
definition for M = 8..256 during development; pinned here against ntt()).
"""
import numpy as np
import pytest

from ultragroth_tpu.ops import ntt as dntt
from ultragroth_tpu.ops.field import fr


def _rand_mont(n, seed=0):
    """Canonical (< r) random field elements as limb planes: Montgomery op
    chains only agree exactly on canonical inputs."""
    rng = np.random.default_rng(seed)
    planes = rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint32)
    planes[15] &= 0x1FFF        # < 2^253 < r
    return planes


@pytest.mark.parametrize("log_n", [6, 9, 10, 12])
@pytest.mark.parametrize("inverse", [False, True])
def test_ntt_fast_matches_reference(log_n, inverse):
    a = _rand_mont(1 << log_n, seed=log_n)
    want = np.asarray(dntt.ntt(a, log_n, inverse=inverse))
    got = np.asarray(dntt.ntt_fast(a, log_n, inverse=inverse))
    assert (want == got).all()


def test_ntt_fast_roundtrip():
    log_n = 11
    a = np.asarray(fr().to_mont(_rand_mont(1 << log_n, seed=3)))
    back = np.asarray(dntt.ntt_fast(
        np.asarray(dntt.ntt_fast(a, log_n)), log_n, inverse=True))
    assert (back == a).all()


def test_quotient_fast_matches_base():
    """quotient_scalars' fast (ntt_fast) pipeline == base per-stage path."""
    log_n = 9
    a = _rand_mont(1 << log_n, seed=21)
    b = _rand_mont(1 << log_n, seed=22)
    base = np.asarray(dntt._quotient_scalars_impl(a, b, log_n, fast=False))
    fast = np.asarray(dntt._quotient_scalars_impl(a, b, log_n, fast=True))
    assert (base == fast).all()


def test_cg_kernel_interpret_mode():
    """The actual Pallas kernel body, via interpret mode on CPU."""
    import jax
    from jax.experimental import pallas as pl
    from ultragroth_tpu.ops.ntt import _cg_stages, _cg_twiddles, _RolledView
    log_m, cb = 4, 128
    m = 1 << log_m
    h = np.random.default_rng(5).integers(
        0, 1 << 16, size=(16, m, cb), dtype=np.uint32)
    tws = _cg_twiddles(log_m, False)
    kv = fr().kernel_view()

    def kernel(x_ref, tw_ref, o_ref):
        o_ref[...] = _cg_stages(x_ref[...], tw_ref[...], kv, log_m)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((16, m, cb), np.uint32),
        interpret=True,
    )(h, np.asarray(tws))
    want = _cg_stages(h, np.asarray(tws), _RolledView(fr()), log_m)
    assert (np.asarray(out) == np.asarray(want)).all()
