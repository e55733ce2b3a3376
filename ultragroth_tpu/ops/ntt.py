"""Fr NTT on limb planes + the Groth16 quotient (H) pipeline.

TPU-first re-design of the reference FFT block (ifft -> coset twiddle ->
fft at /root/reference/src/groth16.cpp:110-148 over ffiasm FFT<Fr>):

* values stay in the Montgomery domain end to end (mont_mul of two
  Montgomery values is again Montgomery, so NTT math is domain-transparent);
* each butterfly stage is one batched mont_mul + add/sub over the whole
  array -- no scalar loops, no bit-level branching;
* twiddle tables are generated ON DEVICE by log-doubling (log2(n) batched
  muls), avoiding any host big-int loops;
* the sparse coefficient scatter (a[c] += w[s]*coef, reference
  src/groth16.cpp:70-99 with 1024 striped mutexes) becomes mont_mul +
  `segment_sum` over uint32 limb planes + one wide Montgomery reduction --
  scatter-free and deterministic.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import FR_MODULUS, MONT_R
from ..protocol.transcript import root_of_unity
from ..protocol.quotient import H_SCALE
from . import kernels
from .field import fr
from .limbs import NLIMBS, int_to_limbs

L = NLIMBS


def _powers(F, base_int: int, m: int):
    """[L, m] Montgomery planes of base^0 .. base^(m-1), device log-doubling."""
    base_m = F.to_mont(F.const(base_int, (1,)))
    p = F.one_mont((1,))
    cur = base_m
    while p.shape[1] < m:
        p = jnp.concatenate([p, F.mont_mul(p, cur)], axis=1)
        cur = F.mont_sqr(cur)
    return p[:, :m]


def _bitrev_perm(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


@functools.lru_cache(maxsize=None)
def _stage_twiddles(log_n: int, inverse: bool):
    """Per-stage twiddle tables for the DIT butterfly network.

    Stage s (s = 1..log_n, block length 2^s) uses powers of w_{2^s} =
    w_n^(n/2^s); inverse NTT uses the inverse root.  Tables are Montgomery
    planes [L, 2^(s-1)], computed once per (log_n, direction) and cached.
    """
    F = fr()
    w = root_of_unity(log_n)
    if inverse:
        w = pow(w, -1, FR_MODULUS)
    out = []
    with jax.ensure_compile_time_eval():
        for s in range(1, log_n + 1):
            ws = pow(w, 1 << (log_n - s), FR_MODULUS)
            out.append(_powers(F, ws, 1 << (s - 1)))
    return out


@functools.lru_cache(maxsize=None)
def _n_inv_mont(log_n: int):
    F = fr()
    with jax.ensure_compile_time_eval():
        return F.to_mont(F.const(pow(1 << log_n, -1, FR_MODULUS), ()))


@functools.partial(jax.jit, static_argnames=("log_n", "inverse"))
def ntt(a, log_n: int, inverse: bool = False):
    """In-order NTT over [L, n] Montgomery planes; returns [L, n].

    X_j = sum_k x_k w^{jk} (inverse: w^-1 and 1/n scaling), matching the
    ffiasm FFT contract consumed at src/groth16.cpp:110-140.
    """
    F = fr()
    n = 1 << log_n
    assert a.shape == (L, n), a.shape
    a = a[:, _bitrev_perm(log_n)]
    tw = _stage_twiddles(log_n, inverse)
    butterfly = kernels.fr_butterfly()
    for s in range(1, log_n + 1):
        half = 1 << (s - 1)
        blocks = n >> s
        v = a.reshape(L, blocks, 2, half)
        u = v[:, :, 0, :].reshape(L, n // 2)
        w_in = v[:, :, 1, :].reshape(L, n // 2)
        twf = jnp.broadcast_to(tw[s - 1][:, None, :],
                               (L, blocks, half)).reshape(L, n // 2)
        hi, lo = butterfly(u, w_in, twf)
        a = jnp.stack([hi.reshape(L, blocks, half),
                       lo.reshape(L, blocks, half)], axis=2).reshape(L, n)
    if inverse:
        a = kernels.fr_mont_mul()(a, _n_inv_mont(log_n)[:, None] + jnp.zeros_like(a))
    return a


@functools.lru_cache(maxsize=None)
def _coset_powers(log_n: int):
    """w_{2n}^i for i < n: the odd-coset shift of src/groth16.cpp:116-132."""
    F = fr()
    with jax.ensure_compile_time_eval():
        return _powers(F, root_of_unity(log_n + 1), 1 << log_n)


@functools.lru_cache(maxsize=None)
def _h_scale_std(log_n: int):
    """H_SCALE as a standard-domain constant: mont_mul(x_mont, this) both
    applies the R^-2 wire-format scale and leaves standard form (see
    ultragroth_tpu.protocol.quotient.H_SCALE derivation)."""
    F = fr()
    with jax.ensure_compile_time_eval():
        return F.const(H_SCALE, ())


def to_odd_coset(vals, log_n: int):
    """ifft -> pointwise w_{2n}^i -> fft (all Montgomery domain)."""
    F = fr()
    coeffs = ntt(vals, log_n, inverse=True)
    shifted = kernels.fr_mont_mul()(coeffs, _coset_powers(log_n))
    return ntt(shifted, log_n)


@functools.partial(jax.jit, static_argnames=("domain_size", "chunk"))
def scatter_coefs(witness_mont, coef_val_mont, coef_m, coef_c, coef_s,
                  domain_size: int, chunk: int = 1 << 16):
    """Sparse R1CS evaluation: a[c] += w[s] * coef (m selects a or b).

    witness_mont: [L, nVars] Montgomery planes; coef_val_mont: [L, nCoefs];
    coef_m/c/s: int arrays [nCoefs].  Returns (a, b) [L, domain] Montgomery.

    Lazy uint32 limb accumulation via segment_sum in chunks of <= 2^16
    addends (the exactness bound of FieldOps.redc_carry), then one wide
    reduction per chunk.
    """
    F = fr()
    n_coefs = coef_m.shape[0]
    seg = coef_m.astype(jnp.uint32) * jnp.uint32(domain_size) + coef_c.astype(jnp.uint32)
    prod = F.mont_mul(witness_mont[:, coef_s], coef_val_mont)  # [L, nC]
    acc = F.zero((2 * domain_size,))
    for start in range(0, n_coefs, chunk):
        end = min(start + chunk, n_coefs)
        sums = jax.ops.segment_sum(
            prod[:, start:end].T, seg[start:end],
            num_segments=2 * domain_size)          # [2D, L] uint32 lazy
        acc = F.add(acc, F.redc_carry(sums.T))
    a = acc[:, :domain_size]
    b = acc[:, domain_size:]
    return a, b


@functools.partial(jax.jit, static_argnames=("log_n",))
def quotient_scalars(a, b, log_n: int):
    """Montgomery-domain (a, b) evals -> standard-form H MSM scalars.

    Parity with the oracle quotient_evals (protocol/quotient.py): evaluate
    h = (A*B - C) on the odd coset and fold in the R^-2 wire scale, fused
    into the final multiply.
    """
    F = fr()
    mul = kernels.fr_mont_mul()
    c = mul(a, b)
    a2 = to_odd_coset(a, log_n)
    b2 = to_odd_coset(b, log_n)
    c2 = to_odd_coset(c, log_n)
    h = F.sub(mul(a2, b2), c2)
    return mul(h, _h_scale_std(log_n)[:, None] + jnp.zeros_like(h))
