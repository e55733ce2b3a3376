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


# ---------------------------------------------------------------------------
# Fast path: VMEM-resident constant-geometry (Pease) NTT kernel + recursive
# Bailey splitting.  The per-stage XLA pipeline above costs ~20 full HBM
# round trips at 2^20; this path does the whole butterfly network of each
# <=2^8 factor inside ONE Pallas kernel, so a 2^20 NTT is ~5 passes total.
#
# Constant-geometry schedule (derived + verified in tests/test_ntt_fast.py):
#   natural-order input; stage s (1..log M):
#     out[2i]   = a[i] + tw_s[i] * a[i + M/2]
#     out[2i+1] = a[i] - tw_s[i] * a[i + M/2]
#   tw_s[i] = w^((sigma_s(i) mod 2^(s-1)) * (M >> s)) with sigma_1 = bitrev,
#   sigma_{s+1}(2i) = sigma_s(i), sigma_{s+1}(2i+1) = sigma_s(i + M/2);
#   final layout is bit-reversed (one take at the end restores order).
# Every stage reads two contiguous halves and writes an interleave - pure
# sublane-axis movement in the [L, M, lanes] kernel layout, no lane
# shuffles (the Mosaic-hostile part of a textbook DIT).
# ---------------------------------------------------------------------------

# kernel handles factors up to 2^6: the fully unrolled butterfly network is
# log_m stages x CIOS mont_mul; 2^8 (and not 2^6) crashes the Mosaic
# compile helper on v5e (experiments/probe_cg2.log), so the Bailey split
# recurses one level deeper instead.
_CG_KERNEL_MAX_LOG = 6


def _cg_sigmas(log_m: int):
    m = 1 << log_m
    sig = _bitrev_perm(log_m).astype(np.int64)
    out = [sig]
    for _ in range(log_m):
        nxt = np.zeros(m, np.int64)
        nxt[0::2] = sig[: m // 2]
        nxt[1::2] = sig[m // 2:]
        out.append(nxt)
        sig = nxt
    return out


@functools.lru_cache(maxsize=None)
def _cg_twiddles(log_m: int, inverse: bool):
    """[log_m, L, M/2] Montgomery twiddles for the constant-geometry net."""
    F = fr()
    m = 1 << log_m
    w = root_of_unity(log_m)
    if inverse:
        w = pow(w, -1, FR_MODULUS)
    sig = _cg_sigmas(log_m)
    tables = []
    with jax.ensure_compile_time_eval():
        base = _powers(F, w, m)                           # w^0..w^(m-1)
        for s in range(1, log_m + 1):
            half = 1 << (s - 1)
            exps = (sig[s - 1][: m // 2] % half) * (m >> s)
            tables.append(base[:, np.asarray(exps)])
        # np.asarray: the cached value must be concrete host data — a
        # jnp op outside ensure_compile_time_eval would stage a tracer
        # into the lru_cache and leak it into the NEXT trace.
        return np.stack([np.asarray(t) for t in tables])  # [log_m, L, m/2]


def _cg_stages(x, tws, fops, log_m: int):
    """Shared math: x [L, M, CB] -> all log_m stages (any field-ops impl).

    tws: [log_m, L, M/2] Montgomery twiddles; output in bit-reversed layout.
    """
    m = 1 << log_m
    for s in range(log_m):
        u = x[:, : m // 2, :]
        w_in = x[:, m // 2:, :]
        t = fops.mont_mul(w_in, tws[s][:, :, None])
        hi = fops.add(u, t)
        lo = fops.sub(u, t)
        x = jnp.stack([hi, lo], axis=2).reshape(x.shape[0], m, x.shape[2])
    return x


class _RolledView:
    """Adapter giving the rolled FieldOps the kernel-view method names."""

    def __init__(self, F):
        self.mont_mul = F._mont_mul
        self.add = F._add
        self.sub = F._sub


def _cg_kernel_call(h, log_m: int, inverse: bool):
    """One Pallas kernel: full cg butterfly network over axis 1 of
    [L, M, CB]; returns bit-reversed-layout output."""
    from .fuse import _interpret, _use_pallas, pltpu
    import jax.experimental.pallas as pl
    F = fr()
    m = 1 << log_m
    L_, M_, CB = h.shape
    assert M_ == m
    tws = _cg_twiddles(log_m, inverse)
    if not _use_pallas():
        return _cg_stages(h, tws, _RolledView(F), log_m)

    kv = F.kernel_view()
    # lane-block size: cap the input block at 1 MB of VMEM (L*m*cb*4 B),
    # lanes >= 128.  The unrolled log_m-stage CIOS network multiplies the
    # block's VMEM footprint several-fold; 8 MB input blocks (the old
    # (1<<19)//(m*4) formula, which forgot the L factor) crash the Mosaic
    # compile helper, while 1 MB (= the probe_cg2 geometry that compiles
    # at factor 2^6) fits (experiments/probe_cg2.log, measure_r2d.log).
    cb = max(128, min(CB, (1 << 20) // (L * m * 4)))
    pad = (-CB) % cb
    if pad:
        h = jnp.pad(h, ((0, 0), (0, 0), (0, pad)))
    grid = (CB + pad) // cb

    def kernel(x_ref, tw_ref, o_ref):
        o_ref[...] = _cg_stages(x_ref[...], tw_ref[...], kv, log_m)

    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((L, m, cb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((log_m, L, m // 2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, m, cb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, m, CB + pad), h.dtype),
        interpret=_interpret(),
    )(h, tws)
    if pad:
        out = out[:, :, :CB]
    return out


@functools.lru_cache(maxsize=None)
def _split_twiddles(log_m2: int, log_m1: int, inverse: bool):
    """w_M^(j1*k2) Montgomery planes [L, M2, M1] for the Bailey split."""
    F = fr()
    m1, m2 = 1 << log_m1, 1 << log_m2
    w = root_of_unity(log_m1 + log_m2)
    if inverse:
        w = pow(w, -1, FR_MODULUS)
    with jax.ensure_compile_time_eval():
        wk2 = _powers(F, w, m2)                        # [L, M2] w^(k2)
        # powers of w^(k2) up to M1: [L, M2, M1]
        p = F.one_mont((m2, 1))
        cur = wk2[:, :, None]
        while p.shape[2] < m1:
            p = jnp.concatenate([p, F.mont_mul(p, cur)], axis=2)
            cur = F.mont_sqr(cur)
        return np.asarray(p[:, :, :m1])   # concrete: see _cg_twiddles


def _ntt_cols(h, log_m: int, inverse: bool):
    """NTT along axis 1 of [L, M, CB] Montgomery planes, natural order
    in and out, batched over the trailing lane axis."""
    if log_m <= _CG_KERNEL_MAX_LOG:
        out = _cg_kernel_call(h, log_m, inverse)
        return out[:, _bitrev_perm(log_m), :]
    log_m1 = min(_CG_KERNEL_MAX_LOG, log_m - 1)
    log_m2 = log_m - log_m1
    m1, m2 = 1 << log_m1, 1 << log_m2
    L_, M_, CB = h.shape
    mul = kernels.fr_mont_mul()
    # j = j2*M1 + j1: [L, M2, M1, CB] with j1 minor
    v = h.reshape(L, m2, m1 * CB)
    v = _ntt_cols(v, log_m2, inverse)                  # over j2 -> k2
    tw = _split_twiddles(log_m2, log_m1, inverse)      # [L, M2, M1]
    v = v.reshape(L, m2, m1, CB)
    v = mul(v.reshape(L, -1),
            jnp.broadcast_to(tw[:, :, :, None],
                             (L, m2, m1, CB)).reshape(L, -1)
            ).reshape(L, m2, m1, CB)
    v = v.transpose(0, 2, 1, 3)                        # [L, M1, M2, CB]
    v = _ntt_cols(v.reshape(L, m1, m2 * CB), log_m1, inverse)  # j1 -> k1
    # layout [L, M1(k1), M2(k2), CB]; k = k1*M2 + k2 -> natural reshape
    return v.reshape(L, M_, CB)


@functools.partial(jax.jit, static_argnames=("log_n", "inverse"))
def ntt_fast(a, log_n: int, inverse: bool = False):
    """Same contract as ntt(); VMEM-resident kernel path for large n."""
    F = fr()
    n = 1 << log_n
    assert a.shape == (L, n), a.shape
    out = _ntt_cols(a[:, :, None], log_n, inverse)[:, :, 0]
    if inverse:
        scale = _n_inv_mont(log_n)[:, None] + jnp.zeros_like(out)
        out = kernels.fr_mont_mul()(out, scale)
    return out


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


def to_odd_coset(vals, log_n: int, ntt_fn=None):
    """ifft -> pointwise w_{2n}^i -> fft (all Montgomery domain)."""
    f = ntt_fn or ntt
    coeffs = f(vals, log_n, inverse=True)
    shifted = kernels.fr_mont_mul()(coeffs, _coset_powers(log_n))
    return f(shifted, log_n)


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
    L_ = witness_mont.shape[0]
    n_coefs = coef_m.shape[0]
    seg = coef_m.astype(jnp.uint32) * jnp.uint32(domain_size) + coef_c.astype(jnp.uint32)
    prod = F.mont_mul(witness_mont[:, coef_s], coef_val_mont)  # [L, nC]
    # chunks ride a lax.scan so the jaxpr holds ONE segment_sum no matter
    # how many chunks: the unrolled python-loop form emitted 32 big
    # scatters at 2^20 coefs and that program reliably crashed the remote
    # TPU compiler (tpu_compile_helper exit 1 — both r5 e2e-2^20 attempts
    # died on exactly this compile).  Pad lanes scatter into a dump slot.
    n_chunks = -(-n_coefs // chunk)
    pad = n_chunks * chunk - n_coefs
    if pad:
        prod = jnp.pad(prod, ((0, 0), (0, pad)))
        seg = jnp.pad(seg, (0, pad),
                      constant_values=2 * domain_size)      # dump slot
    prod_c = prod.reshape(L_, n_chunks, chunk).transpose(1, 2, 0)
    seg_c = seg.reshape(n_chunks, chunk)

    def body(acc, xs):
        p, s = xs                                 # [chunk, L], [chunk]
        sums = jax.ops.segment_sum(
            p, s, num_segments=2 * domain_size + 1)  # uint32 lazy
        return F.add(acc, F.redc_carry(sums[:-1].T)), None

    acc, _ = jax.lax.scan(body, F.zero((2 * domain_size,)),
                          (prod_c, seg_c))
    a = acc[:, :domain_size]
    b = acc[:, domain_size:]
    return a, b


@functools.partial(jax.jit, static_argnames=("log_n", "fast"))
def _quotient_scalars_impl(a, b, log_n: int, fast: bool):
    F = fr()
    mul = kernels.fr_mont_mul()
    f = ntt_fast if fast else ntt
    c = mul(a, b)
    a2 = to_odd_coset(a, log_n, f)
    b2 = to_odd_coset(b, log_n, f)
    c2 = to_odd_coset(c, log_n, f)
    h = F.sub(mul(a2, b2), c2)
    return mul(h, _h_scale_std(log_n)[:, None] + jnp.zeros_like(h))


def _ntt_mode() -> str:
    """'fast' (VMEM-resident cg kernels) or 'base' (per-stage passes).
    ULTRAGROTH_NTT overrides; default fast only on a real TPU (the flat
    cg graphs are XLA-CPU-compile heavy, and interpret mode covers them
    in dedicated tests)."""
    import os
    env = os.environ.get("ULTRAGROTH_NTT")
    if env in ("fast", "base"):
        return env
    from .fuse import _interpret, _use_pallas
    return "fast" if (_use_pallas() and not _interpret()) else "base"


_FAST_QUOTIENT_BROKEN = False


def quotient_scalars(a, b, log_n: int):
    """Montgomery-domain (a, b) evals -> standard-form H MSM scalars.

    Parity with the oracle quotient_evals (protocol/quotient.py): evaluate
    h = (A*B - C) on the odd coset and fold in the R^-2 wire scale, fused
    into the final multiply.  Uses the ntt_fast kernel path on TPU with a
    one-shot fallback to the per-stage NTT if the kernels fail to lower
    (Mosaic ceilings are probed empirically; see _CG_KERNEL_MAX_LOG).
    """
    global _FAST_QUOTIENT_BROKEN
    if _ntt_mode() == "fast" and not _FAST_QUOTIENT_BROKEN:
        try:
            return _quotient_scalars_impl(a, b, log_n, fast=True)
        except Exception:  # noqa: BLE001 - Mosaic lowering/compile failure
            _FAST_QUOTIENT_BROKEN = True
    return _quotient_scalars_impl(a, b, log_n, fast=False)
