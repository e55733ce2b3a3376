"""Mesh-sharded Fr NTT: the 4-step (Bailey) decomposition.

Replaces the reference's shared-memory FFT<Fr> (SURVEY.md section 2.11) for
domains that out-scale one chip.  n = n1 * n2 with the n1 axis sharded:

  view x[j] as M[j1, j2], j = j1 + n1*j2          (rows j1 sharded)
  1. local NTT of size n2 along each row
  2. local twiddle multiply by w_n^(j1*k2)
  3. all_to_all row<->column exchange over ICI
  4. local NTT of size n1 along each row of the transposed view
  output read-out: X[k2*n1 + k1] -> returned in natural order

All math stays in the Montgomery domain on limb planes; the only cross-chip
traffic is the one transpose (n * 64B over ICI).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..constants import FR_MODULUS
from ..protocol.transcript import root_of_unity
from ..ops.field import fr
from ..ops.limbs import NLIMBS
from ..ops import ntt as base_ntt
from .mesh import axis_size

L = NLIMBS


def _row_powers(F, bases, m: int):
    """bases: [L, rows] -> powers [L, rows, m]: bases[r]^k for k < m."""
    p = F.one_mont(bases.shape[1:] + (1,))
    cur = bases[..., None]
    while p.shape[-1] < m:
        p = jnp.concatenate([p, F.mont_mul(p, cur)], axis=-1)
        cur = F.mont_sqr(cur)
    return p[..., :m]


def _batched_ntt(a, log_m: int, inverse: bool):
    """NTT along the LAST axis of [L, rows, m] Montgomery planes."""
    from ..ops import kernels
    F = fr()
    m = 1 << log_m
    a = a[..., base_ntt._bitrev_perm(log_m)]
    tw = base_ntt._stage_twiddles(log_m, inverse)
    rows = a.shape[1]
    butterfly = kernels.fr_butterfly()
    for s in range(1, log_m + 1):
        half = 1 << (s - 1)
        blocks = m >> s
        v = a.reshape(L, rows, blocks, 2, half)
        u = v[..., 0, :].reshape(L, rows * blocks * half)
        w_in = v[..., 1, :].reshape(L, rows * blocks * half)
        twf = jnp.broadcast_to(tw[s - 1][:, None, None, :],
                               (L, rows, blocks, half)
                               ).reshape(L, rows * blocks * half)
        hi, lo = butterfly(u, w_in, twf)
        shp = (L, rows, blocks, half)
        a = jnp.stack([hi.reshape(shp), lo.reshape(shp)],
                      axis=-2).reshape(L, rows, m)
    if inverse:
        a = kernels.fr_mont_mul()(
            a.reshape(L, rows * m),
            base_ntt._n_inv_mont(log_m)[:, None] + jnp.zeros((L, rows * m),
                                                             a.dtype)
        ).reshape(L, rows, m)
    return a


@functools.lru_cache(maxsize=None)
def _ntt_sharded_fn(log_n: int, mesh: Mesh, axis, inverse: bool):
    """ONE jitted shard_map program per (log_n, mesh, axis, inverse).

    jit-wrapped and cached for the same reason as parallel.msm's builder:
    an eager shard_map executes op-by-op (one tiny multi-device compile
    per add/mul), and a per-call closure retraces on every NTT pass —
    a sharded quotient runs six of these."""
    F = fr()
    ndev = axis_size(mesh, axis)
    log_n1 = max((log_n // 2), (ndev - 1).bit_length())
    log_n2 = log_n - log_n1
    n1, n2 = 1 << log_n1, 1 << log_n2
    assert n1 % ndev == 0, (n1, ndev)

    # Warm the lru-cached twiddle tables OUTSIDE the shard_map region:
    # cache entries first created inside a shard_map trace would capture
    # ShardMapTracers and poison every later (non-sharded) NTT call.
    base_ntt._stage_twiddles(log_n1, inverse)
    base_ntt._stage_twiddles(log_n2, inverse)
    if inverse:
        base_ntt._n_inv_mont(log_n1)
        base_ntt._n_inv_mont(log_n2)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, axis, None), P(None, axis)),
        out_specs=P(None, axis, None), check_vma=False)
    def run(m_local, bases_local):
        # step 1: size-n2 NTT along rows (local)
        h = _batched_ntt(m_local, log_n2, inverse)
        # step 2: twiddle w_n^(j1 * k2)
        from ..ops import kernels
        tw = _row_powers(F, bases_local, n2)
        rows_l = h.shape[1]
        h = kernels.fr_mont_mul()(
            h.reshape(L, rows_l * n2), tw.reshape(L, rows_l * n2)
        ).reshape(L, rows_l, n2)
        # step 3: distributed transpose: split the k2 axis across devices,
        # gather the full j1 axis locally -> [L, n1, n2/D] -> [L, n2/D, n1]
        h = jax.lax.all_to_all(h, axis, split_axis=2, concat_axis=1,
                               tiled=True)
        h = jnp.moveaxis(h, 1, 2)
        # step 4: size-n1 NTT along the last (j1 -> k1) axis; the two
        # inverse passes scale by 1/n2 and 1/n1 = 1/n total.
        return _batched_ntt(h, log_n1, inverse)

    return run, log_n1, log_n2


def ntt_sharded(a, log_n: int, mesh: Mesh, axis="data",
                inverse: bool = False):
    """[L, n] Montgomery planes -> NTT, n1 axis sharded over mesh[axis].

    axis: a mesh-axis name or a tuple of names (e.g. ('host', 'chip')):
    the transpose's all_to_all flattens over the product — on a pod slice
    put the fast axis last so the bulk of the exchange rides ICI."""
    if isinstance(axis, list):
        axis = tuple(axis)
    run, log_n1, log_n2 = _ntt_sharded_fn(log_n, mesh, axis, inverse)
    n1, n2 = 1 << log_n1, 1 << log_n2

    F = fr()
    w = root_of_unity(log_n)
    if inverse:
        w = pow(w, -1, FR_MODULUS)
    # per-row twiddle bases w_n^(j1), j1 global row index: precompute [L, n1]
    with jax.ensure_compile_time_eval():
        row_bases = base_ntt._powers(F, w, n1)

    m = a.reshape(L, n2, n1).transpose(0, 2, 1)      # M[j1, j2]
    out = run(m, jnp.asarray(row_bases))             # [L, n2 (sharded), n1]
    # out[:, k2, k1] = X[k2 + n2*k1] -> natural order via transpose
    return out.transpose(0, 2, 1).reshape(L, 1 << log_n)


def to_odd_coset_sharded(vals, log_n: int, mesh: Mesh, axis="data"):
    """Sharded twin of ops.ntt.to_odd_coset: ifft -> w_{2n}^i -> fft."""
    from ..ops import kernels
    coeffs = ntt_sharded(vals, log_n, mesh, axis, inverse=True)
    shifted = kernels.fr_mont_mul()(coeffs, base_ntt._coset_powers(log_n))
    return ntt_sharded(shifted, log_n, mesh, axis)


def quotient_scalars_sharded(a, b, log_n: int, mesh: Mesh,
                             axis="data"):
    """Sharded twin of ops.ntt.quotient_scalars: the six NTT passes of the
    H(x) pipeline (parity: /root/reference/src/groth16.cpp:110-148) run as
    4-step mesh NTTs; the elementwise combines stay fused XLA ops."""
    from ..ops import kernels
    F = fr()
    mul = kernels.fr_mont_mul()
    c = mul(a, b)
    a2 = to_odd_coset_sharded(a, log_n, mesh, axis)
    b2 = to_odd_coset_sharded(b, log_n, mesh, axis)
    c2 = to_odd_coset_sharded(c, log_n, mesh, axis)
    h = F.sub(mul(a2, b2), c2)
    scale = base_ntt._h_scale_std(log_n)[:, None] + jnp.zeros_like(h)
    return mul(h, scale)
