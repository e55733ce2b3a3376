"""Multi-scalar multiplication (Pippenger) on TPU, G1 and G2.

Re-design of the ffiasm bucket MSM (behavioral contract at
/root/reference/src/groth16.cpp:55-64,154: Curve::multiMulByScalarMSM with
raw little-endian scalars).  The CPU reference chases pointers into
mutex-striped buckets; here everything is data-parallel and scatter-free:

  1. window digits  - scalars are 16-bit limb planes, so a 16-bit window's
                      digits ARE one limb plane (other widths: shift/mask);
  2. bucket accumulation - ALL-BUCKETS-PARALLEL: sort point order by digit
                      once (argsort + bincount/cumsum for bucket offsets),
                      then while t < max_bucket_size: every bucket b adds
                      its t-th point via ONE fused complete-madd kernel of
                      width 2^c.  Work is O(N * imbalance-slack) adds - not
                      the O(N log N) of a segmented scan - and each step is
                      a full-width VPU pass;
  3. bucket reduction - suffix sums + total, roll-based Hillis-Steele with
                      the fused add-where kernel: sum_b b*B_b;
  4. window combine - Horner with c doublings per window (lax.scan).

Every loop is traced ONCE (lax.scan / lax.while_loop) and every combine is
a single fused Pallas kernel on TPU (ops/kernels.py), so both compile time
and HBM traffic stay sane.

Scalars are STANDARD form (wtns convention); points are Montgomery-form
affine planes (zkey convention) - same domain split as the reference.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .curve import CurveOps, g1_ops, g2_ops
from . import kernels
from .limbs import LIMB_BITS, NLIMBS

L = NLIMBS


def _tree_map(fn, *pts):
    return jax.tree_util.tree_map(fn, *pts)


def _window_digits(scalars, w: int, c: int):
    """Digit (bits [w*c, w*c+c)) of each scalar; scalars: [L, N] u32."""
    if c == LIMB_BITS:
        return scalars[w]
    bit0 = w * c
    limb, off = divmod(bit0, LIMB_BITS)
    d = scalars[limb] >> off
    take = LIMB_BITS - off
    if take < c and limb + 1 < L:
        d = d | (scalars[limb + 1] << take)
    return d & jnp.uint32((1 << c) - 1)


def _pack_points_rows(x, y, inf):
    """Pack (x, y, inf) into ONE row-major array [N, K*L + 1] so the bucket
    loop issues a single gather per step (TPU gathers are ~3 ms per 8K rows
    regardless of row width - one wide gather beats several narrow ones)."""
    leaves = jax.tree_util.tree_leaves(x) + jax.tree_util.tree_leaves(y)
    cols = [a.T for a in leaves] + [inf.astype(jnp.uint32)[:, None]]
    return jnp.concatenate(cols, axis=1), len(leaves)


def _unpack_rows(rows, x_like, y_like):
    """[B, K*L+1] gathered rows -> (x planes, y planes, inf) batch."""
    rt = rows.T
    xs = jax.tree_util.tree_leaves(x_like)
    k = 0
    out_leaves = []
    for _ in range(len(xs) * 2):
        out_leaves.append(rt[k * L:(k + 1) * L])
        k += 1
    nx = len(xs)
    x = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(x_like), out_leaves[:nx])
    y = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(y_like), out_leaves[nx:])
    inf = rt[2 * nx * L] != 0
    return x, y, inf


def _bucket_accumulate(ops: CurveOps, madd, packed, x_like, y_like, digits,
                       n_buckets: int):
    """One fused madd per "row": bucket b accumulates its t-th point.

    `packed` is the row-major combined point table (see _pack_points_rows):
    the per-step gather walks the MAJOR axis once and a cheap transpose
    feeds the limb-major madd kernel.

    Returns the [n_buckets] xyzz bucket sums (bucket 0 = garbage, unused).
    """
    order = jnp.argsort(digits).astype(jnp.int32)
    counts = jnp.bincount(digits.astype(jnp.int32), length=n_buckets)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)[:-1]])
    # bucket 0 contributes nothing (digit 0) and collects every zero-scalar
    # / padding point - accumulating it would stretch max_count (and thus
    # the loop trip count) to the padding size
    counts = counts.at[0].set(0)
    max_count = jnp.max(counts)

    acc0 = ops.inf_xyzz((n_buckets,))

    def cond(st):
        return st[0] < max_count

    def body(st):
        t, acc = st
        pos = offsets + t
        valid = t < counts
        pidx = order[jnp.where(valid, pos, 0)]
        gx, gy, ginf = _unpack_rows(packed[pidx], x_like, y_like)
        ginf = ginf | ~valid
        return (t + 1, madd(acc, gx, gy, ginf))

    _, acc = jax.lax.while_loop(cond, body, (jnp.zeros((), counts.dtype),
                                             acc0))
    return acc


def _hs_suffix(ops: CurveOps, add_where, pts, m: int):
    """suffix[i] = sum_{j >= i} pts[j] via Hillis-Steele (roll + mask)."""
    idx = jnp.arange(m, dtype=jnp.int32)

    def cond(state):
        return state[0] < m

    def body(state):
        k, s = state
        shifted = _tree_map(lambda t: jnp.roll(t, -k, axis=-1), s)
        ok = (idx + k) < m
        return (k * 2, add_where(s, shifted, ok))

    _, s = jax.lax.while_loop(cond, body, (jnp.int32(1), pts))
    return s


def _weighted_bucket_total(ops, add_where, buckets, n_buckets: int):
    """sum_{b>=1} b * B_b = sum of the suffix sums over b = 1..B-1."""
    m = n_buckets - 1
    body = _tree_map(lambda t: t[..., 1:], buckets)
    suffix = _hs_suffix(ops, add_where, body, m)
    totals = _hs_suffix(ops, add_where, suffix, m)   # totals[0] = sum_i
    return _tree_map(lambda t: t[..., 0], totals)


def _msm(ops: CurveOps, group: str, x, y, inf, scalars, c: int,
         n_windows: int):
    n_buckets = 1 << c
    madd = kernels.curve_madd_valid(group)
    add_where = kernels.curve_add_where(group)
    digits_all = jnp.stack([_window_digits(scalars, w, c)
                            for w in range(n_windows)])     # [W, N]
    # one combined row-major table, packed once, reused by every window
    packed, _ = _pack_points_rows(x, y, inf)

    def window_body(_, digits):
        buckets = _bucket_accumulate(ops, madd, packed, x, y, digits,
                                     n_buckets)
        return None, _weighted_bucket_total(ops, add_where, buckets,
                                            n_buckets)

    _, wsums = jax.lax.scan(window_body, None, digits_all)  # leaves [W, L]

    def horner_body(total, wsum):
        total = jax.lax.fori_loop(0, c, lambda i, t: ops.dbl(t), total)
        return ops.add_unified(total, wsum), None

    wsums_rev = _tree_map(lambda t: jnp.flip(t, axis=0), wsums)
    init = ops.inf_xyzz(())
    total, _ = jax.lax.scan(horner_body, init, wsums_rev)
    return total


def default_window(n: int) -> int:
    """Pippenger window size: balances bucket-phase slack (small buckets)
    against reduction cost (many buckets)."""
    if n >= (1 << 22):
        return 16
    if n >= (1 << 16):
        return 13
    if n >= (1 << 12):
        return 10
    return 8


def _pad_pow2(x, y, inf, scalars):
    """Pad N up to the next power of two (>= 64) with infinity points and
    zero scalars, so all same-curve MSMs of one circuit share a single
    compiled graph (compile cost amortization + clean TPU tiling)."""
    n = inf.shape[0]
    size = max(64, 1 << (n - 1).bit_length())
    if size == n:
        return x, y, inf, scalars
    pad = size - n

    def padp(a):
        return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])

    x = _tree_map(padp, x)
    y = _tree_map(padp, y)
    scalars = padp(jnp.asarray(scalars))
    inf = jnp.pad(jnp.asarray(inf), (0, pad), constant_values=True)
    return x, y, inf, scalars


@functools.partial(jax.jit, static_argnames=("c",))
def _msm_g1_padded(x, y, inf, scalars, c: int):
    return _msm(g1_ops(), "g1", x, y, inf, scalars, c, -(-256 // c))


@functools.partial(jax.jit, static_argnames=("c",))
def _msm_g2_padded(x, y, inf, scalars, c: int):
    return _msm(g2_ops(), "g2", x, y, inf, scalars, c, -(-256 // c))


def msm_g1(x, y, inf, scalars, c: int = 16):
    """G1 MSM.  x, y: [L, N] Montgomery Fq planes; inf: [N] bool;
    scalars: [L, N] standard-form Fr planes.  Returns a single xyzz point
    (leaves shaped [L]); normalize with g1_ops().to_affine."""
    return _msm_g1_padded(*_pad_pow2(x, y, inf, scalars), c=c)


def msm_g2(x, y, inf, scalars, c: int = 16):
    """G2 MSM: x, y are (c0, c1) tuples of [L, N] planes."""
    return _msm_g2_padded(*_pad_pow2(x, y, inf, scalars), c=c)
