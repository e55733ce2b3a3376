"""Multi-scalar multiplication (Pippenger) on TPU, G1 and G2.

Re-design of the ffiasm bucket MSM (behavioral contract at
/root/reference/src/groth16.cpp:55-64,154: Curve::multiMulByScalarMSM with
raw little-endian scalars).  The CPU reference chases pointers into
mutex-striped buckets; here everything is data-parallel and scatter-free:

  1. window digits  - scalars are 16-bit limb planes, so a 16-bit window's
                      digits ARE one limb plane (other widths: shift/mask);
  2. bucket accumulation - sort point indices by digit, then a segmented
                      Hillis-Steele scan whose combine is the batched
                      complete XYZZ add; runs log2(max bucket size) rounds
                      (lax.while_loop), each a full-width VPU pass;
  3. bucket reduction - suffix sums + total, each a roll-based
                      Hillis-Steele pass: sum_b b*B_b;
  4. window combine - Horner with c doublings per window (lax.scan).

Every loop is traced ONCE (lax.scan / lax.while_loop / fori_loop) - the
whole MSM lowers to a compact graph regardless of size, which keeps both
XLA compile time and TPU scheduling sane.

Scalars are STANDARD form (wtns convention); points are Montgomery-form
affine planes (zkey convention) - same domain split as the reference.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .curve import CurveOps, g1_ops, g2_ops
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


def _segmented_scan(ops: CurveOps, acc, seg):
    """Inclusive segmented scan: acc[i] = sum of the same-segment run ending
    at i.  Hillis-Steele with offset doubling; stops once the offset exceeds
    the longest bucket run (data-dependent trip count, static shapes)."""
    n = seg.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), jnp.bool_), seg[1:] != seg[:-1]])
    run_start = jax.lax.associative_scan(jnp.maximum,
                                         jnp.where(is_start, idx, -1))
    max_run = jnp.max(idx - run_start) + 1

    def cond(state):
        return state[0] < max_run

    def body(state):
        offset, acc = state
        shifted = _tree_map(lambda a: jnp.roll(a, offset, axis=-1), acc)
        ok = (idx >= offset) & (seg == jnp.roll(seg, offset))
        acc = ops.select(ok, ops.add_unified(acc, shifted), acc)
        return (offset * 2, acc)

    _, acc = jax.lax.while_loop(cond, body, (jnp.int32(1), acc))
    return acc


def _bucket_sums(ops: CurveOps, acc, seg, n_buckets: int):
    """Scatter per-segment totals (at run ends) into a bucket-indexed array.

    Non-end rows are dumped into bucket 0, which Pippenger ignores anyway
    (digit 0 contributes nothing); empty buckets read as infinity."""
    is_end = jnp.concatenate([seg[:-1] != seg[1:], jnp.ones((1,), jnp.bool_)])
    tgt = jnp.where(is_end, seg, 0).astype(jnp.int32)

    def scatter(leaf):
        buckets = jnp.zeros(leaf.shape[:-1] + (n_buckets,), leaf.dtype)
        return buckets.at[..., tgt].set(leaf, mode="drop")

    buckets = _tree_map(scatter, acc)
    present = jnp.zeros((n_buckets,), jnp.bool_).at[tgt].set(is_end)
    return ops.select(present, buckets, ops.inf_xyzz((n_buckets,)))


def _hs_suffix(ops: CurveOps, pts, m: int):
    """suffix[i] = sum_{j >= i} pts[j] via Hillis-Steele (roll + mask)."""
    idx = jnp.arange(m, dtype=jnp.int32)

    def cond(state):
        return state[0] < m

    def body(state):
        k, s = state
        shifted = _tree_map(lambda t: jnp.roll(t, -k, axis=-1), s)
        ok = (idx + k) < m
        s = ops.select(ok, ops.add_unified(s, shifted), s)
        return (k * 2, s)

    _, s = jax.lax.while_loop(cond, body, (jnp.int32(1), pts))
    return s


def _weighted_bucket_total(ops: CurveOps, buckets, n_buckets: int):
    """sum_{b>=1} b * B_b = sum of the suffix sums over b = 1..B-1."""
    m = n_buckets - 1
    body = _tree_map(lambda t: t[..., 1:], buckets)
    suffix = _hs_suffix(ops, body, m)
    totals = _hs_suffix(ops, suffix, m)     # totals[0] = sum_i suffix[i]
    return _tree_map(lambda t: t[..., 0], totals)


def _msm(ops: CurveOps, x, y, inf, scalars, c: int, n_windows: int):
    n_buckets = 1 << c
    digits_all = jnp.stack([_window_digits(scalars, w, c)
                            for w in range(n_windows)])     # [W, N]

    def window_body(_, digits):
        perm = jnp.argsort(digits)
        seg = digits[perm]
        gx = _tree_map(lambda a: a[:, perm], x)
        gy = _tree_map(lambda a: a[:, perm], y)
        ginf = inf[perm] | (seg == 0)
        acc = ops.affine_to_xyzz(gx, gy, ginf)
        acc = _segmented_scan(ops, acc, seg)
        buckets = _bucket_sums(ops, acc, seg, n_buckets)
        return None, _weighted_bucket_total(ops, buckets, n_buckets)

    _, wsums = jax.lax.scan(window_body, None, digits_all)  # leaves [W, L]

    def horner_body(total, wsum):
        total = jax.lax.fori_loop(0, c, lambda i, t: ops.dbl(t), total)
        return ops.add_unified(total, wsum), None

    wsums_rev = _tree_map(lambda t: jnp.flip(t, axis=0), wsums)
    init = ops.inf_xyzz(())
    total, _ = jax.lax.scan(horner_body, init, wsums_rev)
    return total


def default_window(n: int) -> int:
    """Pippenger window size: balances bucket-phase vs reduction cost."""
    if n >= (1 << 18):
        return 16
    if n >= (1 << 12):
        return 12
    return 8


@functools.partial(jax.jit, static_argnames=("c",))
def msm_g1(x, y, inf, scalars, c: int = 16):
    """G1 MSM.  x, y: [L, N] Montgomery Fq planes; inf: [N] bool;
    scalars: [L, N] standard-form Fr planes.  Returns a single xyzz point
    (leaves shaped [L]); normalize with g1_ops().to_affine."""
    n_windows = -(-256 // c)
    return _msm(g1_ops(), x, y, inf, scalars, c, n_windows)


@functools.partial(jax.jit, static_argnames=("c",))
def msm_g2(x, y, inf, scalars, c: int = 16):
    """G2 MSM: x, y are (c0, c1) tuples of [L, N] planes."""
    n_windows = -(-256 // c)
    return _msm(g2_ops(), x, y, inf, scalars, c, n_windows)
