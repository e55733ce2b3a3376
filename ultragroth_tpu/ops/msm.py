"""Multi-scalar multiplication (Pippenger) on TPU, G1 and G2.

Re-design of the ffiasm bucket MSM (behavioral contract at
/root/reference/src/groth16.cpp:55-64,154: Curve::multiMulByScalarMSM with
raw little-endian scalars).  The CPU reference chases pointers into
mutex-striped buckets; here everything is data-parallel and scatter-free:

  1. window digits  - scalars are 16-bit limb planes, so a 16-bit window's
                      digits ARE one limb plane (other widths: shift/mask);
  2. bucket accumulation - ALL-BUCKETS-AND-WINDOWS-PARALLEL: argsort point
                      order by digit (bincount/cumsum for bucket offsets),
                      then while t < max_bucket_size: every (window,
                      bucket) lane adds its t-th point via ONE fused
                      complete-madd kernel of width W * 2^c — the whole
                      MSM is ~N/2^c kernel steps, not ~W * N/2^c (the
                      per-step fixed cost dominated the arithmetic on
                      v5e).  Skewed windows (the top bits of a
                      254-bit scalar take < 2^c distinct values, so naive
                      per-bucket counts explode) are rebalanced by STATIC
                      sub-accumulator splitting: bucket b gets S lanes,
                      lane (b, j) accumulates points j, j+S, ... of b, and
                      the S sub-sums fold in log2(S) pairwise passes - the
                      loop trip count stays ~N/2^c for every window;
  3. bucket reduction - sum_b b*B_b via BINARY DECOMPOSITION: each level
                      pairwise-folds the bucket array (S(V) = 2*S(even+odd)
                      + sum(odd)) and banks the odd half; banked arrays all
                      share the current width, so every level is ONE fused
                      add over [windows x (level+1) x width/2] lanes and the
                      total work is ~2*2^c adds per window (vs 2^c*c for a
                      Hillis-Steele suffix scan), finished by a log2(2^c)-
                      step Horner on [W]-wide lanes;
  4. window combine - Horner with c doublings per window (lax.scan), every
                      doubling a fused add_where(t, t, True) kernel step.

Data layout: the point table is PLANE-MAJOR [K*L+1, N] (all coordinate
limb planes stacked, infinity flags last), so the per-step fetch is one
axis-1 gather whose result feeds the madd kernel directly - measured 3.4x
faster per step than row-major gather + transpose on v5e
(experiments/measure_r2c.log: 0.176 ms vs 0.593 ms per 8192-wide step).

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
import numpy as np

from .curve import CurveOps, g1_ops, g2_ops
from . import kernels
from .limbs import LIMB_BITS, NLIMBS

L = NLIMBS
SCALAR_BITS = 254          # BN254 r bit length


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


def _split_factor(w: int, c: int) -> int:
    """Static sub-accumulator split for window w: scalars < 2^SCALAR_BITS,
    so window w has at most 2^max(0, SCALAR_BITS - c*w) distinct values;
    give each value 2^c / distinct lanes so per-lane counts stay ~N/2^c."""
    hi_bits = SCALAR_BITS - c * w
    if hi_bits >= c:
        return 1
    distinct = 1 << max(0, hi_bits)
    return max(1, (1 << c) // distinct)


def _pack_points_planes(x, y, inf):
    """Stack all coordinate planes + infinity flags into ONE plane-major
    array [K*L + 1, N]; the bucket loop's per-step fetch is then a single
    axis-1 gather feeding the madd kernel without any transpose."""
    leaves = jax.tree_util.tree_leaves(x) + jax.tree_util.tree_leaves(y)
    rows = list(leaves) + [inf.astype(jnp.uint32)[None, :]]
    rows = [r if r.ndim == 2 else r[None] for r in rows]
    return jnp.concatenate(
        [r.reshape(-1, r.shape[-1]) for r in rows], axis=0)


def _unpack_cols(cols, x_like, y_like):
    """[K*L+1, B] gathered columns -> (x planes, y planes, inf) batch."""
    xs = jax.tree_util.tree_leaves(x_like)
    nx = len(xs)
    out_leaves = [cols[k * L:(k + 1) * L] for k in range(2 * nx)]
    x = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(x_like), out_leaves[:nx])
    y = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(y_like), out_leaves[nx:])
    inf = cols[2 * nx * L] != 0
    return x, y, inf


def _bucket_accumulate_all(ops: CurveOps, madd, packed, x_like, y_like,
                           orders, counts, c: int, splits):
    """Bucket accumulation for ALL windows in ONE while_loop.

    orders/counts: [W, N] digit-argsorted point order and [W, 2^c] per-digit
    counts.  splits: static per-window sub-accumulator factors
    (_split_factor) — lane (w, b*S_w + j) accumulates points j, j+S_w, ...
    of window w's bucket b, so skewed top windows don't stretch the trip
    count.  Every window has exactly 2^c lanes regardless of its split, so
    the whole MSM runs max_count fused madd steps of width W * 2^c — one
    kernel launch and ONE plane-gather per step instead of one per window
    (the per-step fixed cost, not the arithmetic, dominated the per-window
    variant: experiments/measure_r2e.log).

    Returns raw xyzz sub-lane accumulators, leaves [L, W, 2^c]
    (sub-lane folding is per-split-group, done by the caller).
    """
    n_buckets = 1 << c
    n_windows, n = orders.shape
    offsets = jnp.concatenate(
        [jnp.zeros((n_windows, 1), jnp.int32),
         jnp.cumsum(counts, axis=1)[:, :-1].astype(jnp.int32)], axis=1)

    lane = jnp.arange(n_buckets, dtype=jnp.int32)[None, :]
    split_w = jnp.asarray(splits, jnp.int32)[:, None]        # [W, 1]
    d = lane // split_w                                      # [W, 2^c]
    j = lane % split_w
    base = jnp.take_along_axis(offsets, d, axis=1) + j
    # bucket 0 contributes nothing (digit 0) and collects every zero-scalar
    # / padding point - accumulating it would stretch the loop trip count
    cnt = jnp.take_along_axis(counts.astype(jnp.int32), d, axis=1)
    cnt = jnp.maximum(cnt - j + split_w - 1, 0) // split_w
    cnt = jnp.where(d == 0, 0, cnt)
    max_count = jnp.max(cnt)

    w_off = (jnp.arange(n_windows, dtype=jnp.int32) * n)[:, None]
    orders_f = orders.reshape(-1)
    acc0 = ops.inf_xyzz((n_windows * n_buckets,))

    def cond(st):
        return st[0] < max_count

    def body(st):
        t, acc = st
        pos = base + t * split_w
        valid = t < cnt
        pidx = orders_f[(w_off + jnp.where(valid, pos, 0)).reshape(-1)]
        gx, gy, ginf = _unpack_cols(packed[:, pidx], x_like, y_like)
        ginf = ginf | ~valid.reshape(-1)
        return (t + 1, madd(acc, gx, gy, ginf))

    _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), acc0))
    return _tree_map(
        lambda t: t.reshape(t.shape[:-1] + (n_windows, n_buckets)), acc)


def _add_all(add_where, a, b):
    """Unconditional complete add of two xyzz trees of ANY leaf rank
    [L, ...], flattened to [L, width] and padded onto a factor-4 width
    ladder (1024, 4096, ...).

    Every distinct Pallas call shape is a separate multi-minute Mosaic
    compile through the remote relay; the reduction tree naturally
    produces ~25 distinct widths per MSM.  The ladder collapses them to
    <= 5 shared kernel shapes for <= 15 ms of padded-lane overhead.  Pad
    lanes are ok=False: the kernel computes garbage there and the select
    discards it.  The rolled fallback (CPU tests) skips the padding —
    there it would multiply tiny-op RUNTIME by the pad factor instead of
    saving kernel compiles.
    """
    from .fuse import _use_pallas
    leaves = jax.tree_util.tree_leaves(a)
    shape = leaves[0].shape
    nw = 1
    for d in shape[1:]:
        nw *= d
    if not _use_pallas():
        flat0 = lambda t: t.reshape(t.shape[0], nw)
        out = add_where(_tree_map(flat0, a), _tree_map(flat0, b),
                        jnp.ones((nw,), bool))
        return _tree_map(lambda t: t.reshape(shape), out)
    pw = 1024
    while pw < nw:
        pw *= 4
    flat = lambda t: jnp.pad(t.reshape(t.shape[0], nw), ((0, 0), (0, pw - nw)))
    ok = jnp.arange(pw) < nw
    out = add_where(_tree_map(flat, a), _tree_map(flat, b), ok)
    return _tree_map(lambda t: t[..., :nw].reshape(shape), out)


def _fold_pairs(add_where, acc):
    """xyzz leaves [..., 2m] -> [..., m]: lane i = acc[2i] + acc[2i+1]."""
    a = _tree_map(lambda t: t[..., 0::2], acc)
    b = _tree_map(lambda t: t[..., 1::2], acc)
    return _add_all(add_where, a, b)


def _level_fold(add_where, arrays, w: int, u: int):
    """Pairwise-fold each xyzz tree in `arrays` (leaves [L, w, u], same u)
    along the last axis, all in ONE fused add pass."""
    k = len(arrays)
    cat = _tree_map(lambda *ts: jnp.concatenate(ts, axis=1), *arrays)
    ev = _tree_map(lambda t: t[..., 0::2], cat)
    od = _tree_map(lambda t: t[..., 1::2], cat)
    out = _add_all(add_where, ev, od)        # leaves [L, k*w, u//2]
    return [_tree_map(lambda t, i=i: t[:, i * w:(i + 1) * w, :], out)
            for i in range(k)]


def _weighted_totals(ops: CurveOps, add_where, buckets, n_buckets: int):
    """sum_{b>=1} b * B_b per window, by binary decomposition.

    buckets: xyzz leaves [L, Wg, 2^c']; returns totals leaves [L, Wg].  Identity: S(V) = 2*S(E + O) + sum(O)
    with E/O the even/odd-indexed halves; the banked odd halves are folded
    alongside the main array (all widths agree per level), so the whole
    reduction is log2(2^c') fused adds of geometrically shrinking width
    (~2 * 2^c' lane-adds per window total) plus a [Wg]-wide Horner.
    """
    wg = jax.tree_util.tree_leaves(buckets)[0].shape[1]
    cur = buckets                   # leaves [L, Wg, m]
    pend = []                       # pend[l]: weight 2^l, plain-sum banked
    u = n_buckets
    while u > 1:
        odd = _tree_map(lambda t: t[..., 1::2], cur)
        folded = _level_fold(add_where, [cur] + pend, wg, u)
        cur, pend = folded[0], folded[1:]
        pend.append(odd)
        u //= 2
    # all pend widths are 1; Horner over the 2^l weights, [Wg]-wide lanes.
    # dbl(t) == add_where(t, t, True): the complete unified add takes its
    # cond-gated doubling branch, and the FUSED kernel replaces what was a
    # ~2 * log2(m) chain of rolled tiny-op graphs per group.
    sq = lambda p: _tree_map(lambda t: t[..., 0], p)
    k = len(pend)
    if k == 1:
        return sq(pend[0])
    # fori_loop so the 2 fused adds are traced ONCE, not once per level
    # (each extra call site is another minutes-long Mosaic instance
    # compile through the relay, and a fresh XLA-CPU graph on fallback)
    stacked = _tree_map(lambda *ts: jnp.stack([t[..., 0] for t in ts]),
                        *pend)                        # leaves [k, L, Wg]

    def tail(i, total):
        lvl = _tree_map(lambda t: t[k - 2 - i], stacked)
        return _add_all(add_where, _add_all(add_where, total, total), lvl)

    return jax.lax.fori_loop(0, k - 1, tail, sq(pend[-1]))


def _msm(ops: CurveOps, group: str, x, y, inf, scalars, c: int,
         n_windows: int):
    n_buckets = 1 << c
    madd = kernels.curve_madd_valid(group)
    add_where = kernels.curve_add_where(group)
    packed = _pack_points_planes(x, y, inf)
    splits = [_split_factor(w, c) for w in range(n_windows)]

    digits = jnp.stack([_window_digits(scalars, w, c)
                        for w in range(n_windows)]).astype(jnp.int32)
    # batched sort across all windows (one lax.sort is ~2.5x the cost of a
    # batch of 32: experiments/measure_r2b.log)
    orders = jnp.argsort(digits, axis=1).astype(jnp.int32)
    counts = jax.vmap(
        functools.partial(jnp.bincount, length=n_buckets))(digits)

    acc = _bucket_accumulate_all(ops, madd, packed, x, y, orders, counts,
                                 c, splits)              # [L, W, 2^c]

    # per split-group: fold sub-lanes, then the batched weighted reduction
    groups: dict[int, list[int]] = {}
    for w in range(n_windows):
        groups.setdefault(splits[w], []).append(w)

    wsums = [None] * n_windows   # xyzz leaves [L]
    for split, ws in groups.items():
        g = _tree_map(lambda t: t[..., np.asarray(ws), :], acc)
        for _ in range(split.bit_length() - 1):
            g = _fold_pairs(add_where, g)
        totals = _weighted_totals(
            ops, add_where, g, n_buckets // split)       # leaves [L, Wg]
        for i, w in enumerate(ws):
            wsums[w] = _tree_map(lambda t, i=i: t[..., i], totals)

    # window combine: Horner with c fused doublings per window.  Rolled
    # single-point dbl chains were the dominant MSM cost on TPU (hundreds
    # of tiny sequential device ops); _add_all(t, t) runs each doubling as
    # ONE fused kernel step instead (same kernel shape as the folds).

    def horner_body(total, wsum):
        total = jax.lax.fori_loop(
            0, c, lambda i, t: _add_all(add_where, t, t), total)
        return _add_all(add_where, total,
                        _tree_map(lambda t: t[:, None], wsum)), None

    stacked = _tree_map(lambda *ts: jnp.stack(ts), *wsums[::-1])
    init = ops.inf_xyzz((1,))
    total, _ = jax.lax.scan(horner_body, init, stacked)
    return _tree_map(lambda t: t[..., 0], total)


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
    return _msm(g1_ops(), "g1", x, y, inf, scalars, c, -(-SCALAR_BITS // c))


@functools.partial(jax.jit, static_argnames=("c",))
def _msm_g2_padded(x, y, inf, scalars, c: int):
    return _msm(g2_ops(), "g2", x, y, inf, scalars, c, -(-SCALAR_BITS // c))


def msm_g1(x, y, inf, scalars, c: int = 16):
    """G1 MSM.  x, y: [L, N] Montgomery Fq planes; inf: [N] bool;
    scalars: [L, N] standard-form Fr planes.  Returns a single xyzz point
    (leaves shaped [L]); normalize with g1_ops().to_affine."""
    return _msm_g1_padded(*_pad_pow2(x, y, inf, scalars), c=c)


def msm_g2(x, y, inf, scalars, c: int = 16):
    """G2 MSM: x, y are (c0, c1) tuples of [L, N] planes."""
    return _msm_g2_padded(*_pad_pow2(x, y, inf, scalars), c=c)
