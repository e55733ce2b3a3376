"""Multi-scalar multiplication (Pippenger) on TPU, G1 and G2.

Re-design of the ffiasm bucket MSM (behavioral contract at
/root/reference/src/groth16.cpp:55-64,154: Curve::multiMulByScalarMSM with
raw little-endian scalars).  The CPU reference chases pointers into
mutex-striped buckets; here everything is data-parallel and scatter-free:

  1. signed digits  - windowed-NAF recode: digit d (+running carry) maps
                      to +/-bucket with bucket <= 2^(c-1), HALVING the
                      bucket count (same trick as ZPrize MSMs; negating an
                      affine point is a masked y := p - y inside the madd
                      kernel).  Magnitude distribution is near-uniform, so
                      per-bucket count slack (max/avg, the idle-lane factor
                      of the unified loop below) also drops;
  2. bucket accumulation - ALL-BUCKETS-AND-WINDOWS-PARALLEL: sort point
                      order by bucket (bincount/cumsum for bucket offsets),
                      then every (window, bucket) lane adds its t-th point
                      per step via ONE fused INCOMPLETE signed-madd kernel
                      of width W * 2^(c-1), with flagged lanes (dup point/
                      cancellation) redone through the complete kernel
                      under a rare lax.cond — the whole MSM is ~2N/2^c
                      kernel steps (the per-step fixed cost dominated the
                      arithmetic on v5e).  TWO-PHASE: all lanes run to the
                      (lanes/8)-th largest count, then just the heavy
                      lanes drain their tails at 1/8 width — lane-steps
                      ~= avg count, not max count (Poisson slack gone).
                      Skewed windows (the top bits of a 254-bit scalar
                      take few distinct values, so naive per-bucket counts
                      explode) are rebalanced by STATIC sub-accumulator
                      splitting: bucket b gets S lanes, lane (b, j)
                      accumulates points j, j+S, ... of b, and the S
                      sub-sums fold in log2(S) pairwise passes - the loop
                      trip count stays ~2N/2^c for every window;
  3. bucket reduction - sum_i (i+1)*B_i via BINARY DECOMPOSITION: each
                      level pairwise-folds the bucket array
                      (S'(V) = 2*S'(even+odd) - sum(even)) and banks the
                      NEGATED even half; banked arrays all share the
                      current width, so every level is ONE fused add over
                      [windows x (level+1) x width/2] lanes and the total
                      work is ~2*2^(c-1) adds per window (vs 2^c*c for a
                      Hillis-Steele suffix scan), finished by a
                      log2-width-step Horner on [W]-wide lanes;
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

from ..constants import FR_MODULUS
from .curve import CurveOps, g1_ops, g2_ops
from . import kernels
from .limbs import LIMB_BITS, LIMB_MASK as MASK, NLIMBS

L = NLIMBS
SCALAR_BITS = 254          # BN254 r bit length


def _tree_map(fn, *pts):
    return jax.tree_util.tree_map(fn, *pts)


def _lazy_kernels() -> bool:
    """True when the Fq curve kernels emit LAZY [0, 2p) representatives
    (ULTRAGROTH_LAZY=1 on a kernel-path backend; ops/field.lazy_enabled).
    The MSM then (a) negates banked bucket halves with the lazy-domain
    sub and (b) canonicalizes its final point, so nothing lazy ever
    escapes to rolled-op consumers (to_affine, prover combinations)."""
    from .field import lazy_enabled
    from .fuse import _use_pallas
    return lazy_enabled() and _use_pallas()


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


def _signed_digits(scalars, c: int, n_windows: int):
    """Signed window recode (windowed NAF): per window,
    d + carry_in = d' + 2^c * carry_out with d' in [-(2^(c-1) - 1),
    2^(c-1)]; returns (bucket = |d'|, neg = d' < 0), both [W, N].

    The top window never carries out: the caller guarantees it holds
    < c bits (n_windows is bumped when SCALAR_BITS % c == 0), so
    d + carry <= 2^(c-1) there and the `> half` test stays false."""
    half = 1 << (c - 1)
    digits = jnp.stack([_window_digits(scalars, w, c)
                        for w in range(n_windows)]).astype(jnp.int32)

    def body(carry, d):
        d = d + carry
        neg = d > half
        bucket = jnp.where(neg, (1 << c) - d, d)
        return neg.astype(jnp.int32), (bucket, neg)

    _, (buckets, negs) = jax.lax.scan(
        body, jnp.zeros(digits.shape[1:], jnp.int32), digits)
    return buckets, negs


def _split_factor(w: int, c: int) -> int:
    """Static sub-accumulator split for window w.

    Scalars are canonical Fr (< r: the wtns/H-scalar contract), so window
    w's residual value is <= top = (r-1) >> (c*w) and its signed bucket
    index is <= top (bucket <= top + 1 with the recode carry; never
    negative when top + 1 <= 2^(c-1)).  Give each index
    2^(c-1) / next_pow2(top+2) lanes so per-lane counts stay ~2N/2^c —
    e.g. c=13: the top window takes only 49 distinct values (r's leading
    bits), so each gets 64 sub-lanes.  Scalars >= r would overflow the
    representable index range and silently drop points — the canonical-
    form contract is load-bearing."""
    n_buckets = 1 << (c - 1)
    top = (FR_MODULUS - 1) >> (c * w)
    if top + 1 >= n_buckets:
        return 1
    return max(1, n_buckets // (1 << (top + 1).bit_length()))


def _pack_points_planes(x, y):
    """Stack all coordinate planes into ONE plane-major array [K*L, N];
    the bucket loop's per-step fetch is then a single axis-1 gather
    feeding the madd kernel without any transpose.  Infinity table points
    are excluded at the digit stage (sort sentinel), so no flag row rides
    along.

    NOT bit-packed: a two-limbs-per-u32 variant (halving gather bytes)
    was measured at 2x SLOWER full-MSM on v5e (1242.8 ms vs 644.5 ms at
    2^18/c=13, experiments/measure_r3b.log phase B vs queue_r2c.log) —
    TPU random-gather cost is per ROW-INDEX, independent of row width
    (PERF.md "366 ns/row regardless of row width"), so the packing saved
    nothing and the per-step interleave-unpack added a relayout pass."""
    leaves = jax.tree_util.tree_leaves(x) + jax.tree_util.tree_leaves(y)
    rows = [r if r.ndim == 2 else r[None] for r in leaves]
    return jnp.concatenate(
        [r.reshape(-1, r.shape[-1]) for r in rows], axis=0)


def _unpack_cols(cols, x_like, y_like):
    """[K*L, B] gathered columns -> (x planes, y planes) batch."""
    xs = jax.tree_util.tree_leaves(x_like)
    nx = len(xs)
    out_leaves = [cols[k * L:(k + 1) * L] for k in range(2 * nx)]
    x = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(x_like), out_leaves[:nx])
    y = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(y_like), out_leaves[nx:])
    return x, y


def _bucket_accumulate_all(ops: CurveOps, group: str, packed, x_like,
                           y_like, orders, counts, c: int, splits):
    """Bucket accumulation for ALL windows, two-phase.

    orders: [W, N] bucket-argsorted point order, each entry encoded
    pid * 2 + sign (the sign bit rides along so the loop body does ONE
    int gather per step).  counts: [W, 2^(c-1)] per-bucket-index counts
    (index i = bucket i+1; bucket-0 / padding / infinity points are
    excluded upstream via the sort sentinel).  splits: static per-window
    sub-accumulator factors (_split_factor) — lane (w, b*S_w + j)
    accumulates points j, j+S_w, ... of window w's bucket-index b, so
    skewed top windows don't stretch the trip count.

    Step shape: every step is ONE plane-gather + ONE fused INCOMPLETE
    signed madd (curve.madd_fast, ~25% cheaper than the complete form);
    lanes where incompleteness breaks (dup point / cancellation) raise a
    flag and that step is redone through the complete kernel under a
    lax.cond — rare, so the common path never pays for the branch set.
    Lane 0 of each accumulator is seeded with its first point by one
    complete madd, so the in-loop formula never sees an infinity
    accumulator on the common path.

    Two phases kill the Poisson bucket-count slack (max/avg ~1.5x):
    phase A runs every lane to the kb-th largest count (kb = lanes/8),
    then phase B gathers just the kb heaviest lanes and drains their
    tails at 1/8 width, scattering the partial sums back with one
    complete add.  Total lane-steps ~= avg_count * lanes instead of
    max_count * lanes (experiments/measure_r3.log).

    Returns raw xyzz sub-lane accumulators, leaves [L, W, 2^(c-1)]
    (sub-lane folding is per-split-group, done by the caller).
    """
    madd_fast = kernels.curve_madd_fast(group)
    madd_complete = kernels.curve_madd_signed(group)
    n_buckets = 1 << (c - 1)
    n_windows, n = orders.shape
    lanes = n_windows * n_buckets
    offsets = jnp.concatenate(
        [jnp.zeros((n_windows, 1), jnp.int32),
         jnp.cumsum(counts, axis=1)[:, :-1].astype(jnp.int32)], axis=1)

    lane = jnp.arange(n_buckets, dtype=jnp.int32)[None, :]
    split_w = jnp.asarray(splits, jnp.int32)[:, None]        # [W, 1]
    d = lane // split_w                                      # [W, 2^(c-1)]
    j = lane % split_w
    base = jnp.take_along_axis(offsets, d, axis=1) + j
    cnt = jnp.take_along_axis(counts.astype(jnp.int32), d, axis=1)
    cnt = jnp.maximum(cnt - j + split_w - 1, 0) // split_w
    max_count = jnp.max(cnt)

    w_off = (jnp.arange(n_windows, dtype=jnp.int32) * n)[:, None]
    orders_f = orders.reshape(-1)
    gidx0 = (w_off + base).reshape(-1)        # flat orders_f index at t=0
    stride_f = jnp.broadcast_to(split_w, base.shape).reshape(-1)
    cnt_f = cnt.reshape(-1)

    def fetch(pos_f, valid_f):
        ent = orders_f[jnp.where(valid_f, pos_f, 0)]
        gx, gy = _unpack_cols(packed[:, ent >> 1], x_like, y_like)
        return gx, gy, (ent & 1) != 0

    def seed(gidx, stride, cnts, t0, width):
        """Accumulators at step t0: one complete madd from infinity."""
        valid = t0 < cnts
        gx, gy, gneg = fetch(gidx + t0 * stride, valid)
        return madd_complete(ops.inf_xyzz((width,)), gx, gy, ~valid, gneg)

    def drain(acc, gidx, stride, cnts, t_from, t_to):
        """Fast madd steps t_from..t_to-1; STICKY exception flag.

        The hot loop body is the incomplete madd only — no per-step
        branch (a lax.cond inside the while body tripled the XLA compile
        cost and added a per-step sync).  If any lane ever flagged, ONE
        outer cond redoes the whole drain from the same initial state
        with the complete formula: exceptional inputs (duplicate points,
        cancellations) cost 2x, the common case pays nothing.  The flag
        is sound even though post-exception lanes compute garbage — the
        FIRST exceptional step is detected while the accumulator is
        still valid, and the redo discards everything after it."""
        def body_fast(st):
            t, a, fl = st
            valid = t < cnts
            gx, gy, gneg = fetch(gidx + t * stride, valid)
            out, flag = madd_fast(a, gx, gy, gneg, valid)
            return (t + 1, out, fl | jnp.any(flag))

        def body_complete(st):
            t, a = st
            valid = t < cnts
            gx, gy, gneg = fetch(gidx + t * stride, valid)
            return (t + 1, madd_complete(a, gx, gy, ~valid, gneg))

        _, fast_acc, flagged = jax.lax.while_loop(
            lambda st: st[0] < t_to, body_fast,
            (t_from, acc, jnp.bool_(False)))
        return jax.lax.cond(
            flagged,
            lambda: jax.lax.while_loop(lambda st: st[0] < t_to,
                                       body_complete, (t_from, acc))[1],
            lambda: fast_acc)

    acc = seed(gidx0, stride_f, cnt_f, jnp.int32(0), lanes)
    two_phase = lanes > 8192
    end_a = (jnp.minimum(jnp.maximum(jnp.sort(cnt_f)[lanes - lanes // 8],
                                     1), max_count)
             if two_phase else max_count)
    acc = drain(acc, gidx0, stride_f, cnt_f, jnp.int32(1), end_a)

    if two_phase:
        kb = lanes // 8
        _, ids = jax.lax.top_k(cnt_f, kb)
        gidx_b, stride_b, cnt_b = gidx0[ids], stride_f[ids], cnt_f[ids]
        acc_b = seed(gidx_b, stride_b, cnt_b, end_a, kb)
        acc_b = drain(acc_b, gidx_b, stride_b, cnt_b, end_a + 1, max_count)
        extra = _tree_map(
            lambda full, part: full.at[..., ids].set(part),
            ops.inf_xyzz((lanes,)), acc_b)
        add_where = kernels.curve_add_where(group)
        acc = add_where(acc, extra, jnp.ones((lanes,), bool))

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
    """sum_i (i+1) * B_i per window, by binary decomposition.

    buckets: xyzz leaves [L, Wg, m]; returns totals leaves [L, Wg].
    Index i holds bucket i+1 of the signed-digit MSM (bucket 0 never
    enters the accumulator), hence the +1 weights.  Identity:
    S'(V) = 2 * S'(E + O) - sum(E), S'([v]) = v, with E/O the even/odd-
    indexed halves; the banked NEGATED even halves are folded alongside
    the main array (all widths agree per level), so the whole reduction
    is log2(m) fused adds of geometrically shrinking width (~2m
    lane-adds per window total) plus a [Wg]-wide Horner:
    S' = 2^k * cur_k + sum_l 2^l * sum(-E_l).
    """
    wg = jax.tree_util.tree_leaves(buckets)[0].shape[1]
    cur = buckets                   # leaves [L, Wg, m]
    pend = []                       # pend[l]: weight 2^l, neg-even banked
    u = n_buckets
    while u > 1:
        ev_neg = ops.neg(_tree_map(lambda t: t[..., 0::2], cur))
        folded = _level_fold(add_where, [cur] + pend, wg, u)
        cur, pend = folded[0], folded[1:]
        pend.append(ev_neg)
        u //= 2
    # all widths are 1 now; Horner over the 2^l weights, [Wg]-wide lanes.
    # dbl(t) == add_where(t, t, True): the complete unified add takes its
    # cond-gated doubling branch, and the FUSED kernel replaces what was a
    # ~2 * log2(m) chain of rolled tiny-op graphs per group.
    sq = lambda p: _tree_map(lambda t: t[..., 0], p)
    k = len(pend)
    if k == 0:
        return sq(cur)
    # fori_loop so the 2 fused adds are traced ONCE, not once per level
    # (each extra call site is another minutes-long Mosaic instance
    # compile through the relay, and a fresh XLA-CPU graph on fallback)
    stacked = _tree_map(lambda *ts: jnp.stack([t[..., 0] for t in ts]),
                        *pend)                        # leaves [k, L, Wg]

    def tail(i, total):
        lvl = _tree_map(lambda t: t[k - 1 - i], stacked)
        return _add_all(add_where, _add_all(add_where, total, total), lvl)

    return jax.lax.fori_loop(0, k, tail, sq(cur))


def _msm(ops: CurveOps, group: str, x, y, inf, scalars, c: int,
         n_windows: int):
    if SCALAR_BITS % c == 0:
        n_windows += 1      # spare window absorbs the signed-recode carry
    n_buckets = 1 << (c - 1)
    add_where = kernels.curve_add_where(group)
    # under lazy reduction the bucket values are [0, 2p) representatives:
    # the reduction's neg must be the lazy-domain one (kernel view); the
    # plain rolled neg mis-wraps representatives above p
    red_ops = kernels._kernel_curve(group) if _lazy_kernels() else ops
    packed = _pack_points_planes(x, y)
    splits = [_split_factor(w, c) for w in range(n_windows)]

    buckets, negs = _signed_digits(scalars, c, n_windows)
    # bucket b >= 1 -> index b-1 (weight b = index+1 in the reduction);
    # bucket 0 (zero digit / padding) and INFINITY table points ->
    # sentinel, sorts last, excluded from counts so they never stretch
    # the accumulation trip count (and the bucket loop never needs a
    # per-point infinity flag)
    idx = jnp.where(buckets > 0, buckets - 1, n_buckets)
    idx = jnp.where(jnp.asarray(inf)[None, :], n_buckets, idx)
    # batched sort across all windows (one lax.sort is ~2.5x the cost of a
    # batch of 32: experiments/measure_r2b.log); the per-point sign bit is
    # folded into the order VALUES (pid*2+sign, sorted alongside the keys
    # in one lax.sort_key_val) so the loop body gathers once
    n = idx.shape[1]
    enc = (jnp.arange(n, dtype=jnp.int32)[None, :] * 2
           + negs.astype(jnp.int32))                     # [W, N]
    _, orders = jax.lax.sort((idx, enc), dimension=1, num_keys=1)
    counts = jax.vmap(
        functools.partial(jnp.bincount, length=n_buckets + 1))(
            idx)[:, :n_buckets]

    acc = _bucket_accumulate_all(ops, group, packed, x, y, orders, counts,
                                 c, splits)              # [L, W, 2^(c-1)]

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
            red_ops, add_where, g, n_buckets // split)   # leaves [L, Wg]
        for i, w in enumerate(ws):
            wsums[w] = _tree_map(lambda t, i=i: t[..., i], totals)

    # window combine: total = sum_w 2^(c*w) * S_w.  The 2^(cw) scaling is
    # ONE in-kernel masked-doubling chain over [W] lanes (lane w doubles
    # c*w times; kernels.curve_horner_scale) — the previous Horner scan
    # issued ~SCALAR_BITS separate fused-add launches and cost ~58 ms of
    # launch overhead at 2^18 — then a log2(W) pairwise fold.
    stacked = _tree_map(lambda *ts: jnp.stack(ts, axis=-1), *wsums)
    scaled = kernels.curve_horner_scale(group, c, n_windows)(*stacked)
    m = 1 << max(1, (n_windows - 1).bit_length())
    total = _tree_map(                       # zero-pad = xyzz infinity
        lambda t: jnp.pad(t, ((0, 0), (0, m - n_windows))), scaled)
    while m > 1:
        total = _fold_pairs(add_where, total)
        m //= 2
    out = _tree_map(lambda t: t[..., 0], total)
    if _lazy_kernels():
        from .field import fq
        out = _tree_map(lambda t: fq().canon(t), out)
    return out


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


# -- fixed-base MSM (precomputed window multiples) --------------------------
#
# The prover's MSM points are per-circuit CONSTANTS (zkey sections, loaded
# once by *_prover_create and reused across proves — the amortization the
# reference's C API is built around, /root/reference/src/prover.cpp:449-473).
# Precomputing 2^(c*w) * P_i per point collapses Pippenger's W windows into
# ONE shared bucket space:
#
#   sum_i k_i P_i = sum_{w,i} d_{w,i} * (2^(c*w) P_i)
#
# so the per-prove work drops from N * ceil(254/c_small) bucket adds (the
# window combine forces small c) to N * ceil(254/c_big) with NO window
# combine at all — the only c limit left is the single reduction over
# 2^(c-1) buckets, which amortizes at ~2 adds/bucket.  c=16 at 2^18 points:
# 16N pairs vs 20N, no Horner, and a reduction 16x narrower than the
# standard path's W-window one.

def fixed_n_windows(c: int) -> int:
    nw = -(-SCALAR_BITS // c)
    if SCALAR_BITS % c == 0:
        nw += 1      # spare window absorbs the signed-recode carry
    return nw


def default_fixed_window(n: int) -> int:
    """Balance accumulation pairs (N * ceil(254/c)) against reduction
    lanes (~2 * 2^(c-1) adds + per-level launch overhead): c ~ log2(N)-2."""
    if n >= (1 << 21):
        return 19
    if n >= (1 << 19):
        return 17
    if n >= (1 << 15):
        return 16
    if n >= (1 << 12):
        return 13
    return 10


@functools.partial(jax.jit, static_argnames=("group", "c"))
def _fb_table_jit(x, y, inf, group: str, c: int):
    """Packed fixed-base table: column w*N + i = affine(2^(c*w) * P_i).

    Doublings ride the fused complete add's doubling branch (one kernel
    launch per doubling, ladder-padded shape); the W*N normalization back
    to affine is ONE Montgomery-trick batch inversion (to_affine_batch),
    not W*N Fermat chains."""
    ops = g1_ops() if group == "g1" else g2_ops()
    add_where = kernels.curve_add_where(group)
    nw = fixed_n_windows(c)
    cur = ops.affine_to_xyzz(x, y, inf)
    levels = [cur]
    for _ in range(1, nw):
        cur = jax.lax.fori_loop(
            0, c, lambda i, p: _add_all(add_where, p, p), cur)
        levels.append(cur)
    allp = _tree_map(lambda *ts: jnp.concatenate(ts, axis=-1), *levels)
    if _lazy_kernels():
        from .field import fq
        allp = _tree_map(lambda t: fq().canon(t), allp)
    ax, ay, _ = ops.to_affine_batch(allp)
    return _pack_points_planes(ax, ay)


def msm_fixed_table(group: str, x, y, inf, c: int | None = None):
    """Precompute the fixed-base table for msm_*_fixed (once per circuit).

    Pads N to a power of two (shared compiled graphs, clean tiling) and
    returns (packed [K*L, W*Npad], inf [Npad], c).  Table memory is
    W * Npad * 128 B for G1 (256 B for G2) — callers gate on that
    (protocol/prover.py budgets it against HBM)."""
    n = inf.shape[0]
    if c is None:
        c = default_fixed_window(n)
    size = max(64, 1 << (n - 1).bit_length())
    pad = size - n

    def padp(a):
        return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])

    if pad:
        x = _tree_map(padp, x)
        y = _tree_map(padp, y)
        inf = jnp.pad(jnp.asarray(inf), (0, pad), constant_values=True)
    packed = _fb_table_jit(jax.tree_util.tree_map(jnp.asarray, x),
                           jax.tree_util.tree_map(jnp.asarray, y),
                           jnp.asarray(inf), group, c)
    return packed, jnp.asarray(inf), c


def _msm_fixed(ops: CurveOps, group: str, packed, x_like, y_like, inf,
               scalars, c: int):
    n_windows = fixed_n_windows(c)
    n_buckets = 1 << (c - 1)
    add_where = kernels.curve_add_where(group)
    red_ops = kernels._kernel_curve(group) if _lazy_kernels() else ops

    buckets, negs = _signed_digits(scalars, c, n_windows)    # [W, N]
    idx = jnp.where(buckets > 0, buckets - 1, n_buckets)
    idx = jnp.where(jnp.asarray(inf)[None, :], n_buckets, idx)
    w, n = idx.shape
    # ONE shared bucket space across all windows: entry id w*N + i is the
    # packed-table column of 2^(c*w) * P_i, so the flat sort/accumulate/
    # reduce machinery of the standard path applies with n_windows=1 (and
    # no _split_factor skew handling: the top window's few distinct
    # indices just share buckets with everyone else)
    # PER-ROW sorts + per-row counts, exactly the standard path's compile
    # shapes ([W, N] batched sort, [W, n_buckets] counts): the flat
    # [1, W*N] single-row form compiled into a program that crashes the
    # relay's tpu_compile_helper (compile-side OOM, same signature as
    # scatter_coefs — queue_r5c.log / bench_msmfix_r5{b,c}.log).  The
    # bucket space is still SHARED: enc carries the GLOBAL packed-table
    # column (w*N + i -> the 2^(cw)*P_i multiple), so each window's
    # accumulators target the same bucket ids and the window axis is
    # folded with plain complete adds below — no Horner window-combine.
    enc = (jnp.arange(w * n, dtype=jnp.int32).reshape(w, n) * 2
           + negs.astype(jnp.int32))                     # [W, N] global ids
    sorted_idx, orders = jax.lax.sort((idx, enc), dimension=1, num_keys=1)
    # counts from the sorted keys (searchsorted = gather-based binary
    # search), NOT jnp.bincount: the scatter-add form at 32769 bins is a
    # compile-OOM risk on the relay helper
    bnd = jax.vmap(lambda r: jnp.searchsorted(
        r, jnp.arange(n_buckets + 1, dtype=idx.dtype)))(sorted_idx)
    counts = bnd[:, 1:] - bnd[:, :-1]                    # [W, n_buckets]

    acc = _bucket_accumulate_all(ops, group, packed, x_like, y_like,
                                 orders, counts, c, [1] * w)
    # fold the window axis (shared bucket space: bucket b total =
    # sum_w acc[w, b]); zero-pad = xyzz infinity, as in the standard
    # window combine
    acc = _tree_map(lambda t: t.swapaxes(-1, -2), acc)   # [.., nb, W]
    m = 1 << max(1, (w - 1).bit_length())
    acc = _tree_map(
        lambda t: jnp.pad(t, [(0, 0)] * (t.ndim - 1) + [(0, m - w)]), acc)
    while m > 1:
        acc = _fold_pairs(add_where, acc)
        m //= 2
    acc = _tree_map(lambda t: t.swapaxes(-1, -2), acc)   # [.., 1, nb]
    totals = _weighted_totals(red_ops, add_where, acc, n_buckets)
    out = _tree_map(lambda t: t[..., 0], totals)
    if _lazy_kernels():
        from .field import fq
        out = _tree_map(lambda t: fq().canon(t), out)
    return out


@functools.partial(jax.jit, static_argnames=("c",))
def _msm_g1_fixed_jit(packed, inf, scalars, c: int):
    return _msm_fixed(g1_ops(), "g1", packed, scalars, scalars, inf,
                      scalars, c)


@functools.partial(jax.jit, static_argnames=("c",))
def _msm_g2_fixed_jit(packed, inf, scalars, c: int):
    tmpl = (scalars, scalars)
    return _msm_fixed(g2_ops(), "g2", packed, tmpl, tmpl, inf, scalars, c)


def _pad_scalars(scalars, n: int):
    scal = jnp.asarray(scalars)
    if scal.shape[1] != n:
        scal = jnp.pad(scal, ((0, 0), (0, n - scal.shape[1])))
    return scal


def msm_g1_fixed(packed, inf, scalars, c: int):
    """G1 fixed-base MSM over a precomputed table (msm_fixed_table).
    scalars: [L, n] standard-form Fr planes, n <= table N (zero-padded);
    returns a single xyzz point, leaves [L]."""
    return _msm_g1_fixed_jit(packed, inf, _pad_scalars(scalars,
                                                       inf.shape[0]), c)


def msm_g2_fixed(packed, inf, scalars, c: int):
    """G2 fixed-base MSM over a precomputed table."""
    return _msm_g2_fixed_jit(packed, inf, _pad_scalars(scalars,
                                                       inf.shape[0]), c)
