"""Fused Pallas kernel registry for the hot compute paths.

Each entry pairs a TPU Pallas kernel (whole formula VMEM-resident, built on
FieldOps.kernel_view's flat math) with the rolled XLA formulation for other
backends.  Measured on v5e: fused mont_mul 4.8 ms / 2^20 elements vs 60 ms
for the unfused XLA chain.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .curve import CurveOps
from .field import fr, fq
from .fq2 import Fq2Ops
from .fuse import fused_map, _use_pallas


@functools.cache
def fr_mont_mul():
    """Batched Fr mont_mul: [L, N] x [L, N] -> [L, N]."""
    if _use_pallas():
        kv = fr().kernel_view()
        return fused_map(lambda a, b: kv.mont_mul(a, b), block=2048,
                         name="fr_mont_mul")
    return lambda a, b: fr()._mont_mul(a, b)


@functools.cache
def fr_butterfly():
    """NTT butterfly: (u, w_in, tw) -> (u + w*tw, u - w*tw), one pass."""
    if _use_pallas():
        kv = fr().kernel_view()

        def bf(u, w_in, tw):
            t = kv.mont_mul(w_in, tw)
            return kv.add(u, t), kv.sub(u, t)

        return fused_map(bf, block=2048, name="fr_butterfly")

    F = fr()

    def bf(u, w_in, tw):
        t = F._mont_mul(w_in, tw)
        return F._add(u, t), F._sub(u, t)

    return bf


@functools.cache
def _kernel_curve(group: str) -> CurveOps:
    base = fq().kernel_view() if _use_pallas() else fq()
    return CurveOps(base if group == "g1" else Fq2Ops(base))


def _plain_curve(group: str) -> CurveOps:
    from .curve import g1_ops, g2_ops
    return g1_ops() if group == "g1" else g2_ops()


@functools.cache
def curve_madd_valid(group: str):
    """(acc_xyzz, qx, qy, q_inf) -> acc + Q, complete mixed add."""
    ops = _kernel_curve(group)
    if _use_pallas():
        block = 512 if group == "g2" else 1024
        return fused_map(
            lambda acc, qx, qy, qinf: ops.madd_unified(acc, qx, qy, qinf),
            block=block, name=f"{group}_madd")
    pops = _plain_curve(group)
    return lambda acc, qx, qy, qinf: pops.madd_unified(acc, qx, qy, qinf)


@functools.cache
def curve_madd_signed(group: str):
    """(acc_xyzz, qx, qy, q_inf, q_neg) -> acc + (q_neg ? -Q : Q).

    Complete mixed add with in-kernel y-negation, for the signed-digit
    (windowed-NAF) MSM: negating an affine point is y -> p - y, one
    masked limb-subtract fused into the same VMEM-resident kernel."""
    ops = _kernel_curve(group)
    if _use_pallas():
        block = 512 if group == "g2" else 1024

        def fn(acc, qx, qy, qinf, qneg):
            qy = ops.F.select(qneg, ops.F.neg(qy), qy)
            return ops.madd_unified(acc, qx, qy, qinf)

        return fused_map(fn, block=block, name=f"{group}_madd_s")
    pops = _plain_curve(group)

    def fn2(acc, qx, qy, qinf, qneg):
        qy = pops.F.select(qneg, pops.F.neg(qy), qy)
        return pops.madd_unified(acc, qx, qy, qinf)

    return fn2


@functools.cache
def curve_madd_fast(group: str):
    """(acc_xyzz, qx, qy, q_neg, valid) -> (out, flag): incomplete signed
    mixed add for the MSM bucket loop's COMMON case.

    out = valid ? acc + (q_neg ? -Q : Q) : acc via the 10-mul short
    formula; flag marks valid lanes where the incompleteness assumptions
    fail (doubling/cancellation/acc-at-infinity) — the caller re-runs
    that step through curve_madd_signed under a lax.cond, so exceptional
    steps cost one extra (rare) complete pass instead of taxing every
    step with the full branch set."""
    ops = _kernel_curve(group)
    if _use_pallas():
        block = 512 if group == "g2" else 1024

        def fn(acc, qx, qy, qneg, valid):
            qy = ops.F.select(qneg, ops.F.neg(qy), qy)
            added, bad = ops.madd_fast(acc, qx, qy)
            return ops.select(valid, added, acc), bad & valid

        return fused_map(fn, block=block, name=f"{group}_madd_f")
    pops = _plain_curve(group)

    def fn2(acc, qx, qy, qneg, valid):
        qy = pops.F.select(qneg, pops.F.neg(qy), qy)
        added, bad = pops.madd_fast(acc, qx, qy)
        return pops.select(valid, added, acc), bad & valid

    return fn2


@functools.cache
def curve_horner_scale(group: str, c: int, n_windows: int):
    """xyzz window sums, leaves [L, B] with lane w = S_w -> lane w =
    2^(c*w) * S_w: the MSM window-combine's 2^(cw) scaling done as ONE
    VMEM-resident kernel with an in-kernel fori_loop of masked doublings
    (lane w doubles while i < c*w), instead of ~SCALAR_BITS separate
    fused-add launches (each ~0.2 ms of launch overhead; the old scan
    was ~58 ms of the 2^18 MSM).  The pairwise fold to the final total
    stays outside (log2(W) fused adds).

    dbl is complete here: BN254 G1/G2 groups have odd prime order (no
    2-torsion, y != 0) and dbl-2008-s-1 maps the xyzz infinity encoding
    (zz == 0) to itself.  Pad lanes double garbage and are discarded."""
    ops = _kernel_curve(group)
    iters = c * (n_windows - 1)
    # the in-kernel iota is block-relative: one block must cover all lanes
    assert n_windows <= 128, n_windows

    def make(fops_curve):
        def fn(x, y, zz, zzz):
            t = (x, y, zz, zzz)
            width = jax.tree_util.tree_leaves(x)[0].shape[-1]
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)[0]

            def body(i, t):
                return fops_curve.select(i < c * lane,
                                         fops_curve.dbl(t), t)

            return jax.lax.fori_loop(0, iters, body, t)

        return fn

    if _use_pallas():
        return fused_map(make(ops), block=128,
                         name=f"{group}_horner_c{c}")
    return make(_plain_curve(group))


@functools.cache
def curve_add_where(group: str):
    """(a_xyzz, b_xyzz, ok) -> ok ? a+b : a, complete add."""
    ops = _kernel_curve(group)
    if _use_pallas():
        block = 512 if group == "g2" else 1024
        return fused_map(
            lambda a, b, ok: ops.select(ok, ops.add_unified(a, b), a),
            block=block, name=f"{group}_add_where")
    pops = _plain_curve(group)
    return lambda a, b, ok: pops.select(ok, pops.add_unified(a, b), a)
