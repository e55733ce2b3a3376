"""Fused Pallas kernel registry for the hot compute paths.

Each entry pairs a TPU Pallas kernel (whole formula VMEM-resident, built on
FieldOps.kernel_view's flat math) with the rolled XLA formulation for other
backends.  Measured on v5e: fused mont_mul 4.8 ms / 2^20 elements vs 60 ms
for the unfused XLA chain.
"""
from __future__ import annotations

import functools

import jax

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
