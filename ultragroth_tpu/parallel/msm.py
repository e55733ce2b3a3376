"""Data-parallel MSM over a device mesh.

Replaces the reference's single-node Pippenger (ffiasm
Curve::multiMulByScalarMSM, usage /root/reference/src/groth16.cpp:55-64)
with: shard points+scalars across chips -> full local bucket MSM per chip
-> all_gather of the per-chip partial points over ICI -> log-fold.  The
cross-chip traffic is O(devices) points - negligible against the local
bucket work, so scaling is essentially linear in chips.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.curve import g1_ops, g2_ops
from ..ops import kernels
from ..ops.msm import _msm, _fold_pairs, _pad_pow2, _tree_map


def _fold_gathered(ops, group, pts, n: int):
    """Sum n gathered points (leaves [..., n]) -> single point leaves."""
    assert n & (n - 1) == 0, n
    aw = kernels.curve_add_where(group)
    while n > 1:
        pts = _fold_pairs(aw, pts)
        n //= 2
    return _tree_map(lambda t: t[..., 0], pts)


def _sharded_msm(ops, group: str, mesh: Mesh, axis: str, x, y, inf, scalars,
                 c: int):
    n_windows = -(-256 // c)
    ndev = mesh.shape[axis]

    pspec_pt = jax.tree_util.tree_map(lambda _: P(None, axis), x)
    spec_in = (pspec_pt, pspec_pt, P(axis), P(None, axis))
    spec_out = jax.tree_util.tree_map(lambda _: P(), (x, x, x, x))

    @functools.partial(shard_map, mesh=mesh, in_specs=spec_in,
                       out_specs=spec_out, check_vma=False)
    def run(x, y, inf, s):
        local = _msm(ops, group, x, y, inf, s, c, n_windows)  # leaves [L]
        gathered = jax.lax.all_gather(local, axis, axis=1)    # leaves [L, D]
        return _fold_gathered(ops, group, gathered, ndev)

    return run(x, y, inf, scalars)


def msm_g1_sharded(x, y, inf, scalars, mesh: Mesh, axis: str = "data",
                   c: int = 16):
    """G1 MSM sharded across `mesh[axis]`.  N must divide evenly after the
    power-of-two pad; inputs follow ops.msm.msm_g1 conventions."""
    x, y, inf, scalars = _pad_pow2(x, y, inf, scalars)
    return _sharded_msm(g1_ops(), "g1", mesh, axis, jnp.asarray(x),
                        jnp.asarray(y), jnp.asarray(inf),
                        jnp.asarray(scalars), c)


def msm_g2_sharded(x, y, inf, scalars, mesh: Mesh, axis: str = "data",
                   c: int = 16):
    x, y, inf, scalars = _pad_pow2(x, y, inf, scalars)
    x = tuple(jnp.asarray(v) for v in x)
    y = tuple(jnp.asarray(v) for v in y)
    return _sharded_msm(g2_ops(), "g2", mesh, axis, x, y, jnp.asarray(inf),
                        jnp.asarray(scalars), c)
