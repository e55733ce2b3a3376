"""Pallas kernel fusion for limb-plane math.

The XLA-level field ops materialize every intermediate [L, N] array in HBM;
a mont_mul measured ~60 ms / 2^20 elements on v5e - pure HBM traffic (the
useful ALU work is <1 ms).  `fused_map` wraps any elementwise-batched
pytree function (field mul, NTT butterfly, complete EC add, ...) into ONE
`pallas_call` blocked over the trailing batch axis: inputs stream
HBM -> VMEM once, the whole formula evaluates in VMEM/registers, outputs
stream back once.  That turns ~25 KB of HBM traffic per element-mul into
~192 B - the speed-of-light profile for this workload.

Falls back to calling `fn` directly (pure XLA) on non-TPU backends so the
CPU test mesh exercises identical math.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only lowers on TPU; import lazily-tolerant
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None


def _interpret() -> bool:
    """ULTRAGROTH_PALLAS=interpret runs the REAL kernel bodies through the
    Pallas interpreter on any backend — CI coverage for the kernel path
    (blocking, padding, bool marshalling, kernel_view math) without a TPU."""
    return os.environ.get("ULTRAGROTH_PALLAS") == "interpret"


def _use_pallas() -> bool:
    if _interpret():
        return True
    try:
        return jax.default_backend() == "tpu" and pltpu is not None
    except Exception:
        return False


def fused_map(fn, block: int = 1024, name: str | None = None):
    """fn(*pytrees of [..., N] leaves) -> pytree of [..., N] leaves,
    executed as one VMEM-resident Pallas kernel, grid = N / block.

    Leaves must share the trailing batch dim N; bool leaves are carried as
    uint32 through the kernel boundary.  N is padded to a block multiple
    (fn must be pure elementwise along the batch axis, so padding lanes are
    garbage-in/garbage-out and get sliced away).
    """

    def call(*trees):
        leaves, treedef = jax.tree_util.tree_flatten(trees)
        n = leaves[0].shape[-1]
        assert all(l.shape[-1] == n for l in leaves), [l.shape for l in leaves]

        bool_mask = [l.dtype == jnp.bool_ for l in leaves]
        leaves = [l.astype(jnp.uint32) if b else l
                  for l, b in zip(leaves, bool_mask)]
        # promote 1-D leaves to [1, N]: 1-D kernel operands hit XLA/Mosaic
        # tiling mismatches at some widths (T(1024) vs T(512))
        dim1 = [l.ndim == 1 for l in leaves]
        leaves = [l[None] if d else l for l, d in zip(leaves, dim1)]

        def fn_flat(*flat):
            flat = [l[0] if d else l for l, d in zip(flat, dim1)]
            flat = [l.astype(jnp.bool_) if b else l
                    for l, b in zip(flat, bool_mask)]
            out = fn(*jax.tree_util.tree_unflatten(treedef, flat))
            out_leaves, out_def = jax.tree_util.tree_flatten(out)
            obool = [l.dtype == jnp.bool_ for l in out_leaves]
            odim1 = [l.ndim == 1 for l in out_leaves]
            out_leaves = [l.astype(jnp.uint32) if b else l
                          for l, b in zip(out_leaves, obool)]
            out_leaves = [l[None] if d else l
                          for l, d in zip(out_leaves, odim1)]
            return out_leaves, out_def, obool, odim1

        if not _use_pallas():
            out_leaves, out_def, obool, odim1 = fn_flat(*leaves)
            out_leaves = [l[0] if d else l
                          for l, d in zip(out_leaves, odim1)]
            out_leaves = [l.astype(jnp.bool_) if b else l
                          for l, b in zip(out_leaves, obool)]
            return jax.tree_util.tree_unflatten(out_def, out_leaves)

        # pad N to a block multiple
        pad = (-n) % block
        if pad:
            leaves = [jnp.pad(l, [(0, 0)] * (l.ndim - 1) + [(0, pad)])
                      for l in leaves]
        np_ = n + pad
        grid = np_ // block

        # shape inference on a single block (abstract trace; meta captured
        # by side effect since treedefs aren't arrays)
        slice_avals = [jax.ShapeDtypeStruct(l.shape[:-1] + (block,), l.dtype)
                       for l in leaves]
        meta = {}

        def shape_probe(*xs):
            out_leaves, out_def, obool, odim1 = fn_flat(*xs)
            meta["def"], meta["bool"], meta["dim1"] = out_def, obool, odim1
            return out_leaves

        out_avals = jax.eval_shape(shape_probe, *slice_avals)
        out_def, obool, odim1 = meta["def"], meta["bool"], meta["dim1"]

        def kernel(*refs):
            in_refs = refs[:len(leaves)]
            out_refs = refs[len(leaves):]
            outs, _, _, _ = fn_flat(*[r[...] for r in in_refs])
            for r, o in zip(out_refs, outs):
                r[...] = o

        def spec_for(l):
            nd = l.ndim
            return pl.BlockSpec(
                l.shape[:-1] + (block,),
                lambda i, nd=nd: (0,) * (nd - 1) + (i,),
                memory_space=pltpu.VMEM)

        out = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[spec_for(l) for l in leaves],
            out_specs=[pl.BlockSpec(a.shape[:-1] + (block,),
                                    lambda i, nd=a.ndim: (0,) * (nd - 1) + (i,),
                                    memory_space=pltpu.VMEM)
                       for a in out_avals],
            out_shape=[jax.ShapeDtypeStruct(a.shape[:-1] + (np_,), a.dtype)
                       for a in out_avals],
            interpret=_interpret(),
        )(*leaves)
        if pad:
            out = [o[..., :n] for o in out]
        out = [o[0] if d else o for o, d in zip(out, odim1)]
        out = [o.astype(jnp.bool_) if b else o for o, b in zip(out, obool)]
        return jax.tree_util.tree_unflatten(out_def, out)

    call.__name__ = name or getattr(fn, "__name__", "fused_map")
    return call
