"""Kernel-path regression coverage without a TPU (round-1 verdict item 4).

Every CI test normally runs the rolled-XLA fallback (ops/fuse._use_pallas
is False on the CPU mesh), so a regression in the REAL kernel bodies —
kernel_view math, fused_map blocking/padding/bool marshalling, the madd /
add_where / butterfly formulas — would pass the suite and only surface
at bench time on the TPU box.  ULTRAGROTH_PALLAS=interpret routes
fused_map through the Pallas interpreter on CPU: the identical kernel
callables, BlockSpecs, and grid as the TPU path, minus only the Mosaic
lowering itself.

Process shape (round-5 forensics): ONE child compiling the whole kernel
set peaked at 78 GB RSS and was OOM-killed — the XLA:CPU/LLVM compile of
each flat unrolled kernel graph costs tens of GB, and a single process
accumulates them.  So the chain is split into PARTS with independent
deterministic inputs; each part runs in its own pair of children
(interpret vs rolled, concurrently — the rolled child is cheap), and the
parts run sequentially so peak memory is one interpret compile.
"""
import numpy as np
import pytest

import childproc

_CHILD = r"""
import json
import os
import pathlib
import sys

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
# the flat kernel_view graphs are XLA-CPU-compile heavy; share the test
# suite's persistent cache (cwd == repo root, machine-scoped) so warm
# runs skip them
from ultragroth_tpu.runtime import cpu_cache_dir
jax.config.update("jax_compilation_cache_dir",
                  cpu_cache_dir(pathlib.Path.cwd() / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ultragroth_tpu.ops import kernels
from ultragroth_tpu.ops.fuse import fused_map, _use_pallas
from ultragroth_tpu.ops.field import fr

# the interpret child must take the kernel path; the rolled 'want' child
# (no ULTRAGROTH_PALLAS) must take the XLA fallback
if os.environ.get("ULTRAGROTH_PALLAS") == "interpret":
    assert _use_pallas(), "interpret env must force the kernel path"
else:
    assert not _use_pallas(), "rolled child must use the XLA fallback"

PART = os.environ["ULTRAGROTH_CHILD_PART"]

N = 1537          # deliberately not a block multiple: exercises padding
rng = np.random.default_rng(3)


def planes(seed):
    a = rng.integers(0, 1 << 16, size=(16, N), dtype=np.uint32)
    a[15] &= 0x3FFF
    return a


def digest(tree):
    return sum(int(np.asarray(l).sum(dtype=np.uint64))
               for l in jax.tree_util.tree_leaves(tree))


out = {}
a, b = planes(0), planes(1)

if PART == "field":
    # registry kernels at their shipped block sizes
    out["mont_mul"] = digest(kernels.fr_mont_mul()(a, b))
    u, w, tw = planes(2), planes(3), planes(4)
    hi, lo = kernels.fr_butterfly()(u, w, tw)
    out["butterfly"] = digest(hi) + digest(lo)
    # block-size sweep of the same formula (the TPU madd kernel
    # historically compiled only at block=1024; the kernel MATH must be
    # block-invariant)
    kv = fr().kernel_view()
    for blk in (256, 1024):
        f = fused_map(lambda x, y: kv.mont_mul(x, y), block=blk)
        out[f"mont_mul_b{blk}"] = digest(f(a, b))
else:
    # curve-kernel parts: independent deterministic inputs per part (no
    # cross-part chaining — parts run in separate processes)
    from ultragroth_tpu.ops.curve import g1_ops
    ops = g1_ops()
    M = 257
    qx = np.asarray(a[:, :M])
    qy = np.asarray(b[:, :M])
    qinf = np.zeros(M, bool)
    qinf[::5] = True
    qneg = np.zeros(M, bool)
    qneg[::3] = True
    ok = np.zeros(M, bool)
    ok[1::2] = True
    valid = np.ones(M, bool)
    valid[::7] = False
    base = ops.affine_to_xyzz(qy, qx, np.zeros(M, bool))  # rolled, cheap

    if PART == "madd":
        acc1 = kernels.curve_madd_valid("g1")(base, qx, qy, qinf)
        acc2 = kernels.curve_madd_valid("g1")(acc1, qy, qx, ~qinf)
        out["g1_chain"] = digest(acc2)
    elif PART == "signed":
        # signed madd (windowed-NAF MSM kernel): in-kernel y-negation,
        # seeding from infinity covers the doubling branch
        acc = kernels.curve_madd_signed("g1")(ops.inf_xyzz((M,)),
                                              qx, qy, qinf, qneg)
        out["g1_signed"] = digest(acc)
    elif PART == "fast":
        # fast incomplete madd + exception flags (MSM bucket-loop common
        # case)
        acc, flags = kernels.curve_madd_fast("g1")(base, qy, qx, qneg,
                                                   valid)
        out["g1_fast"] = digest(acc) + int(
            np.asarray(flags).sum(dtype=np.uint64))
    elif PART == "where":
        acc = kernels.curve_add_where("g1")(base, base, ok)
        out["g1_where"] = digest(acc)
    elif PART == "horner":
        # in-kernel masked-doubling chain (the MSM window-combine scaler)
        W = 20
        tr = jax.tree_util.tree_map(lambda l: l[..., :W], base)
        out["g1_horner"] = digest(kernels.curve_horner_scale("g1", 3, W)(*tr))
    else:
        raise SystemExit(f"unknown part {PART}")

print(json.dumps({k: int(v) for k, v in out.items()}))
"""

PARTS = ("field", "madd", "signed", "fast", "where", "horner")


@pytest.mark.parametrize("part", PARTS)
def test_kernel_path_interpret_matches_rolled(part):
    # LAZY pinned off: this test compares RAW kernel outputs against the
    # rolled path bit-for-bit, which only holds in the canonical domain
    # (the lazy-domain twin lives in tests/test_lazy_field.py).  Each
    # part's interpret and rolled children run concurrently (the rolled
    # one is cheap); parts run sequentially so peak RSS stays at ONE
    # interpret-mode XLA:CPU compile (the single-child form hit 78 GB
    # and the OOM killer, round-5 forensics).
    p_interp = childproc.spawn(_CHILD, {"ULTRAGROTH_PALLAS": "interpret",
                                        "ULTRAGROTH_LAZY": "0",
                                        "ULTRAGROTH_CHILD_PART": part})
    p_rolled = childproc.spawn(_CHILD, {"ULTRAGROTH_LAZY": "0",
                                        "ULTRAGROTH_CHILD_PART": part})
    try:
        got = childproc.join(p_interp)
        want = childproc.join(p_rolled)
    finally:
        for p in (p_interp, p_rolled):
            childproc.reap(p)
    assert got == want, (part, got, want)
    if part == "field":
        # the block sweep must agree with the registry kernel
        for blk in (256, 1024):
            assert got[f"mont_mul_b{blk}"] == got["mont_mul"], blk
