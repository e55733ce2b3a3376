"""Kernel-path regression coverage without a TPU (round-1 verdict item 4).

Every CI test normally runs the rolled-XLA fallback (ops/fuse._use_pallas
is False on the CPU mesh), so a regression in the REAL kernel bodies —
kernel_view math, fused_map blocking/padding/bool marshalling, the madd /
add_where / butterfly formulas — would pass 64/64 tests and only surface
at bench time on the TPU box.  ULTRAGROTH_PALLAS=interpret routes
fused_map through the Pallas interpreter on CPU: the identical kernel
callables, BlockSpecs, and grid as the TPU path, minus only the Mosaic
lowering itself.

The kernel registry (ops/kernels.py) caches the backend decision per
process, so the interpret run happens in a subprocess with the env set
from the start; it prints canonical digests that this test compares with
the rolled-XLA path computed in-process.
"""
import numpy as np

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

N = 1537          # deliberately not a block multiple: exercises padding
rng = np.random.default_rng(3)


def planes(seed):
    a = rng.integers(0, 1 << 16, size=(16, N), dtype=np.uint32)
    a[15] &= 0x3FFF
    return a


out = {}
a, b = planes(0), planes(1)

# registry kernels at their shipped block sizes
out["mont_mul"] = np.asarray(kernels.fr_mont_mul()(a, b)).sum(dtype=np.uint64)
u, w, tw = planes(2), planes(3), planes(4)
hi, lo = kernels.fr_butterfly()(u, w, tw)
out["butterfly"] = (np.asarray(hi).sum(dtype=np.uint64)
                    + np.asarray(lo).sum(dtype=np.uint64))

# block-size sweep of the same formula (the TPU madd kernel historically
# compiled only at block=1024; the kernel MATH must be block-invariant)
kv = fr().kernel_view()
for blk in (256, 1024):
    f = fused_map(lambda x, y: kv.mont_mul(x, y), block=blk)
    out[f"mont_mul_b{blk}"] = np.asarray(f(a, b)).sum(dtype=np.uint64)

# curve kernels: madd + add_where on a small batch
from ultragroth_tpu.ops.curve import g1_ops
ops = g1_ops()
M = 257
acc = ops.inf_xyzz((M,))
qx = np.asarray(a[:, :M])
qy = np.asarray(b[:, :M])
qinf = np.zeros(M, bool)
qinf[::5] = True
acc1 = kernels.curve_madd_valid("g1")(acc, qx, qy, qinf)
acc2 = kernels.curve_madd_valid("g1")(acc1, qy, qx, ~qinf)
ok = np.zeros(M, bool)
ok[1::2] = True
acc3 = kernels.curve_add_where("g1")(acc2, acc1, ok)
out["g1_chain"] = sum(int(np.asarray(l).sum(dtype=np.uint64))
                      for l in jax.tree_util.tree_leaves(acc3))

# signed madd (the windowed-NAF MSM kernel): in-kernel y-negation
qneg = np.zeros(M, bool)
qneg[::3] = True
acc4 = kernels.curve_madd_signed("g1")(acc3, qx, qy, qinf, qneg)
out["g1_signed"] = sum(int(np.asarray(l).sum(dtype=np.uint64))
                       for l in jax.tree_util.tree_leaves(acc4))

# fast incomplete madd + exception flags (the MSM bucket-loop common case)
valid = np.ones(M, bool)
valid[::7] = False
acc5, flags = kernels.curve_madd_fast("g1")(acc4, qy, qx, qneg, valid)
out["g1_fast"] = (sum(int(np.asarray(l).sum(dtype=np.uint64))
                      for l in jax.tree_util.tree_leaves(acc5))
                  + int(np.asarray(flags).sum(dtype=np.uint64)))

# in-kernel masked-doubling chain (the MSM window-combine scaler)
W = 20
tr = jax.tree_util.tree_map(lambda l: l[..., :W], acc5)
acc6 = kernels.curve_horner_scale("g1", 3, W)(*tr)
out["g1_horner"] = sum(int(np.asarray(l).sum(dtype=np.uint64))
                       for l in jax.tree_util.tree_leaves(acc6))

print(json.dumps({k: int(v) for k, v in out.items()}))
"""


def test_kernel_path_interpret_matches_rolled():
    # LAZY pinned off: this test compares RAW kernel outputs against the
    # rolled path bit-for-bit, which only holds in the canonical domain
    # (the lazy-domain twin lives in tests/test_lazy_field.py).  The two
    # children run CONCURRENTLY with a generous timeout: the serial
    # 5400 s version lost a 4-core contended box in the round-4 full
    # suite (experiments/pytest_r4.log).
    p_interp = childproc.spawn(_CHILD, {"ULTRAGROTH_PALLAS": "interpret",
                                        "ULTRAGROTH_LAZY": "0"})
    p_rolled = childproc.spawn(_CHILD, {"ULTRAGROTH_LAZY": "0"})
    try:
        got = childproc.join(p_interp)
        want = childproc.join(p_rolled)
    finally:
        for p in (p_interp, p_rolled):
            childproc.reap(p)
    assert got == want, (got, want)
    # the block sweep must agree with the registry kernel
    for blk in (256, 1024):
        assert got[f"mont_mul_b{blk}"] == got["mont_mul"], blk
