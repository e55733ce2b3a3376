"""Isolate the ntt_fast Mosaic compile failure on the real TPU.

Candidates, each compiled separately (smallest first so a crash pins the
culprit): (a) bare stack-interleave-reshape, (b) strided-slice deinterleave,
(c) tiny _cg_kernel_call, (d) the failing 2^8-factor kernel.
Run:  python experiments/probe_cg_mosaic.py 2>&1 | tee experiments/probe_cg.log
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("device=", jax.devices()[0], flush=True)


def try_case(name, fn):
    print(f"--- {name}", flush=True)
    try:
        out = fn()
        print(f"OK {name}: {np.asarray(out).reshape(-1)[:2]}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:500]}", flush=True)


def case_interleave():
    # bare stack(axis=2)+reshape interleave on [16, 32, 256]
    h = np.arange(16 * 32 * 256, dtype=np.uint32).reshape(16, 32, 256)

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        hi = x[:, :16, :] + jnp.uint32(1)
        lo = x[:, 16:, :] + jnp.uint32(2)
        o_ref[...] = jnp.stack([hi, lo], axis=2).reshape(16, 32, 256)

    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((16, 32, 256), jnp.uint32),
    )(h)


def case_strided():
    # strided-slice deinterleave on sublane axis
    h = np.arange(16 * 32 * 256, dtype=np.uint32).reshape(16, 32, 256)

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        ev = x[:, 0::2, :]
        od = x[:, 1::2, :]
        o_ref[...] = jnp.concatenate([ev + jnp.uint32(1), od], axis=1)

    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((16, 32, 256), jnp.uint32),
    )(h)


def case_cg(log_m):
    from ultragroth_tpu.ops import ntt as dntt
    n = 1 << log_m
    rng = np.random.default_rng(1)
    a = rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint32)
    a[15] &= 0x1FFF
    return dntt._cg_kernel_call(jnp.asarray(a)[:, :, None] +
                                jnp.zeros((1, 1, 256), jnp.uint32),
                                log_m, False)


def case_kernel_loop(iters):
    """jax.lax.fori_loop INSIDE a Pallas kernel around kernel_view
    mont_mul — decides whether multi-step formulas (Horner doubling
    chains, in-kernel NTT stages) can run as ONE kernel launch."""
    from ultragroth_tpu.ops.field import fr
    kv = fr().kernel_view()
    rng = np.random.default_rng(2)
    a = rng.integers(0, 1 << 16, size=(16, 512), dtype=np.uint32)
    a[15] &= 0x3FFF

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        o_ref[...] = jax.lax.fori_loop(
            0, iters, lambda i, t: kv.mont_mul(t, t), x)

    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((16, 512), jnp.uint32),
    )(a)


def case_madd_block(block):
    """g1 madd fused kernel at a non-default block size (the round-1
    folklore: only block=1024 compiles)."""
    from ultragroth_tpu.ops.fuse import fused_map
    from ultragroth_tpu.ops.kernels import _kernel_curve
    ops = _kernel_curve("g1")
    f = fused_map(
        lambda acc, qx, qy, qinf: ops.madd_unified(acc, qx, qy, qinf),
        block=block, name=f"g1_madd_b{block}")
    rng = np.random.default_rng(4)
    n = max(block, 2048)
    acc = ops.inf_xyzz((n,))
    qx = rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint32)
    qy = rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint32)
    qinf = np.zeros(n, bool)
    return f(acc, jnp.asarray(qx), jnp.asarray(qy), jnp.asarray(qinf))


def case_cg_loop(log_m, cb=128):
    """Constant-geometry NTT stages as an IN-KERNEL fori_loop with dynamic
    tw_ref[s] indexing — O(one stage) program size for any factor."""
    from ultragroth_tpu.ops import ntt as dntt
    from ultragroth_tpu.ops.field import fr
    kv = fr().kernel_view()
    m = 1 << log_m
    tws = np.asarray(dntt._cg_twiddles(log_m, False))      # [log_m, L, m/2]
    rng = np.random.default_rng(3)
    h = rng.integers(0, 1 << 16, size=(16, m, cb), dtype=np.uint32)
    h[15] &= 0x1FFF

    def kernel(x_ref, tw_ref, o_ref):
        def stage(s, x):
            u = x[:, : m // 2, :]
            w_in = x[:, m // 2:, :]
            t = kv.mont_mul(w_in, tw_ref[s][:, :, None])
            hi = kv.add(u, t)
            lo = kv.sub(u, t)
            return jnp.stack([hi, lo], axis=2).reshape(x.shape)

        o_ref[...] = jax.lax.fori_loop(0, log_m, stage, x_ref[...])

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((16, m, cb), jnp.uint32),
    )(h, tws)
    # correctness vs the XLA-staged reference
    want = dntt._cg_stages(h, tws, dntt._RolledView(fr()), log_m)
    ok = bool((np.asarray(out) == np.asarray(want)).all())
    print(f"  cg_loop{log_m} matches XLA stages: {ok}", flush=True)
    assert ok
    return out


def case_gather_pack(log_n=18, width=163840, iters=20):
    """Gather cost: 33xN uint32 plane-major vs 17xN uint64-packed —
    does halving the row count halve the random-gather wall?"""
    import time
    n = 1 << log_n
    rng = np.random.default_rng(9)
    t32 = jnp.asarray(rng.integers(0, 1 << 31, size=(33, n), dtype=np.uint32))
    t64_np = np.zeros((17, n), np.uint64)
    h = np.asarray(t32, np.uint64)
    t64_np[:16] = h[0:32:2] | (h[1:32:2] << np.uint64(32))
    t64_np[16] = h[32]
    t64 = jnp.asarray(t64_np)
    idx = jnp.asarray(rng.integers(0, n, size=width, dtype=np.int32))

    @jax.jit
    def g32(t, idx):
        return t[:, idx].sum(axis=1)

    @jax.jit
    def g64(t, idx):
        return t[:, idx].sum(axis=1)

    for name, fn, t in (("u32x33", g32, t32), ("u64x17", g64, t64)):
        out = fn(t, idx)
        np.asarray(out[:2])
        t0 = time.perf_counter()
        for _ in range(iters):
            np.asarray(fn(t, idx)[:2])
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"  gather {name}: {dt:.3f} ms / {width} cols", flush=True)
    return out


def main():
    which = sys.argv[1:] or ["interleave", "strided", "cg4", "cg6", "cg8"]
    for w in which:
        if w == "interleave":
            try_case(w, case_interleave)
        elif w == "strided":
            try_case(w, case_strided)
        elif w.startswith("cgl"):
            try_case(w, lambda lm=int(w[3:]): case_cg_loop(lm))
        elif w.startswith("cg"):
            try_case(w, lambda lm=int(w[2:]): case_cg(lm))
        elif w.startswith("loop"):
            try_case(w, lambda it=int(w[4:]): case_kernel_loop(it))
        elif w.startswith("maddb"):
            try_case(w, lambda b=int(w[5:]): case_madd_block(b))
        elif w == "gather":
            try_case(w, case_gather_pack)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
