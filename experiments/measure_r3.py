"""Phase-level timing of the SIGNED-DIGIT G1 MSM on the real TPU.

Round-2 follow-up to measure_r2e.py: the signed (windowed-NAF) recode
halves the bucket count (lanes per window 2^c -> 2^(c-1)), so the unified
accumulation loop runs ~2x the steps on half the lanes with better
balance, and the weighted reduction halves.  Also separates the full-MSM
timing into device-resident vs host (numpy) inputs to expose the H2D
relay transfer that measure_r2e.py conflated into "module overhead".

Run:  python experiments/measure_r3.py [log_n] [c] 2>&1 | tee experiments/measure_r3.log
"""
import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

if os.environ.get("R2E_CPU"):          # cheap trace-check mode
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp

from ultragroth_tpu.ops import msm as dmsm
from ultragroth_tpu.ops import kernels
from ultragroth_tpu.ops.curve import g1_ops

LOG_N = int(sys.argv[1]) if len(sys.argv) > 1 else 18
C = int(sys.argv[2]) if len(sys.argv) > 2 else 13
N, NB = 1 << LOG_N, 1 << (C - 1)

print("device=", jax.devices()[0], flush=True)


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:2])


def timeit(name, fn, *args, iters=3):
    try:
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            sync(fn(*args))
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"{name}: {dt:.1f} ms steady (compile+first {tc:.1f}s)",
              flush=True)
        return out
    except Exception as e:  # noqa: BLE001
        print(f"{name}: ERROR {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None


def main():
    rng = np.random.default_rng(7)
    x = rng.integers(0, 1 << 16, size=(16, N), dtype=np.uint32)
    y = rng.integers(0, 1 << 16, size=(16, N), dtype=np.uint32)
    inf = np.zeros(N, bool)
    scalars = rng.integers(0, 1 << 16, size=(16, N), dtype=np.uint32)
    scalars[15] &= 0x2FFF  # < r (canonical-form contract)

    ops = g1_ops()
    add_where = kernels.curve_add_where("g1")
    n_windows = -(-dmsm.SCALAR_BITS // C)
    splits = [dmsm._split_factor(w, C) for w in range(n_windows)]

    @jax.jit
    def digits_phase(scalars):
        buckets, negs = dmsm._signed_digits(scalars, C, n_windows)
        idx = jnp.where(buckets > 0, buckets - 1, NB)
        enc = (jnp.arange(N, dtype=jnp.int32)[None, :] * 2
               + negs.astype(jnp.int32))
        _, o = jax.lax.sort((idx, enc), dimension=1, num_keys=1)
        cnt = jax.vmap(functools.partial(jnp.bincount, length=NB + 1))(
            idx)[:, :NB]
        return o, cnt

    oc = timeit(f"signed digits+sort+bincount[{n_windows}w]", digits_phase,
                jnp.asarray(scalars))
    if oc is None:
        return
    orders, counts = oc
    cnp = np.asarray(counts)
    print(f"  bucket counts: avg={cnp.mean():.1f} max={cnp.max()} "
          f"(slack {cnp.max() / max(cnp.mean(), 1e-9):.2f}x)", flush=True)

    packed = jnp.asarray(np.asarray(
        dmsm._pack_points_planes(jnp.asarray(x), jnp.asarray(y))))

    @jax.jit
    def accum_phase(packed, orders, counts):
        return dmsm._bucket_accumulate_all(
            ops, "g1", packed, jnp.zeros((16, 1), jnp.uint32),
            jnp.zeros((16, 1), jnp.uint32), orders, counts, C, splits)

    acc = timeit("accum[two-phase fast-madd]", accum_phase,
                 packed, orders, counts)
    if acc is None:
        return

    groups: dict = {}
    for w in range(n_windows):
        groups.setdefault(splits[w], []).append(w)

    @jax.jit
    def wtot_phase(acc):
        wsums = [None] * n_windows
        for split, ws in groups.items():
            g = dmsm._tree_map(lambda t: t[..., np.asarray(ws), :], acc)
            for _ in range(split.bit_length() - 1):
                g = dmsm._fold_pairs(add_where, g)
            totals = dmsm._weighted_totals(ops, add_where, g, NB // split)
            for i, w in enumerate(ws):
                wsums[w] = dmsm._tree_map(lambda t, i=i: t[..., i], totals)
        return dmsm._tree_map(lambda *ts: jnp.stack(ts, axis=-1), *wsums)

    totals = timeit("fold+weighted_totals", wtot_phase, acc)
    if totals is None:
        return

    @jax.jit
    def horner_phase(totals):
        scaled = kernels.curve_horner_scale("g1", C, n_windows)(*totals)
        m = 1 << max(1, (n_windows - 1).bit_length())
        total = dmsm._tree_map(
            lambda t: jnp.pad(t, ((0, 0), (0, m - n_windows))), scaled)
        while total[0].shape[-1] > 1:
            total = dmsm._fold_pairs(add_where, total)
        return total

    timeit("horner[in-kernel chain]", horner_phase, totals)

    # full MSM, device-resident inputs (the prover's steady-state shape:
    # points/scalars are already on-chip) vs host numpy inputs (includes
    # the ~50 MB H2D transfer through the axon relay per call)
    dx, dy, dinf, dsc = (jnp.asarray(x), jnp.asarray(y), jnp.asarray(inf),
                         jnp.asarray(scalars))
    sync(dsc)
    timeit("full msm_g1[device inputs]",
           lambda: dmsm.msm_g1(dx, dy, dinf, dsc, c=C))
    timeit("full msm_g1[host inputs]",
           lambda: dmsm.msm_g1(x, y, inf, scalars, c=C))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
