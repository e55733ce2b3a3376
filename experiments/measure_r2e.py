"""Phase-level timing of the reworked G1 MSM on the real TPU.

The full 2^18 c=13 MSM measured 1185 ms steady (measure_r2d) but the sum
of its parts, extrapolated from microbenches, is ~330 ms.  Time each phase
as its own jit graph on realistic inputs to find the missing ~850 ms:

  digits    - window digit extraction + batched argsort + bincount
  accum     - the while_loop bucket accumulation, one 19-window scan group
  wtotals   - binary-decomposition weighted reduction (19 windows)
  horner    - the final 20-window Horner (c doublings per window)
  full      - the whole msm_g1 for reference

Run:  python experiments/measure_r2e.py 2>&1 | tee experiments/measure_r2e.log
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
    # share the bench's persistent cache: identical jit graphs (msm_g1 at
    # the bench shapes) then cost milliseconds in the driver's bench run
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
N, NB = 1 << LOG_N, 1 << C

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
    # random affine-ish planes are fine for timing (madd cost is input-
    # independent); scalars full-range 254-bit
    x = rng.integers(0, 1 << 16, size=(16, N), dtype=np.uint32)
    y = rng.integers(0, 1 << 16, size=(16, N), dtype=np.uint32)
    inf = np.zeros(N, bool)
    scalars = rng.integers(0, 1 << 16, size=(16, N), dtype=np.uint32)
    scalars[15] &= 0x3FFF

    ops = g1_ops()
    madd = kernels.curve_madd_valid("g1")
    add_where = kernels.curve_add_where("g1")
    n_windows = -(-dmsm.SCALAR_BITS // C)
    splits = [dmsm._split_factor(w, C) for w in range(n_windows)]

    @jax.jit
    def digits_phase(scalars):
        d = jnp.stack([dmsm._window_digits(scalars, w, C)
                       for w in range(n_windows)]).astype(jnp.int32)
        o = jnp.argsort(d, axis=1).astype(jnp.int32)
        cnt = jax.vmap(functools.partial(jnp.bincount, length=NB))(d)
        return o, cnt

    oc = timeit(f"digits+sort+bincount[{n_windows}w]", digits_phase,
                jnp.asarray(scalars))
    if oc is None:
        return
    orders, counts = oc

    packed = jnp.asarray(np.asarray(
        dmsm._pack_points_planes(jnp.asarray(x), jnp.asarray(y),
                                 jnp.asarray(inf))))

    @jax.jit
    def accum_phase(packed, orders, counts):
        return dmsm._bucket_accumulate_all(
            ops, madd, packed, jnp.zeros((16, 1), jnp.uint32),
            jnp.zeros((16, 1), jnp.uint32), orders, counts, C, splits)

    acc = timeit("accum[unified while-loop]", accum_phase,
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
        def body(total, wsum):
            total = jax.lax.fori_loop(
                0, C, lambda i, t: dmsm._add_all(add_where, t, t), total)
            return dmsm._add_all(
                add_where, total,
                dmsm._tree_map(lambda t: t[:, None], wsum)), None

        wsums = [dmsm._tree_map(lambda t, i=i: t[..., i], totals)
                 for i in range(n_windows)]
        stacked = dmsm._tree_map(lambda *ts: jnp.stack(ts), *wsums[::-1])
        total, _ = jax.lax.scan(body, ops.inf_xyzz((1,)), stacked)
        return total

    timeit("horner[fused dbl]", horner_phase, totals)

    timeit("full msm_g1", lambda: dmsm.msm_g1(x, y, inf, scalars, c=C))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
