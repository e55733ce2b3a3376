"""Lazy-reduction MSM measurement on the real TPU (v5e via axon relay).

The round-3 floor analysis (PERF.md) names in-kernel lazy reduction the
one remaining lever toward >= 500 K pts/s: mont-mul's canonicalizing
conditional subtract is ~25-30% of the fused kernel cost and is redundant
inside the bucket loop when values ride in [0, 2p).  The implementation
landed behind ULTRAGROTH_LAZY=1 (ops/field.py lazy_enabled) with CPU
interpret-mode exactness tests (tests/test_lazy_field.py); this script
produces the DEVICE decision numbers.

Run (one subprocess per mode -- the flag is read at trace time):
    python experiments/measure_lazy.py            # runs both modes
    python experiments/measure_lazy.py base|lazy  # one mode

Prints the full-MSM steady ms at 2^18/c=13 plus a SHA of the canonical
output point so the two modes can be checked bit-identical on device.
"""
import hashlib
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_mode(mode: str) -> None:
    os.environ["ULTRAGROTH_LAZY"] = "1" if mode == "lazy" else "0"
    import jax
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp
    from measure_r3b import distinct_points, rand_scalars, sync, timeit
    from ultragroth_tpu.ops import msm as dmsm

    print(f"== mode={mode} (ULTRAGROTH_LAZY={os.environ['ULTRAGROTH_LAZY']}),"
          " full msm 2^18/c=13 ==", flush=True)
    sc = jnp.asarray(rand_scalars(18, 7))
    x, y, inf = distinct_points(18)
    x, y, inf = jnp.asarray(x), jnp.asarray(y), jnp.asarray(inf)
    sync(x)
    t = timeit(f"  msm {mode}", lambda: dmsm.msm_g1(x, y, inf, sc, c=13),
               iters=5)
    out = dmsm.msm_g1(x, y, inf, sc, c=13)
    h = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(out):
        h.update(np.asarray(leaf).tobytes())
    print(f"  out sha256 (xyzz): {h.hexdigest()[:16]}", flush=True)
    # affine hash too: a raw-xyzz mismatch that canonicalizes to the same
    # affine point is a representation change, not a correctness break
    from ultragroth_tpu.ops.curve import g1_ops
    ha = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(g1_ops().to_affine(out)):
        ha.update(np.asarray(leaf).tobytes())
    print(f"  out sha256 (affine): {ha.hexdigest()[:16]}", flush=True)
    if t:
        print(f"  rate: {(1 << 18) / t:,.0f} pts/s", flush=True)


if __name__ == "__main__":
    modes = sys.argv[1:] or ["base", "lazy"]
    if len(modes) == 1:
        run_mode(modes[0])
    else:
        for m in modes:
            t0 = time.time()
            p = subprocess.run([sys.executable, __file__, m],
                               cwd=os.path.dirname(__file__), check=False)
            status = "ok" if p.returncode == 0 else f"FAILED rc={p.returncode}"
            print(f"[mode {m}: {time.time() - t0:.0f}s total, {status}]",
                  flush=True)
