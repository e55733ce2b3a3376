"""Quick CPU correctness check of the signed-digit MSM vs the int oracle."""
import os
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np

from ultragroth_tpu.ops import msm as dmsm
from ultragroth_tpu.oracle import curve as ocurve
from ultragroth_tpu.ops.limbs import int_to_limbs, limbs_to_int
from ultragroth_tpu.ops.curve import g1_ops
from ultragroth_tpu.constants import FR_MODULUS, FQ_MODULUS


def main():
    rng = np.random.default_rng(3)
    n, c = 200, 8
    # random G1 points: k*G for random k (oracle scalar mul)
    G = ocurve.G1
    pts = [ocurve.g1_mul(G, int(rng.integers(1, 1 << 60))) for _ in range(n)]
    scalars = [int.from_bytes(rng.bytes(32), "little") % FR_MODULUS
               for _ in range(n)]
    # a few edge scalars
    scalars[0] = 0
    scalars[1] = 1
    scalars[2] = FR_MODULUS - 1
    pts[3] = None  # infinity
    # duplicate point (exercises the doubling path)
    pts[5] = pts[4]
    scalars[4] = scalars[5] = 7

    mont = lambda v: (v << 256) % FQ_MODULUS
    x = np.zeros((16, n), np.uint32)
    y = np.zeros((16, n), np.uint32)
    inf = np.zeros(n, bool)
    for i, p in enumerate(pts):
        if p is None:
            inf[i] = True
            continue
        x[:, i] = int_to_limbs(mont(p[0]))
        y[:, i] = int_to_limbs(mont(p[1]))
    sc = np.zeros((16, n), np.uint32)
    for i, s in enumerate(scalars):
        sc[:, i] = int_to_limbs(s)

    expect = None
    for p, s in zip(pts, scalars):
        if p is None or s == 0:
            continue
        q = ocurve.g1_mul(p, s)
        expect = q if expect is None else ocurve.g1_add(expect, q)

    for cc in (8, 10, 13):
        out = dmsm.msm_g1(x, y, inf, sc, c=cc)
        ax, ay, ainf = g1_ops().to_affine(out)
        gx = (limbs_to_int(np.asarray(ax)) * pow(1 << 256, -1, FQ_MODULUS)) % FQ_MODULUS
        gy = (limbs_to_int(np.asarray(ay)) * pow(1 << 256, -1, FQ_MODULUS)) % FQ_MODULUS
        ok = (not bool(np.asarray(ainf))) and (gx, gy) == expect
        print(f"c={cc}: {'OK' if ok else 'MISMATCH ' + str((gx, gy)) + ' vs ' + str(expect)}",
              flush=True)
        if not ok:
            sys.exit(1)
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main()
