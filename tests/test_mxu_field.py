"""MXU (matmul-REDC) kernel-mode mont_mul: exactness + wiring coverage.

ops/mxufield.py replaces the flat CIOS inside Pallas kernels when
ULTRAGROTH_MXU_FIELD=1: f32 byte-limb schoolbook + two constant-Toeplitz
MXU dots for the Montgomery reduction (all intermediates < 2^24, exact
in f32).  Checked here against FieldOps._mont_mul on CPU for both Fr and
Fq (random + edge inputs incl. the a < 2^256 lazy-operand contract), and
end-to-end through the Pallas interpreter + curve madd in a subprocess
(the kernel registry caches the backend/flag decision per process).
"""
import json
import os
import pathlib
import subprocess
import sys

import numpy as np
import jax.numpy as jnp

from ultragroth_tpu.ops.field import fr, fq
from ultragroth_tpu.ops.mxufield import mont_mul_mxu


def _rand_planes(n, rng, top=0x3FFF):
    a = rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint32)
    a[15] &= top
    return a


def _planes(vals):
    out = np.zeros((16, len(vals)), np.uint32)
    for j, v in enumerate(vals):
        for l in range(16):
            out[l, j] = (int(v) >> (16 * l)) & 0xFFFF
    return out


def test_mont_mul_mxu_matches_cios():
    rng = np.random.default_rng(7)
    for F in (fr(), fq()):
        a = _rand_planes(333, rng)
        b = _rand_planes(333, rng)
        want = np.asarray(F._mont_mul(jnp.asarray(a), jnp.asarray(b)))
        got = np.asarray(mont_mul_mxu(F, jnp.asarray(a), jnp.asarray(b)))
        assert (got == want).all(), F.name


def test_mont_mul_mxu_edges():
    F = fr()
    edges = [0, 1, 2, F.p - 1, F.p - 2, F.r, (F.r * F.r) % F.p]
    a = _planes(edges)
    for val in (0, 1, F.p - 1, F.r):
        b = _planes([val] * len(edges))
        want = np.asarray(F._mont_mul(jnp.asarray(a), jnp.asarray(b)))
        got = np.asarray(mont_mul_mxu(F, jnp.asarray(a), jnp.asarray(b)))
        assert (got == want).all(), val


def test_mont_mul_mxu_lazy_operand():
    """The CIOS contract extends to a < 2^256 (not reduced) when b < p —
    used by redc_carry-style callers; the MXU form must match."""
    F = fr()
    rng = np.random.default_rng(9)
    a = rng.integers(0, 1 << 16, size=(16, 64), dtype=np.uint32)  # < 2^256
    b = _rand_planes(64, rng, top=0x2FFF)
    want = np.asarray(F._mont_mul(jnp.asarray(a), jnp.asarray(b)))
    got = np.asarray(mont_mul_mxu(F, jnp.asarray(a), jnp.asarray(b)))
    assert (got == want).all()


_CHILD = r"""
import json
import pathlib

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
from ultragroth_tpu.runtime import cpu_cache_dir
jax.config.update("jax_compilation_cache_dir",
                  cpu_cache_dir(pathlib.Path.cwd() / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ultragroth_tpu.ops import kernels
from ultragroth_tpu.ops.curve import g1_ops

rng = np.random.default_rng(3)
N = 300
a = rng.integers(0, 1 << 16, size=(16, N), dtype=np.uint32); a[15] &= 0x2FFF
b = rng.integers(0, 1 << 16, size=(16, N), dtype=np.uint32); b[15] &= 0x2FFF
out = {"mont_mul": int(np.asarray(kernels.fr_mont_mul()(a, b))
                       .sum(dtype=np.uint64))}
acc = g1_ops().inf_xyzz((N,))
qinf = np.zeros(N, bool); qinf[::5] = True
acc = kernels.curve_madd_valid("g1")(acc, a, b, qinf)
acc = kernels.curve_madd_valid("g1")(acc, b, a, ~qinf)
out["g1_chain"] = sum(int(np.asarray(l).sum(dtype=np.uint64))
                      for l in jax.tree_util.tree_leaves(acc))
print(json.dumps(out))
"""


def _run_child(env_extra):
    env = dict(os.environ, **env_extra)
    env.pop("JAX_PLATFORMS", None)
    repo = pathlib.Path(__file__).resolve().parent.parent
    res = subprocess.run([sys.executable, "-c", _CHILD], cwd=repo, env=env,
                         capture_output=True, text=True, timeout=2400)
    assert res.returncode == 0, res.stderr[-3000:]
    return json.loads(res.stdout.strip().splitlines()[-1])


def test_mxu_field_kernel_path_interpret():
    # LAZY pinned off on both sides: raw-output bit-parity with the rolled
    # path only holds in the canonical domain (see tests/test_lazy_field.py)
    got = _run_child({"ULTRAGROTH_PALLAS": "interpret",
                      "ULTRAGROTH_MXU_FIELD": "1",
                      "ULTRAGROTH_LAZY": "0"})
    want = _run_child({"ULTRAGROTH_LAZY": "0"})
    assert got == want, (got, want)
