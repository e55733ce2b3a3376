"""Lazy-reduction (ULTRAGROTH_LAZY) kernel-mode field math vs the int oracle.

The lazy domain keeps Fq values in [0, 2p) and skips mont_mul's
canonicalizing conditional subtract (sound for BN254: 4p < R = 2^256; see
ops/field.lazy_enabled).  These tests drive representatives ABOVE p —
including p itself, the second representative of zero — through every
lazy op and check value-mod-p correctness plus the [0, 2p) closure bound,
then run a whole interpret-mode MSM under the flag and require its
(canonicalized) output to be bit-identical to the rolled-XLA MSM.
"""
import json
import os
import pathlib
import random
import subprocess
import sys

import numpy as np
import pytest

from ultragroth_tpu.constants import FQ_MODULUS
from ultragroth_tpu.ops import limbs as lb
from ultragroth_tpu.ops.field import fq

P = FQ_MODULUS
RINV = pow(1 << 256, -1, P)
RNG = random.Random(11)


def _reps(n):
    """Random lazy-domain representatives, seeded with the edge cases."""
    vals = [0, P, 1, P + 1, P - 1, 2 * P - 1]
    vals += [RNG.randrange(2 * P) for _ in range(n - len(vals))]
    return vals


def _ints(planes):
    return lb.planes_to_ints(np.asarray(planes))


def test_lazy_field_ops_match_oracle():
    F = fq()
    n = 32
    a, b = _reps(n), list(reversed(_reps(n)))
    A, B = lb.ints_to_planes(a), lb.ints_to_planes(b)

    mm = _ints(F._mont_mul(A, B, unroll=True, lazy=True))
    ad = _ints(F._add(A, B, unroll=True, lazy=True))
    sb = _ints(F._sub(A, B, unroll=True, lazy=True))
    ng = _ints(F._sub(F.zero((n,)), B, unroll=True, lazy=True))
    for i in range(n):
        assert mm[i] % P == (a[i] * b[i] * RINV) % P, i
        assert ad[i] % P == (a[i] + b[i]) % P, i
        assert sb[i] % P == (a[i] - b[i]) % P, i
        assert ng[i] % P == (-b[i]) % P, i
        for v in (mm[i], ad[i], sb[i], ng[i]):
            assert 0 <= v < 2 * P, (i, v)


def test_lazy_is_zero_and_canon():
    F = fq()
    vals = [0, P, 1, P + 1, P - 1, 2 * P - 1]
    A = lb.ints_to_planes(vals)
    got = np.asarray(F._is_zero_lazy(A))
    np.testing.assert_array_equal(
        got, [v % P == 0 for v in vals])
    canon = _ints(F.canon(A))
    assert canon == [v - P if v >= P else v for v in vals]


def test_lazy_rolled_forms_match_unrolled():
    """The rolled (assoc-scan) and flat lazy forms must agree bit-exactly:
    the fallback path and the Pallas path share callers."""
    F = fq()
    a, b = _reps(16), _reps(16)
    A, B = lb.ints_to_planes(a), lb.ints_to_planes(b)
    for fn in ("_mont_mul", "_add", "_sub"):
        rolled = np.asarray(getattr(F, fn)(A, B, unroll=False, lazy=True))
        flat = np.asarray(getattr(F, fn)(A, B, unroll=True, lazy=True))
        np.testing.assert_array_equal(rolled, flat, err_msg=fn)


def test_lazy_madd_chain_matches_oracle():
    """A lazy-kernel-view madd_fast chain (eager, tiny batch) must land on
    the oracle point after one final canonicalization — exercises the
    lazy sub's p-representative handling inside the curve formula."""
    os.environ["ULTRAGROTH_LAZY"] = "1"
    try:
        from ultragroth_tpu.ops.curve import CurveOps
        from ultragroth_tpu.oracle import curve as oc
        ops = CurveOps(fq().kernel_view())
        F = fq()
        pts = [oc.g1_mul(oc.G1, k) for k in range(2, 6)]
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        X = lb.ints_to_planes([(x * (1 << 256)) % P for x in xs])
        Y = lb.ints_to_planes([(y * (1 << 256)) % P for y in ys])
        acc = ops.affine_to_xyzz(np.repeat(X[:, :1], 4, axis=1),
                                 np.repeat(Y[:, :1], 4, axis=1),
                                 np.zeros(4, bool))
        for k in (1, 2, 3):
            qx = np.repeat(X[:, k:k + 1], 4, axis=1)
            qy = np.repeat(Y[:, k:k + 1], 4, axis=1)
            acc, bad = ops.madd_fast(acc, qx, qy)
            assert not np.any(np.asarray(bad)), k
        x3, y3, zz, zzz = [lb.planes_to_ints(np.asarray(F.canon(t)))
                           for t in acc]
        expect = oc.g1_msm(pts, [1, 1, 1, 1])
        for lane in range(4):
            izz = pow((zz[lane] * RINV) % P, -1, P)
            izzz = pow((zzz[lane] * RINV) % P, -1, P)
            xa = (x3[lane] * RINV * izz) % P
            ya = (y3[lane] * RINV * izzz) % P
            assert (xa, ya) == expect, lane
    finally:
        os.environ.pop("ULTRAGROTH_LAZY", None)


_CHILD = r"""
import json
import pathlib

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path.cwd() / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ultragroth_tpu.ops.fuse import _use_pallas
from ultragroth_tpu.ops import msm as dmsm
from ultragroth_tpu.ops import limbs as lb
from ultragroth_tpu.oracle import curve as oc
from ultragroth_tpu.constants import FQ_MODULUS

assert _use_pallas()
assert dmsm._lazy_kernels()

P = FQ_MODULUS
N = 128
pts = [oc.g1_mul(oc.G1, k + 2) for k in range(N)]
X = lb.ints_to_planes([(p[0] * (1 << 256)) % P for p in pts])
Y = lb.ints_to_planes([(p[1] * (1 << 256)) % P for p in pts])
inf = np.zeros(N, bool)
scalars = lb.ints_to_planes([(7 * i + 3) for i in range(N)])
pt = dmsm.msm_g1(X, Y, inf, scalars, c=8)
digest = [int(np.asarray(t).sum(dtype=np.uint64))
          for t in jax.tree_util.tree_leaves(pt)]
print(json.dumps(digest))
"""


@pytest.mark.slow
def test_lazy_interpret_msm_matches_rolled():
    """Full MSM through the Pallas interpreter with lazy reduction ON:
    the canonicalized output point must be bit-identical to the rolled
    XLA MSM (flag off, CPU fallback) — covers the in-kernel lazy madd,
    the lazy-domain bucket negation, and the final canon."""
    env = dict(os.environ, ULTRAGROTH_PALLAS="interpret",
               ULTRAGROTH_LAZY="1")
    env.pop("JAX_PLATFORMS", None)
    repo = pathlib.Path(__file__).resolve().parent.parent
    res = subprocess.run([sys.executable, "-c", _CHILD], cwd=repo, env=env,
                         capture_output=True, text=True, timeout=5400)
    assert res.returncode == 0, res.stderr[-3000:]
    got = json.loads(res.stdout.strip().splitlines()[-1])

    import jax
    from ultragroth_tpu.ops import msm as dmsm
    from ultragroth_tpu.oracle import curve as oc
    N = 128
    pts = [oc.g1_mul(oc.G1, k + 2) for k in range(N)]
    X = lb.ints_to_planes([(p[0] * (1 << 256)) % P for p in pts])
    Y = lb.ints_to_planes([(p[1] * (1 << 256)) % P for p in pts])
    scalars = lb.ints_to_planes([(7 * i + 3) for i in range(N)])
    pt = dmsm.msm_g1(X, Y, np.zeros(N, bool), scalars, c=8)
    want = [int(np.asarray(t).sum(dtype=np.uint64))
            for t in jax.tree_util.tree_leaves(pt)]
    assert got == want, (got, want)
