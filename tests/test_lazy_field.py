"""Lazy-reduction (ULTRAGROTH_LAZY) kernel-mode field math vs the int oracle.

The lazy domain keeps Fq values in [0, 2p) and skips mont_mul's
canonicalizing conditional subtract (sound for BN254: 4p < R = 2^256; see
ops/field.lazy_enabled).  These tests drive representatives ABOVE p —
including p itself, the second representative of zero — through every
lazy op and check value-mod-p correctness plus the [0, 2p) closure bound,
then run a whole interpret-mode MSM under the flag and require its
(canonicalized) output to be bit-identical to the rolled-XLA MSM.
"""
import os
import random

import numpy as np
import pytest

import childproc

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
import os
import pathlib

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
from ultragroth_tpu.runtime import cpu_cache_dir
jax.config.update("jax_compilation_cache_dir",
                  cpu_cache_dir(pathlib.Path.cwd() / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ultragroth_tpu.ops import kernels
from ultragroth_tpu.ops import limbs as lb
from ultragroth_tpu.ops.curve import g1_ops
from ultragroth_tpu.ops.field import fq
from ultragroth_tpu.ops.fuse import _use_pallas
from ultragroth_tpu.oracle import curve as oc
from ultragroth_tpu.constants import FQ_MODULUS

assert _use_pallas()

PART = os.environ["ULTRAGROTH_CHILD_PART"]

P = FQ_MODULUS
M = 257
pts = [oc.g1_mul(oc.G1, k + 2) for k in range(M)]
qx = lb.ints_to_planes([(p[0] * (1 << 256)) % P for p in pts])
qy = lb.ints_to_planes([(p[1] * (1 << 256)) % P for p in pts])
qinf = np.zeros(M, bool)
qinf[::5] = True
qneg = np.zeros(M, bool)
qneg[::3] = True
valid = np.ones(M, bool)
valid[::7] = False
ok = np.zeros(M, bool)
ok[1::2] = True
# rolled constructor (canonical values are valid lazy representatives)
base = g1_ops().affine_to_xyzz(qy, qx, np.zeros(M, bool))

# one kernel program per part: a single child compiling the whole chain
# peaked at 78 GB RSS and met the OOM killer (round-5 forensics); parts
# run in separate processes with independent inputs
out = {}
if PART == "signed":
    # complete signed madd seeding from infinity: covers the doubling
    # branch the horner scaler reuses + the in-kernel y-negation
    out["signed"] = kernels.curve_madd_signed("g1")(
        g1_ops().inf_xyzz((M,)), qx, qy, qinf, qneg)
elif PART == "fast":
    acc, flags = kernels.curve_madd_fast("g1")(base, qy, qx, qneg, valid)
    out["fast"] = acc
    out["flags_scalar"] = int(np.asarray(flags).sum(dtype=np.uint64))
elif PART == "where":
    # add_where + the eager kernel-view neg (the bucket-reduction
    # banked-half negation is the lazy-domain-sensitive op)
    acc = kernels.curve_add_where("g1")(base, base, ok)
    out["where"] = acc
    out["neg"] = kernels._kernel_curve("g1").neg(acc)
else:
    raise SystemExit(f"unknown part {PART}")

# canonicalize before digesting: lazy-mode kernels emit [0, 2p)
# representatives; the residues must agree with the canonical run
F = fq()
dig = {}
for name, tree in out.items():
    if name.endswith("_scalar"):
        dig[name] = int(tree)
        continue
    canon = [np.asarray(F.canon(l)) for l in jax.tree_util.tree_leaves(tree)]
    dig[name] = sum(int(l.sum(dtype=np.uint64)) for l in canon)
print(json.dumps(dig))
"""

LAZY_PARTS = ("signed", "fast", "where")


@pytest.mark.slow
@pytest.mark.parametrize("part", LAZY_PARTS)
def test_lazy_interpret_kernels_match_canonical(part):
    """The MSM's curve kernels through the Pallas interpreter with lazy
    reduction ON: canonicalized outputs must be bit-identical to the
    canonical-mode run of the same kernels — covers the in-kernel lazy
    madd/add, the lazy-domain bucket negation, and the final canon.

    (A FULL interpret-mode MSM was tried here and is intractable: the
    while_loop drains re-trace the 40k-op unrolled kernels into XLA:CPU
    compiles that exceed 90 minutes — tests/pytest_r3c.log.  The MSM
    composition itself is covered on the rolled path by test_ntt_msm and
    on real hardware by the bench oracle checks.)"""
    # lazy and canonical children run CONCURRENTLY (both interpret-mode;
    # each compiles the same ONE kernel program); parts sequential so
    # peak RSS stays bounded (see _CHILD docstring)
    p_lazy = childproc.spawn(_CHILD, {"ULTRAGROTH_PALLAS": "interpret",
                                      "ULTRAGROTH_LAZY": "1",
                                      "ULTRAGROTH_CHILD_PART": part})
    p_base = childproc.spawn(_CHILD, {"ULTRAGROTH_PALLAS": "interpret",
                                      "ULTRAGROTH_LAZY": "0",
                                      "ULTRAGROTH_CHILD_PART": part})
    try:
        got = childproc.join(p_lazy)
        want = childproc.join(p_base)
    finally:
        for p in (p_lazy, p_base):
            childproc.reap(p)
    assert got == want, (part, got, want)
