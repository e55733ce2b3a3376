"""Batched XYZZ group-law tests vs the affine oracle, G1 and G2."""
import random

import jax
import numpy as np
import pytest

from ultragroth_tpu.constants import FQ_MODULUS as Q
from ultragroth_tpu.ops import limbs as lb
from ultragroth_tpu.ops.curve import g1_ops, g2_ops
from ultragroth_tpu.ops.field import fq
from ultragroth_tpu.oracle import curve as oc

RNG = random.Random(99)
FQ = fq()


def g1_batch_to_planes(points):
    """List of oracle affine G1 (or None) -> (x, y, inf) Montgomery planes."""
    xs = [0 if p is None else p[0] for p in points]
    ys = [0 if p is None else p[1] for p in points]
    inf = np.array([p is None for p in points])
    x = FQ.to_mont(lb.ints_to_planes(xs))
    y = FQ.to_mont(lb.ints_to_planes(ys))
    return x, y, inf


def g2_batch_to_planes(points):
    xs0 = [0 if p is None else p[0][0] for p in points]
    xs1 = [0 if p is None else p[0][1] for p in points]
    ys0 = [0 if p is None else p[1][0] for p in points]
    ys1 = [0 if p is None else p[1][1] for p in points]
    inf = np.array([p is None for p in points])
    x = (FQ.to_mont(lb.ints_to_planes(xs0)), FQ.to_mont(lb.ints_to_planes(xs1)))
    y = (FQ.to_mont(lb.ints_to_planes(ys0)), FQ.to_mont(lb.ints_to_planes(ys1)))
    return x, y, inf


def g1_affine_from_device(x, y, inf):
    xi = lb.planes_to_ints(np.asarray(FQ.from_mont(x)))
    yi = lb.planes_to_ints(np.asarray(FQ.from_mont(y)))
    inf = np.atleast_1d(np.asarray(inf))
    return [None if inf[i] else (xi[i], yi[i]) for i in range(len(xi))]


def g2_affine_from_device(x, y, inf):
    x0 = lb.planes_to_ints(np.asarray(FQ.from_mont(x[0])))
    x1 = lb.planes_to_ints(np.asarray(FQ.from_mont(x[1])))
    y0 = lb.planes_to_ints(np.asarray(FQ.from_mont(y[0])))
    y1 = lb.planes_to_ints(np.asarray(FQ.from_mont(y[1])))
    inf = np.atleast_1d(np.asarray(inf))
    return [None if inf[i] else ((x0[i], x1[i]), (y0[i], y1[i]))
            for i in range(len(x0))]


def _rand_g1(n):
    return [oc.g1_mul(oc.G1, RNG.randrange(1, 1 << 64)) for _ in range(n)]


def _rand_g2(n):
    return [oc.g2_mul(oc.G2, RNG.randrange(1, 1 << 64)) for _ in range(n)]


def test_g1_madd_unified_edges():
    ops = g1_ops()
    base = _rand_g1(4)
    p_pts = base + [None, base[0], base[1], base[2]]
    q_pts = base[1:] + [base[0]] + [base[0], None, base[1],
                                    oc.g1_neg(base[2])]
    # expected: pairwise adds incl. inf+P, P+inf, P+P (double), P+(-P)
    expected = [oc.g1_add(p, q) for p, q in zip(p_pts, q_pts)]

    px, py, pinf = g1_batch_to_planes(p_pts)
    qx, qy, qinf = g1_batch_to_planes(q_pts)
    fn = jax.jit(lambda px, py, pinf, qx, qy, qinf: ops.to_affine(
        ops.madd_unified(ops.affine_to_xyzz(px, py, pinf), qx, qy, qinf)))
    got = g1_affine_from_device(*fn(px, py, pinf, qx, qy, qinf))
    assert got == expected


def test_g1_add_chain_vs_oracle():
    ops = g1_ops()
    n = 8
    pts = _rand_g1(n)
    qts = _rand_g1(n)
    px, py, pinf = g1_batch_to_planes(pts)
    qx, qy, qinf = g1_batch_to_planes(qts)

    def chain(px, py, pinf, qx, qy, qinf):
        p = ops.affine_to_xyzz(px, py, pinf)
        q = ops.affine_to_xyzz(qx, qy, qinf)
        s = ops.add_unified(p, q)          # p + q
        s = ops.add_unified(s, s_dbl(s))   # 3(p+q)
        return ops.to_affine(s)

    def s_dbl(s):
        return ops.dbl(s)

    got = g1_affine_from_device(*jax.jit(chain)(px, py, pinf, qx, qy, qinf))
    for i in range(n):
        e = oc.g1_add(pts[i], qts[i])
        e = oc.g1_mul(e, 3)
        assert got[i] == e


def test_g2_madd_and_dbl():
    ops = g2_ops()
    n = 4
    pts = _rand_g2(n) + [None]
    qts = _rand_g2(n) + [_rand_g2(1)[0]]
    expected = [oc.g2_add(p, q) for p, q in zip(pts, qts)]
    px, py, pinf = g2_batch_to_planes(pts)
    qx, qy, qinf = g2_batch_to_planes(qts)
    fn = jax.jit(lambda px, py, pinf, qx, qy, qinf: ops.to_affine(
        ops.madd_unified(ops.affine_to_xyzz(px, py, pinf), qx, qy, qinf)))
    got = g2_affine_from_device(*fn(px, py, pinf, qx, qy, qinf))
    assert got == expected

    dbl_fn = jax.jit(lambda px, py, pinf: ops.to_affine(
        ops.dbl(ops.affine_to_xyzz(px, py, pinf))))
    got2 = g2_affine_from_device(*dbl_fn(px, py, pinf))
    for i, p in enumerate(pts):
        assert got2[i] == oc.g2_add(p, p)
