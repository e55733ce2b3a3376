"""Batched short-Weierstrass group law in XYZZ coordinates (a = 0).

One generic implementation serves G1 (field = Fq) and G2 (field = Fq2),
the same structural trick as the reference's templated group law (XYZZ
zz/zzz layout per /root/reference/src/groth16.cpp:400-410), but batched:
every op maps over [*batch] points kept as limb planes, with branchless
`where`-selected handling of the special cases (infinity, P == +-Q).

Point encodings (pytrees):
  affine batch: (x, y) field elements; infinity is tracked by a separate
                bool mask [*batch] (zkey encodes it as x == y == 0).
  xyzz batch:   (X, Y, ZZ, ZZZ); infinity <=> ZZ == 0.

Formulas: madd-2008-s / add-2008-s / dbl-2008-s-1 (hyperelliptic.org EFD),
complete-ified by computing both the add and double paths and selecting.
"""
from __future__ import annotations

from .field import FieldOps, fq
from .fq2 import Fq2Ops


class CurveOps:
    def __init__(self, F):
        self.F = F

    # -- constructors ------------------------------------------------------

    def inf_xyzz(self, batch_shape=()):
        z = self.F.zero(batch_shape)
        one = self.F.one_mont(batch_shape)
        return (one, one, z, z)

    def affine_to_xyzz(self, x, y, inf):
        """(x, y) Montgomery-form affine + inf mask -> xyzz batch."""
        F = self.F
        batch = self._batch_shape(x)
        one = self._bc(F.one_mont(batch), batch)
        zz = F.select(inf, F.zero(batch), one)
        return (x, y, zz, zz)

    def _batch_shape(self, x):
        # x is [L, *batch] for Fq or a tuple of such for Fq2
        arr = x[0] if isinstance(x, tuple) else x
        return arr.shape[1:]

    def _bc(self, v, batch):
        return v

    def is_inf(self, p):
        return self.F.is_zero(p[2])

    # -- group law ---------------------------------------------------------

    def dbl(self, p):
        """dbl-2008-s-1 (a=0): 6M + 3S.  Handles infinity (ZZ=0 propagates)
        and the y = 0 two-torsion (not on BN254 G1/G2, but U=0 -> ZZ3=0)."""
        F = self.F
        x1, y1, zz1, zzz1 = p
        u = F.add(y1, y1)
        v = F.mont_sqr(u)
        w = F.mont_mul(u, v)
        s = F.mont_mul(x1, v)
        xx = F.mont_sqr(x1)
        m = F.add(F.add(xx, xx), xx)
        x3 = F.sub(F.mont_sqr(m), F.add(s, s))
        y3 = F.sub(F.mont_mul(m, F.sub(s, x3)), F.mont_mul(w, y1))
        zz3 = F.mont_mul(v, zz1)
        zzz3 = F.mont_mul(w, zzz1)
        return (x3, y3, zz3, zzz3)

    def madd_unified(self, p, qx, qy, q_inf):
        """Complete mixed add: xyzz P + affine Q -> xyzz.  ~19 muls."""
        F = self.F
        x1, y1, zz1, zzz1 = p
        p_inf = self.is_inf(p)

        u2 = F.mont_mul(qx, zz1)
        s2 = F.mont_mul(qy, zzz1)
        pp_ = F.sub(u2, x1)
        r_ = F.sub(s2, y1)
        same_x = F.is_zero(pp_)
        same_y = F.is_zero(r_)

        pp = F.mont_sqr(pp_)
        ppp = F.mont_mul(pp_, pp)
        q_ = F.mont_mul(x1, pp)
        rr = F.mont_sqr(r_)
        x3 = F.sub(F.sub(rr, ppp), F.add(q_, q_))
        y3 = F.sub(F.mont_mul(r_, F.sub(q_, x3)), F.mont_mul(y1, ppp))
        zz3 = F.mont_mul(zz1, pp)
        zzz3 = F.mont_mul(zzz1, ppp)
        added = (x3, y3, zz3, zzz3)

        q_xyzz = self.affine_to_xyzz(qx, qy, q_inf)
        doubled = self.dbl(q_xyzz)

        # special-case selection (innermost first):
        # same point -> doubled; opposite points -> infinity
        batch = self._batch_shape(qx)
        out = self.select(same_x & same_y, doubled, added)
        out = self.select(same_x & ~same_y & ~p_inf & ~q_inf,
                          self.inf_xyzz(batch), out)
        out = self.select(q_inf, p, out)
        out = self.select(p_inf, q_xyzz, out)
        return out

    def add_unified(self, p, q):
        """Complete xyzz + xyzz add: ~23 muls."""
        F = self.F
        x1, y1, zz1, zzz1 = p
        x2, y2, zz2, zzz2 = q
        p_inf = self.is_inf(p)
        q_inf = self.is_inf(q)

        u1 = F.mont_mul(x1, zz2)
        u2 = F.mont_mul(x2, zz1)
        s1 = F.mont_mul(y1, zzz2)
        s2 = F.mont_mul(y2, zzz1)
        pp_ = F.sub(u2, u1)
        r_ = F.sub(s2, s1)
        same_x = F.is_zero(pp_)
        same_y = F.is_zero(r_)

        pp = F.mont_sqr(pp_)
        ppp = F.mont_mul(pp_, pp)
        q_ = F.mont_mul(u1, pp)
        rr = F.mont_sqr(r_)
        x3 = F.sub(F.sub(rr, ppp), F.add(q_, q_))
        y3 = F.sub(F.mont_mul(r_, F.sub(q_, x3)), F.mont_mul(s1, ppp))
        zz3 = F.mont_mul(F.mont_mul(zz1, zz2), pp)
        zzz3 = F.mont_mul(F.mont_mul(zzz1, zzz2), ppp)
        added = (x3, y3, zz3, zzz3)

        doubled = self.dbl(p)
        batch = self._batch_shape(x1)
        out = self.select(same_x & same_y, doubled, added)
        out = self.select(same_x & ~same_y & ~p_inf & ~q_inf,
                          self.inf_xyzz(batch), out)
        out = self.select(q_inf, p, out)
        out = self.select(p_inf, q, out)
        return out

    def neg(self, p):
        return (p[0], self.F.neg(p[1]), p[2], p[3])

    def select(self, cond, a, b):
        """cond [*batch]; a, b xyzz batches."""
        return tuple(self.F.select(cond, ai, bi) for ai, bi in zip(a, b))

    # -- normalization -----------------------------------------------------

    def to_affine(self, p):
        """xyzz -> (x, y, inf) Montgomery-form affine, batched inversion."""
        F = self.F
        x, y, zz, zzz = p
        inf = self.is_inf(p)
        izz = F.inv_mont(zz)     # 0 stays 0
        izzz = F.inv_mont(zzz)
        return (F.mont_mul(x, izz), F.mont_mul(y, izzz), inf)


def g1_ops() -> CurveOps:
    return CurveOps(fq())


def g2_ops() -> CurveOps:
    return CurveOps(Fq2Ops())
