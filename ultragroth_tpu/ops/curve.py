"""Batched short-Weierstrass group law in XYZZ coordinates (a = 0).

One generic implementation serves G1 (field = Fq) and G2 (field = Fq2),
the same structural trick as the reference's templated group law (XYZZ
zz/zzz layout per /root/reference/src/groth16.cpp:400-410), but batched:
every op maps over [*batch] points kept as limb planes, with branchless
`where`-selected handling of the special cases (infinity, P == +-Q).

Graph-size discipline: independent field multiplies inside one formula are
STACKED along the batch axis and issued as a single mont_mul ("mul-many"),
so a complete unified add lowers to ~7 multiplier instantiations instead of
~23 - this is what keeps XLA compile times of the MSM graphs sane and gives
the TPU fewer, wider VPU passes.

Point encodings (pytrees):
  affine batch: (x, y) field elements; infinity is tracked by a separate
                bool mask [*batch] (zkey encodes it as x == y == 0).
  xyzz batch:   (X, Y, ZZ, ZZZ); infinity <=> ZZ == 0.

Formulas: madd-2008-s / add-2008-s / dbl-2008-s-1 (hyperelliptic.org EFD),
complete-ified by computing both the add and double paths and selecting.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .field import FieldOps, fq
from .fq2 import Fq2Ops


def _tmap(fn, *ts):
    return jax.tree_util.tree_map(fn, *ts)


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
        one = F.one_mont(batch)
        zz = F.select(inf, F.zero(batch), one)
        return (x, y, zz, zz)

    def _batch_shape(self, x):
        arr = x[0] if isinstance(x, tuple) else x
        return arr.shape[1:]

    def is_inf(self, p):
        return self.F.is_zero(p[2])

    # -- stacked multiplier ------------------------------------------------

    def _mul_many(self, pairs):
        """[(a1,b1),...,(ak,bk)] -> [a1*b1, ..., ak*bk] via ONE mont_mul on
        batch-concatenated operands (all pairs must share a batch shape).

        Inside Pallas kernels (field marked fuse_stacks=False) stacking is
        pointless (everything is VMEM-resident) and the concat doesn't lower
        in Mosaic - issue the muls individually there."""
        k = len(pairs)
        if k == 1 or not getattr(self.F, "fuse_stacks", True):
            return [self.F.mont_mul(a, b) for a, b in pairs]
        flat = self._batch_shape(pairs[0][0]) == ()

        def prep(v):
            return _tmap(lambda t: t[..., None], v) if flat else v

        a = _tmap(lambda *xs: jnp.concatenate(xs, axis=-1),
                  *[prep(p[0]) for p in pairs])
        b = _tmap(lambda *xs: jnp.concatenate(xs, axis=-1),
                  *[prep(p[1]) for p in pairs])
        c = self.F.mont_mul(a, b)
        # split back along the concat axis
        outs = []
        n = a[0].shape[-1] // k if isinstance(a, tuple) else a.shape[-1] // k
        for i in range(k):
            piece = _tmap(lambda t: t[..., i * n:(i + 1) * n], c)
            if flat:
                piece = _tmap(lambda t: t[..., 0], piece)
            outs.append(piece)
        return outs

    # -- group law ---------------------------------------------------------

    def dbl(self, p):
        """dbl-2008-s-1 (a=0), 3 stacked multiplier passes."""
        F = self.F
        x1, y1, zz1, zzz1 = p
        u = F.add(y1, y1)
        v, xx = self._mul_many([(u, u), (x1, x1)])
        m = F.add(F.add(xx, xx), xx)
        w, s, mm = self._mul_many([(u, v), (x1, v), (m, m)])
        x3 = F.sub(mm, F.add(s, s))
        t1, t2, zz3, zzz3 = self._mul_many(
            [(m, F.sub(s, x3)), (w, y1), (v, zz1), (w, zzz1)])
        y3 = F.sub(t1, t2)
        return (x3, y3, zz3, zzz3)

    def madd_unified(self, p, qx, qy, q_inf):
        """Complete mixed add: xyzz P + affine Q -> xyzz."""
        F = self.F
        x1, y1, zz1, zzz1 = p
        p_inf = self.is_inf(p)

        u2, s2 = self._mul_many([(qx, zz1), (qy, zzz1)])
        pp_ = F.sub(u2, x1)
        r_ = F.sub(s2, y1)
        same_x = F.is_zero(pp_)
        same_y = F.is_zero(r_)

        pp, rr = self._mul_many([(pp_, pp_), (r_, r_)])
        ppp, q_, zz3 = self._mul_many([(pp_, pp), (x1, pp), (zz1, pp)])
        x3 = F.sub(F.sub(rr, ppp), F.add(q_, q_))
        t1, t2, zzz3 = self._mul_many(
            [(r_, F.sub(q_, x3)), (y1, ppp), (zzz1, ppp)])
        y3 = F.sub(t1, t2)
        added = (x3, y3, zz3, zzz3)

        q_xyzz = self.affine_to_xyzz(qx, qy, q_inf)
        # the double path only matters when some lane has P == Q; gate its
        # ~9 muls behind a scalar cond (when false, `doubled` is never
        # selected, so any placeholder is sound)
        need_dbl = jnp.any(same_x & same_y & ~p_inf & ~q_inf)
        doubled = jax.lax.cond(need_dbl, lambda: self.dbl(q_xyzz),
                               lambda: q_xyzz)

        batch = self._batch_shape(qx)
        out = self.select(same_x & same_y, doubled, added)
        out = self.select(same_x & ~same_y & ~p_inf & ~q_inf,
                          self.inf_xyzz(batch), out)
        out = self.select(q_inf, p, out)
        out = self.select(p_inf, q_xyzz, out)
        return out

    def madd_fast(self, p, qx, qy):
        """INCOMPLETE mixed add (madd-2008-s, 10 muls): assumes P != inf,
        Q != inf, P != +-Q.  Returns (P+Q, bad) where `bad` flags lanes
        violating the assumptions (x1 == u2, i.e. doubling/cancellation,
        or P at infinity) — the caller must redo those via madd_unified.
        Q at infinity must be excluded upstream (the MSM drops infinity
        table points at the digit stage).  ~25% cheaper than the complete
        form: no affine_to_xyzz constants, no doubling branch, one output
        select instead of four."""
        F = self.F
        x1, y1, zz1, zzz1 = p
        u2, s2 = self._mul_many([(qx, zz1), (qy, zzz1)])
        pp_ = F.sub(u2, x1)
        r_ = F.sub(s2, y1)
        bad = F.is_zero(pp_) | F.is_zero(zz1)
        pp, rr = self._mul_many([(pp_, pp_), (r_, r_)])
        ppp, q_, zz3 = self._mul_many([(pp_, pp), (x1, pp), (zz1, pp)])
        x3 = F.sub(F.sub(rr, ppp), F.add(q_, q_))
        t1, t2, zzz3 = self._mul_many(
            [(r_, F.sub(q_, x3)), (y1, ppp), (zzz1, ppp)])
        y3 = F.sub(t1, t2)
        return (x3, y3, zz3, zzz3), bad

    def add_unified(self, p, q):
        """Complete xyzz + xyzz add, 4 stacked passes + unified dbl."""
        F = self.F
        x1, y1, zz1, zzz1 = p
        x2, y2, zz2, zzz2 = q
        p_inf = self.is_inf(p)
        q_inf = self.is_inf(q)

        u1, u2, s1, s2 = self._mul_many(
            [(x1, zz2), (x2, zz1), (y1, zzz2), (y2, zzz1)])
        pp_ = F.sub(u2, u1)
        r_ = F.sub(s2, s1)
        same_x = F.is_zero(pp_)
        same_y = F.is_zero(r_)

        pp, rr, zz_a, zzz_a = self._mul_many(
            [(pp_, pp_), (r_, r_), (zz1, zz2), (zzz1, zzz2)])
        ppp, q_, zz3 = self._mul_many([(pp_, pp), (u1, pp), (zz_a, pp)])
        x3 = F.sub(F.sub(rr, ppp), F.add(q_, q_))
        t1, t2, zzz3 = self._mul_many(
            [(r_, F.sub(q_, x3)), (s1, ppp), (zzz_a, ppp)])
        y3 = F.sub(t1, t2)
        added = (x3, y3, zz3, zzz3)

        need_dbl = jnp.any(same_x & same_y & ~p_inf & ~q_inf)
        doubled = jax.lax.cond(need_dbl, lambda: self.dbl(p), lambda: p)
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
        xa, ya = self._mul_many([(x, izz), (y, izzz)])
        return (xa, ya, inf)

    def to_affine_batch(self, p):
        """to_affine via ONE Montgomery-trick batch inversion over the
        stacked (zz, zzz) lanes — ~170x fewer multiplies than the
        per-element Fermat chains for big one-shot normalizations
        (fixed-base tables).  inv(0) = 0, so infinity lanes stay (0, 0)."""
        F = self.F
        x, y, zz, zzz = p
        inf = self.is_inf(p)
        both = _tmap(lambda a, b: jnp.concatenate(
            [a.reshape(a.shape[0], -1), b.reshape(b.shape[0], -1)],
            axis=-1), zz, zzz)
        invs = F.batch_inv_mont(both)
        n = jax.tree_util.tree_leaves(zz)[0].reshape(
            jax.tree_util.tree_leaves(zz)[0].shape[0], -1).shape[-1]
        izz = _tmap(lambda t, z: t[..., :n].reshape(z.shape), invs, zz)
        izzz = _tmap(lambda t, z: t[..., n:].reshape(z.shape), invs, zzz)
        xa, ya = self._mul_many([(x, izz), (y, izzz)])
        return (xa, ya, inf)


def g1_ops() -> CurveOps:
    return CurveOps(fq())


def g2_ops() -> CurveOps:
    return CurveOps(Fq2Ops())
