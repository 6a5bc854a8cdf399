"""COMPLETE projective EC kernels for j-invariant-0 curves (a = 0).

Renes–Costello–Batina 2015 ("Complete addition formulas for prime order
elliptic curves", algorithms 7-9): homogeneous projective (X:Y:Z)
formulas that are correct for EVERY input pair — identity, P == Q,
P == -Q — with NO branches, selects or embedded doubling.

Why this beats the Jacobian kernels (ops/ec.py) for the MSM: the unified
Jacobian add must compute a full double() and four masked selects on
every call to stay total (measured ~20 mul-equivalents per mixed add);
RCB mixed addition is 11M + 2 const-muls + adds, total and branchless —
the arithmetic the MSM leaf/bucket phases actually want on a VPU.

Identity is the class (0 : Y : 0), Y != 0.  All supported pairing curves
have a = 0 (BN254 b=3, BLS12-381 b=4, BLS12-377 b=1, BLS24-315 b=1,
BW6-761 b=-1, BW6-633 b=5).

Reference counterpart: gnark-crypto's Jacobian G1Jac/G2Jac arithmetic
(used by MultiExp) — semantics target only; the formula choice here is
TPU-first.
"""

from __future__ import annotations

import jax.numpy as jnp


class CompleteOps:
    """Complete projective group ops bound to field ops F and curve b.

    b is given as field element(s) in REGULAR int form: an int for fp,
    an (c0, c1) int pair for fp2.  3b is baked in as Montgomery-form
    scalar-literal limbs so kernels stay Pallas-lowerable.
    """

    def __init__(self, F, b):
        self.F = F
        self.b = b
        # small signed representative of a constant mod q, or None
        def small(c, q):
            c = c % q
            if c < (1 << 12):
                return c
            if q - c < (1 << 12):
                return -(q - c)
            return None

        spec = getattr(F, "spec", None)
        if spec is not None:                      # fp
            q = spec.modulus
            b3 = 3 * (b % q) % q
            R = spec.R
            b3m = b3 * R % q
            self._b3_ints = tuple(
                int(b3m >> (16 * i)) & 0xFFFF for i in range(spec.L))
            self._b3_bytes = tuple(
                int(b3m >> (8 * i)) & 0xFF for i in range(2 * spec.L))
            # every supported curve has tiny 3b (9/12/3/-3/15): the
            # small-const route is ~L mults + a cond-sub cascade instead
            # of a full const-mul + REDC (see FieldOps.mul_small)
            self._b3_small = small(b3, q)
            self._fp2 = False
        else:                                     # fp2 (Fp2Ops)
            base = F.base
            q = base.spec.modulus
            R = base.spec.R
            c0, c1 = b
            b3 = (3 * (c0 % q) % q, 3 * (c1 % q) % q)
            self._b3_ints = tuple(
                tuple(int((c * R % q) >> (16 * i)) & 0xFFFF
                      for i in range(base.spec.L))
                for c in b3)
            self._b3_bytes = tuple(
                tuple(int((c * R % q) >> (8 * i)) & 0xFF
                      for i in range(2 * base.spec.L))
                for c in b3)
            s0, s1 = small(b3[0], q), small(b3[1], q)
            self._b3_small = ((s0, s1)
                              if s0 is not None and s1 is not None else None)
            self._fp2 = True

    # -- constructors / conversions -------------------------------------------

    def inf(self, n):
        z = self.F.zeros(n)
        return (z, self.F.ones(n), z)

    def from_affine(self, xy):
        x, y = xy
        return (x, y, self.F.ones_like(x))

    def is_inf(self, P):
        return self.F.is_zero(P[2])

    def neg(self, P):
        X, Y, Z = P
        return (X, self.F.neg(Y), Z)

    def select(self, mask, P, Q):
        F = self.F
        return tuple(F.select(mask, a, b) for a, b in zip(P, Q))

    def mask_inf(self, P, valid):
        """Force invalid lanes to the identity class (0 : 1 : 0).

        (Unlike the Jacobian kernels, Z = 0 alone is NOT enough: the RCB
        proof needs the input in the identity's projective class, i.e.
        X = 0 too, with Y nonzero.)
        """
        F = self.F
        X, Y, Z = P
        return (F.select(valid, X, jnp.zeros_like(X)),
                F.select(valid, Y, F.ones_like(Y)),
                F.select(valid, Z, jnp.zeros_like(Z)))

    def to_jacobian(self, P):
        """Projective -> Jacobian: (XZ, YZ^2, Z) (same affine point)."""
        F = self.F
        X, Y, Z = P
        Z2 = F.sqr(Z)
        return (F.mul(X, Z), F.mul(Y, Z2), Z)

    # -- b3 const-mul ----------------------------------------------------------

    def _mul_b3(self, a):
        F = self.F
        if not self._fp2:
            if self._b3_small is not None:
                k = self._b3_small
                r = F.mul_small(a, abs(k))
                return F.neg(r) if k < 0 else r
            if F._mxu_on():
                t = F._mul_wide_const_mxu(a, self._b3_bytes)
            else:
                t = F._mul_wide_const(a, self._b3_ints)
            return F._redc(t)
        # fp2: (a0 + u a1)(c0 + u c1) with constant (c0, c1)
        base = F.base
        a0, a1 = F._split(a)
        if self._b3_small is not None:
            s0, s1 = self._b3_small

            def smul(x, s):
                r = base.mul_small(x, abs(s))
                return base.neg(r) if s < 0 else r

            t00, t11 = smul(a0, s0), smul(a1, s1)
            t01, t10 = smul(a0, s1), smul(a1, s0)
            return F._join(base.add(t00, F._mul_beta(t11)),
                           base.add(t01, t10))
        if base._mxu_on():
            c0b, c1b = self._b3_bytes
            wide = lambda x, cb: base._mul_wide_const_mxu(x, cb)
            c0, c1 = c0b, c1b
        else:
            wide = lambda x, ci: base._mul_wide_const(x, ci)
            c0, c1 = self._b3_ints
        t00 = base._redc(wide(a0, c0))
        t11 = base._redc(wide(a1, c1))
        t01 = base._redc(wide(a0, c1))
        t10 = base._redc(wide(a1, c0))
        r0 = base.add(t00, F._mul_beta(t11))
        r1 = base.add(t01, t10)
        return F._join(r0, r1)

    # -- group law (RCB15 algorithms 7-9, a = 0) -------------------------------

    def add(self, P, Q):
        """Complete projective addition (alg 7): 12M + 2 b3-muls."""
        F = self.F
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        t0 = F.mul(X1, X2)
        t1 = F.mul(Y1, Y2)
        t2 = F.mul(Z1, Z2)
        t3 = F.mul(F.add(X1, Y1), F.add(X2, Y2))
        t3 = F.sub(t3, F.add(t0, t1))
        t4 = F.mul(F.add(Y1, Z1), F.add(Y2, Z2))
        t4 = F.sub(t4, F.add(t1, t2))
        Y3 = F.mul(F.add(X1, Z1), F.add(X2, Z2))
        Y3 = F.sub(Y3, F.add(t0, t2))
        t0 = F.add(F.double(t0), t0)          # 3 X1X2
        t2 = self._mul_b3(t2)                 # b3 Z1Z2
        Z3 = F.add(t1, t2)
        t1 = F.sub(t1, t2)
        Y3 = self._mul_b3(Y3)                 # b3 (X1Z2 + X2Z1)
        X3 = F.sub(F.mul(t3, t1), F.mul(t4, Y3))
        Y3 = F.add(F.mul(t1, Z3), F.mul(Y3, t0))
        Z3 = F.add(F.mul(Z3, t4), F.mul(t0, t3))
        return (X3, Y3, Z3)

    def add_mixed(self, P, xy, q_inf):
        """Complete mixed addition (alg 8, Z2 = 1): 11M + 2 b3-muls; the
        affine point's infinity flag is resolved with one 3-plane select
        (affine representation has no encoding for the identity)."""
        F = self.F
        X1, Y1, Z1 = P
        X2, Y2 = xy
        t0 = F.mul(X1, X2)
        t1 = F.mul(Y1, Y2)
        t3 = F.mul(F.add(X1, Y1), F.add(X2, Y2))
        t3 = F.sub(t3, F.add(t0, t1))
        t4 = F.add(F.mul(X2, Z1), X1)         # X1 + X2 Z1  (X1Z2+X2Z1)
        t5 = F.add(F.mul(Y2, Z1), Y1)         # Y1 + Y2 Z1  (Y1Z2+Y2Z1)
        t0_3 = F.add(F.double(t0), t0)        # 3 X1X2
        tz = self._mul_b3(Z1)                 # b3 Z1
        Z3 = F.add(t1, tz)
        t1 = F.sub(t1, tz)
        Y3 = self._mul_b3(t4)                 # b3 (X1Z2+X2Z1)
        X3 = F.sub(F.mul(t3, t1), F.mul(t5, Y3))
        Y3 = F.add(F.mul(t1, Z3), F.mul(Y3, t0_3))
        Z3 = F.add(F.mul(Z3, t5), F.mul(t0_3, t3))
        R = (X3, Y3, Z3)
        return self.select(q_inf, P, R)

    def double(self, P):
        """Complete doubling (alg 9): 6M + 2S + 1 b3-mul."""
        F = self.F
        X, Y, Z = P
        t0 = F.sqr(Y)
        Z3 = F.double(F.double(F.double(t0)))     # 8 Y^2
        t1 = F.mul(Y, Z)
        t2 = self._mul_b3(F.sqr(Z))               # b3 Z^2
        X3 = F.mul(t2, Z3)
        Y3 = F.add(t0, t2)
        Z3 = F.mul(t1, Z3)
        t1 = F.double(t2)
        t2 = F.add(t1, t2)                        # 3 b3 Z^2
        t0 = F.sub(t0, t2)
        Y3 = F.add(F.mul(t0, Y3), X3)
        t1 = F.mul(X, Y)
        X3 = F.double(F.mul(t0, t1))
        return (X3, Y3, Z3)
