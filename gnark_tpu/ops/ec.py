"""Vectorized elliptic-curve kernels over limb planes (Jacobian coords).

Short Weierstrass, a = 0 (all supported pairing curves).  A point batch is
a tuple (X, Y, Z) of field-element batches; Z == 0 encodes infinity.
Generic over the field-ops object, so the same code drives G1 (fp) and G2
(fp2) — reference equivalents are gnark-crypto's per-curve G1Jac/G2Jac
types (called from internal/backend/bn254/groth16/prove.go:153-250).

All ops are branchless: degenerate cases (infinity operands, P == Q,
P == -Q) are resolved with masked selects so the kernels are valid inside
jit/scan/shard_map on any input mix.
"""

from __future__ import annotations

import jax.numpy as jnp


class CurveOps:
    """EC group ops bound to a field-ops object F (FieldOps or Fp2Ops)."""

    def __init__(self, F, b=None):
        self.F = F
        # curve coefficient (int for fp, (c0, c1) for fp2): lets the MSM
        # build complete-formula ops (ops/ec_complete.py) when known
        self.b = b

    # -- constructors --------------------------------------------------------

    def inf(self, n):
        z = self.F.zeros(n)
        return (z, self.F.ones(n), z)

    def from_affine(self, xy):
        """(x, y) batch + implicit 'not infinity' -> Jacobian."""
        x, y = xy
        ones = self.F.ones_like(x)
        return (x, y, ones)

    def is_inf(self, P):
        return self.F.is_zero(P[2])

    def neg(self, P):
        X, Y, Z = P
        return (X, self.F.neg(Y), Z)

    def select(self, mask, P, Q):
        F = self.F
        return tuple(F.select(mask, a, b) for a, b in zip(P, Q))

    # -- group law ------------------------------------------------------------

    def double(self, P):
        """dbl-2009-l (2M + 5S).  Infinity doubles to infinity (Z3=2YZ=0)."""
        F = self.F
        X, Y, Z = P
        A = F.sqr(X)
        B = F.sqr(Y)
        C = F.sqr(B)
        t = F.sqr(F.add(X, B))
        D = F.double(F.sub(F.sub(t, A), C))
        E = F.add(F.add(A, A), A)
        G = F.sqr(E)
        X3 = F.sub(G, F.double(D))
        eightC = F.double(F.double(F.double(C)))
        Y3 = F.sub(F.mul(E, F.sub(D, X3)), eightC)
        Z3 = F.double(F.mul(Y, Z))
        return (X3, Y3, Z3)

    def add(self, P, Q):
        """Unified Jacobian add (add-2007-bl + masked degenerate handling)."""
        F = self.F
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        Z1Z1 = F.sqr(Z1)
        Z2Z2 = F.sqr(Z2)
        U1 = F.mul(X1, Z2Z2)
        U2 = F.mul(X2, Z1Z1)
        S1 = F.mul(F.mul(Y1, Z2), Z2Z2)
        S2 = F.mul(F.mul(Y2, Z1), Z1Z1)
        H = F.sub(U2, U1)
        I = F.sqr(F.double(H))
        J = F.mul(H, I)
        r = F.double(F.sub(S2, S1))
        V = F.mul(U1, I)
        X3 = F.sub(F.sub(F.sqr(r), J), F.double(V))
        Y3 = F.sub(F.mul(r, F.sub(V, X3)), F.double(F.mul(S1, J)))
        Z3 = F.mul(F.sub(F.sub(F.sqr(F.add(Z1, Z2)), Z1Z1), Z2Z2), H)
        R = (X3, Y3, Z3)

        same_x = F.is_zero(H)
        same_y = F.is_zero(F.sub(S2, S1))
        p_inf = F.is_zero(Z1)
        q_inf = F.is_zero(Z2)
        # P == Q (and neither infinite): use doubling
        R = self.select(same_x & same_y & ~p_inf & ~q_inf, self.double(P), R)
        # P == -Q: infinity
        R = self.select(same_x & ~same_y & ~p_inf & ~q_inf,
                        self.inf(X3.shape[1:]), R)
        R = self.select(p_inf, Q, R)
        R = self.select(q_inf, P, R)
        return R

    def add_mixed(self, P, xy, q_inf):
        """P (Jacobian) + Q (affine, with explicit infinity mask).

        madd-2007-bl (7M + 4S) — the hot combiner of the MSM leaf scan.
        """
        F = self.F
        X1, Y1, Z1 = P
        X2, Y2 = xy
        Z1Z1 = F.sqr(Z1)
        U2 = F.mul(X2, Z1Z1)
        S2 = F.mul(F.mul(Y2, Z1), Z1Z1)
        H = F.sub(U2, X1)
        HH = F.sqr(H)
        I = F.double(F.double(HH))
        J = F.mul(H, I)
        r = F.double(F.sub(S2, Y1))
        V = F.mul(X1, I)
        X3 = F.sub(F.sub(F.sqr(r), J), F.double(V))
        Y3 = F.sub(F.mul(r, F.sub(V, X3)), F.double(F.mul(Y1, J)))
        Z3 = F.sub(F.sub(F.sqr(F.add(Z1, H)), Z1Z1), HH)
        R = (X3, Y3, Z3)

        same_x = F.is_zero(H)
        same_y = F.is_zero(F.sub(S2, Y1))
        p_inf = F.is_zero(Z1)
        R = self.select(same_x & same_y & ~p_inf & ~q_inf, self.double(P), R)
        R = self.select(same_x & ~same_y & ~p_inf & ~q_inf,
                        self.inf(X3.shape[1:]), R)
        R = self.select(p_inf & ~q_inf, self.from_affine(xy), R)
        R = self.select(q_inf, P, R)
        return R

    # -- conversions ------------------------------------------------------------

    def to_affine(self, P):
        """Batch Jacobian -> affine via one batched inversion.

        Returns (x, y, inf_mask).  Infinity maps to (0, 0, True).
        Requires F to expose batch_inv (fp path) or inv (fp2 path).
        """
        F = self.F
        X, Y, Z = P
        if hasattr(F, "batch_inv"):
            zinv = F.batch_inv(Z)
        else:
            zinv = F.inv(Z)  # fp2: Fermat per element (still vectorized)
        zinv2 = F.sqr(zinv)
        x = F.mul(X, zinv2)
        y = F.mul(Y, F.mul(zinv, zinv2))
        return x, y, self.is_inf(P)
