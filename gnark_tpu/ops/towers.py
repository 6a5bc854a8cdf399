"""Quadratic extension field ops on limb planes.

An fp2 element batch is a ``uint32[2L, ...]`` array: c0 limbs stacked over
c1 limbs (element = c0 + u*c1, u^2 = beta).  Exposes the same ops protocol
as FieldOps so ops/ec.py runs unchanged over G1 (fp) and G2 (fp2) — the
TPU replacement for the reference's separate per-curve G1/G2 code.

(The in-circuit tower gadgets std/algebra/fields_* in the reference are a
different layer — those are circuit gadgets, built later in std/.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gnark_tpu.ops.limbs import FieldOps, field_ops
from gnark_tpu.fields.spec import FieldSpec


class Fp2Ops:
    """fp2 = fp[u]/(u^2 - beta) with beta a small (signed) non-residue."""

    def __init__(self, base: FieldOps, beta: int):
        self.base = base
        self.beta = beta
        self.L = 2 * base.L  # leading-dim size of an element

    def _split(self, a):
        Lb = self.base.L
        return a[:Lb], a[Lb:]

    def _join(self, c0, c1):
        return jnp.concatenate([c0, c1], axis=0)

    # -- constructors --------------------------------------------------------

    def zeros(self, n):
        shape = (n,) if isinstance(n, int) else tuple(n)
        return jnp.zeros((self.L,) + shape, jnp.uint32)

    def ones(self, n):
        return self._join(self.base.ones(n), self.base.zeros(n))

    def ones_like(self, a):
        c0, c1 = self._split(a)
        return self._join(self.base.ones_like(c0), jnp.zeros_like(c1))

    def pack(self, pairs):
        """[(c0, c1), ...] host ints -> [2L, n] Montgomery limb planes."""
        c0 = self.base.pack([x for x, _ in pairs])
        c1 = self.base.pack([y for _, y in pairs])
        return self._join(c0, c1)

    def unpack(self, arr):
        Lb = self.base.L
        return list(zip(self.base.unpack(arr[:Lb]), self.base.unpack(arr[Lb:])))

    # -- arithmetic ------------------------------------------------------------

    def add(self, a, b):
        a0, a1 = self._split(a)
        b0, b1 = self._split(b)
        return self._join(self.base.add(a0, b0), self.base.add(a1, b1))

    def sub(self, a, b):
        a0, a1 = self._split(a)
        b0, b1 = self._split(b)
        return self._join(self.base.sub(a0, b0), self.base.sub(a1, b1))

    def neg(self, a):
        a0, a1 = self._split(a)
        return self._join(self.base.neg(a0), self.base.neg(a1))

    def double(self, a):
        return self.add(a, a)

    def _mul_beta(self, x):
        """x * beta for the small signed non-residue beta."""
        F = self.base
        k = abs(self.beta)
        acc = x
        # addition chain for small k (k is 1 or 5 for supported curves)
        if k == 5:
            acc = F.add(F.double(F.double(x)), x)
        elif k != 1:
            raise NotImplementedError(f"beta={self.beta}")
        return F.neg(acc) if self.beta < 0 else acc

    def mul(self, a, b):
        F = self.base
        a0, a1 = self._split(a)
        b0, b1 = self._split(b)
        v0 = F.mul(a0, b0)
        v1 = F.mul(a1, b1)
        c0 = F.add(v0, self._mul_beta(v1))
        c1 = F.sub(F.sub(F.mul(F.add(a0, a1), F.add(b0, b1)), v0), v1)
        return self._join(c0, c1)

    def sqr(self, a):
        F = self.base
        a0, a1 = self._split(a)
        v = F.mul(a0, a1)
        c0 = F.sub(F.sub(F.mul(F.add(a0, a1), F.add(a0, self._mul_beta(a1))), v),
                   self._mul_beta(v))
        c1 = F.double(v)
        return self._join(c0, c1)

    def inv(self, a):
        """(c0 - u c1) / (c0^2 - beta c1^2)."""
        F = self.base
        a0, a1 = self._split(a)
        norm = F.sub(F.sqr(a0), self._mul_beta(F.sqr(a1)))
        ninv = F.inv(norm)
        return self._join(F.mul(a0, ninv), F.neg(F.mul(a1, ninv)))

    # -- predicates ---------------------------------------------------------

    def is_zero(self, a):
        return jnp.all(a == 0, axis=0)

    def eq(self, a, b):
        return jnp.all(a == b, axis=0)

    def select(self, mask, a, b):
        return jnp.where(jnp.asarray(mask)[None], a, b)


@functools.lru_cache(maxsize=None)
def fp2_ops(spec: FieldSpec, beta: int) -> Fp2Ops:
    return Fp2Ops(field_ops(spec), beta)


class FpKOps:
    """Binomial extension fp^k = fp[u]/(u^k - c) on stacked limb planes
    ([k*L, ...]).  Same ops protocol as FieldOps/Fp2Ops, so ops/ec.py
    runs unchanged over G2 coordinate fields of any degree — BLS24's
    fp4 G2 (reference gnark-crypto E4) uses k=4, c=13.
    """

    def __init__(self, base: FieldOps, k: int, c: int):
        self.base = base
        self.k = k
        self.c = c
        self.L = k * base.L

    def _split(self, a):
        Lb = self.base.L
        return [a[i * Lb:(i + 1) * Lb] for i in range(self.k)]

    def _join(self, parts):
        return jnp.concatenate(parts, axis=0)

    def zeros(self, n):
        shape = (n,) if isinstance(n, int) else tuple(n)
        return jnp.zeros((self.L,) + shape, jnp.uint32)

    def ones(self, n):
        return self._join([self.base.ones(n)]
                          + [self.base.zeros(n)] * (self.k - 1))

    def ones_like(self, a):
        c0 = self._split(a)[0]
        return self._join([self.base.ones_like(c0)]
                          + [jnp.zeros_like(c0)] * (self.k - 1))

    def pack(self, tuples):
        """[(c0..ck-1), ...] host ints -> [k*L, n] Montgomery planes."""
        return self._join([self.base.pack([t[i] for t in tuples])
                           for i in range(self.k)])

    def unpack(self, arr):
        cols = [self.base.unpack(p) for p in self._split(arr)]
        return list(zip(*cols))

    def add(self, a, b):
        return self._join([self.base.add(x, y) for x, y
                           in zip(self._split(a), self._split(b))])

    def sub(self, a, b):
        return self._join([self.base.sub(x, y) for x, y
                           in zip(self._split(a), self._split(b))])

    def neg(self, a):
        return self._join([self.base.neg(x) for x in self._split(a)])

    def double(self, a):
        return self.add(a, a)

    def _mul_c(self, x):
        """x * c for the small non-residue c (addition chain)."""
        F = self.base
        k = abs(self.c)
        acc = None
        bit = x
        kk = k
        while kk:
            if kk & 1:
                acc = bit if acc is None else F.add(acc, bit)
            kk >>= 1
            if kk:
                bit = F.double(bit)
        return F.neg(acc) if self.c < 0 else acc

    def mul(self, a, b):
        F = self.base
        A = self._split(a)
        B = self._split(b)
        k = self.k
        cols = [None] * (2 * k - 1)
        for i in range(k):
            for j in range(k):
                t = F.mul(A[i], B[j])
                cols[i + j] = t if cols[i + j] is None else \
                    F.add(cols[i + j], t)
        out = cols[:k]
        for m in range(k, 2 * k - 1):
            out[m - k] = F.add(out[m - k], self._mul_c(cols[m]))
        return self._join(out)

    def sqr(self, a):
        return self.mul(a, a)

    def inv(self, a):
        """Fermat in the extension: a^(q^k - 2)... too wide; instead use
        the norm-free Itoh-Tsujii-style reduction via a^(r) where
        r = (q^k-1)/(q-1): a^r lies in fp.  Simpler and adequate for the
        verifier-side use: linear-algebra-free exponentiation by q^k-2
        is impractical on device; G2 to_affine instead uses this via
        repeated Frobenius is unavailable -> use CPU-free approach:
        compute the adjugate via exponent (q^k-1)/(q-1) - 1 in fp^k,
        then one fp inversion."""
        # a^s where s = q^(k-1) + ... + q (conjugate product / a):
        # implemented as exp by integer s (device scan over bits)
        q = self.base.spec.modulus
        k = self.k
        s = sum(q ** i for i in range(1, k))
        conj_prod = self._exp_const(a, s)         # prod of conjugates / a^0
        norm_full = self.mul(a, conj_prod)        # = Norm(a) in fp (c0 only)
        parts = self._split(norm_full)
        n0_inv = self.base.inv(parts[0])
        return self._join([self.base.mul(p, n0_inv)
                           for p in self._split(conj_prod)])

    def _exp_const(self, a, e: int):
        nbits = e.bit_length()
        bits = np.array([(e >> i) & 1 for i in range(nbits)], np.uint32)

        def body(carry, bit):
            result, base = carry
            result = jnp.where(bit > 0, self.mul(result, base), result)
            base = self.sqr(base)
            return (result, base), None

        (result, _), _ = jax.lax.scan(
            body, (self.ones_like(a), a), bits)
        return result

    def is_zero(self, a):
        return jnp.all(a == 0, axis=0)

    def eq(self, a, b):
        return jnp.all(a == b, axis=0)

    def select(self, mask, a, b):
        return jnp.where(jnp.asarray(mask)[None], a, b)


@functools.lru_cache(maxsize=None)
def fpk_ops(spec: FieldSpec, k: int, c: int) -> FpKOps:
    return FpKOps(field_ops(spec), k, c)
