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
