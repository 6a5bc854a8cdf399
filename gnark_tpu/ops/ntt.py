"""Radix-2 NTT over fr limb planes (the fft.Domain equivalent).

TPU-native replacement for gnark-crypto's fft package.  Reference call
sites that fix the required semantics: Groth16 computeH does
iFFT(DIF) -> FFT(DIT, coset) -> pointwise -> iFFT(DIF, coset) -> bitrev
(internal/backend/bn254/groth16/prove.go:275-324); PLONK evaluates on a 4n
coset domain in bit-reversed layout (internal/backend/bn254/plonk/
prove.go:726).  As in the reference, DIF consumes natural order and
produces bit-reversed, DIT consumes bit-reversed and produces natural, so
provers chain DIF->DIT without materializing a permutation.

Design: each butterfly stage is a reshape [L, blocks, 2, half] + one
vectorized add/sub/mul over the whole array — log2(n) fused XLA steps, no
scalar loops.  Twiddle tables are built on device by log-doubling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gnark_tpu.fields.spec import FieldSpec
from gnark_tpu.ops.limbs import field_ops


def bit_reverse_perm(n: int) -> np.ndarray:
    """Permutation idx such that x[idx] is the bit-reversal reordering."""
    k = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros_like(idx)
    for b in range(k):
        rev |= ((idx >> b) & 1) << (k - 1 - b)
    return rev


def bit_reverse(x):
    """Reorder the batch axis of [L, n] limb planes into bit-reversed order."""
    n = x.shape[1]
    return jnp.take(x, jnp.asarray(bit_reverse_perm(n).astype(np.int32)), axis=1)


class Domain:
    """Evaluation domain of size n (power of two) over a scalar field.

    Holds forward/inverse twiddle tables and coset scaling tables
    (coset generator = the field's multiplicative generator, matching
    gnark-crypto Domain.FrMultiplicativeGen).
    """

    def __init__(self, spec: FieldSpec, n: int):
        assert n > 0 and n & (n - 1) == 0, "domain size must be a power of two"
        self.spec = spec
        self.n = n
        self.log_n = n.bit_length() - 1
        self.F = field_ops(spec)
        p = spec.modulus
        self.omega = spec.root_of_unity(n)
        self.omega_inv = pow(self.omega, -1, p)
        self.n_inv = pow(n, -1, p)
        self.coset_gen = spec.multiplicative_generator % p
        self.coset_gen_inv = pow(self.coset_gen, -1, p)
        self._tables = {}

    # ---- table construction (device, log-doubling) ------------------------

    def _powers(self, base: int, n: int):
        """[L, n] Montgomery limb planes of 1, base, base^2, ... base^{n-1}."""
        F, p = self.F, self.spec.modulus
        out = F.ones(1)
        k = 1
        while k < n:
            step = F.pack([pow(base, k, p)])
            out = jnp.concatenate([out, F.mul(out, step)], axis=1)
            k *= 2
        return out[:, :n]

    def table(self, name: str):
        if name in self._tables:
            return self._tables[name]
        n, half = self.n, self.n // 2
        brev = jnp.asarray(bit_reverse_perm(n).astype(np.int32))
        if name == "tw":
            t = self._powers(self.omega, half)
        elif name == "itw":
            t = self._powers(self.omega_inv, half)
        elif name == "coset":
            t = self._powers(self.coset_gen, n)
        elif name == "coset_brev":
            t = jnp.take(self.table("coset"), brev, axis=1)
        elif name == "icoset_ninv":
            # g^{-j} * n^{-1}: fused post-scale for inverse coset transforms
            t = self.F.mul(self._powers(self.coset_gen_inv, n),
                           self.F.pack([self.n_inv]))
        elif name == "icoset_ninv_brev":
            t = jnp.take(self.table("icoset_ninv"), brev, axis=1)
        else:
            raise KeyError(name)
        self._tables[name] = t
        return t

    # ---- transforms --------------------------------------------------------

    def fft(self, x, order: str = "DIF", coset: bool = False):
        """Forward NTT. order=DIF: natural coeffs -> bit-reversed evals;
        order=DIT: bit-reversed coeffs -> natural evals."""
        return self._dispatch(x, order, inverse=False, coset=coset)

    def ifft(self, x, order: str = "DIF", coset: bool = False):
        """Inverse NTT (scaled by 1/n). order=DIF: natural evals ->
        bit-reversed coeffs; order=DIT: bit-reversed evals -> natural."""
        return self._dispatch(x, order, inverse=True, coset=coset)

    def _dispatch(self, x, order, inverse, coset):
        assert x.shape == (self.spec.L, self.n), (x.shape, self.n)
        key = ("fn", order, inverse, pre_needed := coset and not inverse, coset)
        if key not in self._tables:
            self._tables[key] = jax.jit(
                functools.partial(self._transform, order=order))
        tw = self.table("itw" if inverse else "tw")
        pre = post = None
        if coset and not inverse:
            pre = self.table("coset" if order == "DIF" else "coset_brev")
        if inverse:
            if coset:
                post = self.table(
                    "icoset_ninv_brev" if order == "DIF" else "icoset_ninv")
            else:
                post = self.F.pack([self.n_inv])
        return self._tables[key](x, tw, pre, post)

    def _transform(self, x, tw, pre, post, *, order):
        F, k, n = self.F, self.log_n, self.n
        if pre is not None:
            x = F.mul(x, pre)
        stages = range(k) if order == "DIF" else range(k - 1, -1, -1)
        for s in stages:
            blocks = 1 << s
            half = n >> (s + 1)
            w = tw if blocks == 1 else jax.lax.slice(
                tw, (0, 0), tw.shape, (1, blocks))
            w = w[:, None, :]  # [L, 1, half] broadcasts across blocks
            xs = x.reshape(F.L, blocks, 2, half)
            a, b = xs[:, :, 0], xs[:, :, 1]
            if order == "DIF":
                u = F.add(a, b)
                v = F.mul(F.sub(a, b), w)
            else:  # DIT
                bw = F.mul(b, w)
                u = F.add(a, bw)
                v = F.sub(a, bw)
            x = jnp.stack([u, v], axis=2).reshape(F.L, n)
        if post is not None:
            x = F.mul(x, post)
        return x
