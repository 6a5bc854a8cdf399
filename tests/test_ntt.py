"""NTT correctness vs naive big-int DFT, round trips, coset, orderings."""

import random

import numpy as np
import pytest

from gnark_tpu.fields import BN254_FR, BLS12_377_FR
from gnark_tpu.ops.limbs import field_ops
from gnark_tpu.ops.ntt import Domain, bit_reverse, bit_reverse_perm

pytestmark = pytest.mark.slow  # compile-heavy device kernels


def naive_dft(coeffs, omega, p):
    n = len(coeffs)
    return [sum(coeffs[j] * pow(omega, i * j, p) for j in range(n)) % p
            for i in range(n)]


@pytest.mark.parametrize("n", [8, 32])
def test_fft_dif_matches_naive(n):
    spec = BN254_FR
    p = spec.modulus
    d = Domain(spec, n)
    F = field_ops(spec)
    rng = random.Random(n)
    coeffs = [rng.randrange(p) for _ in range(n)]
    evals = naive_dft(coeffs, d.omega, p)
    got = F.unpack(d.fft(F.pack(coeffs), order="DIF"))
    perm = bit_reverse_perm(n)
    assert got == [evals[perm[i]] for i in range(n)]


def test_fft_dit_matches_naive():
    n = 16
    spec = BN254_FR
    p = spec.modulus
    d = Domain(spec, n)
    F = field_ops(spec)
    rng = random.Random(1)
    coeffs = [rng.randrange(p) for _ in range(n)]
    evals = naive_dft(coeffs, d.omega, p)
    # DIT consumes bit-reversed coeffs, emits natural-order evals
    got = F.unpack(d.fft(bit_reverse(F.pack(coeffs)), order="DIT"))
    assert got == evals


@pytest.mark.parametrize("spec", [BN254_FR, BLS12_377_FR], ids=lambda s: s.name)
def test_roundtrip_dif_dit(spec):
    n = 64
    p = spec.modulus
    d = Domain(spec, n)
    F = field_ops(spec)
    rng = random.Random(2)
    coeffs = [rng.randrange(p) for _ in range(n)]
    x = F.pack(coeffs)
    # gnark's prover pipeline shape: iFFT(DIF) then FFT(DIT) == identity
    back = F.unpack(d.fft(d.ifft(x, order="DIF"), order="DIT"))
    assert back == coeffs


def test_coset_roundtrip_and_semantics():
    n = 16
    spec = BN254_FR
    p = spec.modulus
    d = Domain(spec, n)
    F = field_ops(spec)
    rng = random.Random(3)
    coeffs = [rng.randrange(p) for _ in range(n)]
    # coset evals must equal evaluation at g * omega^i
    evals_coset = [
        sum(coeffs[j] * pow(d.coset_gen, j, p) * pow(d.omega, i * j, p)
            for j in range(n)) % p
        for i in range(n)
    ]
    got = F.unpack(d.fft(F.pack(coeffs), order="DIF", coset=True))
    perm = bit_reverse_perm(n)
    assert got == [evals_coset[perm[i]] for i in range(n)]
    # roundtrip: coset DIF forward then coset DIT inverse
    x = F.pack(coeffs)
    fwd = d.fft(x, order="DIF", coset=True)       # bitrev coset evals
    back = d.ifft(fwd, order="DIT", coset=True)   # natural coeffs
    assert F.unpack(back) == coeffs


def test_groth16_h_pipeline_shape():
    """The exact transform chain computeH uses must compose to identity."""
    n = 32
    spec = BN254_FR
    p = spec.modulus
    d = Domain(spec, n)
    F = field_ops(spec)
    rng = random.Random(4)
    evals = [rng.randrange(p) for _ in range(n)]
    x = F.pack(evals)
    c = d.ifft(x, order="DIF")                     # bitrev coeffs
    e_coset = d.fft(c, order="DIT", coset=True)    # natural coset evals
    c2 = d.ifft(e_coset, order="DIF", coset=True)  # bitrev coeffs
    back = d.fft(c2, order="DIT")                  # natural evals
    assert F.unpack(back) == evals


def test_bit_reverse_involution():
    spec = BN254_FR
    F = field_ops(spec)
    vals = list(range(1, 17))
    x = F.pack(vals)
    assert F.unpack(bit_reverse(bit_reverse(x))) == vals
