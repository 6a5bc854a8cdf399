"""Differential tests: device limb arithmetic vs python-int ground truth.

Mirrors the reference's oracle pattern (test/engine.go big.Int engine):
every device op is checked against exact big-int arithmetic.
"""

import random

import numpy as np
import pytest

from gnark_tpu.fields import ALL_FIELDS, BN254_FR, BLS12_381_FP
from gnark_tpu.ops.limbs import field_ops

pytestmark = pytest.mark.slow  # compile-heavy device kernels

N = 67  # deliberately non-power-of-two, non-multiple-of-lane-width


def rand_elems(spec, n, seed):
    rng = random.Random(seed)
    vals = [0, 1, 2, spec.modulus - 1, spec.modulus - 2, spec.R % spec.modulus]
    vals += [rng.randrange(spec.modulus) for _ in range(n - len(vals))]
    return vals[:n]


@pytest.mark.parametrize("spec", list(ALL_FIELDS.values()), ids=lambda s: s.name)
def test_roundtrip(spec):
    vals = rand_elems(spec, N, 1)
    F = field_ops(spec)
    assert F.unpack(F.pack(vals)) == vals


@pytest.mark.parametrize("spec", [BN254_FR, BLS12_381_FP], ids=lambda s: s.name)
def test_add_sub_neg(spec):
    p = spec.modulus
    F = field_ops(spec)
    a_i, b_i = rand_elems(spec, N, 2), rand_elems(spec, N, 3)
    a, b = F.pack(a_i), F.pack(b_i)
    assert F.unpack(F.add(a, b)) == [(x + y) % p for x, y in zip(a_i, b_i)]
    assert F.unpack(F.sub(a, b)) == [(x - y) % p for x, y in zip(a_i, b_i)]
    assert F.unpack(F.neg(a)) == [(-x) % p for x in a_i]
    assert F.unpack(F.double(a)) == [2 * x % p for x in a_i]


@pytest.mark.parametrize("spec", list(ALL_FIELDS.values()), ids=lambda s: s.name)
def test_mul(spec):
    p = spec.modulus
    F = field_ops(spec)
    a_i, b_i = rand_elems(spec, N, 4), rand_elems(spec, N, 5)
    a, b = F.pack(a_i), F.pack(b_i)
    assert F.unpack(F.mul(a, b)) == [x * y % p for x, y in zip(a_i, b_i)]
    assert F.unpack(F.sqr(a)) == [x * x % p for x in a_i]


def test_mul_fuzz_bn254():
    p = BN254_FR.modulus
    F = field_ops(BN254_FR)
    rng = random.Random(7)
    # adversarial values near limb boundaries
    vals = []
    for _ in range(256):
        k = rng.randrange(1, 255)
        v = (1 << k) + rng.randrange(-2, 3)
        vals.append(v % p)
    a_i, b_i = vals[:128], vals[128:]
    a, b = F.pack(a_i), F.pack(b_i)
    assert F.unpack(F.mul(a, b)) == [x * y % p for x, y in zip(a_i, b_i)]


@pytest.mark.parametrize("spec", [BN254_FR], ids=lambda s: s.name)
def test_inv_exp(spec):
    p = spec.modulus
    F = field_ops(spec)
    a_i = rand_elems(spec, 17, 6)
    a = F.pack(a_i)
    got = F.unpack(F.inv(a))
    want = [pow(x, -1, p) if x else 0 for x in a_i]
    assert got == want
    e = 0x1234567890ABCDEF
    assert F.unpack(F.exp_const(a, e)) == [pow(x, e, p) for x in a_i]


def test_batch_inv():
    spec = BN254_FR
    p = spec.modulus
    F = field_ops(spec)
    a_i = rand_elems(spec, 33, 8)
    a_i[5] = 0  # zero must map to zero, not poison neighbours
    a = F.pack(a_i)
    got = F.unpack(F.batch_inv(a))
    want = [pow(x, -1, p) if x else 0 for x in a_i]
    assert got == want


def test_mont_conversion():
    spec = BN254_FR
    F = field_ops(spec)
    vals = rand_elems(spec, 9, 9)
    regular = F.pack(vals)  # pack = to Montgomery
    back = F.from_mont(regular)
    assert spec.from_limbs(np.asarray(back), montgomery=False) == vals
    again = F.to_mont(back)
    assert F.unpack(again) == vals


def test_predicates():
    spec = BN254_FR
    F = field_ops(spec)
    a = F.pack([0, 1, 5, 0])
    b = F.pack([0, 2, 5, 7])
    assert list(np.asarray(F.is_zero(a))) == [True, False, False, True]
    assert list(np.asarray(F.eq(a, b))) == [True, False, True, False]
    sel = F.select(np.array([True, False, True, False]), a, b)
    assert F.unpack(sel) == [0, 2, 5, 7]

