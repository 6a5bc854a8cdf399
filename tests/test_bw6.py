"""BW6-761 curve + pairing + Groth16 backend tests.

Parameters were derived in-repo from the BLS12-377 seed (EHG19
construction; see curves/__init__.py) — these tests pin down the
derivation invariants and run the full host prover over the 761-bit
curve (reference: internal/backend/bw6-761/groth16).
"""

import random

import pytest

from gnark_tpu.backend import groth16
from gnark_tpu.curves import BW6_761, BLS12_377
from gnark_tpu.curves.pairing import pairing_for
from gnark_tpu.examples.cubic import CubicCircuit
from gnark_tpu.frontend.compile import compile_circuit


def test_two_chain_property():
    # fr(BW6-761) == fp(BLS12-377): the point of the curve
    assert BW6_761.fr.modulus == BLS12_377.fp.modulus


def test_curve_params():
    BW6_761.validate()
    p = BW6_761.fp.modulus
    assert p.bit_length() == 761
    assert BW6_761.host_g1.b == p - 1          # E: y^2 = x^3 - 1
    assert BW6_761.host_g2.b == 4              # E': y^2 = x^3 + 4 (M-twist)


def test_pairing_bilinearity():
    pr = pairing_for(BW6_761)
    gt = pr.gt
    h1, h2 = BW6_761.host_g1, BW6_761.host_g2
    P, Q = BW6_761.g1_gen, BW6_761.g2_gen
    e = pr.pair(P, Q)
    assert not gt.eq(e, gt.one())
    a, b = 1234567, 7654321
    assert gt.eq(pr.pair(h1.scalar_mul(P, a), h2.scalar_mul(Q, b)),
                 gt.pow(e, a * b))
    # conj is GT inverse on unitary elements
    assert gt.eq(gt.mul(e, gt.conj(e)), gt.one())


def test_pairing_check_product():
    pr = pairing_for(BW6_761)
    h1 = BW6_761.host_g1
    P, Q = BW6_761.g1_gen, BW6_761.g2_gen
    aP = h1.scalar_mul(P, 99)
    assert pr.pairing_check([(aP, Q), (h1.neg(aP), Q)])
    assert not pr.pairing_check([(P, Q)])


def test_groth16_host_e2e():
    cs = compile_circuit(CubicCircuit(), BW6_761)
    assert cs.field_modulus == BLS12_377.fp.modulus
    pk, vk = groth16.setup(cs, BW6_761, rng=random.Random(3), host=True)
    proof = groth16.prove(cs, pk, [35, 3], rng=random.Random(1))
    assert groth16.verify(proof, vk, [35])
    assert not groth16.verify(proof, vk, [36])


def test_fp6_tower():
    from gnark_tpu.curves.pairing_bw6 import Fp6Poly
    p = BW6_761.fp.modulus
    gt = Fp6Poly(p, -4)
    rng = random.Random(0)
    x = tuple(rng.randrange(p) for _ in range(6))
    y = tuple(rng.randrange(p) for _ in range(6))
    # ring laws + inverse
    assert gt.eq(gt.mul(x, y), gt.mul(y, x))
    assert gt.eq(gt.mul(x, gt.inv(x)), gt.one())
    assert gt.eq(gt.sqr(x), gt.mul(x, x))
