"""BLS24-315 + BW6-633 curves, pairings, and backends — completing the
reference's 6-curve matrix (SURVEY §2.6; parameters derived in-repo,
see curves/__init__.py docstrings)."""

import random

import pytest

from gnark_tpu.backend import groth16, plonk
from gnark_tpu.curves import BLS24_315, BW6_633
from gnark_tpu.curves.pairing import pairing_for
from gnark_tpu.examples.cubic import CubicCircuit
from gnark_tpu.frontend.compile import compile_circuit


def test_bls24_params():
    BLS24_315.validate()
    assert BLS24_315.fp.modulus.bit_length() == 315
    assert BLS24_315.fr.modulus.bit_length() == 253
    x = BLS24_315.x_param
    assert BLS24_315.fr.modulus == x ** 8 - x ** 4 + 1
    assert BLS24_315.fp.modulus == (x - 1) ** 2 * BLS24_315.fr.modulus // 3 + x


def test_bw6633_two_chain():
    BW6_633.validate()
    assert BW6_633.fr.modulus == BLS24_315.fp.modulus
    assert BW6_633.fp.modulus.bit_length() == 633


@pytest.mark.parametrize("curve", [BLS24_315, BW6_633],
                         ids=lambda c: c.name)
def test_pairing_bilinearity(curve):
    pr = pairing_for(curve)
    gt = pr.gt
    h1, h2 = curve.host_g1, curve.host_g2
    P, Q = curve.g1_gen, curve.g2_gen
    e = pr.pair(P, Q)
    assert not gt.eq(e, gt.one())
    a, b = 1912, 7737
    assert gt.eq(pr.pair(h1.scalar_mul(P, a), h2.scalar_mul(Q, b)),
                 gt.pow(e, a * b))
    assert gt.eq(gt.mul(e, gt.conj(e)), gt.one())
    aP = h1.scalar_mul(P, 5)
    assert pr.pairing_check([(aP, Q), (h1.neg(aP), Q)])
    assert not pr.pairing_check([(P, Q)])


@pytest.mark.parametrize("curve", [BLS24_315, BW6_633],
                         ids=lambda c: c.name)
def test_groth16_host_e2e(curve):
    cs = compile_circuit(CubicCircuit(), curve)
    pk, vk = groth16.setup(cs, curve, rng=random.Random(3), host=True)
    proof = groth16.prove(cs, pk, [35, 3], rng=random.Random(1))
    assert groth16.verify(proof, vk, [35])
    assert not groth16.verify(proof, vk, [36])


def test_bls24_plonk_host_e2e():
    cs = compile_circuit(CubicCircuit(), BLS24_315, scheme="plonk")
    pk, vk = plonk.setup(cs, BLS24_315, rng=random.Random(4), host=True)
    proof = plonk.prove(cs, pk, [35, 3], rng=random.Random(2))
    assert plonk.verify(proof, vk, [35])
    assert not plonk.verify(proof, vk, [36])


def test_fp4_host_field():
    from gnark_tpu.curves.host import HostFpK
    p = BLS24_315.fp.modulus
    F = HostFpK(p, 4, 13)
    rng = random.Random(0)
    a = tuple(rng.randrange(p) for _ in range(4))
    b = tuple(rng.randrange(p) for _ in range(4))
    assert F.eq(F.mul(a, b), F.mul(b, a))
    assert F.eq(F.mul(a, F.inv(a)), F.one)
    assert F.eq(F.sub(F.add(a, b), b), a)
