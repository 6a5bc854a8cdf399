"""Groth16 end-to-end: compile -> setup -> prove -> verify.

The tier-2 assertion-harness analog (reference test/assert.go:46
ProverSucceeded/ProverFailed) on the cubic example circuit
(examples/cubic/cubic.go:32).
"""

import random

import pytest

from gnark_tpu.backend import groth16
from gnark_tpu.backend.solver import UnsatisfiedConstraintError, solve
from gnark_tpu.curves import BN254, BLS12_377
from gnark_tpu.frontend.compile import compile_circuit
from gnark_tpu.frontend.schema import Circuit, Public, Secret


class Cubic(Circuit):
    x = Secret()
    y = Public()

    def define(self, api):
        x3 = api.mul(self.x, self.x, self.x)
        api.assert_is_equal(self.y, api.add(x3, self.x, 5))


@pytest.fixture(scope="module")
def cubic_bn254():
    cs = compile_circuit(Cubic(), BN254)
    rng = random.Random(1)
    pk, vk = groth16.setup(cs, BN254, rng=rng)
    return cs, pk, vk


def test_prove_verify(cubic_bn254):
    cs, pk, vk = cubic_bn254
    proof = groth16.prove(cs, pk, [35, 3], rng=random.Random(2))
    assert groth16.verify(proof, vk, [35])


def test_verify_rejects_wrong_public(cubic_bn254):
    cs, pk, vk = cubic_bn254
    proof = groth16.prove(cs, pk, [35, 3], rng=random.Random(3))
    assert not groth16.verify(proof, vk, [36])


def test_prover_fails_on_bad_witness(cubic_bn254):
    cs, pk, vk = cubic_bn254
    with pytest.raises(UnsatisfiedConstraintError):
        solve(cs, [35, 4])
    # forced prover on invalid witness (IgnoreSolverError analog,
    # backend/backend.go:82) must not verify
    proof = groth16.prove(cs, pk, [35, 4], rng=random.Random(4), check=False)
    assert not groth16.verify(proof, vk, [35])


def test_proof_is_randomized(cubic_bn254):
    cs, pk, vk = cubic_bn254
    p1 = groth16.prove(cs, pk, [35, 3], rng=random.Random(5))
    p2 = groth16.prove(cs, pk, [35, 3], rng=random.Random(6))
    assert p1.ar != p2.ar  # blinding r/s differ
    assert groth16.verify(p1, vk, [35]) and groth16.verify(p2, vk, [35])


def test_bls12_377_end_to_end():
    cs = compile_circuit(Cubic(), BLS12_377)
    rng = random.Random(7)
    pk, vk = groth16.setup(cs, BLS12_377, rng=rng)
    proof = groth16.prove(cs, pk, [35, 3], rng=rng)
    assert groth16.verify(proof, vk, [35])
    assert not groth16.verify(proof, vk, [34])


class ManyConstraints(Circuit):
    """x_{i+1} = x_i^2 + x_i chain — exercises domain padding + real MSMs
    (shape of the reference benchmark circuit, groth16_test.go:57)."""
    x = Secret()
    y = Public()

    def define(self, api):
        v = self.x
        for _ in range(70):
            v = api.add(api.mul(v, v), v)
        api.assert_is_equal(self.y, v)


def test_larger_circuit_bn254():
    q = BN254.fr.modulus
    x = 3
    v = x
    for _ in range(70):
        v = (v * v + v) % q
    cs = compile_circuit(ManyConstraints(), BN254)
    assert cs.nb_constraints > 64  # crosses a power-of-two domain boundary
    rng = random.Random(8)
    pk, vk = groth16.setup(cs, BN254, rng=rng)
    proof = groth16.prove(cs, pk, [v, x], rng=rng)
    assert groth16.verify(proof, vk, [v])
