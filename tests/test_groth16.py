"""Groth16 end-to-end: compile -> setup -> prove -> verify.

The tier-2 assertion-harness analog (reference test/assert.go:46) on the
cubic example circuit (examples/cubic/cubic.go:32).

Fast tests run the pure-host prover path (same protocol math, python
ints); the device-kernel path (fixed-base setup kernels, NTT quotient,
ladder/windowed MSMs) is exercised by the `slow`-marked test and by the
dedicated kernel tests (test_msm/test_ntt/test_ec/test_sharded).
"""

import random

import pytest

from gnark_tpu.backend import groth16
from gnark_tpu.backend.solver import UnsatisfiedConstraintError, solve
from gnark_tpu.curves import BLS12_377, BLS12_381, BN254
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
    pk, vk = groth16.setup(cs, BN254, rng=rng, host=True)
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


@pytest.mark.parametrize("curve", [BLS12_381, BLS12_377],
                         ids=lambda c: c.name)
def test_other_curves_end_to_end(curve):
    cs = compile_circuit(Cubic(), curve)
    rng = random.Random(7)
    pk, vk = groth16.setup(cs, curve, rng=rng, host=True)
    proof = groth16.prove(cs, pk, [35, 3], rng=rng)
    assert groth16.verify(proof, vk, [35])
    assert not groth16.verify(proof, vk, [34])


def test_serialization_roundtrip_verifies(cubic_bn254):
    from gnark_tpu.backend import serialize
    cs, pk, vk = cubic_bn254
    proof = groth16.prove(cs, pk, [35, 3], rng=random.Random(8))
    blob = serialize.proof_to_bytes(proof, BN254)
    proof2 = serialize.proof_from_bytes(blob, BN254)
    assert groth16.verify(proof2, vk, [35])


class ManyConstraints(Circuit):
    """x_{i+1} = x_i^2 + x_i chain — exercises domain padding
    (shape of the reference benchmark circuit, groth16_test.go:57)."""
    x = Secret()
    y = Public()

    def define(self, api):
        v = self.x
        for _ in range(70):
            v = api.add(api.mul(v, v), v)
        api.assert_is_equal(self.y, v)


def _chain_output(x, q):
    v = x
    for _ in range(70):
        v = (v * v + v) % q
    return v


def test_larger_circuit_host_path():
    q = BN254.fr.modulus
    v = _chain_output(3, q)
    cs = compile_circuit(ManyConstraints(), BN254)
    assert cs.nb_constraints > 64  # crosses a power-of-two domain boundary
    rng = random.Random(8)
    pk, vk = groth16.setup(cs, BN254, rng=rng, host=True)
    proof = groth16.prove(cs, pk, [v, 3], rng=rng)
    assert groth16.verify(proof, vk, [v])


@pytest.mark.slow
def test_device_path_end_to_end():
    """Full device pipeline: fixed-base setup kernels -> NTT quotient ->
    device MSMs (compile-heavy on CPU; kernels cached under .jax_cache)."""
    cs = compile_circuit(Cubic(), BN254)
    rng = random.Random(9)
    pk, vk = groth16.setup(cs, BN254, rng=rng)
    proof = groth16.prove(cs, pk, [35, 3], rng=rng)
    assert groth16.verify(proof, vk, [35])
    assert not groth16.verify(proof, vk, [36])
