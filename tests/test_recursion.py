"""Recursion gadget tests: in-circuit BLS12-377 towers/pairing/Groth16
verifier over BW6-761's scalar field.

Differential pattern: every gadget is executed by the big-int engine on
concrete values and compared against the host implementations
(curves/pairing.py, backend/groth16.py), then the full verifier circuit
is compiled + solved (std/groth16_bls12377/verifier_test.go analog).
"""

import random

import pytest

from gnark_tpu import test_engine, test_harness
from gnark_tpu.backend import groth16, solver
from gnark_tpu.curves import BLS12_377, BW6_761
from gnark_tpu.curves.pairing import pairing_for
from gnark_tpu.frontend.compile import compile_circuit
from gnark_tpu.frontend.schema import Circuit, Public, Secret
from gnark_tpu.std import groth16_bls12377
from gnark_tpu.std.algebra.fields_bls12377 import E12
from gnark_tpu.std.algebra.sw_bls12377 import G1Gadget, PairingGadget
from gnark_tpu.std.groth16_bls12377 import _gt_to_tower

FP = BLS12_377.fp.modulus


def _engine():
    return test_engine.BigIntEngine(BW6_761)


def test_e12_matches_host_fp12():
    api = _engine()
    K = E12(api)
    pr = pairing_for(BLS12_377)
    rng = random.Random(0)
    a_host = tuple((rng.randrange(FP), rng.randrange(FP)) for _ in range(6))
    b_host = tuple((rng.randrange(FP), rng.randrange(FP)) for _ in range(6))
    a, b = _gt_to_tower(a_host), _gt_to_tower(b_host)

    got = K.mul(a, b)
    want = _gt_to_tower(pr.fp12.mul(a_host, b_host))
    assert got == want

    got_inv = K.inverse(a)
    want_inv = _gt_to_tower(pr.fp12.inv(a_host))
    assert got_inv == want_inv

    got_frob = K.frobenius(a)
    want_frob = _gt_to_tower(pr.fp12.frob(a_host))
    assert got_frob == want_frob


def test_pairing_gadget_matches_host():
    api = _engine()
    pg = PairingGadget(api)
    host1, host2 = BLS12_377.host_g1, BLS12_377.host_g2
    P = host1.scalar_mul(BLS12_377.g1_gen, 777)
    Q = host2.scalar_mul(BLS12_377.g2_gen, 333)
    got = pg.pair(P, (Q[0], Q[1]))
    want = _gt_to_tower(pairing_for(BLS12_377).pair(P, Q))
    assert got == want


def test_g1_gadget_scalar_mul():
    api = _engine()
    g1 = G1Gadget(api)
    host = BLS12_377.host_g1
    base = host.scalar_mul(BLS12_377.g1_gen, 9)
    k = 0xDEADBEEF12345
    got = g1.scalar_mul_const_base(base, k, nb_bits=64)
    want = host.scalar_mul(base, k)
    assert got == want


# ---- full in-circuit Groth16 verification --------------------------------------


class _InnerCubic(Circuit):
    x = Secret()
    y = Public()

    def define(self, api):
        x3 = api.mul(self.x, self.x, self.x)
        api.assert_is_equal(self.y, api.add(x3, self.x, 5))


@pytest.fixture(scope="module")
def inner_proof():
    cs = compile_circuit(_InnerCubic(), BLS12_377)
    rng = random.Random(9)
    pk, vk = groth16.setup(cs, BLS12_377, rng=rng, host=True)
    proof = groth16.prove(cs, pk, [35, 3], rng=rng)
    assert groth16.verify(proof, vk, [35])
    return vk, proof


class RecursionCircuit(Circuit):
    """Verifies a BLS12-377 cubic proof in-circuit (verifier.go:33)."""
    inner_y = Public()
    ar_x = Secret(); ar_y = Secret()
    krs_x = Secret(); krs_y = Secret()
    bs_x0 = Secret(); bs_x1 = Secret()
    bs_y0 = Secret(); bs_y1 = Secret()

    vk = None  # set per-instance before compile

    def define(self, api):
        groth16_bls12377.verify_proof(
            api, type(self).vk,
            (self.ar_x, self.ar_y),
            ((self.bs_x0, self.bs_x1), (self.bs_y0, self.bs_y1)),
            (self.krs_x, self.krs_y),
            [self.inner_y])


def _assignment(vk, proof, public_value):
    a = RecursionCircuit()
    a.inner_y = public_value
    a.ar_x, a.ar_y = proof.ar
    a.krs_x, a.krs_y = proof.krs
    (a.bs_x0, a.bs_x1), (a.bs_y0, a.bs_y1) = proof.bs
    return a


def test_recursive_verifier_engine(inner_proof):
    vk, proof = inner_proof
    RecursionCircuit.vk = vk
    test_engine.is_solved(RecursionCircuit(), _assignment(vk, proof, 35),
                          BW6_761)
    with pytest.raises(Exception):
        test_engine.is_solved(RecursionCircuit(),
                              _assignment(vk, proof, 36), BW6_761)


def test_recursive_verifier_solver(inner_proof):
    vk, proof = inner_proof
    RecursionCircuit.vk = vk
    cs = compile_circuit(RecursionCircuit(), BW6_761)
    a = _assignment(vk, proof, 35)
    from gnark_tpu.frontend import schema as schema_mod
    pub = schema_mod.collect_values(a, "public")
    sec = schema_mod.collect_values(a, "secret")
    sol = solver.solve(cs, pub + sec)
    assert sol is not None
    assert not solver.is_solved(cs, [36] + sec)


def test_glv_scalar_mul_var():
    """GLV variable-point scalar mul (g1.go:234 varScalarMul analog):
    engine differential + compiled/solved circuit at half the ladder's
    iteration count."""
    import random
    from gnark_tpu.std.algebra.sw_bls12377 import (
        G1Gadget, decompose_scalar_bls12377, GLV_LAMBDA)

    api = _engine()
    g1 = G1Gadget(api)
    host = BLS12_377.host_g1
    rng = random.Random(11)
    k = rng.randrange(2, BLS12_377.fr.modulus)
    base = host.scalar_mul(BLS12_377.g1_gen, 7)
    assert g1.scalar_mul_var(base, k) == host.scalar_mul(base, k)

    # compiled: prove knowledge of k with [k]G == public point
    class GlvCircuit(Circuit):
        out_x = Public()
        out_y = Public()
        k = Secret()

        def define(self, api):
            g = G1Gadget(api)
            P = g.scalar_mul_var(base, self.k)
            api.assert_is_equal(P[0], self.out_x)
            api.assert_is_equal(P[1], self.out_y)

    cs = compile_circuit(GlvCircuit(), BW6_761)
    want = host.scalar_mul(base, k)
    sol = solver.solve(cs, [want[0], want[1], k])
    assert sol is not None
    # ~128 GLV iterations vs 253 ladder steps: constraint count must
    # reflect the halving (ladder version was ~6/bit)
    assert cs.nb_constraints < 2500, cs.nb_constraints


@pytest.mark.slow
def test_outer_proof_end_to_end(inner_proof):
    """ONE-LAYER RECURSION, outer prove included: the BLS12-377 proof is
    verified in-circuit over BW6-761 AND the resulting outer BW6-761
    Groth16 proof is produced and verified (the deliverable of
    std/groth16_bls12377/verifier_test.go:164).  ~8 min: 92.5k-constraint
    outer circuit, native setup/MSM cores + device NTT."""
    import random
    from gnark_tpu.frontend import schema as schema_mod

    vk_in, proof_in = inner_proof
    RecursionCircuit.vk = vk_in
    cs = compile_circuit(RecursionCircuit(), BW6_761)
    pk, vk = groth16.setup(cs, BW6_761, rng=random.Random(11))
    a = _assignment(vk_in, proof_in, 35)
    pub = schema_mod.collect_values(a, "public")
    sec = schema_mod.collect_values(a, "secret")
    proof = groth16.prove(cs, pk, pub + sec, rng=random.Random(12))
    assert groth16.verify(proof, vk, pub)
    assert not groth16.verify(proof, vk, [36])
