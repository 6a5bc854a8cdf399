"""Recursion gadget tests: in-circuit BLS24-315 towers/pairing/Groth16
verifier over BW6-633's scalar field.

Differential pattern (as tests/test_recursion.py): every gadget is
executed by the big-int engine on concrete values and compared against
the host implementations (curves/pairing_bw6.PairingBLS24Ate,
backend/groth16.py), then the full verifier circuit is compiled +
solved (std/groth16_bls24315/verifier_test.go analog).
"""

import random

import pytest

from gnark_tpu import test_engine
from gnark_tpu.backend import groth16, solver
from gnark_tpu.curves import BLS24_315, BW6_633
from gnark_tpu.curves.pairing import pairing_for
from gnark_tpu.curves.pairing_bw6 import PairingBLS24, PairingBLS24Ate
from gnark_tpu.frontend.compile import compile_circuit
from gnark_tpu.frontend.schema import Circuit, Public, Secret
from gnark_tpu.std import groth16_bls24315
from gnark_tpu.std.algebra.fields_bls24315 import (
    E24, flat_to_tower, tower_to_flat, frobenius_consts)
from gnark_tpu.std.algebra.sw_bls24315 import (
    G1Gadget, PairingGadget, GLV_LAMBDA, GLV_BETA)

FP = BLS24_315.fp.modulus
FR = BLS24_315.fr.modulus


def _engine():
    return test_engine.BigIntEngine(BW6_633)


def _host_gt():
    return pairing_for(BLS24_315).gt


def test_final_exp_chain_identity():
    """The x-chain used by host + gadget final exponentiation is the
    integer identity 3(p^8-p^4+1)/r = (x-1)^2 (x+p)(x^2+p^2)(x^4+p^4-1)+3."""
    p, r, u = FP, FR, BLS24_315.x_param
    assert r == u ** 8 - u ** 4 + 1
    assert (p ** 8 - p ** 4 + 1) % r == 0
    assert 3 * (p ** 8 - p ** 4 + 1) // r == \
        (u - 1) ** 2 * (u + p) * (u * u + p * p) * (u ** 4 + p ** 4 - 1) + 3


def test_glv_constants():
    assert (GLV_LAMBDA * GLV_LAMBDA + GLV_LAMBDA + 1) % FR == 0
    assert pow(GLV_BETA, 3, FP) == 1 and GLV_BETA != 1
    host = BLS24_315.host_g1
    P = BLS24_315.g1_gen
    lP = host.scalar_mul(P, GLV_LAMBDA)
    assert (GLV_BETA * P[0] % FP, P[1] % FP) == (lP[0] % FP, lP[1] % FP)


def test_e24_matches_host_flat():
    api = _engine()
    K = E24(api)
    gt = _host_gt()
    rng = random.Random(0)
    a_flat = tuple(rng.randrange(FP) for _ in range(24))
    b_flat = tuple(rng.randrange(FP) for _ in range(24))
    a, b = flat_to_tower(list(a_flat)), flat_to_tower(list(b_flat))

    # round-trip of the basis mapping
    assert tuple(tower_to_flat(a)) == a_flat

    assert tower_to_flat(K.mul(a, b)) == list(gt.mul(a_flat, b_flat))
    assert tower_to_flat(K.sqr(a)) == list(gt.sqr(a_flat))
    assert tower_to_flat(K.inverse(a)) == list(gt.inv(a_flat))
    assert tower_to_flat(K.conjugate(a)) == list(gt.conj(a_flat))

    pr = pairing_for(BLS24_315)
    for e in (1, 2, 4):
        assert tower_to_flat(K.frobenius(a, e)) == list(pr.frob(a_flat, e))


def test_conjugate_is_p12_frobenius():
    """The tower conjugate (negate z-coeff) must equal the flat p^12
    Frobenius: gamma = 13^((p^12-1)/24) = -1."""
    for i, (j, c) in enumerate(frobenius_consts(12)):
        assert j == i
        assert c == (1 if i % 2 == 0 else FP - 1)


def test_pairing_gadget_matches_host():
    api = _engine()
    pg = PairingGadget(api)
    host1, host2 = BLS24_315.host_g1, BLS24_315.host_g2
    P = host1.scalar_mul(BLS24_315.g1_gen, 777)
    Q = host2.scalar_mul(BLS24_315.g2_gen, 333)
    got = pg.pair(P, (Q[0], Q[1]))
    want = flat_to_tower(list(pairing_for(BLS24_315).pair(P, Q)))
    assert got == want


def test_host_ate_bilinear_and_tate_consistent():
    cv = BLS24_315
    pr = PairingBLS24Ate(cv)
    gt = pr.gt
    h1, h2 = cv.host_g1, cv.host_g2
    P, Q = cv.g1_gen, cv.g2_gen
    e = pr.pair(P, Q)
    assert not gt.eq(e, gt.one())
    assert gt.eq(gt.pow(e, cv.fr.modulus), gt.one())
    a, b = 1234567, 987654
    assert gt.eq(pr.pair(h1.scalar_mul(P, a), h2.scalar_mul(Q, b)),
                 gt.pow(e, a * b % cv.fr.modulus))
    # ate and Tate agree on pairing-product checks
    tate = PairingBLS24(cv)
    pairs = [(h1.scalar_mul(P, 21), Q),
             (h1.neg(h1.scalar_mul(P, 3)), h2.scalar_mul(Q, 7))]
    assert pr.pairing_check(pairs) and tate.pairing_check(pairs)
    bad = [(h1.scalar_mul(P, 22), Q),
           (h1.neg(h1.scalar_mul(P, 3)), h2.scalar_mul(Q, 7))]
    assert not pr.pairing_check(bad) and not tate.pairing_check(bad)


def test_g1_gadget_scalar_mul():
    api = _engine()
    g1 = G1Gadget(api)
    host = BLS24_315.host_g1
    base = host.scalar_mul(BLS24_315.g1_gen, 9)
    k = 0xDEADBEEF12345
    assert g1.scalar_mul_const_base(base, k, nb_bits=64) == \
        host.scalar_mul(base, k)


def test_glv_scalar_mul_var():
    api = _engine()
    g1 = G1Gadget(api)
    host = BLS24_315.host_g1
    rng = random.Random(11)
    k = rng.randrange(2, FR)
    base = host.scalar_mul(BLS24_315.g1_gen, 7)
    assert g1.scalar_mul_var(base, k) == host.scalar_mul(base, k)


# ---- full in-circuit Groth16 verification -------------------------------


class _InnerCubic(Circuit):
    x = Secret()
    y = Public()

    def define(self, api):
        x3 = api.mul(self.x, self.x, self.x)
        api.assert_is_equal(self.y, api.add(x3, self.x, 5))


@pytest.fixture(scope="module")
def inner_proof():
    cs = compile_circuit(_InnerCubic(), BLS24_315)
    rng = random.Random(9)
    pk, vk = groth16.setup(cs, BLS24_315, rng=rng, host=True)
    proof = groth16.prove(cs, pk, [35, 3], rng=rng)
    assert groth16.verify(proof, vk, [35])
    return vk, proof


class RecursionCircuit(Circuit):
    """Verifies a BLS24-315 cubic proof in-circuit (verifier.go analog)."""
    inner_y = Public()
    ar_x = Secret(); ar_y = Secret()
    krs_x = Secret(); krs_y = Secret()
    bs_x = Secret(shape=(4,)); bs_y = Secret(shape=(4,))

    vk = None  # set per-instance before compile

    def define(self, api):
        groth16_bls24315.verify_proof(
            api, type(self).vk,
            (self.ar_x, self.ar_y),
            (tuple(self.bs_x), tuple(self.bs_y)),
            (self.krs_x, self.krs_y),
            [self.inner_y])


def _assignment(vk, proof, public_value):
    a = RecursionCircuit()
    a.inner_y = public_value
    a.ar_x, a.ar_y = proof.ar
    a.krs_x, a.krs_y = proof.krs
    a.bs_x = list(proof.bs[0])
    a.bs_y = list(proof.bs[1])
    return a


def test_recursive_verifier_engine(inner_proof):
    vk, proof = inner_proof
    RecursionCircuit.vk = vk
    test_engine.is_solved(RecursionCircuit(), _assignment(vk, proof, 35),
                          BW6_633)
    with pytest.raises(Exception):
        test_engine.is_solved(RecursionCircuit(),
                              _assignment(vk, proof, 36), BW6_633)


def test_recursive_verifier_solver(inner_proof):
    vk, proof = inner_proof
    RecursionCircuit.vk = vk
    cs = compile_circuit(RecursionCircuit(), BW6_633)
    a = _assignment(vk, proof, 35)
    from gnark_tpu.frontend import schema as schema_mod
    pub = schema_mod.collect_values(a, "public")
    sec = schema_mod.collect_values(a, "secret")
    sol = solver.solve(cs, pub + sec)
    assert sol is not None
    assert not solver.is_solved(cs, [36] + sec)


@pytest.mark.slow
def test_outer_proof_end_to_end(inner_proof):
    """ONE-LAYER RECURSION over the BLS24 2-chain: the BLS24-315 proof
    is verified in-circuit over BW6-633 AND the outer BW6-633 Groth16
    proof is produced and verified (std/groth16_bls24315/
    verifier_test.go analog)."""
    from gnark_tpu.frontend import schema as schema_mod

    vk_in, proof_in = inner_proof
    RecursionCircuit.vk = vk_in
    cs = compile_circuit(RecursionCircuit(), BW6_633)
    pk, vk = groth16.setup(cs, BW6_633, rng=random.Random(11))
    a = _assignment(vk_in, proof_in, 35)
    pub = schema_mod.collect_values(a, "public")
    sec = schema_mod.collect_values(a, "secret")
    proof = groth16.prove(cs, pk, pub + sec, rng=random.Random(12))
    assert groth16.verify(proof, vk, pub)
    assert not groth16.verify(proof, vk, [36])
