"""Gadget stdlib tests: MiMC, Merkle, twisted Edwards, EdDSA, bits.

Differential pattern from the reference (std/*_test.go): every gadget is
checked against its host implementation through the big-int engine and
the real solvers.
"""

import pytest

from gnark_tpu import test_harness
from gnark_tpu.curves import ALL_CURVES, BN254, BLS12_377, BLS12_381
from gnark_tpu.frontend.schema import Circuit, Public, Secret
from gnark_tpu.std import bits as std_bits
from gnark_tpu.std import eddsa, merkle
from gnark_tpu.std.mimc import MiMC, mimc_hash
from gnark_tpu.std.twisted_edwards import BY_SNARK_CURVE, EdCurve, host_curve


# ---- MiMC ----------------------------------------------------------------------


class MiMCPreimage(Circuit):
    pre = Secret()
    h = Public()

    def define(self, api):
        m = MiMC(api)
        m.write(self.pre)
        api.assert_is_equal(self.h, m.sum())


@pytest.mark.parametrize("name", sorted(ALL_CURVES))
def test_mimc_host_circuit_consistency(name):
    curve = ALL_CURVES[name]
    a = MiMCPreimage()
    a.pre = 12345
    a.h = mimc_hash(curve, 12345)
    test_harness.prover_succeeded(MiMCPreimage, a, curves=[curve])
    bad = MiMCPreimage()
    bad.pre = 12346
    bad.h = a.h
    test_harness.prover_failed(MiMCPreimage, bad, curves=[curve])


def test_mimc_multi_write():
    # Miyaguchi-Preneel chaining over several elements
    class TwoElem(Circuit):
        a = Secret()
        b = Secret()
        h = Public()

        def define(self, api):
            m = MiMC(api)
            m.write(self.a, self.b)
            api.assert_is_equal(self.h, m.sum())

    x = TwoElem()
    x.a, x.b = 7, 9
    x.h = mimc_hash(BN254, 7, 9)
    test_harness.prover_succeeded(TwoElem, x)


# ---- Merkle --------------------------------------------------------------------


def test_merkle_proof():
    leaves = [10, 20, 30, 40, 50, 60, 70, 80]
    rt = merkle.root(BN254, leaves)
    proof, helper = merkle.prove(BN254, leaves, 5)

    assert len(proof) == 4 and len(helper) == 3  # 8 leaves -> depth 3

    class MerkleCircuit(Circuit):
        root = Public()
        proof = Secret(shape=(4,))
        helper = Secret(shape=(3,))

        def define(self, api):
            merkle.verify_proof(api, self.root, self.proof, self.helper)

    a = MerkleCircuit()
    a.root, a.proof, a.helper = rt, proof, helper
    test_harness.prover_succeeded(MerkleCircuit, a)

    bad = MerkleCircuit()
    bad.root = rt
    bad.proof = [proof[0] + 1] + proof[1:]
    bad.helper = helper
    test_harness.prover_failed(MerkleCircuit, bad)


# ---- twisted Edwards -------------------------------------------------------------


@pytest.mark.parametrize("name", sorted(BY_SNARK_CURVE))
def test_ed_curve_params_valid(name):
    host_curve(name).validate()


def test_ed_scalar_mul_circuit_matches_host():
    ed = host_curve("bn254")
    B = ed.params.base
    k = 0x1234567890ABCDEF
    expect = ed.scalar_mul(B, k)

    class ScalarMul(Circuit):
        k = Secret()
        x = Public()
        y = Public()

        def define(self, api):
            c = EdCurve(api)
            P = c.scalar_mul(c.params.base, self.k, nb_bits=64)
            api.assert_is_equal(P[0], self.x)
            api.assert_is_equal(P[1], self.y)

    a = ScalarMul()
    a.k, (a.x, a.y) = k, expect
    test_harness.prover_succeeded(ScalarMul, a)


# ---- Bandersnatch GLV ----------------------------------------------------------


def test_bandersnatch_endo_constants():
    """Verify the published endo constants in-repo: lambda^2 = -2 mod
    order, the phi formula lands on the curve and acts as [lambda]."""
    from gnark_tpu.std.twisted_edwards import (
        BANDERSNATCH, BANDERSNATCH_ENDO, EdHost)
    pms, endo = BANDERSNATCH, BANDERSNATCH_ENDO
    p = pms.field_modulus
    assert pow(endo.lam, 2, pms.order) == pms.order - 2
    host = EdHost(pms)
    host.validate()
    X, Y = host.scalar_mul(pms.base, 12345)
    yy = Y * Y % p
    phix = endo.c * (1 - yy) % p * pow(X * Y % p, -1, p) % p
    phiy = endo.b * (yy + endo.b) % p * pow((yy - endo.b) % p, -1, p) % p
    assert host.is_on_curve((phix, phiy))
    assert (phix, phiy) == host.scalar_mul((X, Y), endo.lam)


def test_bandersnatch_glv_scalar_mul():
    """GLV joint ladder (scalarmul_glv.go analog): engine differential
    vs the host ladder + compiled/solved circuit."""
    import random
    from gnark_tpu import test_engine
    from gnark_tpu.backend import solver
    from gnark_tpu.curves import BLS12_381
    from gnark_tpu.frontend.compile import compile_circuit
    from gnark_tpu.std.twisted_edwards import BANDERSNATCH, EdHost

    host = EdHost(BANDERSNATCH)
    rng = random.Random(5)
    k = rng.randrange(2, BANDERSNATCH.order)
    base = host.scalar_mul(BANDERSNATCH.base, 3)
    want = host.scalar_mul(base, k)

    api = test_engine.BigIntEngine(BLS12_381)
    c = EdCurve(api, BANDERSNATCH)
    assert c.scalar_mul_glv(base, k) == want

    # VARIABLE base point (the eddsa-style use case — with a constant
    # base the plain ladder constant-folds its doubling chain and wins)
    class Glv(Circuit):
        out_x = Public()
        out_y = Public()
        bx = Secret(); by = Secret()
        k = Secret()

        def define(self, api):
            c = EdCurve(api, BANDERSNATCH)
            P = c.scalar_mul_glv((self.bx, self.by), self.k)
            api.assert_is_equal(P[0], self.out_x)
            api.assert_is_equal(P[1], self.out_y)

    cs = compile_circuit(Glv(), BLS12_381)
    assert solver.solve(cs, [want[0], want[1], base[0], base[1], k]) \
        is not None
    assert not solver.is_solved(cs, [want[0], (want[1] + 1),
                                     base[0], base[1], k])
    # the GLV ladder must beat the 253-step plain double-and-add
    class Plain(Circuit):
        out_x = Public()
        out_y = Public()
        bx = Secret(); by = Secret()
        k = Secret()

        def define(self, api):
            c = EdCurve(api, BANDERSNATCH)
            P = c.scalar_mul((self.bx, self.by), self.k)
            api.assert_is_equal(P[0], self.out_x)
            api.assert_is_equal(P[1], self.out_y)

    cs_plain = compile_circuit(Plain(), BLS12_381)
    assert cs.nb_constraints < cs_plain.nb_constraints, \
        (cs.nb_constraints, cs_plain.nb_constraints)


# ---- EdDSA ---------------------------------------------------------------------


@pytest.mark.parametrize("name", ["bn254", "bls12_377"])
def test_eddsa_sign_verify(name):
    curve = ALL_CURVES[name]
    kp = eddsa.KeyPair.generate(curve, b"seed-42")
    msg = 1234567890123456789
    sig = kp.sign(msg, curve)
    assert eddsa.host_verify(sig, msg, kp.public, curve)
    assert not eddsa.host_verify(sig, msg + 1, kp.public, curve)

    class EdDSACircuit(Circuit):
        msg = Public()
        rx = Secret()
        ry = Secret()
        s = Secret()
        ax = Secret()
        ay = Secret()

        def define(self, api):
            eddsa.verify(api, (self.rx, self.ry), self.s, self.msg,
                         (self.ax, self.ay))

    a = EdDSACircuit()
    a.msg = msg
    a.rx, a.ry = sig.r
    a.s = sig.s
    a.ax, a.ay = kp.public
    # scalar-mul gadgets are large: solver-level check, groth16 only
    test_harness.prover_succeeded(EdDSACircuit, a, curves=[curve],
                                  schemes=["groth16"])

    bad = EdDSACircuit()
    bad.msg = msg + 1
    bad.rx, bad.ry = sig.r
    bad.s = sig.s
    bad.ax, bad.ay = kp.public
    test_harness.prover_failed(EdDSACircuit, bad, curves=[curve],
                               schemes=["groth16"])


# ---- bits ----------------------------------------------------------------------


def test_ternary_and_naf():
    class Ternary(Circuit):
        v = Secret()
        w = Public()

        def define(self, api):
            std_bits.to_ternary(api, self.v, nb_trits=12)
            std_bits.to_naf(api, self.w, nb_digits=12)

    a = Ternary()
    a.v, a.w = 3 ** 11 - 5, 1000
    test_harness.prover_succeeded(Ternary, a)


def test_mimc_golden_digests():
    """Pin the keccak-chain round-constant derivation (gnark-crypto
    structure, see std/mimc.py caveat): mimc(12345) per curve."""
    from gnark_tpu.curves import (BLS12_377, BLS12_381, BLS24_315, BN254,
                                  BW6_633, BW6_761)
    from gnark_tpu.std.mimc import mimc_hash
    golden = {
        "bn254": 18146917318481812645722117845613669474519613444966114841141548207944429999455,
        "bls12_381": 47497899474892410415985766704767937826124063418577145894616483902780098152088,
        "bls12_377": 5751355265600680005426107910457456988197935762956554404097619488954804593753,
        "bls24_315": 1701900559257181960668998168157191655038672865215325390282961542982772502509,
        "bw6_633": 875525048382201788449136652700918819396455172117902998054118955250912532034420720433529217372,
        "bw6_761": 238355638580015487351811983620679849677188783841343234019816880273842142537194302484191454671332521430890532255705,
    }
    for c in (BN254, BLS12_381, BLS12_377, BLS24_315, BW6_633, BW6_761):
        assert mimc_hash(c, 12345) == golden[c.name], c.name
