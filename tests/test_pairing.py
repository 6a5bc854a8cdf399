"""Host pairing tests: bilinearity / non-degeneracy on all curves.

Mirrors the role of gnark-crypto's pairing tests (consumed by the
reference at internal/backend/bn254/groth16/verify.go:58-86).
"""

import pytest

from gnark_tpu.curves import ALL_CURVES, BN254
from gnark_tpu.curves.pairing import pairing_for


@pytest.mark.parametrize("name", sorted(ALL_CURVES))
def test_bilinearity(name):
    curve = ALL_CURVES[name]
    pr = pairing_for(curve)
    g1, g2 = curve.g1_gen, curve.g2_gen
    a, b = 1234577, 9876541
    P = curve.host_g1.scalar_mul(g1, a)
    Q = curve.host_g2.scalar_mul(g2, b)
    e_ab = pr.pair(P, Q)
    assert e_ab == pr.fp12.pow(pr.pair(g1, g2), a * b % curve.fr.modulus)
    assert e_ab != pr.fp12.one  # non-degeneracy


@pytest.mark.parametrize("name", sorted(ALL_CURVES))
def test_pairing_check_product(name):
    curve = ALL_CURVES[name]
    pr = pairing_for(curve)
    P = curve.host_g1.scalar_mul(curve.g1_gen, 777)
    Q = curve.host_g2.scalar_mul(curve.g2_gen, 333)
    assert pr.pairing_check([(P, Q), (curve.host_g1.neg(P), Q)])
    assert not pr.pairing_check([(P, Q), (P, Q)])


def test_gt_inverse_is_conjugate():
    pr = pairing_for(BN254)
    e = pr.pair(BN254.g1_gen, BN254.g2_gen)
    assert pr.fp12.mul(e, pr.fp12.conj(e)) == pr.fp12.one


def test_curve_specs_validate():
    for curve in ALL_CURVES.values():
        curve.validate()
