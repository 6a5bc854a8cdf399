"""Vectorized (leveled numpy) solver vs the scalar reference solver.

Differential discipline: every corpus circuit, valid and invalid
assignment, must produce identical wire vectors / a,b,c vectors or the
identical failure (reference: internal/backend/bn254/cs/r1cs.go:127
parallelSolve vs Solve agreement, exercised by assert.go).
"""

import random

import pytest

from gnark_tpu.backend import solver
from gnark_tpu.backend.witness import Witness
from gnark_tpu.curves import BN254
from gnark_tpu.frontend.compile import compile_circuit
from gnark_tpu.frontend.schema import Circuit, Public, Secret

from circuits_corpus import CORPUS


@pytest.mark.parametrize("entry", CORPUS, ids=lambda e: e[0].__name__)
def test_corpus_differential(entry):
    cls, good, bad = entry
    cs = compile_circuit(cls(), BN254)
    for assignment, _ok in ((good, True), (bad, False)):
        w = Witness.from_assignment(assignment, BN254)
        try:
            s1 = solver.solve(cs, w.values, vectorized=False)
            r1 = ("ok", s1.values, s1.a, s1.b, s1.c)
        except Exception as e:
            r1 = ("err", type(e).__name__)
        try:
            s2 = solver.solve(cs, w.values, vectorized=True)
            assert s2.limbs is not None, "np path not taken"
            r2 = ("ok", s2.values, s2.a, s2.b, s2.c)
        except AssertionError:
            raise
        except Exception as e:
            r2 = ("err", type(e).__name__)
        assert r1[0] == r2[0], f"{cls.__name__}: {r1} vs {r2}"
        if r1[0] == "ok":
            assert r1[1:] == r2[1:], f"{cls.__name__}: value mismatch"


class WideCircuit(Circuit):
    """Wide level schedule: many independent square chains."""
    xs = Secret(shape=(64,))
    out = Public()

    def define(self, api):
        acc = 0
        for i in range(64):
            v = self.xs[i]
            for _ in range(8):
                v = api.mul(v, v)
            acc = api.add(acc, v)
        api.assert_is_equal(acc, self.out)


def test_wide_circuit_auto_vectorizes():
    cs = compile_circuit(WideCircuit(), BN254)
    q = BN254.fr.modulus
    rng = random.Random(7)
    xs = [rng.randrange(q) for _ in range(64)]
    out = sum(pow(x, 1 << 8, q) for x in xs) % q
    a = WideCircuit()
    a.xs, a.out = xs, out
    w = Witness.from_assignment(a, BN254)
    s1 = solver.solve(cs, w.values, vectorized=False)
    s2 = solver.solve(cs, w.values, vectorized=True)
    assert s2.limbs is not None
    assert s1.values == s2.values
    assert (s1.a, s1.b, s1.c) == (s2.a, s2.b, s2.c)


def test_unsatisfied_reports_constraint_id():
    cs = compile_circuit(WideCircuit(), BN254)
    a = WideCircuit()
    a.xs, a.out = [1] * 64, 63   # wrong sum
    w = Witness.from_assignment(a, BN254)
    with pytest.raises(solver.UnsatisfiedConstraintError) as e1:
        solver.solve(cs, w.values, vectorized=False)
    with pytest.raises(solver.UnsatisfiedConstraintError) as e2:
        solver.solve(cs, w.values, vectorized=True)
    assert e1.value.constraint_id == e2.value.constraint_id
