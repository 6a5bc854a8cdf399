"""Micro-circuit corpus with valid + invalid assignments.

The internal/backend/circuits analog (circuits.go:11-42 registry of 24
micro-circuits, each with good/bad witnesses) driving integration tests
over {curves} x {schemes}.
"""

from gnark_tpu.frontend.schema import Circuit, Public, Secret


def _case(cls, valid: dict, invalid: dict):
    good, bad = cls(), cls()
    for k, v in valid.items():
        setattr(good, k, v)
    for k, v in invalid.items():
        setattr(bad, k, v)
    return (cls, good, bad)


class AddCircuit(Circuit):
    a = Secret()
    b = Secret()
    c = Public()

    def define(self, api):
        api.assert_is_equal(api.add(self.a, self.b, 3), self.c)


class SubCircuit(Circuit):
    a = Secret()
    c = Public()

    def define(self, api):
        api.assert_is_equal(api.sub(self.a, 5), self.c)


class MulCircuit(Circuit):
    a = Secret()
    b = Secret()
    c = Public()

    def define(self, api):
        api.assert_is_equal(api.mul(self.a, self.b, 2), self.c)


class DivCircuit(Circuit):
    a = Secret()
    b = Secret()
    c = Public()

    def define(self, api):
        api.assert_is_equal(api.div(self.a, self.b), self.c)


class InverseCircuit(Circuit):
    a = Secret()
    c = Public()

    def define(self, api):
        api.assert_is_equal(api.inverse(self.a), self.c)


class NegCircuit(Circuit):
    a = Secret()
    c = Public()

    def define(self, api):
        api.assert_is_equal(api.neg(self.a), self.c)


class XorCircuit(Circuit):
    a = Secret()
    b = Secret()
    c = Public()

    def define(self, api):
        api.assert_is_equal(api.xor(self.a, self.b), self.c)


class OrCircuit(Circuit):
    a = Secret()
    b = Secret()
    c = Public()

    def define(self, api):
        api.assert_is_equal(api.or_(self.a, self.b), self.c)


class AndCircuit(Circuit):
    a = Secret()
    b = Secret()
    c = Public()

    def define(self, api):
        api.assert_is_equal(api.and_(self.a, self.b), self.c)


class ToBinaryCircuit(Circuit):
    a = Secret()
    b0 = Public()
    b1 = Public()
    b2 = Public()

    def define(self, api):
        bits = api.to_binary(self.a, 3)
        api.assert_is_equal(bits[0], self.b0)
        api.assert_is_equal(bits[1], self.b1)
        api.assert_is_equal(bits[2], self.b2)


class FromBinaryCircuit(Circuit):
    b = Secret(shape=(4,))
    v = Public()

    def define(self, api):
        api.assert_is_equal(api.from_binary(self.b), self.v)


class SelectCircuit(Circuit):
    cond = Secret()
    a = Secret()
    b = Secret()
    c = Public()

    def define(self, api):
        api.assert_is_equal(api.select(self.cond, self.a, self.b), self.c)


class Lookup2Circuit(Circuit):
    b0 = Secret()
    b1 = Secret()
    c = Public()

    def define(self, api):
        api.assert_is_equal(
            api.lookup2(self.b0, self.b1, 10, 20, 30, 40), self.c)


class IsZeroCircuit(Circuit):
    a = Secret()
    z = Public()

    def define(self, api):
        api.assert_is_equal(api.is_zero(self.a), self.z)


class AssertDifferentCircuit(Circuit):
    a = Secret()
    b = Public()

    def define(self, api):
        api.assert_is_different(self.a, self.b)


class AssertBooleanCircuit(Circuit):
    a = Secret()
    b = Public()

    def define(self, api):
        api.assert_is_boolean(self.a)
        api.assert_is_equal(api.mul(self.a, 2), self.b)


class LessOrEqualConstCircuit(Circuit):
    a = Secret()
    b = Public()

    def define(self, api):
        api.assert_is_less_or_equal(self.a, 100)
        api.assert_is_equal(self.a, self.b)


class ExpCircuit(Circuit):
    x = Secret()
    e = Secret()
    y = Public()

    def define(self, api):
        out = 1
        bits = api.to_binary(self.e, 4)
        for i in range(3, -1, -1):
            if i != 3:
                out = api.mul(out, out)
            out = api.select(bits[i], api.mul(out, self.x), out)
        api.assert_is_equal(self.y, out)


class AssertEqualCircuit(Circuit):
    """internal/backend/circuits/assertequal.go"""
    x = Secret()
    y = Public()

    def define(self, api):
        api.assert_is_equal(self.x, self.y)


class NoComputationCircuit(Circuit):
    """internal/backend/circuits/nocomputation.go: no computational
    constraints, just an input-to-input assertion."""
    a = Public()
    b = Secret()

    def define(self, api):
        api.assert_is_equal(self.a, self.b)


class DeterminismCircuit(Circuit):
    """internal/backend/circuits/determinism.go"""
    x = Secret(shape=(5,))
    z = Public()

    def define(self, api):
        a = api.add(self.x[0], self.x[0], self.x[1], self.x[1],
                    self.x[2], self.x[2], self.x[3], self.x[3],
                    self.x[4], self.x[4])
        api.assert_is_equal(api.mul(a, a), self.z)


class CmpCorpusCircuit(Circuit):
    """internal/backend/circuits/cmp.go (result pinned to 1 so the
    expectation is field-independent)."""
    a = Secret()
    b = Public()

    def define(self, api):
        api.assert_is_equal(api.cmp(self.a, self.b), 1)


class BooleanCircuit(Circuit):
    """internal/backend/circuits/boolean.go: AssertIsBoolean on a plain
    variable, linear add/sub expressions and a constant multiple."""
    a = Secret()
    b = Secret()
    c = Secret()
    d = Secret()

    def define(self, api):
        api.assert_is_boolean(self.c)
        api.assert_is_boolean(api.add(self.a, self.b))
        api.assert_is_boolean(api.sub(self.a, self.b))
        api.assert_is_boolean(api.mul(self.d, 2))


class OrXorAndMulCircuit(Circuit):
    """internal/backend/circuits/orxorandmul.go: products of logic-op
    outputs (booleans by marking, not by constraint) stay boolean."""
    a = Secret()
    b = Secret()

    def define(self, api):
        p = api.mul(api.xor(self.a, self.b), self.a)
        q = api.mul(api.or_(self.a, self.b), self.a)
        r = api.mul(api.and_(self.a, self.b), self.a)
        api.assert_is_boolean(p)
        api.assert_is_boolean(q)
        api.assert_is_boolean(r)


class RangeCheckCircuit(Circuit):
    """internal/backend/circuits/range.go (variable bound)."""
    x = Secret()
    y = Public()
    bound = Public()

    def define(self, api):
        c1 = api.mul(self.x, self.y)
        c2 = api.mul(c1, self.y)
        c3 = api.add(self.x, self.y)
        api.assert_is_less_or_equal(c2, self.bound)
        api.assert_is_less_or_equal(c3, self.bound)


class ReferenceSmallCircuit(Circuit):
    """internal/backend/circuits/reference_small.go: x <- x^2 five times."""
    x = Secret()
    y = Public()

    def define(self, api):
        v = self.x
        for _ in range(5):
            v = api.mul(v, v)
        api.assert_is_equal(v, self.y)


def _mul_by_7(q, inputs, n_out):
    return [inputs[0] * 7 % q]


def _make_3(q, inputs, n_out):
    return [3]


def _vector_double(q, inputs, n_out):
    return [v * 2 % q for v in inputs]


class HintCorpusCircuit(Circuit):
    """internal/backend/circuits/hint.go: nullary + unary + vector hints,
    each cross-checked against an in-circuit recomputation."""
    a = Secret()
    b = Public()
    v = Secret(shape=(3,))
    w = Public(shape=(3,))

    def define(self, api):
        (a7,) = api.new_hint(_mul_by_7, 1, self.a)
        api.assert_is_equal(a7, api.mul(self.a, 7))
        api.assert_is_equal(a7, self.b)
        (c,) = api.new_hint(_make_3, 1)
        api.assert_is_equal(api.mul(c, c), 9)
        doubled = api.new_hint(_vector_double, 3, *list(self.v))
        for i in range(3):
            api.assert_is_equal(api.mul(2, self.v[i]), self.w[i])
            api.assert_is_equal(doubled[i], self.w[i])


CORPUS = [
    _case(AddCircuit, dict(a=4, b=5, c=12), dict(a=4, b=5, c=13)),
    _case(SubCircuit, dict(a=11, c=6), dict(a=11, c=7)),
    _case(MulCircuit, dict(a=3, b=7, c=42), dict(a=3, b=7, c=41)),
    _case(DivCircuit, dict(a=8, b=2, c=4), dict(a=8, b=2, c=5)),
    _case(InverseCircuit,
          dict(a=2,
               c=10944121435919637611123202872628637544274182200208017171849102093287904247809),
          dict(a=2, c=3)),
    _case(NegCircuit,
          dict(a=1,
               c=21888242871839275222246405745257275088548364400416034343698204186575808495616),
          dict(a=1, c=1)),
    _case(XorCircuit, dict(a=1, b=0, c=1), dict(a=1, b=1, c=1)),
    _case(OrCircuit, dict(a=1, b=0, c=1), dict(a=0, b=0, c=1)),
    _case(AndCircuit, dict(a=1, b=1, c=1), dict(a=1, b=0, c=1)),
    _case(ToBinaryCircuit, dict(a=5, b0=1, b1=0, b2=1),
          dict(a=5, b0=1, b1=1, b2=1)),
    _case(FromBinaryCircuit, dict(b=[1, 0, 1, 1], v=13),
          dict(b=[1, 0, 1, 1], v=12)),
    _case(SelectCircuit, dict(cond=1, a=7, b=9, c=7),
          dict(cond=1, a=7, b=9, c=9)),
    _case(Lookup2Circuit, dict(b0=1, b1=1, c=40), dict(b0=1, b1=0, c=40)),
    _case(IsZeroCircuit, dict(a=0, z=1), dict(a=5, z=1)),
    _case(AssertDifferentCircuit, dict(a=3, b=4), dict(a=4, b=4)),
    _case(AssertBooleanCircuit, dict(a=1, b=2), dict(a=2, b=4)),
    _case(LessOrEqualConstCircuit, dict(a=99, b=99), dict(a=101, b=101)),
    _case(ExpCircuit, dict(x=3, e=5, y=243), dict(x=3, e=5, y=242)),
    _case(AssertEqualCircuit, dict(x=3, y=3), dict(x=5, y=2)),
    _case(NoComputationCircuit, dict(a=42, b=42), dict(a=42, b=43)),
    _case(DeterminismCircuit, dict(x=[1, 2, 3, 4, 5], z=900),
          dict(x=[1, 1, 1, 1, 1], z=900)),
    _case(CmpCorpusCircuit, dict(a=5, b=3), dict(a=3, b=5)),
    _case(BooleanCircuit, dict(a=1, b=0, c=1, d=0),
          dict(a=1, b=1, c=0, d=0)),
    _case(OrXorAndMulCircuit, dict(a=1, b=0), dict(a=2, b=1)),
    _case(RangeCheckCircuit, dict(x=10, y=4, bound=161),
          dict(x=11, y=4, bound=161)),
    _case(ReferenceSmallCircuit, dict(x=2, y=2 ** 32), dict(x=3, y=2 ** 32)),
    _case(HintCorpusCircuit, dict(a=2, b=14, v=[1, 2, 3], w=[2, 4, 6]),
          dict(a=2, b=15, v=[1, 2, 3], w=[2, 4, 6])),
]
