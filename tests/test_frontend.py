"""Frontend corpus: compile + engine + solver agreement.

Mirrors the reference's micro-circuit corpus (internal/backend/circuits/)
and the engine-vs-solver differential discipline (test/assert.go:135).
"""

import pytest

from gnark_tpu import curves
from gnark_tpu.backend import solver
from gnark_tpu.backend.witness import Witness
from gnark_tpu.frontend import Circuit, CompileError, Public, Secret, compile_circuit
from gnark_tpu.test_engine import EngineError, is_solved as engine_solved

BN254 = curves.BN254
Q = BN254.fr.modulus


def check(circuit_cls, good: dict, bad: dict | None = None, **compile_kw):
    """Valid assignment must pass engine + solver; invalid must fail both."""
    cs = compile_circuit(circuit_cls(), BN254, **compile_kw)

    def run(vals, expect_ok):
        a = circuit_cls()
        for k, v in vals.items():
            setattr(a, k, v)
        w = Witness.from_assignment(a, BN254)
        ok_solver = solver.is_solved(cs, w.values)
        a2 = circuit_cls()
        for k, v in vals.items():
            setattr(a2, k, v)
        try:
            engine_solved(a2, a2, BN254)
            ok_engine = True
        except EngineError:
            ok_engine = False
        assert ok_solver == expect_ok, f"solver: {vals} -> {ok_solver}"
        assert ok_engine == expect_ok, f"engine: {vals} -> {ok_engine}"

    run(good, True)
    if bad is not None:
        run(bad, False)
    return cs


class Cubic(Circuit):
    x = Secret()
    y = Public()

    def define(self, api):
        x3 = api.mul(self.x, self.x, self.x)
        api.assert_is_equal(api.add(x3, self.x, 5), self.y)


def test_cubic():
    cs = check(Cubic, {"x": 3, "y": 35}, {"x": 3, "y": 36})
    assert cs.nb_public == 2  # one + y
    assert cs.nb_secret == 1
    assert cs.nb_constraints == 3  # x*x, x2*x, assert


class AddMulDiv(Circuit):
    a = Secret()
    b = Secret()
    c = Public()

    def define(self, api):
        s = api.add(self.a, self.b, 7)
        d = api.div(s, self.b)
        m = api.mul(d, api.sub(self.a, 2))
        api.assert_is_equal(m, self.c)


def test_add_mul_div():
    a, b = 10, 4
    c = (a + b + 7) * pow(b, -1, Q) % Q * (a - 2) % Q
    check(AddMulDiv, {"a": a, "b": b, "c": c}, {"a": a, "b": b, "c": c + 1})


class Inv(Circuit):
    x = Secret()
    y = Public()

    def define(self, api):
        api.assert_is_equal(api.inverse(self.x), self.y)


def test_inverse():
    check(Inv, {"x": 5, "y": pow(5, -1, Q)}, {"x": 0, "y": 0})


class IsZeroC(Circuit):
    x = Secret()
    z = Public()

    def define(self, api):
        api.assert_is_equal(api.is_zero(self.x), self.z)


def test_is_zero():
    check(IsZeroC, {"x": 0, "z": 1})
    check(IsZeroC, {"x": 17, "z": 0}, {"x": 17, "z": 1})


class Bits(Circuit):
    x = Secret()
    b0 = Public()
    b1 = Public()
    b2 = Public()

    def define(self, api):
        bits = api.to_binary(self.x, 3)
        api.assert_is_equal(bits[0], self.b0)
        api.assert_is_equal(bits[1], self.b1)
        api.assert_is_equal(bits[2], self.b2)
        api.assert_is_equal(api.from_binary(bits), self.x)


def test_to_from_binary():
    check(Bits, {"x": 5, "b0": 1, "b1": 0, "b2": 1},
          {"x": 9, "b0": 1, "b1": 0, "b2": 0})  # 9 needs 4 bits


class Logic(Circuit):
    a = Secret()
    b = Secret()
    x = Public()
    o = Public()
    n = Public()

    def define(self, api):
        api.assert_is_equal(api.xor(self.a, self.b), self.x)
        api.assert_is_equal(api.or_(self.a, self.b), self.o)
        api.assert_is_equal(api.and_(self.a, self.b), self.n)


def test_logic():
    check(Logic, {"a": 1, "b": 0, "x": 1, "o": 1, "n": 0},
          {"a": 2, "b": 0, "x": 0, "o": 0, "n": 0})  # non-boolean input


class Sel(Circuit):
    c = Secret()
    a = Secret()
    b = Secret()
    out = Public()

    def define(self, api):
        api.assert_is_equal(api.select(self.c, self.a, self.b), self.out)


def test_select():
    check(Sel, {"c": 1, "a": 11, "b": 22, "out": 11},
          {"c": 0, "a": 11, "b": 22, "out": 11})


class Lk2(Circuit):
    b0 = Secret()
    b1 = Secret()
    out = Public()

    def define(self, api):
        api.assert_is_equal(api.lookup2(self.b0, self.b1, 10, 11, 12, 13), self.out)


def test_lookup2():
    for b0, b1, want in [(0, 0, 10), (1, 0, 11), (0, 1, 12), (1, 1, 13)]:
        check(Lk2, {"b0": b0, "b1": b1, "out": want})
    check(Lk2, {"b0": 1, "b1": 1, "out": 13}, {"b0": 1, "b1": 1, "out": 12})


class Range(Circuit):
    x = Secret()
    bound = Public()

    def define(self, api):
        api.assert_is_less_or_equal(self.x, self.bound)
        api.assert_is_less_or_equal(self.x, 100)


def test_range():
    check(Range, {"x": 44, "bound": 50}, {"x": 55, "bound": 50})
    check(Range, {"x": 100, "bound": 200}, {"x": 101, "bound": 200})


class CmpC(Circuit):
    a = Secret()
    b = Secret()
    r = Public()

    def define(self, api):
        api.assert_is_equal(api.cmp(self.a, self.b), self.r)


@pytest.mark.slow
def test_cmp():
    check(CmpC, {"a": 5, "b": 3, "r": 1})
    check(CmpC, {"a": 3, "b": 5, "r": Q - 1}, {"a": 3, "b": 3, "r": 1})
    check(CmpC, {"a": 7, "b": 7, "r": 0}, {"a": Q - 1, "b": 1, "r": Q - 1})


@pytest.mark.slow
def test_cmp_scs():
    from gnark_tpu.backend import scs_solver
    cs = compile_circuit(CmpC(), BN254, scheme="plonk")
    for a, b, r in ((5, 3, 1), (3, 5, Q - 1), (3, 3, 0), (Q - 1, 1, 1)):
        c = CmpC()
        c.a, c.b, c.r = a, b, r
        w = Witness.from_assignment(c, BN254)
        assert scs_solver.is_solved(cs, w.values), (a, b, r)
    c = CmpC()
    c.a, c.b, c.r = 3, 3, 1
    w = Witness.from_assignment(c, BN254)
    assert not scs_solver.is_solved(cs, w.values)


class HintC(Circuit):
    x = Secret()
    y = Public()

    def define(self, api):
        def halve(q, inputs, n_out):
            return [inputs[0] * pow(2, -1, q) % q]

        (h,) = api.new_hint(halve, 1, self.x)
        api.assert_is_equal(api.add(h, h), self.x)
        api.assert_is_equal(h, self.y)


def test_custom_hint():
    check(HintC, {"x": 10, "y": 5}, {"x": 10, "y": 6})


class Shaped(Circuit):
    xs = Secret(shape=3)
    total = Public()

    def define(self, api):
        api.assert_is_equal(api.add(self.xs[0], self.xs[1], self.xs[2]), self.total)


def test_shaped_signals():
    check(Shaped, {"xs": [1, 2, 3], "total": 6}, {"xs": [1, 2, 3], "total": 7})


class Unconstrained(Circuit):
    x = Secret()
    y = Secret()
    o = Public()

    def define(self, api):
        api.assert_is_equal(self.x, self.o)  # y never used


def test_unconstrained_detection():
    with pytest.raises(CompileError, match="unconstrained"):
        compile_circuit(Unconstrained(), BN254)
    from gnark_tpu.frontend import CompileConfig
    cs = compile_circuit(Unconstrained(), BN254,
                         config=CompileConfig(ignore_unconstrained_inputs=True))
    assert cs.nb_constraints == 1


def test_levels_schedule():
    cs = compile_circuit(Cubic(), BN254)
    # x*x (level 0) -> x2*x (level 1) -> assertion (level 2 or merged)
    assert sum(len(l) for l in cs.levels) == cs.nb_constraints
    flat = [ci for lvl in cs.levels for ci in lvl]
    assert sorted(flat) == list(range(cs.nb_constraints))
    assert cs.levels[0] == [0]


def test_witness_serialization():
    a = Cubic()
    a.x, a.y = 3, 35
    w = Witness.from_assignment(a, BN254)
    data = w.to_bytes()
    assert len(data) == 4 + 2 * 32
    w2 = Witness.from_bytes(data, Q, nb_public=1)
    assert w2.values == w.values
    pub = w.public()
    assert pub.values == [35]


def test_compile_determinism():
    """Compiling twice must give identical systems (assert.go:433 check)."""
    cs1 = compile_circuit(Cubic(), BN254)
    cs2 = compile_circuit(Cubic(), BN254)
    assert cs1.coeffs == cs2.coeffs
    assert (cs1.L.wires == cs2.L.wires).all()
    assert (cs1.R.coeffs == cs2.R.coeffs).all()
    assert cs1.levels == cs2.levels


class LogicConst(Circuit):
    """xor/or with one constant operand must fold affinely on both schemes
    (gnark api.Xor/Or accept constants; ADVICE r1: SCS previously emitted
    a gate on the constant-sentinel wire and crashed compile)."""
    a = Secret()
    x1 = Public()   # a ^ 1
    x0 = Public()   # a ^ 0
    o1 = Public()   # a | 1
    o0 = Public()   # a | 0

    def define(self, api):
        api.assert_is_equal(api.xor(self.a, 1), self.x1)
        api.assert_is_equal(api.xor(0, self.a), self.x0)
        api.assert_is_equal(api.or_(self.a, 1), self.o1)
        api.assert_is_equal(api.or_(0, self.a), self.o0)


def test_logic_constant_operand_r1cs():
    check(LogicConst, {"a": 1, "x1": 0, "x0": 1, "o1": 1, "o0": 1},
          {"a": 1, "x1": 1, "x0": 1, "o1": 1, "o0": 1})


def test_logic_constant_operand_scs():
    from gnark_tpu.backend import scs_solver
    cs = compile_circuit(LogicConst(), BN254, scheme="plonk")
    a = LogicConst()
    a.a, a.x1, a.x0, a.o1, a.o0 = 0, 1, 0, 1, 0
    w = Witness.from_assignment(a, BN254)
    assert scs_solver.is_solved(cs, w.values)
    a.x1 = 0
    w = Witness.from_assignment(a, BN254)
    assert not scs_solver.is_solved(cs, w.values)
