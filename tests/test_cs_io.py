"""Constraint-system serialization round-trip + solve-after-load
(the serialized-CS server pattern, examples/serialization/main.go)."""

from gnark_tpu.backend import cs_io, scs_solver, solver
from gnark_tpu.curves import BN254
from gnark_tpu.examples.mimc import MiMCCircuit
from gnark_tpu.frontend.compile import compile_circuit
from gnark_tpu.std.mimc import mimc_hash


def test_r1cs_roundtrip_and_solve():
    cs = compile_circuit(MiMCCircuit(), BN254)
    data = cs_io.cs_to_bytes(cs)
    assert cs_io.cs_to_bytes(cs_io.cs_from_bytes(data)) == data  # determinism
    cs2 = cs_io.cs_from_bytes(data)
    h = mimc_hash(BN254, 42)
    sol1 = solver.solve(cs, [h, 42])
    sol2 = solver.solve(cs2, [h, 42])
    assert sol1.values == sol2.values


def test_scs_roundtrip_and_solve():
    cs = compile_circuit(MiMCCircuit(), BN254, scheme="plonk")
    data = cs_io.cs_to_bytes(cs)
    cs2 = cs_io.cs_from_bytes(data)
    assert cs_io.cs_to_bytes(cs2) == data
    h = mimc_hash(BN254, 7)
    assert scs_solver.solve(cs, [h, 7]).values == \
        scs_solver.solve(cs2, [h, 7]).values
