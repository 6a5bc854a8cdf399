"""Fuzz harness over corpus circuits (Assert.Fuzz analog)."""

import pytest

from circuits_corpus import (
    AddCircuit, AndCircuit, IsZeroCircuit, MulCircuit, SelectCircuit,
    ToBinaryCircuit, XorCircuit,
)
from gnark_tpu.curves import BN254
from gnark_tpu.fuzz import fuzz


@pytest.mark.parametrize("cls", [
    AddCircuit, MulCircuit, XorCircuit, AndCircuit, SelectCircuit,
    IsZeroCircuit, ToBinaryCircuit,
], ids=lambda c: c.__name__)
def test_fuzz_engine_solver_agree(cls):
    fuzz(cls, BN254, iterations=24, seed=1, schemes=("groth16", "plonk"))
