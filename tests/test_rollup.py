"""Rollup example: operator state machine + circuit (engine + solver
differential; examples/rollup/rollup_test.go analog)."""

import pytest

from gnark_tpu import test_harness
from gnark_tpu.curves import BN254
from gnark_tpu.examples.rollup import DEPTH, Operator, RollupCircuit
from gnark_tpu.std import eddsa


@pytest.fixture(scope="module")
def operator():
    keys = [eddsa.KeyPair.generate(BN254, bytes([i]) * 8)
            for i in range(1 << DEPTH)]
    return Operator(BN254, keys)


def test_single_transfer(operator):
    w = operator.transfer(0, 1, 100)
    assert operator.accounts[0].balance == 900
    assert operator.accounts[1].balance == 1100
    test_harness.prover_succeeded(RollupCircuit, w, schemes=["groth16"])


def test_tampered_amount_fails(operator):
    w = operator.transfer(2, 3, 50)
    w.amount = 51  # signature and balances no longer match
    test_harness.prover_failed(RollupCircuit, w, schemes=["groth16"])


def test_overdraft_rejected(operator):
    with pytest.raises(AssertionError):
        operator.transfer(4, 5, 10 ** 6)
