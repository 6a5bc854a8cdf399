"""Integration corpus run: every micro-circuit, both schemes, engine +
solver differential (integration_test.go:29 analog)."""

import pytest

from circuits_corpus import CORPUS
from gnark_tpu import test_harness
from gnark_tpu.curves import BN254


@pytest.mark.parametrize(
    "cls,good,bad", CORPUS, ids=[c[0].__name__ for c in CORPUS])
def test_corpus(cls, good, bad):
    test_harness.prover_succeeded(cls, good, curves=[BN254])
    test_harness.prover_failed(cls, bad, curves=[BN254])
