"""PLONK + KZG end-to-end walkthrough (examples/plonk/main.go analog):
compile a circuit to PLONK gates, build an SRS, prove, verify."""

import random

from gnark_tpu.backend import kzg, plonk
from gnark_tpu.curves import BN254
from gnark_tpu.examples.cubic import CubicCircuit
from gnark_tpu.frontend.compile import compile_circuit


def main():
    cs = compile_circuit(CubicCircuit(), BN254, scheme="plonk")
    srs = kzg.new_srs(BN254, 64, tau=42, host=True)  # test SRS
    pk, vk = plonk.setup(cs, BN254, srs=srs, host=True)
    proof = plonk.prove(cs, pk, [35, 3], rng=random.Random(1))
    assert plonk.verify(proof, vk, [35])
    assert not plonk.verify(proof, vk, [36])
    print("plonk: proof verified (x=3, y=35), wrong input rejected")


if __name__ == "__main__":
    main()
