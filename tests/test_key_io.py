"""Key serialization: setup -> save -> load -> prove -> verify.

Reference: groth16/marshal.go:188 pk.WriteTo + :250 UnsafeReadFrom,
plonk/marshal.go:28-234 — capability parity (own byte layout, see
backend/key_io.py docstring).
"""

import io
import random

import pytest

from gnark_tpu.backend import groth16, key_io, plonk
from gnark_tpu.curves import BN254
from gnark_tpu.examples.cubic import CubicCircuit
from gnark_tpu.frontend.compile import compile_circuit


def test_plonk_vk_roundtrip():
    cs = compile_circuit(CubicCircuit(), BN254, scheme="plonk")
    pk, vk = plonk.setup(cs, BN254, rng=random.Random(3), host=True)
    blob = key_io.plonk_vk_to_bytes(vk)
    vk2 = key_io.plonk_vk_from_bytes(blob)
    assert vk2.n == vk.n and vk2.ell == vk.ell
    assert vk2.k1 == vk.k1 and vk2.k2 == vk.k2
    assert vk2.generator == vk.generator
    for nm in ("c_ql", "c_qr", "c_qm", "c_qo", "c_qc",
               "c_s1", "c_s2", "c_s3", "g1_gen", "g2_gen", "g2_tau"):
        assert getattr(vk2, nm) == getattr(vk, nm), nm
    # a proof made before serialization verifies under the reloaded VK
    proof = plonk.prove(cs, pk, [35, 3], rng=random.Random(1))
    assert plonk.verify(proof, vk2, [35])


def test_host_pk_rejects_serialization():
    cs = compile_circuit(CubicCircuit(), BN254)
    pk, _ = groth16.setup(cs, BN254, rng=random.Random(3), host=True)
    with pytest.raises(ValueError):
        key_io.groth16_pk_write(pk, io.BytesIO())


@pytest.mark.slow
def test_groth16_pk_roundtrip_device():
    cs = compile_circuit(CubicCircuit(), BN254)
    pk, vk = groth16.setup(cs, BN254, rng=random.Random(3))
    buf = io.BytesIO()
    key_io.groth16_pk_write(pk, buf)
    buf.seek(0)
    pk2 = key_io.groth16_pk_read(buf, safe=True)
    assert pk2.domain_n == pk.domain_n and pk2.n_pad == pk.n_pad
    assert pk2.alpha_g1 == pk.alpha_g1 and pk2.delta_g2 == pk.delta_g2
    proof = groth16.prove(cs, pk2, [35, 3], rng=random.Random(1))
    assert groth16.verify(proof, vk, [35])


@pytest.mark.slow
def test_plonk_pk_roundtrip_device():
    cs = compile_circuit(CubicCircuit(), BN254, scheme="plonk")
    pk, vk = plonk.setup(cs, BN254, rng=random.Random(3))
    buf = io.BytesIO()
    key_io.plonk_pk_write(pk, buf)
    buf.seek(0)
    pk2 = key_io.plonk_pk_read(buf)
    assert pk2.n == pk.n and pk2.ql_c == pk.ql_c
    assert pk2.sigma_vals == pk.sigma_vals
    proof = plonk.prove(cs, pk2, [35, 3], rng=random.Random(2))
    assert plonk.verify(proof, vk, [35])
