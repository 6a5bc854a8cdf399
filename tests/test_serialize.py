"""Serialization: round-trips + cross-implementation bellman vectors.

The base64 vectors are the public test data from the reference's
backend/groth16/bellman_test.go:18 (originally from
github.com/esuwu/groth16-verifier-bls12381): BLS12-381 VKs, proofs and
public inputs that gnark's deserializer+verifier accepts/rejects.
Passing them proves byte-level interop of our point codecs, witness
format, and Groth16 verifier.
"""

import base64
import struct

import pytest

from gnark_tpu.backend import serialize
from gnark_tpu.curves import BLS12_381, BN254

VK1 = "hwk883gUlTKCyXYA6XWZa8H9/xKIYZaJ0xEs0M5hQOMxiGpxocuX/8maSDmeCk3bhwk883gUlTKCyXYA6XWZa8H9/xKIYZaJ0xEs0M5hQOMxiGpxocuX/8maSDmeCk3bo5ViaDBdO7ZBxAhLSe5k/5TFQyF5Lv7KN2tLKnwgoWMqB16OL8WdbePIwTCuPtJNAFKoTZylLDbSf02kckMcZQDPF9iGh+JC99Pio74vDpwTEjUx5tQ99gNQwxULtztsqDRsPnEvKvLmsxHt8LQVBkEBm2PBJFY+OXf1MNW021viDBpR10mX4WQ6zrsGL5L0GY4cwf4tlbh+Obit+LnN/SQTnREf8fPpdKZ1sa/ui3pGi8lMT6io4D7Ujlwx2RdChwk883gUlTKCyXYA6XWZa8H9/xKIYZaJ0xEs0M5hQOMxiGpxocuX/8maSDmeCk3bkBF+isfMf77HCEGsZANw0hSrO2FGg14Sl26xLAIohdaW8O7gEaag8JdVAZ3OVLd5Df1NkZBEr753Xb8WwaXsJjE7qxwINL1KdqA4+EiYW4edb7+a9bbBeOPtb67ZxmFqAAAAAoMkzUv+KG8WoXszZI5NNMrbMLBDYP/xHunVgSWcix/kBrGlNozv1uFr0cmYZiij3YqToYs+EZa3dl2ILHx7H1n+b+Bjky/td2QduHVtf5t/Z9sKCfr+vOn12zVvOVz/6w=="
PROOF1 = "lvQLU/KqgFhsLkt/5C/scqs7nWR+eYtyPdWiLVBux9GblT4AhHYMdCgwQfSJcudvsgV6fXoK+DUSRgJ++Nqt+Wvb7GlYlHpxCysQhz26TTu8Nyo7zpmVPH92+UYmbvbQCSvX2BhWtvkfHmqDVjmSIQ4RUMfeveA1KZbSf999NE4qKK8Do+8oXcmTM4LZVmh1rlyqznIdFXPN7x3pD4E0gb6/y69xtWMChv9654FMg05bAdueKt9uA4BEcAbpkdHF"
IN_OK = "LcMT3OOlkHLzJBKCKjjzzVMg+r+FVgd52LlhZPB4RFg="
IN_BAD = "cmzVCcRVnckw3QUPhmG4Bkppeg4K50oDQwQ9EH+Fq1s="

VK4 = "kYYCAS8vM2T99GeCr4toQ+iQzvl5fI89mPrncYqx3C1d75BQbFk8LMtcnLWwntd6kYYCAS8vM2T99GeCr4toQ+iQzvl5fI89mPrncYqx3C1d75BQbFk8LMtcnLWwntd6knkzSwcsialcheg69eZYPK8EzKRVI5FrRHKi8rgB+R5jyPV70ejmYEx1neTmfYKODRmARr/ld6pZTzBWYDfrCkiS1QB+3q3M08OQgYcLzs/vjW4epetDCmk0K1CEGcWdh7yLzdqr7HHQNOpZI8mdj/7lR0IBqB9zvRfyTr+guUG22kZo4y2KINDp272xGglKEeTglTxyDUriZJNF/+T6F8w70MR/rV+flvuo6EJ0+HA+A2ZnBbTjOIl9wjisBV+0kYYCAS8vM2T99GeCr4toQ+iQzvl5fI89mPrncYqx3C1d75BQbFk8LMtcnLWwntd6jgld4oAppAOzvQ7eoIx2tbuuKVSdbJm65KDxl/T+boaYnjRm3omdETYnYRk3HAhrAeWpefX+dM/k7PrcheInnxHUyjzSzqlN03xYjg28kdda9FZJaVsQKqdEJ/St9ivXAAAAAZae/nTwyDn5u+4WkhZ76991cGB/ymyGpXziT0bwS86pRw/AcbpzXmzK+hq+kvrvpw=="
PROOF4 = "sStVLdyxqInmv76iaNnRFB464lGq48iVeqYWSi2linE9DST0fTNhxSnvSXAoPpt8tFsanj5vPafC+ij/Fh98dOUlMbO42bf280pOZ4lm+zr63AWUpOOIugST+S6pq9zeB0OHp2NY8XFmriOEKhxeabhuV89ljqCDjlhXBeNZwM5zti4zg89Hd8TbKcw46jAsjIJe2Siw3Th7ELQQKR5ucX50f0GISmnOSceePPdvjbGJ8fSFOnSmSp8dK7uyehrU"


def _inputs(b64: str):
    data = base64.b64decode(b64)
    n = len(data) // 32
    return [int.from_bytes(data[i * 32:(i + 1) * 32], "big")
            for i in range(n)]


def _verify(vk_b64, proof_b64, inputs_b64):
    from gnark_tpu.backend import groth16
    vk = serialize.vk_from_bytes(base64.b64decode(vk_b64), BLS12_381)
    proof = serialize.proof_from_bytes(base64.b64decode(proof_b64), BLS12_381)
    return groth16.verify(proof, vk, _inputs(inputs_b64))


def test_bellman_vector_accepts():
    assert _verify(VK1, PROOF1, IN_OK)


def test_bellman_vector_rejects_wrong_input():
    assert not _verify(VK1, PROOF1, IN_BAD)


def test_bellman_vector_no_inputs():
    assert _verify(VK4, PROOF4, "")


def test_point_roundtrip_bn254():
    c = serialize.PointCodec(BN254)
    P = BN254.host_g1.scalar_mul(BN254.g1_gen, 123456789)
    assert c.g1_from_bytes(c.g1_to_bytes(P)) == P
    Q = BN254.host_g2.scalar_mul(BN254.g2_gen, 987654321)
    assert c.g2_from_bytes(c.g2_to_bytes(Q)) == Q
    assert c.g1_from_bytes(c.g1_to_bytes(None)) is None
    assert c.g2_from_bytes(c.g2_to_bytes(None)) is None


def test_point_roundtrip_bls12_381():
    c = serialize.PointCodec(BLS12_381)
    P = BLS12_381.host_g1.scalar_mul(BLS12_381.g1_gen, 123456789)
    assert c.g1_from_bytes(c.g1_to_bytes(P)) == P
    Q = BLS12_381.host_g2.scalar_mul(BLS12_381.g2_gen, 987654321)
    assert c.g2_from_bytes(c.g2_to_bytes(Q)) == Q


def test_witness_binary_roundtrip():
    from gnark_tpu.backend.witness import Witness
    w = Witness(values=[5, 7, 11], nb_public=1,
                field_modulus=BN254.fr.modulus)
    data = w.to_bytes()
    assert struct.unpack_from(">I", data)[0] == 3
    w2 = Witness.from_bytes(data, BN254.fr.modulus, 1)
    assert w2.values == [5, 7, 11]


def test_point_roundtrip_wide_g2_families():
    """fp-G2 (BW6 family) and fp4-G2 (BLS24) codec branches: point
    round-trips, infinity encodings, and subgroup rejection."""
    from gnark_tpu.curves import BLS24_315, BW6_633, BW6_761

    for cv in (BW6_761, BW6_633, BLS24_315):
        c = serialize.PointCodec(cv)
        P = cv.host_g1.scalar_mul(cv.g1_gen, 123456789)
        assert c.g1_from_bytes(c.g1_to_bytes(P)) == P
        Q = cv.host_g2.scalar_mul(cv.g2_gen, 987654321)
        data = c.g2_to_bytes(Q)
        assert len(data) == c.g2_compressed_size()
        assert c.g2_from_bytes(data) == Q
        assert c.g2_from_bytes(c.g2_to_bytes(None)) is None
        # a tampered x must be rejected (off-twist or out of subgroup)
        bad = bytearray(data)
        bad[-1] ^= 1
        with pytest.raises(ValueError):
            c.g2_from_bytes(bytes(bad))


def test_proof_vk_roundtrip_bls24():
    """Full proof + VK byte round-trip on a curve with fp4 G2."""
    import random
    from gnark_tpu.backend import groth16
    from gnark_tpu.curves import BLS24_315
    from gnark_tpu.frontend.compile import compile_circuit
    from gnark_tpu.frontend.schema import Circuit, Public, Secret

    class Cubic(Circuit):
        x = Secret()
        y = Public()

        def define(self, api):
            api.assert_is_equal(
                self.y, api.add(api.mul(self.x, self.x, self.x), self.x, 5))

    cs = compile_circuit(Cubic(), BLS24_315)
    pk, vk = groth16.setup(cs, BLS24_315, rng=random.Random(3), host=True)
    proof = groth16.prove(cs, pk, [35, 3], rng=random.Random(4))

    proof2 = serialize.proof_from_bytes(
        serialize.proof_to_bytes(proof, BLS24_315), BLS24_315)
    vk2 = serialize.vk_from_bytes(serialize.vk_to_bytes(vk), BLS24_315)
    assert groth16.verify(proof2, vk2, [35])
    assert not groth16.verify(proof2, vk2, [36])
