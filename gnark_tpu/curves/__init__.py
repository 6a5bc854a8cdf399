"""Pairing curve registry (CurveSpec) — replaces the reference's 6x
per-curve generated trees with data-parameterized kernels.

Each CurveSpec carries: the scalar/base field specs, G1/G2 generators,
the fp2 non-residue, and pairing parameters.  Device kernels consume the
field specs; host pairing (curves/pairing_bn254.py) consumes the rest.
"""

from __future__ import annotations

import dataclasses
import functools

from gnark_tpu import fields
from gnark_tpu.curves.host import HostCurve, HostFp, HostFp2
from gnark_tpu.fields.spec import FieldSpec


@dataclasses.dataclass(frozen=True)
class CurveSpec:
    name: str
    fr: FieldSpec
    fp: FieldSpec
    g1_gen: tuple          # (x, y) ints
    g2_gen: tuple          # ((x0, x1), (y0, y1)) int pairs
    fp2_beta: int          # u^2 = beta
    fp6_xi: tuple = (0, 1)  # fp6 = fp2[v]/(v^3 - xi); xi = (c0, c1) in fp2
    x_param: int = 0       # BN/BLS curve parameter (for pairing)
    family: str = "bls"    # "bn" or "bls"

    @functools.cached_property
    def host_g1(self) -> HostCurve:
        F = HostFp(self.fp.modulus)
        b = F.sub(F.sqr(self.g1_gen[1]), F.mul(F.sqr(self.g1_gen[0]), self.g1_gen[0]))
        return HostCurve(F, b)

    @functools.cached_property
    def host_g2(self) -> HostCurve:
        F = HostFp2(self.fp.modulus, self.fp2_beta)
        x, y = self.g2_gen
        b2 = F.sub(F.sqr(y), F.mul(F.sqr(x), x))
        return HostCurve(F, b2)

    @property
    def b(self) -> int:
        return self.host_g1.b

    @property
    def b2(self) -> tuple:
        return self.host_g2.b

    def validate(self) -> None:
        assert self.host_g1.is_on_curve(self.g1_gen)
        assert self.host_g2.is_on_curve(self.g2_gen)
        assert self.host_g1.scalar_mul(self.g1_gen, self.fr.modulus) is None
        assert self.host_g2.scalar_mul(self.g2_gen, self.fr.modulus) is None


BN254 = CurveSpec(
    name="bn254",
    fr=fields.BN254_FR,
    fp=fields.BN254_FP,
    g1_gen=(1, 2),
    g2_gen=(
        (10857046999023057135944570762232829481370756359578518086990519993285655852781,
         11559732032986387107991004021392285783925812861821192530917403151452391805634),
        (8495653923123431417604973247489272438418190587263600148770280649306958101930,
         4082367875863433681332203403145435568316851327593401208105741076214120093531),
    ),
    fp2_beta=-1,
    fp6_xi=(9, 1),
    x_param=4965661367192848881,
    family="bn",
)

BLS12_381 = CurveSpec(
    name="bls12_381",
    fr=fields.BLS12_381_FR,
    fp=fields.BLS12_381_FP,
    g1_gen=(
        3685416753713387016781088315183077757961620795782546409894578378688607592378376318836054947676345821548104185464507,
        1339506544944476473020471379941921221584933875938349620426543736416511423956333506472724655353366534992391756441569,
    ),
    g2_gen=(
        (352701069587466618187139116011060144890029952792775240219908644239793785735715026873347600343865175952761926303160,
         3059144344244213709971259814753781636986470325476647558659373206291635324768958432433509563104347017837885763365758),
        (1985150602287291935568054521177171638300868978215655730859378665066344726373823718423869104263333984641494340347905,
         927553665492332455747201965776037880757740193453592970025027978793976877002675564980949289727957565575433344219582),
    ),
    fp2_beta=-1,
    fp6_xi=(1, 1),
    x_param=-15132376222941642752,  # -0xd201000000010000
    family="bls",
)

BLS12_377 = CurveSpec(
    name="bls12_377",
    fr=fields.BLS12_377_FR,
    fp=fields.BLS12_377_FP,
    g1_gen=(
        81937999373150964239938255573465948239988671502647976594219695644855304257327692006745978603320413799295628339695,
        241266749859715473739788878240585681733927191168601896383759122102112907357779751001206799952863815012735208165030,
    ),
    g2_gen=(
        (233578398248691099356572568220835526895379068987715365179118596935057653620464273615301663571204657964920925606294,
         140913150380207355837477652521042157274541796891053068589147167627541651775299824604154852141315666357241556069118),
        (63160294768292073209381361943935198908131692476676907196754037919244929611450776219210369229519898517858833747423,
         149157405641012693445398062341192467754805999074082136895788947234480009303640899064710353187729182149407503257491),
    ),
    fp2_beta=-5,
    fp6_xi=(0, 1),
    x_param=9586122913090633729,
    family="bls",
)

ALL_CURVES = {c.name: c for c in (BN254, BLS12_381, BLS12_377)}


@dataclasses.dataclass(frozen=True)
class OuterCurveSpec:
    """Frontend-only curve descriptor for 2-chain outer curves: circuits
    over its scalar field can express the inner curve's base-field math
    natively (recursion, std/groth16_bls12377).  Full proving backends
    for BW6 curves (761-bit fp, embedding degree 6 pairing) are a
    separate work item."""
    name: str
    fr: FieldSpec


# BW6-761's scalar field IS BLS12-377's base field (the 2-chain property)
BW6_761 = OuterCurveSpec(name="bw6_761", fr=fields.BLS12_377_FP)
