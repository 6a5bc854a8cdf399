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
    g2_gen: tuple          # ((x0, x1), (y0, y1)) int pairs, or (x, y) ints
                           # for curves whose G2 lives over fp (BW6 family)
    fp2_beta: int          # u^2 = beta (unused when g2_over_fp)
    fp6_xi: tuple = (0, 1)  # fp6 = fp2[v]/(v^3 - xi); xi = (c0, c1) in fp2
    x_param: int = 0       # BN/BLS curve parameter (for pairing)
    family: str = "bls"    # "bn", "bls" or "bw6"
    g2_over_fp: bool = False  # BW6: sextic twist defined over fp itself
    sextic_xi: int = 0     # BW6: fp6 = fp[w]/(w^6 - xi), twist b2 = b*xi

    @functools.cached_property
    def host_g1(self) -> HostCurve:
        F = HostFp(self.fp.modulus)
        b = F.sub(F.sqr(self.g1_gen[1]), F.mul(F.sqr(self.g1_gen[0]), self.g1_gen[0]))
        return HostCurve(F, b)

    @functools.cached_property
    def host_g2(self) -> HostCurve:
        if self.g2_over_fp:
            F = HostFp(self.fp.modulus)
        else:
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

# BW6-761 (EHG19 "one layer proof composition" curve): fr IS BLS12-377's
# base field (the 2-chain property), fp is 761-bit; embedding degree 6,
# so G2 is a sextic twist defined over fp itself: E: y^2 = x^3 - 1,
# E': y^2 = x^3 + 4 = b*xi with xi = -4 (M-twist).  All parameters below
# were DERIVED in-repo from the BLS12-377 seed x = 0x8508c00000000001 via
# the EHG19 polynomials and verified (p prime, CM equation t^2-4p=-3y^2
# at ht=13, r | #E, r | #E'); generators are the smallest-x r-torsion
# points after cofactor clearing (self-derived — gnark-crypto G2
# generator choice may differ; serialization interop is G1/proof-level).
BW6_761 = CurveSpec(
    name="bw6_761",
    fr=fields.BLS12_377_FP,
    fp=fields.BW6_761_FP,
    g1_gen=(
        5121082781502305659180673370797932802982723165543122975335209418297923345190975559367024470794567213188867624617939698818627134048004915564891369096213721202693630090148097888923493708182442885908076346607300083583163982163789167,
        3936891438836912583780051937508657570812555345221986954460153541952284123191322673907692687918062549220672207508016306900511821136915723707181225276750353973961376292016478674329987421847947883311993206004548631860683957877121757,
    ),
    g2_gen=(
        4299495046121976197967899669570453663523609133273326781652351086315825538613647196868186765217397067654540962955975840176693419657193486845273767814170238104346390446211356851381676719718477415944688400098442139983341339355564981,
        1501381476693777451227230978217091430842826962602338045255398371507653537308020955271876978181145096359995695412993165489860312554088896023045541532421545031682170897196224462174980340752795733839523441093477612926958591841733782,
    ),
    fp2_beta=0,
    x_param=9586122913090633729,
    family="bw6",
    g2_over_fp=True,
    sextic_xi=-4,
)

ALL_CURVES = {c.name: c for c in (BN254, BLS12_381, BLS12_377, BW6_761)}
