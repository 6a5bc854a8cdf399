"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(conftest sets --xla_force_host_platform_device_count=8).

The reference has no multi-node tests (SURVEY §4); these validate the
TPU build's mesh path: sharded MSM result == single-chip MSM == host MSM.
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from gnark_tpu.backend.groth16 import ints_to_limbs
from gnark_tpu.curves import BN254
from gnark_tpu.ops.ec import CurveOps
from gnark_tpu.ops.limbs import field_ops
from gnark_tpu.ops.msm import msm
from gnark_tpu.parallel.sharded_msm import sharded_msm

pytestmark = pytest.mark.slow  # compile-heavy device kernels


@pytest.fixture(scope="module")
def setup_points():
    rng = np.random.default_rng(0)
    curve = BN254
    n = 64
    host = curve.host_g1
    scalars = [int(rng.integers(1, 1 << 62)) * int(rng.integers(1, 1 << 62))
               for _ in range(n)]
    points = [host.scalar_mul(curve.g1_gen, 3 + 2 * i) for i in range(n)]
    expected = host.msm(points, scalars)

    fp = field_ops(curve.fp)
    xs = fp.pack([p[0] for p in points])
    ys = fp.pack([p[1] for p in points])
    inf = jax.numpy.zeros((n,), bool)
    sc = jax.numpy.asarray(ints_to_limbs(scalars, curve.fr.L))
    return curve, fp, xs, ys, inf, sc, expected


def _to_host_affine(curve, fp, P):
    G = CurveOps(fp)
    x, y, inf = G.to_affine(P)
    if bool(np.asarray(inf)[0]):
        return None
    return (fp.unpack(x)[0], fp.unpack(y)[0])


def test_sharded_msm_matches_host(setup_points):
    curve, fp, xs, ys, inf, sc, expected = setup_points
    G = CurveOps(fp)
    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("shard",))
    ndev = mesh.shape["shard"]
    assert ndev == 8
    # auto -> per-shard ladder (the windowed plan's CPU compile takes
    # >10 min on this 1-CPU host; windowed coverage lives in test_msm)
    result = sharded_msm(G, mesh, "shard", xs, ys, inf, sc)
    assert _to_host_affine(curve, fp, result) == expected


def test_sharded_matches_single_chip(setup_points):
    curve, fp, xs, ys, inf, sc, expected = setup_points
    G = CurveOps(fp)
    single = msm(G, xs, ys, inf, sc)
    assert _to_host_affine(curve, fp, single) == expected


@pytest.mark.slow
def test_mesh_prove_matches_single_chip():
    """groth16.prove(mesh=...) — sharded 4-step NTT quotient + sharded
    MSMs — must produce byte-identical proofs to the single-chip path
    (same rng).  Goldilocks-field dryrun curve, 8-device CPU mesh."""
    import random

    import importlib.util
    spec_ = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    graft = importlib.util.module_from_spec(spec_)
    spec_.loader.exec_module(graft)

    from gnark_tpu.backend import groth16
    from gnark_tpu.frontend.compile import compile_circuit
    from gnark_tpu.frontend.schema import Circuit, Public, Secret

    curve = graft._dryrun_curve()
    q = curve.fr.modulus
    DEPTH = 63

    class Chain(Circuit):
        x = Secret()
        out = Public()

        def define(self, api):
            v = self.x
            for _ in range(DEPTH):
                v = api.mul(v, v)
            api.assert_is_equal(v, self.out)

    cs = compile_circuit(Chain(), curve)
    pk = groth16.dummy_setup(cs, curve)
    witness = [pow(3, pow(2, DEPTH, q - 1), q), 3]

    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("shard",))
    p1 = groth16.prove(cs, pk, witness, rng=random.Random(5), check=True)
    p2 = groth16.prove(cs, pk, witness, rng=random.Random(5), check=True,
                       mesh=mesh, mesh_axis="shard")
    assert p1.ar == p2.ar and p1.bs == p2.bs and p1.krs == p2.krs


@pytest.mark.slow
def test_mesh_prove_bn254_verifies():
    """REAL BN254 key at real limb width over the 8-device mesh: host
    (python-int) setup packed to device arrays, mesh-sharded NTT + MSMs
    — and the proof VERIFIES (round-4 upgrade of the Goldilocks
    dummy-key run: correctness by verification, not just execution)."""
    import random

    from gnark_tpu.backend import groth16
    from gnark_tpu.frontend.compile import compile_circuit
    from gnark_tpu.frontend.schema import Circuit, Public, Secret

    q = BN254.fr.modulus
    DEPTH = 62  # domain 64 = devices^2, 64 wires

    class Chain(Circuit):
        x = Secret()
        out = Public()

        def define(self, api):
            v = self.x
            for _ in range(DEPTH):
                v = api.mul(v, v)
            api.assert_is_equal(v, self.out)

    cs = compile_circuit(Chain(), BN254)
    pk, vk = groth16.setup(cs, BN254, rng=random.Random(3), host=True)
    pk = groth16.pk_to_device(pk)
    y = pow(3, pow(2, DEPTH, q - 1), q)
    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("shard",))
    proof = groth16.prove(cs, pk, [y, 3], rng=random.Random(4),
                          check=True, mesh=mesh, mesh_axis="shard")
    assert groth16.verify(proof, vk, [y])
    assert not groth16.verify(proof, vk, [(y + 1) % q])
