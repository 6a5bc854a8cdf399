"""Four-step sharded NTT vs the single-chip Domain (8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from gnark_tpu.fields import BN254_FR
from gnark_tpu.ops.limbs import field_ops
from gnark_tpu.ops.ntt import Domain, bit_reverse_perm
from gnark_tpu.parallel.sharded_ntt import ShardedDomain

pytestmark = pytest.mark.slow  # compile-heavy device kernels


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()).reshape(-1), ("x",))


def _natural_fft(domain, x):
    brev = jnp.asarray(bit_reverse_perm(domain.n).astype(np.int32))
    return jnp.take(domain.fft(x, "DIF"), brev, axis=1)


def test_sharded_fft_matches_single_chip(mesh):
    n = 64
    spec = BN254_FR
    F = field_ops(spec)
    rng = np.random.default_rng(3)
    coeffs = [int(v) for v in rng.integers(1, 1 << 62, size=n)]
    x = F.pack(coeffs)

    want = np.asarray(_natural_fft(Domain(spec, n), x))

    sd = ShardedDomain(spec, n, mesh, "x")
    got_strided = np.asarray(sd.fft(x))
    got = sd.deinterleave(got_strided)
    assert np.array_equal(got, want)


def test_sharded_ifft_roundtrip(mesh):
    n = 64
    spec = BN254_FR
    F = field_ops(spec)
    rng = np.random.default_rng(4)
    coeffs = [int(v) for v in rng.integers(1, 1 << 62, size=n)]
    x = F.pack(coeffs)

    sd = ShardedDomain(spec, n, mesh, "x")
    evals_nat = sd.deinterleave(np.asarray(sd.fft(x)))
    back_strided = np.asarray(sd.ifft(jnp.asarray(evals_nat)))
    back = sd.deinterleave(back_strided)
    assert np.array_equal(back, np.asarray(x))


def test_fft_from_strided_roundtrip(mesh):
    """ifft (natural -> strided) then fft_from_strided (strided ->
    natural) must be the identity — the two halves of the sharded
    compute_h chain."""
    n = 64
    spec = BN254_FR
    F = field_ops(spec)
    sd = ShardedDomain(spec, n, mesh, "x")
    rng = np.random.default_rng(5)
    vals = [int(v) for v in rng.integers(1, spec.modulus % (1 << 60), n)]
    x = F.to_mont(jnp.asarray(spec.to_limbs(vals, montgomery=False)))
    back = sd.fft_from_strided(sd.ifft(x))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_sharded_compute_h_matches_single_chip(mesh):
    """Full quotient chain h = (A*B - C)/Z_H on the coset (SURVEY §2.8
    P6 integrated into the prover; reference prove.go:275 computeH)."""
    from gnark_tpu.backend.groth16 import _compute_h

    n = 64
    spec = BN254_FR
    F = field_ops(spec)
    q = spec.modulus
    sd = ShardedDomain(spec, n, mesh, "x")
    dom = Domain(spec, n)
    rng = np.random.default_rng(7)

    def vec():
        vals = [int(v) for v in rng.integers(1, q % (1 << 60), n)]
        return F.to_mont(jnp.asarray(spec.to_limbs(vals, montgomery=False)))

    a, b, c = vec(), vec(), vec()
    want = np.asarray(_compute_h(dom, a, b, c))
    h_strided = sd.compute_h(a, b, c)
    got = np.asarray(jnp.take(
        h_strided, jnp.asarray(sd.strided_to_brev_perm()), axis=1))
    np.testing.assert_array_equal(got, want)
