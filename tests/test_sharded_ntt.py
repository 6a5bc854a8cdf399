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
