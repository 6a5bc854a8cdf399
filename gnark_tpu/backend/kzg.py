"""KZG polynomial commitments over the device MSM.

Reference surface (SURVEY §2.9): kzg.{NewSRS, Commit, Open,
BatchOpenSinglePoint, FoldProof, BatchVerifyMultiPoints} called from the
PLONK backend (internal/backend/bn254/plonk/prove.go:155-433,
verify.go:209-242) and test SRS caching (test/kzg_srs.go:35-87).

Commit = MSM over the SRS G1 powers (device kernel); quotient-poly
synthetic division is host-side ints (O(n) mulmods — cheap vs the MSM);
pairing checks are host-side.
"""

from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

from gnark_tpu.curves.pairing import pairing_for
from gnark_tpu.ops.msm import msm


@dataclasses.dataclass
class SRS:
    """Structured reference string: [tau^i]G1 (host affine) + [tau]G2."""
    curve: object
    g1: list          # host affine points, g1[i] = tau^i * G1
    g2_gen: tuple
    g2_tau: tuple

    @functools.cached_property
    def device_g1(self):
        from gnark_tpu.backend.groth16 import _CurveKernels
        K = _CurveKernels(self.curve)
        return K.g1_points_to_device(self.g1)

    @functools.cached_property
    def host_planes(self):
        """Regular-form 16-bit limb planes of g1 as numpy (the native-C
        commit path; building these must NOT touch the device — wide-
        field device kernels cost minutes of XLA compile)."""
        L = self.curve.fp.L
        n = len(self.g1)
        xs = np.zeros((L, n), np.uint32)
        ys = np.zeros((L, n), np.uint32)
        inf = np.zeros(n, bool)
        for i, P in enumerate(self.g1):
            if P is None:
                inf[i] = True
                continue
            x, y = P
            for l in range(L):
                xs[l, i] = (x >> (16 * l)) & 0xFFFF
                ys[l, i] = (y >> (16 * l)) & 0xFFFF
        return xs, ys, inf


def new_srs(curve, size: int, tau: int | None = None, rng=None,
            host: bool = False) -> SRS:
    """Deterministic test SRS (tau fixed or rng-sampled) — the analog of
    the reference's cached test SRS (test/kzg_srs.go:35: NewSRS(..., big
    fixed seed)).  Production SRS would come from a ceremony file."""
    q = curve.fr.modulus
    if tau is None:
        import secrets
        tau = (rng.randrange(q) if rng is not None else secrets.randbelow(q))
    host1, host2 = curve.host_g1, curve.host_g2
    powers, t = [], 1
    for _ in range(size):
        powers.append(t)
        t = t * tau % q
    if host:
        from gnark_tpu.backend.native_field import native_fixed_base_affine
        g1 = native_fixed_base_affine(curve, powers, curve.g1_gen)
        if g1 is None:
            g1 = [host1.scalar_mul(curve.g1_gen, p) for p in powers]
        else:
            g1 = [p if p is not None else None for p in g1]
    else:
        from gnark_tpu.backend.groth16 import _CurveKernels, ints_to_limbs
        K = _CurveKernels(curve)
        fb = K.fixed_base_g1(curve.g1_gen)
        pts = fb(jnp.asarray(ints_to_limbs(powers, curve.fr.L)))
        g1 = K.g1_to_host(pts)
        g1[0] = curve.g1_gen  # tau^0 * G exactly
    return SRS(curve=curve, g1=g1, g2_gen=curve.g2_gen,
               g2_tau=host2.scalar_mul(curve.g2_gen, tau))


def commit_device(srs: SRS, coeffs_regular):
    """coeffs: [Ls, k] regular-form limb planes -> device Jacobian point.

    Degree bound is enforced, never silently truncated (a quotient longer
    than the SRS would otherwise commit to the wrong polynomial)."""
    from gnark_tpu.backend.groth16 import _CurveKernels
    K = _CurveKernels(srs.curve)
    k = coeffs_regular.shape[-1]
    if k > len(srs.g1):
        raise ValueError(
            f"polynomial has {k} coefficients but SRS only supports "
            f"{len(srs.g1)} (kzg.Commit degree check, kzg.go ErrInvalidPolynomialSize)")
    xs, ys, inf = srs.device_g1
    return msm(K.g1, xs[:, :k], ys[:, :k], inf[:k], coeffs_regular)


def commit(srs: SRS, coeffs: list, host: bool = False):
    """Host int coefficients -> host affine commitment point."""
    if not coeffs:
        return None
    q = srs.curve.fr.modulus
    # trim trailing zero coefficients (degree may be lower than the list
    # length), then enforce the SRS degree bound on what remains
    top = len(coeffs)
    while top > 1 and coeffs[top - 1] % q == 0:
        top -= 1
    coeffs = coeffs[:top]
    if len(coeffs) > len(srs.g1):
        raise ValueError(
            f"polynomial degree {len(coeffs) - 1} exceeds SRS size {len(srs.g1)}")
    from gnark_tpu.backend.groth16 import _CurveKernels, ints_to_limbs
    from gnark_tpu.native import solver_lib
    if solver_lib() is not None and (host or srs.curve.fp.L >= 24):
        # native C Pippenger (device-free, modulus-generic): the
        # host=True protocol-test path (python loop was minutes-scale
        # at 4096 gates) and wide-field (BW6) curves where the
        # 16-bit-limb device layout loses (docs/PERF.md)
        from gnark_tpu.backend.native_field import native_msm
        k = len(coeffs)
        xs, ys, inf = srs.host_planes              # numpy, no device work
        sc = np.asarray(ints_to_limbs(coeffs, srs.curve.fr.L, q=q))
        return native_msm(srs.curve, xs[:, :k], ys[:, :k], inf[:k],
                          sc, coords_mont=False)
    if host:
        host1 = srs.curve.host_g1
        acc = None
        for P, c in zip(srs.g1, coeffs):
            if c % q:
                acc = host1.add(acc, host1.scalar_mul(P, c % q))
        return acc
    K = _CurveKernels(srs.curve)
    arr = jnp.asarray(ints_to_limbs(coeffs, srs.curve.fr.L, q=q))
    return K.g1_to_host(commit_device(srs, arr))[0]


def open_poly(srs: SRS, coeffs: list, z: int, host: bool = False):
    """-> (value p(z), proof [q(tau)]G1) with q = (p - p(z))/(X - z),
    by Horner/synthetic division (native core when large)."""
    q = srs.curve.fr.modulus
    from gnark_tpu.backend.native_field import nat_for
    nat = nat_for(q)
    if nat.available and len(coeffs) > 256:
        quot64, value = nat.synth_div(nat.pack(coeffs), z % q)
        return value, commit(srs, nat.unpack(quot64), host=host)
    acc = 0
    quotient = [0] * max(len(coeffs) - 1, 1)
    for i in range(len(coeffs) - 1, 0, -1):
        acc = (acc * z + coeffs[i]) % q
        quotient[i - 1] = acc
    value = (acc * z + coeffs[0]) % q
    return value, commit(srs, quotient, host=host)


def fold_polys(polys: list, gamma: int, q: int) -> list:
    """sum gamma^i * p_i as one coefficient list."""
    from gnark_tpu.backend.native_field import nat_for
    nat = nat_for(q)
    L = max(len(p) for p in polys)
    if nat.available and L > 256:
        import numpy as np
        out = np.zeros((L, nat.N), np.uint64)
        g = 1
        for p in polys:
            arr = nat.pack(list(p) + [0] * (L - len(p)))
            out = nat.vecadd(out, nat.vecmul(arr, g))
            g = g * gamma % q
        return nat.unpack(out)
    out = [0] * L
    g = 1
    for p in polys:
        for j, c in enumerate(p):
            out[j] = (out[j] + g * c) % q
        g = g * gamma % q
    return out


def batch_open_single_point(srs: SRS, polys: list, z: int, gamma: int):
    """-> (values [p_i(z)], proof of the gamma-folded poly at z)."""
    q = srs.curve.fr.modulus
    values = [_eval_host(p, z, q) for p in polys]
    folded = fold_polys(polys, gamma, q)
    _, proof = open_poly(srs, folded, z)
    return values, proof


def _eval_host(coeffs, z, q):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * z + c) % q
    return acc


def verify_opening(srs: SRS, commitment, z: int, value: int, proof) -> bool:
    """e(W, [tau]2 - z[1]2) == e(C - v[1]1, [1]2), as a 2-pair product."""
    return batch_verify_multi_points(
        srs, [commitment], [z], [value], [proof], u=1)


def batch_verify_multi_points(srs: SRS, commitments, points, values, proofs,
                              u: int | None = None) -> bool:
    """Random-linear-combination batch verification of openings at
    (possibly distinct) points (kzg.BatchVerifyMultiPoints analog):

      e(sum u^i W_i, [tau]2) == e(sum u^i (z_i W_i + C_i - v_i G), [1]2)
    """
    curve = srs.curve
    q = curve.fr.modulus
    host1 = curve.host_g1
    if u is None:
        import secrets
        u = 1 + secrets.randbelow(q - 1)
    w_acc = None
    rhs_acc = None
    ui = 1
    for C, z, v, W in zip(commitments, points, values, proofs):
        w_acc = host1.add(w_acc, host1.scalar_mul(W, ui))
        term = host1.scalar_mul(W, z % q)
        term = host1.add(term, C)
        term = host1.add(term, host1.scalar_mul(host1.neg(curve.g1_gen), v % q))
        rhs_acc = host1.add(rhs_acc, host1.scalar_mul(term, ui))
        ui = ui * u % q
    pr = pairing_for(curve)
    return pr.pairing_check([
        (w_acc, srs.g2_tau),
        (host1.neg(rhs_acc), srs.g2_gen),
    ])
