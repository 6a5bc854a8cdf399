"""Groth16 backend: Setup / Prove / Verify, TPU-native.

Functional parity targets (all cited into /root/reference):
  * Setup semantics — QAP evaluation at tau, infinity-aware key layout,
    bit-reversed Z powers: internal/backend/bn254/groth16/setup.go:80-360.
  * Prove pipeline — solve, H by NTT (iFFT, coset FFT, pointwise, coset
    iFFT), 4 MSMs, blinding r/s: internal/backend/bn254/groth16/prove.go:58.
  * Verify — 3-pairing product check plus public-input MSM:
    internal/backend/bn254/groth16/verify.go:41-91.

TPU design decisions (vs the reference's goroutine/NbTasks orchestration):
  * setup's per-wire QAP coefficients are exact host ints (sparse CSR
    accumulation), key points come from device batch fixed-base kernels;
  * prove is device-first: NTT + MSM kernels between two host syncs
    (witness solve in, proof assembly out) — XLA's async dispatch plays the
    role of prove.go's channel graph (SURVEY §2.8 P4);
  * pk.Z is stored bit-reversed so the prover feeds the coset-iFFT output
    directly to the MSM with no permutation (mirrors setup.go:228).
"""

from __future__ import annotations

import dataclasses
import secrets

import jax.numpy as jnp
import numpy as np

from gnark_tpu.backend.solver import solve
from gnark_tpu.curves.pairing import pairing_for
from gnark_tpu.fields.spec import W
from gnark_tpu.ops.ec import CurveOps
from gnark_tpu.ops.fixed_base import FixedBaseTable
from gnark_tpu.ops.limbs import field_ops
from gnark_tpu.ops.msm import msm
from gnark_tpu.ops.ntt import Domain, bit_reverse_perm
from gnark_tpu.ops.towers import fp2_ops
from gnark_tpu.utils import profiling
from gnark_tpu.utils.logging import logger


def _next_pow2(n: int) -> int:
    return 1 if n <= 1 else 1 << (n - 1).bit_length()


def ints_to_limbs(values, L: int, q: int | None = None) -> np.ndarray:
    """Vectorized python ints -> uint32[L, n] regular-form 16-bit limb planes.

    Via fixed-width big-endian bytes + a view; avoids the per-int python
    limb loop of FieldSpec.to_limbs for prover-sized vectors.
    """
    nbytes = 2 * L
    if q is None:
        buf = b"".join(v.to_bytes(nbytes, "little") for v in values)
    else:
        buf = b"".join((v % q).to_bytes(nbytes, "little") for v in values)
    arr = np.frombuffer(buf, dtype="<u2").reshape(len(values), L)
    return np.ascontiguousarray(arr.T).astype(np.uint32)


def limbs_to_ints(arr) -> list:
    """uint32[L, n] regular-form limb planes -> python ints."""
    arr = np.asarray(arr).astype(np.uint16)
    le = np.ascontiguousarray(arr.T)  # [n, L] little-endian u16
    data = le.tobytes()
    nbytes = 2 * arr.shape[0]
    return [int.from_bytes(data[i * nbytes:(i + 1) * nbytes], "little")
            for i in range(arr.shape[1])]


# ---- key / proof containers ---------------------------------------------------


@dataclasses.dataclass
class VerifyingKey:
    curve: object
    alpha_g1: tuple
    beta_g2: tuple
    gamma_g2: tuple
    delta_g2: tuple
    K: list                 # public-wire commitments (host affine, None=inf)
    e_alpha_beta: tuple     # precomputed GT element
    nb_public: int          # includes the one-wire
    # gnark's VK blob carries [beta]1/[delta]1 too (marshal.go:93) — kept
    # here so a freshly-setup VK serializes faithfully (ADVICE r1 low)
    beta_g1: tuple = None
    delta_g1: tuple = None


@dataclasses.dataclass
class ProvingKey:
    curve: object
    domain_n: int
    n_pad: int              # common padded batch size of A/B1/B2/K/Z
    alpha_g1: tuple
    beta_g1: tuple
    delta_g1: tuple
    beta_g2: tuple
    delta_g2: tuple
    # device arrays: affine coords [L, n] + [n] infinity masks
    A: tuple                # (x, y, inf) over all wires, G1
    B1: tuple               # G1
    B2: tuple               # (x, y, inf) fp2 coords, G2
    K: tuple                # private wires only, G1
    Z: tuple                # n points, bit-reversed order, G1
    host: bool = False      # host point lists instead of device arrays


@dataclasses.dataclass
class Proof:
    ar: tuple               # host affine G1
    bs: tuple               # host affine G2
    krs: tuple              # host affine G1


# ---- setup ---------------------------------------------------------------------


def _qap_at_tau_native(cs, fr_spec, tau: int, n: int, nat):
    """Native-core QAP evaluation: per-wire A_i(tau), B_i(tau), C_i(tau)
    as [nw, N] uint64 limb rows (regular form).  Same math as
    _qap_at_tau, with every O(m)/O(nnz) pass in C (setup.go:278-355)."""
    q = cs.field_modulus
    m = cs.nb_constraints
    omega = fr_spec.root_of_unity(n)
    wc = nat.powers(omega, m)                       # [m, N]: w^c
    zeros = np.zeros_like(wc)
    tau_b = np.broadcast_to(nat.pack([tau]), wc.shape).copy()
    dens = nat.lincomb3(wc, zeros, tau_b, q - 1, 0, 1)   # tau - w^c
    dens_inv = nat.batch_inv(dens)
    zt = (pow(tau, n, q) - 1) % q
    base = zt * pow(n, -1, q) % q
    lag = nat.vecmul(nat.vecmul(wc, dens_inv), base)
    coeffs_mont = nat.pack_mont(cs.coeffs)
    nw = cs.nb_wires
    A = nat.qap_accumulate(cs.L, coeffs_mont, lag, nw)
    B = nat.qap_accumulate(cs.R, coeffs_mont, lag, nw)
    C = nat.qap_accumulate(cs.O, coeffs_mont, lag, nw)
    return A, B, C, zt


def _qap_at_tau(cs, fr_spec, tau: int, n: int):
    """Per-wire QAP evaluations A_i(tau), B_i(tau), C_i(tau) (host ints).

    Lagrange basis at tau over the size-n domain:
      l_c(tau) = (tau^n - 1) * w^c / (n * (tau - w^c)),
    with a batch inversion of all denominators.
    """
    q = cs.field_modulus
    m = cs.nb_constraints
    omega = fr_spec.root_of_unity(n)
    # denominators tau - w^c for c in 0..m-1
    dens, wc = [], 1
    for _ in range(m):
        dens.append((tau - wc) % q)
        wc = wc * omega % q
    dens_inv = _batch_inv_host(dens, q)
    zt = (pow(tau, n, q) - 1) % q
    ninv = pow(n, -1, q)
    base = zt * ninv % q
    lag = []
    wc = 1
    for c in range(m):
        lag.append(base * wc % q * dens_inv[c] % q)
        wc = wc * omega % q

    nw = cs.nb_wires
    A = [0] * nw
    B = [0] * nw
    C = [0] * nw
    coeffs = cs.coeffs
    for out, M in ((A, cs.L), (B, cs.R), (C, cs.O)):
        indptr, wires, cids = M.indptr, M.wires, M.coeffs
        for c in range(m):
            lc = lag[c]
            for k in range(int(indptr[c]), int(indptr[c + 1])):
                w = int(wires[k])
                out[w] = (out[w] + coeffs[int(cids[k])] * lc) % q
    return A, B, C, zt


def _batch_inv_host(vals, q):
    """Montgomery-trick batch inversion on host ints (zeros -> zero)."""
    n = len(vals)
    prefix = [1] * (n + 1)
    for i, v in enumerate(vals):
        prefix[i + 1] = prefix[i] * (v if v else 1) % q
    inv = pow(prefix[n], -1, q)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        v = vals[i]
        if v:
            out[i] = prefix[i] * inv % q
            inv = inv * v % q
    return out


class _CurveKernels:
    """Device kernel bundle for one curve (G1 over fp, G2 over fp2)."""

    _cache = {}

    def __new__(cls, curve):
        if curve.name not in cls._cache:
            self = super().__new__(cls)
            self.curve = curve
            self.fr = field_ops(curve.fr)
            self.fp = field_ops(curve.fp)
            # BW6 family: the sextic twist lives over fp itself, so the
            # G2 kernels are the fp kernels (one code path, different
            # field-ops object — the CurveSpec-generic design paying off)
            if getattr(curve, "g2_over_fp", False):
                self.fp2 = self.fp
            elif getattr(curve, "g2_tower_k", 2) == 4:
                from gnark_tpu.ops.towers import fpk_ops
                self.fp2 = fpk_ops(curve.fp, 4, curve.g2_tower_c)
            else:
                self.fp2 = fp2_ops(curve.fp, curve.fp2_beta)
            self.g1 = CurveOps(self.fp, b=curve.b)
            g2_b = curve.b2 if getattr(curve, "g2_tower_k", 2) != 4 else None
            self.g2 = CurveOps(self.fp2, b=g2_b)
            self._fb = {}
            cls._cache[curve.name] = self
        return cls._cache[curve.name]

    def fixed_base_g1(self, base):
        key = ("g1", base)
        if key not in self._fb:
            self._fb[key] = FixedBaseTable(
                self.g1, self.curve.host_g1, base, self.curve.fr.L * W)
        return self._fb[key]

    def fixed_base_g2(self, base):
        key = ("g2", base)
        if key not in self._fb:
            self._fb[key] = FixedBaseTable(
                self.g2, self.curve.host_g2, base, self.curve.fr.L * W,
                pack=self.fp2.pack)
        return self._fb[key]

    def g1_to_host(self, P):
        """Device Jacobian G1 point batch -> list of host affine points."""
        x, y, inf = self.g1.to_affine(P)
        xs = self.fp.unpack(x)
        ys = self.fp.unpack(y)
        infs = np.asarray(inf)
        return [None if infs[i] else (xs[i], ys[i]) for i in range(len(xs))]

    def g2_to_host(self, P):
        x, y, inf = self.g2.to_affine(P)
        xs = self.fp2.unpack(x)
        ys = self.fp2.unpack(y)
        infs = np.asarray(inf)
        return [None if infs[i] else (xs[i], ys[i]) for i in range(len(xs))]

    def g1_points_to_device(self, points):
        """Host affine G1 list (None = inf) -> (x, y, inf) device arrays."""
        xs = self.fp.pack([0 if p is None else p[0] for p in points])
        ys = self.fp.pack([0 if p is None else p[1] for p in points])
        inf = jnp.asarray(np.array([p is None for p in points]))
        return xs, ys, inf

    def g2_points_to_device(self, points):
        if getattr(self.curve, "g2_over_fp", False):
            zero = 0
        elif getattr(self.curve, "g2_tower_k", 2) == 4:
            zero = (0, 0, 0, 0)
        else:
            zero = (0, 0)
        xs = self.fp2.pack([zero if p is None else p[0] for p in points])
        ys = self.fp2.pack([zero if p is None else p[1] for p in points])
        inf = jnp.asarray(np.array([p is None for p in points]))
        return xs, ys, inf


def _sampler(rng):
    """rng: None (secure default) or a random.Random (test determinism) —
    injectable randomness per SURVEY §7 hard-part 5 (setup.go:368 analog)."""
    if rng is None:
        return secrets.randbelow
    return lambda q: rng.randrange(q)


def _host_ntt(vals, omega, q, inverse=False):
    """Iterative radix-2 NTT on host ints (tiny-circuit / host-path use)."""
    n = len(vals)
    a = [v % q for v in vals]
    # bit-reversal permutation
    j = 0
    for i in range(1, n):
        bit = n >> 1
        while j & bit:
            j ^= bit
            bit >>= 1
        j |= bit
        if i < j:
            a[i], a[j] = a[j], a[i]
    w_base = pow(omega, -1, q) if inverse else omega
    length = 2
    while length <= n:
        wl = pow(w_base, n // length, q)
        for start in range(0, n, length):
            w = 1
            for k in range(start, start + length // 2):
                u, v = a[k], a[k + length // 2] * w % q
                a[k] = (u + v) % q
                a[k + length // 2] = (u - v) % q
                w = w * wl % q
        length <<= 1
    if inverse:
        ninv = pow(n, -1, q)
        a = [x * ninv % q for x in a]
    return a


def setup(cs, curve, rng=None, host=False):
    """-> (ProvingKey, VerifyingKey).  host=True computes key points with
    host scalar muls (slow; tiny circuits / no-device environments)."""
    q = curve.fr.modulus
    rnd = _sampler(rng)

    def sample_nonzero():
        while True:
            v = rnd(q)
            if v:
                return v

    tau, alpha, beta, gamma, delta = (sample_nonzero() for _ in range(5))
    n = _next_pow2(cs.nb_constraints)

    gamma_inv = pow(gamma, -1, q)
    delta_inv = pow(delta, -1, q)
    nb_pub = cs.nb_public
    nw = cs.nb_wires

    from gnark_tpu.backend.native_field import nat_for
    nat = nat_for(q)
    if nat.available:
        # every O(m)/O(nw) pass on the C Montgomery core (setup.go:278)
        A64, B64, C64, zt = _qap_at_tau_native(cs, curve.fr, tau, n, nat)
        vk_k = nat.unpack(nat.lincomb3(
            A64[:nb_pub], B64[:nb_pub], C64[:nb_pub], beta, alpha, gamma_inv))
        pk_k64 = nat.lincomb3(
            A64[nb_pub:], B64[nb_pub:], C64[nb_pub:], beta, alpha, delta_inv)
        zs64 = nat.powers(tau, n, start=zt * delta_inv % q)
        zs_brev64 = zs64[np.asarray(bit_reverse_perm(n))]
        A = A64
        B = B64
        scalar_batches = {"A": A64, "B": B64, "K": pk_k64, "Z": zs_brev64}
    else:
        A, B, C, zt = _qap_at_tau(cs, curve.fr, tau, n)
        vk_k = [(beta * A[i] + alpha * B[i] + C[i]) * gamma_inv % q
                for i in range(nb_pub)]
        pk_k = [(beta * A[i] + alpha * B[i] + C[i]) * delta_inv % q
                for i in range(nb_pub, nw)]
        # Z powers tau^j * Z(tau)/delta for j in 0..n-1, bit-reversed so
        # the prover's coset-iFFT output feeds the MSM directly
        # (setup.go:228).  h has degree n-2: slot n-1 hits a zero coeff.
        zs = []
        t = zt * delta_inv % q
        for _ in range(n):
            zs.append(t)
            t = t * tau % q
        zs_brev = [zs[i] for i in bit_reverse_perm(n)]
        scalar_batches = {"A": A, "B": B, "K": pk_k, "Z": zs_brev}

    # one padded shape for every G1 batch -> ONE compiled kernel serves
    # A/B1/K/Z (and the prover reuses the same padded MSM plan shape)
    n_pad = _next_pow2(max(nw, n, 2))
    Ls = curve.fr.L

    def to_plane_u32(scalars):
        """int list OR [k, N] u64 rows -> [Ls, n_pad] uint32 regular limbs."""
        if isinstance(scalars, np.ndarray):
            planes = nat.planes(scalars, Ls).astype(np.uint32)
            k = planes.shape[1]
            if k < n_pad:
                planes = np.pad(planes, ((0, 0), (0, n_pad - k)))
            return planes
        return np.asarray(
            ints_to_limbs(list(scalars) + [0] * (n_pad - len(scalars)), Ls))

    if host:
        host1, host2h = curve.host_g1, curve.host_g2

        def as_ints(scalars):
            vals = (nat.unpack(scalars)
                    if isinstance(scalars, np.ndarray) else list(scalars))
            return vals + [0] * (n_pad - len(vals))

        def g1_batch(scalars):
            vals = as_ints(scalars)
            from gnark_tpu.backend.native_field import \
                native_fixed_base_affine
            pts = native_fixed_base_affine(curve, vals, curve.g1_gen)
            if pts is not None:
                return pts
            return [None if s % q == 0
                    else host1.scalar_mul(curve.g1_gen, s % q)
                    for s in vals]

        def g2_batch(scalars):
            vals = as_ints(scalars)
            if getattr(curve, "g2_over_fp", False):
                # BW6 family: G2 lives over fp — the generic C core
                # serves it too (host python loop is minutes at 4k pts)
                from gnark_tpu.backend.native_field import \
                    native_fixed_base_affine
                pts = native_fixed_base_affine(curve, vals, curve.g2_gen)
                if pts is not None:
                    return pts
            return [None if s % q == 0
                    else host2h.scalar_mul(curve.g2_gen, s % q)
                    for s in vals]
    elif curve.fp.L >= 24 and nat.available:
        # wide-field (BW6) curves: native C fixed-base (the 16-bit-limb
        # device kernels pay O(L^2) at these widths; see native MSM note
        # in prove()).  QAP scalars are already [k, N] u64 rows.
        from gnark_tpu.backend.native_field import native_fixed_base

        def rows_padded(scalars):
            if isinstance(scalars, np.ndarray):
                rows = scalars
            else:
                rows = nat.pack([s % q for s in scalars])
            if rows.shape[0] < n_pad:
                rows = np.concatenate(
                    [rows, np.zeros((n_pad - rows.shape[0], rows.shape[1]),
                                    np.uint64)], axis=0)
            return rows

        def g1_batch(scalars):
            return native_fixed_base(curve, rows_padded(scalars),
                                     curve.g1_gen)

        def g2_batch(scalars):
            return native_fixed_base(curve, rows_padded(scalars),
                                     curve.g2_gen)
    else:
        K = _CurveKernels(curve)
        fb1 = K.fixed_base_g1(curve.g1_gen)
        fb2 = K.fixed_base_g2(curve.g2_gen)

        def g1_batch(scalars):
            pts = fb1(jnp.asarray(to_plane_u32(scalars)))   # 0 -> inf
            return K.g1.to_affine(pts)

        def g2_batch(scalars):
            pts = fb2(jnp.asarray(to_plane_u32(scalars)))
            return K.g2.to_affine(pts)

    A_pts = g1_batch(scalar_batches["A"])
    B1_pts = g1_batch(scalar_batches["B"])
    K_pts = g1_batch(scalar_batches["K"])
    Z_pts = g1_batch(scalar_batches["Z"])
    B2_pts = g2_batch(scalar_batches["B"])

    host1, host2 = curve.host_g1, curve.host_g2
    g1 = curve.g1_gen
    g2 = curve.g2_gen
    alpha_g1 = host1.scalar_mul(g1, alpha)
    beta_g1 = host1.scalar_mul(g1, beta)
    delta_g1 = host1.scalar_mul(g1, delta)
    beta_g2 = host2.scalar_mul(g2, beta)
    gamma_g2 = host2.scalar_mul(g2, gamma)
    delta_g2 = host2.scalar_mul(g2, delta)

    vk_k_host = [None if s % q == 0 else host1.scalar_mul(g1, s) for s in vk_k]
    e_ab = pairing_for(curve).pair(alpha_g1, beta_g2)

    pk = ProvingKey(
        curve=curve, domain_n=n, n_pad=n_pad, host=host,
        alpha_g1=alpha_g1, beta_g1=beta_g1, delta_g1=delta_g1,
        beta_g2=beta_g2, delta_g2=delta_g2,
        A=A_pts, B1=B1_pts, B2=B2_pts, K=K_pts, Z=Z_pts)
    vk = VerifyingKey(
        curve=curve, alpha_g1=alpha_g1, beta_g2=beta_g2,
        gamma_g2=gamma_g2, delta_g2=delta_g2, K=vk_k_host,
        e_alpha_beta=e_ab, nb_public=nb_pub,
        beta_g1=beta_g1, delta_g1=delta_g1)
    logger.info(f"groth16 setup: {cs.nb_constraints} constraints, domain {n}")
    return pk, vk


def pk_to_device(pk: ProvingKey) -> ProvingKey:
    """Host-point ProvingKey (setup(host=True)) -> device-array key.

    Pure packing, no device kernels — lets a python-int setup feed the
    device/mesh prover, so multi-chip tests and the driver dryrun can
    produce REAL (verifying) proofs without compiling the fixed-base
    key kernels (VERDICT r3 weak #5)."""
    if not pk.host:
        return pk
    K = _CurveKernels(pk.curve)
    return dataclasses.replace(
        pk, host=False,
        A=K.g1_points_to_device(pk.A),
        B1=K.g1_points_to_device(pk.B1),
        B2=K.g2_points_to_device(pk.B2),
        K=K.g1_points_to_device(pk.K),
        Z=K.g1_points_to_device(pk.Z))


def dummy_setup(cs, curve) -> ProvingKey:
    """Fake proving key (all points = small multiples of the generators)
    for prover benchmarking without a real trusted setup — DummySetup
    analog (internal/backend/bn254/groth16/setup.go:411).  Proofs made
    with it do NOT verify."""
    K = _CurveKernels(curve)
    n = _next_pow2(cs.nb_constraints)
    nw = cs.nb_wires
    n_pad = _next_pow2(max(nw, n, 2))
    g1, g2 = curve.g1_gen, curve.g2_gen
    g1_pts = K.g1_points_to_device([g1] * n_pad)
    g1_aff = (g1_pts[0], g1_pts[1], g1_pts[2])
    g2_pts = K.g2_points_to_device([g2] * n_pad)
    return ProvingKey(
        curve=curve, domain_n=n, n_pad=n_pad,
        alpha_g1=g1, beta_g1=g1, delta_g1=g1,
        beta_g2=g2, delta_g2=g2,
        A=g1_aff, B1=g1_aff, B2=g2_pts, K=g1_aff, Z=g1_aff)


# ---- prove ----------------------------------------------------------------------


def _compute_h(domain: Domain, a, b, c):
    """Quotient h = (A*B - C)/Z on device; returns bit-reversed coeffs.

    Chain (prove.go:275 computeH): iFFT (DIF: natural evals -> brev
    coeffs) -> coset FFT (DIT: brev -> natural coset evals) -> pointwise
    (ab - c) * (g^n - 1)^{-1} -> coset iFFT (DIF: -> brev coeffs).
    Z is constant on the coset: Z(g w^i) = g^n - 1.
    """
    F, q = domain.F, domain.spec.modulus
    den = pow(pow(domain.coset_gen, domain.n, q) - 1, -1, q)
    den_pl = F.pack([den])

    def coset_evals(x):
        return domain.fft(domain.ifft(x, "DIF"), "DIT", coset=True)

    ae, be, ce = coset_evals(a), coset_evals(b), coset_evals(c)
    h = F.mul(F.sub(F.mul(ae, be), ce), den_pl)
    return domain.ifft(h, "DIF", coset=True)


def _prove_host(cs, pk, sol, rnd):
    """Pure-host prover core (tiny circuits / platform-independent
    protocol tests): same math as the device path, python ints."""
    curve = pk.curve
    q = curve.fr.modulus
    n = pk.domain_n
    spec = curve.fr
    omega = spec.root_of_unity(n)
    g = spec.multiplicative_generator % q

    def pad(v):
        return [x % q for x in v] + [0] * (n - len(v))

    def coset_evals(vals):
        coeffs = _host_ntt(pad(vals), omega, q, inverse=True)
        shifted = [c * pow(g, i, q) % q for i, c in enumerate(coeffs)]
        return _host_ntt(shifted, omega, q)

    ae, be, ce = (coset_evals(v) for v in (sol.a, sol.b, sol.c))
    den = pow(pow(g, n, q) - 1, -1, q)
    he = [(a * b - c) % q * den % q for a, b, c in zip(ae, be, ce)]
    h_shift = _host_ntt(he, omega, q, inverse=True)
    ginv = pow(g, -1, q)
    h = [c * pow(ginv, i, q) % q for i, c in enumerate(h_shift)]
    h_brev = [h[i] for i in bit_reverse_perm(n)]

    host1, host2 = curve.host_g1, curve.host_g2

    from gnark_tpu.native import solver_lib
    if solver_lib() is not None:
        # native C Pippenger (modulus-generic, device-free) — the
        # python loop is minutes-scale on 4096-gate corpus circuits
        from gnark_tpu.backend.native_field import native_msm
        Lp = curve.fp.L

        def hmsm(points, scalars):
            k = min(len(points), len(scalars))
            xs = np.zeros((Lp, k), np.uint32)
            ys = np.zeros((Lp, k), np.uint32)
            inf = np.zeros(k, bool)
            for i in range(k):
                P = points[i]
                if P is None or scalars[i] % q == 0:
                    inf[i] = True
                    continue
                x, y = P
                for l in range(Lp):
                    xs[l, i] = (x >> (16 * l)) & 0xFFFF
                    ys[l, i] = (y >> (16 * l)) & 0xFFFF
            sc = np.asarray(ints_to_limbs(
                [scalars[i] % q for i in range(k)], curve.fr.L))
            return native_msm(curve, xs, ys, inf, sc, coords_mont=False)
    else:
        def hmsm(points, scalars):
            acc = None
            for P, s in zip(points, scalars):
                if P is not None and s % q:
                    acc = host1.add(acc, host1.scalar_mul(P, s % q))
            return acc

    wires = sol.values
    r, s = rnd(q), rnd(q)
    ar_p = hmsm(pk.A, wires)
    bs1_p = hmsm(pk.B1, wires)
    bs2_p = None
    for P, sv in zip(pk.B2, wires):
        if P is not None and sv % q:
            bs2_p = host2.add(bs2_p, host2.scalar_mul(P, sv % q))
    krs_p = hmsm(pk.K, wires[cs.nb_public:])
    krsz_p = hmsm(pk.Z, h_brev)

    ar = host1.add(host1.add(ar_p, pk.alpha_g1),
                   host1.scalar_mul(pk.delta_g1, r))
    bs1 = host1.add(host1.add(bs1_p, pk.beta_g1),
                    host1.scalar_mul(pk.delta_g1, s))
    bs = host2.add(host2.add(bs2_p, pk.beta_g2),
                   host2.scalar_mul(pk.delta_g2, s))
    krs = host1.add(krs_p, krsz_p)
    krs = host1.add(krs, host1.scalar_mul(ar, s))
    krs = host1.add(krs, host1.scalar_mul(bs1, r))
    krs = host1.add(krs, host1.scalar_mul(pk.delta_g1, (-r * s) % q))
    return Proof(ar=ar, bs=bs, krs=krs)


def prove(cs, pk, witness_values, rng=None, check: bool = True,
          mesh=None, mesh_axis: str = "shard") -> Proof:
    """witness_values: [public (no one-wire) | secret] ints.

    mesh: a jax.sharding.Mesh — the proof MSMs shard their point/scalar
    vectors over `mesh_axis` (parallel/sharded_msm; the NbTasks analog,
    SURVEY §2.8 P3)."""
    curve = pk.curve
    q = curve.fr.modulus
    rnd = _sampler(rng)

    with profiling.phase("groth16.solve"):
        sol = solve(cs, witness_values, check=check)
    if pk.host:
        return _prove_host(cs, pk, sol, rnd)
    K = _CurveKernels(curve)
    n = pk.domain_n
    Ls = curve.fr.L

    def limb_planes(name, start=0):
        """Solution vector -> [Ls, k] uint32 regular planes, zero int
        round-trips when the solver produced limb planes directly."""
        if sol.limbs is not None:
            return np.asarray(sol.limbs[name][:, start:], np.uint32)
        vals = getattr(sol, name)[start:]
        return np.asarray(ints_to_limbs(vals, Ls), np.uint32)

    def pad_to(arr, k):
        return jnp.asarray(np.pad(arr, ((0, 0), (0, k - arr.shape[1]))))

    with profiling.phase("groth16.compute_h"):
        am = K.fr.to_mont(pad_to(limb_planes("a"), n))
        bm = K.fr.to_mont(pad_to(limb_planes("b"), n))
        cm = K.fr.to_mont(pad_to(limb_planes("c"), n))
        n_dev = 0 if mesh is None else mesh.shape[mesh_axis]
        if mesh is not None and n % n_dev == 0 \
                and (n // n_dev) % n_dev == 0:
            # mesh-sharded 4-step NTT chain: both all_to_all stages of
            # every transform ride the mesh (SURVEY §2.8 P6); the
            # strided output is permuted to the bit-reversed order the
            # Z key points use (one global gather)
            from gnark_tpu.parallel.sharded_ntt import ShardedDomain
            sd = _sharded_domain_cache(curve.fr, n, mesh, mesh_axis)
            h_strided = sd.compute_h(am, bm, cm)
            h_brev = K.fr.from_mont(jnp.take(
                h_strided, jnp.asarray(sd.strided_to_brev_perm()), axis=1))
        else:
            domain = _domain_cache(curve.fr, n)
            h_brev = K.fr.from_mont(_compute_h(domain, am, bm, cm))
        n_pad = pk.n_pad
        h_brev = jnp.pad(h_brev, ((0, 0), (0, n_pad - n)))

    wires = pad_to(limb_planes("values"), n_pad)
    priv = pad_to(limb_planes("values", cs.nb_public), n_pad)

    r, s = rnd(q), rnd(q)

    if curve.fp.L >= 24:
        # wide-field (BW6) curves: the 16-bit-limb device MSM pays an
        # O(L^2) representation penalty at 761-bit widths; the native
        # 64-bit CIOS Pippenger core is the fast path (and G2 is over fp
        # on these curves, so one code path serves all five MSMs)
        from gnark_tpu.backend.native_field import native_msm
        if not hasattr(pk, "_host_np"):
            pk._host_np = {
                name: tuple(np.asarray(a) for a in getattr(pk, name))
                for name in ("A", "B1", "B2", "K", "Z")}

        def hmsm(name, scalars):
            x, y, i = pk._host_np[name]
            k = min(scalars.shape[1], x.shape[1])
            with profiling.phase(f"groth16.native_msm.{name}"):
                # PK device planes hold MONTGOMERY-form coordinates
                return native_msm(curve, x[:, :k], y[:, :k], i[:k],
                                  np.asarray(scalars)[:, :k],
                                  coords_mont=True)

        h_np = np.asarray(h_brev)
        ar_p, = [hmsm("A", wires)]
        bs1_p = hmsm("B1", wires)
        bs2_p = hmsm("B2", wires)
        krs_p = hmsm("K", priv)
        krsz_p = hmsm("Z", h_np)
        host1, host2 = curve.host_g1, curve.host_g2
        ar = host1.add(host1.add(ar_p, pk.alpha_g1),
                       host1.scalar_mul(pk.delta_g1, r))
        bs1 = host1.add(host1.add(bs1_p, pk.beta_g1),
                        host1.scalar_mul(pk.delta_g1, s))
        bs = host2.add(host2.add(bs2_p, pk.beta_g2),
                       host2.scalar_mul(pk.delta_g2, s))
        krs = host1.add(krs_p, krsz_p)
        krs = host1.add(krs, host1.scalar_mul(ar, s))
        krs = host1.add(krs, host1.scalar_mul(bs1, r))
        krs = host1.add(krs, host1.scalar_mul(pk.delta_g1, (-r * s) % q))
        return Proof(ar=ar, bs=bs, krs=krs)

    with profiling.phase("groth16.msm"):
        if mesh is not None:
            from gnark_tpu.parallel.sharded_msm import ShardedMSM
            p1 = ShardedMSM(K.g1, mesh, mesh_axis, n_pad, Ls)
            p2 = ShardedMSM(K.g2, mesh, mesh_axis, n_pad, Ls)
            run_g1, run_g2 = p1, p2
        else:
            def run_g1(x, y, i, s):
                return msm(K.g1, x, y, i, s)

            def run_g2(x, y, i, s):
                return msm(K.g2, x, y, i, s)

        # 4 MSMs of identical G1 shape -> one compiled plan serves three
        ar_j = run_g1(*pk.A, wires)
        bs1_j = run_g1(*pk.B1, wires)
        bs2_j = run_g2(*pk.B2, wires)
        krs_pk = run_g1(*pk.K, priv)
        krs_z = run_g1(*pk.Z, h_brev)

    # host assembly (small): fold in blinding terms r, s
    host1, host2 = curve.host_g1, curve.host_g2
    (ar_p,) = K.g1_to_host(ar_j)
    (bs1_p,) = K.g1_to_host(bs1_j)
    (bs2_p,) = K.g2_to_host(bs2_j)
    krs_p = K.g1_to_host(krs_pk)[0]
    krsz_p = K.g1_to_host(krs_z)[0]

    ar = host1.add(host1.add(ar_p, pk.alpha_g1),
                   host1.scalar_mul(pk.delta_g1, r))
    bs1 = host1.add(host1.add(bs1_p, pk.beta_g1),
                    host1.scalar_mul(pk.delta_g1, s))
    bs = host2.add(host2.add(bs2_p, pk.beta_g2),
                   host2.scalar_mul(pk.delta_g2, s))
    krs = host1.add(krs_p, krsz_p)
    krs = host1.add(krs, host1.scalar_mul(ar, s))
    krs = host1.add(krs, host1.scalar_mul(bs1, r))
    krs = host1.add(krs, host1.scalar_mul(pk.delta_g1, (-r * s) % q))
    return Proof(ar=ar, bs=bs, krs=krs)


_domains = {}


def _domain_cache(spec, n):
    if (spec.name, n) not in _domains:
        _domains[(spec.name, n)] = Domain(spec, n)
    return _domains[(spec.name, n)]


_sharded_domains = {}


def _sharded_domain_cache(spec, n, mesh, axis):
    from gnark_tpu.parallel.sharded_ntt import ShardedDomain
    key = (spec.name, n, id(mesh), axis)
    if key not in _sharded_domains:
        _sharded_domains[key] = ShardedDomain(spec, n, mesh, axis)
    return _sharded_domains[key]


# ---- verify ---------------------------------------------------------------------


def verify(proof: Proof, vk: VerifyingKey, public_values) -> bool:
    """public_values: the public inputs WITHOUT the leading one-wire.

    e(Ar, Bs) == e(alpha, beta) * e(kSum, gamma) * e(Krs, delta)
    (verify.go:58-86), as a single 4-pair product-is-one check.
    """
    curve = vk.curve
    q = curve.fr.modulus
    if len(public_values) != vk.nb_public - 1:
        raise ValueError(
            f"got {len(public_values)} public inputs, want {vk.nb_public - 1}")
    host1 = curve.host_g1
    # subgroup/on-curve checks (verify.go:50)
    for p, grp in ((proof.ar, host1), (proof.krs, host1),
                   (proof.bs, curve.host_g2)):
        if not grp.is_on_curve(p) or grp.scalar_mul(p, q) is not None:
            return False
    ksum = vk.K[0]
    for point, value in zip(vk.K[1:], public_values):
        if point is not None and value % q:
            ksum = host1.add(ksum, host1.scalar_mul(point, value % q))
    pr = pairing_for(curve)
    f = pr.miller_loop([
        (host1.neg(proof.ar), proof.bs),
        (ksum, vk.gamma_g2),
        (proof.krs, vk.delta_g2),
    ])
    # product must equal e(alpha, beta)^-1; GT inverse is conjugation
    return pr.final_exp(f) == pr.fp12.conj(vk.e_alpha_beta)
