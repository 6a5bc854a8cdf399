"""PLONK backend (KZG commitments): Setup / Prove / Verify.

Functional parity targets (cited into /root/reference):
  * Setup — selector polys from gates + public-input placeholder rows,
    copy-constraint permutation, KZG commits into the VK:
    internal/backend/bn254/plonk/setup.go:89-300.
  * Prove — the transcript-barriered pipeline of SURVEY §3.3
    (internal/backend/bn254/plonk/prove.go:64-372): commit L,R,O ->
    gamma,beta -> Z -> alpha -> quotient on the 4n coset domain in
    bit-reversed layout (evaluateDomainBigBitReversed prove.go:726) ->
    zeta -> openings + linearization.
  * Verify — challenge re-derivation, quotient identity at zeta,
    linearized digest as an MSM over {Ql,Qr,Qm,Qo,Qc,S3,Z,H},
    batch KZG verification: internal/backend/bn254/plonk/verify.go:42-308.

TPU design: every bulk step (interpolations, 4n coset evaluations, the
quotient pointwise pass, all 9 commitment MSMs) is a device kernel; the
hosts syncs are exactly the Fiat-Shamir barriers, which are inherent to
the protocol.  Sequential-but-cheap steps (Z running product, quotient
linearization combos, openings) are host ints at O(n) mulmods.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from gnark_tpu.backend import kzg
from gnark_tpu.backend import scs_solver
from gnark_tpu.backend.groth16 import (
    _CurveKernels, _batch_inv_host, _next_pow2, _sampler, ints_to_limbs,
    limbs_to_ints,
)
from gnark_tpu.backend.transcript import Transcript
from gnark_tpu.ops.ntt import Domain, bit_reverse_perm
from gnark_tpu.utils.logging import logger

CHALLENGES = ("gamma", "beta", "alpha", "zeta", "eta", "u")


@dataclasses.dataclass
class PlonkVK:
    curve: object
    n: int
    ell: int                # nb public inputs
    k1: int
    k2: int
    generator: int          # omega
    c_ql: tuple; c_qr: tuple; c_qm: tuple; c_qo: tuple; c_qc: tuple
    c_s1: tuple; c_s2: tuple; c_s3: tuple
    g2_gen: tuple
    g2_tau: tuple
    g1_gen: tuple


@dataclasses.dataclass
class PlonkPK:
    curve: object
    srs: kzg.SRS
    vk: PlonkVK
    n: int
    ell: int
    k1: int
    k2: int
    # coefficient forms (host ints, length n)
    ql_c: list; qr_c: list; qm_c: list; qo_c: list; qc_c: list
    s1_c: list; s2_c: list; s3_c: list
    # sigma slot values (host ints, 3 lists of n) and omega powers
    sigma_vals: tuple
    omega_pows: list
    # 4n-coset evaluations: device planes in bit-reversed order, or
    # host int lists in natural order when host_mode
    sel_E: tuple            # (qlE, qrE, qmE, qoE, qcE)
    sig_E: tuple            # (s1E, s2E, s3E)
    x_E: object             # coset points
    zh_inv_E: object        # 1 / Z_H on the coset
    l1_E: object            # Lagrange L1 on the coset
    host_mode: bool = False


@dataclasses.dataclass
class PlonkProof:
    c_l: tuple; c_r: tuple; c_o: tuple
    c_z: tuple
    c_h1: tuple; c_h2: tuple; c_h3: tuple
    # openings at zeta: [r_bar, l_bar, r_bar_, o_bar, s1_bar, s2_bar]
    evals: list
    w_zeta: tuple           # batched opening proof at zeta
    z_omega_zeta: int       # Z(omega * zeta)
    w_zeta_omega: tuple     # opening proof of Z at omega*zeta


# ---- poly helpers (device + host variants) --------------------------------------


class _HostVecF:
    """Pointwise mod-q ops on python int lists (host quotient path);
    scalars broadcast (ints mix with lists)."""

    def __init__(self, q):
        self.q = q

    def _bc(self, a, b):
        if isinstance(a, int) and isinstance(b, list):
            a = [a] * len(b)
        elif isinstance(b, int) and isinstance(a, list):
            b = [b] * len(a)
        return a, b

    def add(self, a, b):
        a, b = self._bc(a, b)
        return [(x + y) % self.q for x, y in zip(a, b)]

    def sub(self, a, b):
        a, b = self._bc(a, b)
        return [(x - y) % self.q for x, y in zip(a, b)]

    def mul(self, a, b):
        a, b = self._bc(a, b)
        return [x * y % self.q for x, y in zip(a, b)]

    def ones_like(self, a):
        return [1] * len(a)


def _big_domain_size(n: int) -> int:
    """Quotient-evaluation domain: deg t = 3n+5 with blinding, so 4n
    suffices only for n >= 8; tiny circuits take 8n (the reference's
    n < 6 exception, internal/backend/bn254/plonk/setup.go:105-110)."""
    return 4 * n if n >= 8 else 8 * n


class _HostPoly:
    """Host-int polynomial helper with the same interface as _Poly
    (natural-order coset layout; order only has to be self-consistent)."""

    _cache = {}

    def __new__(cls, spec, n):
        key = (spec.name, n)
        if key not in cls._cache:
            self = super().__new__(cls)
            self.spec = spec
            self.n = n
            self.big = _big_domain_size(n)
            self.q = spec.modulus
            self.omega = spec.root_of_unity(n)
            self.omega4 = spec.root_of_unity(self.big)
            self.coset = spec.multiplicative_generator % self.q
            self.F = _HostVecF(self.q)
            cls._cache[key] = self
        return cls._cache[key]

    def interpolate(self, evals):
        from gnark_tpu.backend.groth16 import _host_ntt
        q = self.q
        vals = [v % q for v in evals] + [0] * (self.n - len(evals))
        return _host_ntt(vals, self.omega, q, inverse=True)

    def eval_coset4(self, coeffs):
        from gnark_tpu.backend.groth16 import _host_ntt
        q = self.q
        c = [v % q for v in coeffs] + [0] * (self.big - len(coeffs))
        shifted = [v * pow(self.coset, i, q) % q for i, v in enumerate(c)]
        return _host_ntt(shifted, self.omega4, q)

    def interp_coset4(self, evals):
        from gnark_tpu.backend.groth16 import _host_ntt
        q = self.q
        coeffs = _host_ntt(list(evals), self.omega4, q, inverse=True)
        cinv = pow(self.coset, -1, q)
        return [v * pow(cinv, i, q) % q for i, v in enumerate(coeffs)]


class _Poly:
    """Device NTT helper bound to (curve.fr, n): interpolation on H and
    evaluation on the 4n coset in bit-reversed order."""

    _cache = {}

    def __new__(cls, spec, n):
        key = (spec.name, n)
        if key not in cls._cache:
            self = super().__new__(cls)
            self.spec = spec
            self.n = n
            self.big = _big_domain_size(n)
            self.domain = Domain(spec, n)
            self.domain4 = Domain(spec, self.big)
            self.F = self.domain.F
            self.Ls = spec.L
            cls._cache[key] = self
        return cls._cache[key]

    def pack(self, vals, length=None):
        length = length or self.n
        vals = list(vals) + [0] * (length - len(vals))
        return self.F.to_mont(jnp.asarray(
            ints_to_limbs(vals, self.Ls, q=self.spec.modulus)))

    def unpack(self, planes):
        return limbs_to_ints(self.F.from_mont(planes))

    def interpolate(self, evals_ints) -> list:
        """values on H (natural order) -> coefficients (host ints)."""
        x = self.pack(evals_ints)
        coeffs_brev = self.domain.ifft(x, "DIF")
        coeffs = jnp.take(
            coeffs_brev,
            jnp.asarray(bit_reverse_perm(self.n).astype(np.int32)), axis=1)
        return self.unpack(coeffs)

    def eval_coset4(self, coeffs_ints):
        """coefficients -> evaluations on the big coset, bit-reversed
        order (device planes, Montgomery)."""
        x = self.pack(coeffs_ints, self.big)
        return self.domain4.fft(x, "DIF", coset=True)

    def interp_coset4(self, evals_brev):
        """bit-reversed 4n coset evals -> natural coefficients (host ints)."""
        return self.unpack(self.domain4.ifft(evals_brev, "DIT", coset=True))


# ---- setup -----------------------------------------------------------------------


def setup(cs, curve, srs: kzg.SRS | None = None, rng=None,
          host: bool = False):
    """-> (PlonkPK, PlonkVK).  srs: a kzg.SRS of size >= n+3 (test SRS is
    generated when omitted — plonk.Setup(ccs, kzgSRS) analog).
    host=True: pure-host math (tiny circuits / protocol tests)."""
    q = cs.field_modulus
    ell = cs.nb_public
    m = cs.nb_constraints
    n = _next_pow2(ell + m)
    if srs is None:
        srs = kzg.new_srs(curve, n + 3, rng=rng, host=host)
    assert len(srs.g1) >= n + 3, "SRS too small for this circuit"

    coeffs = cs.coeffs
    neg_one = q - 1
    ql = [neg_one] * ell + [coeffs[c] for c in cs.q_l] + [0] * (n - ell - m)
    qr = [0] * ell + [coeffs[c] for c in cs.q_r] + [0] * (n - ell - m)
    qm = [0] * ell + [coeffs[c] for c in cs.q_m] + [0] * (n - ell - m)
    qo = [0] * ell + [coeffs[c] for c in cs.q_o] + [0] * (n - ell - m)
    qc = [0] * ell + [coeffs[c] for c in cs.q_c] + [0] * (n - ell - m)

    # slot wiring: 3 columns x n rows; wire id or -1
    wl = [-1] * n
    wr = [-1] * n
    wo = [-1] * n
    for i in range(ell):
        wl[i] = i
    for j in range(m):
        wl[ell + j] = int(cs.wires_l[j])
        wr[ell + j] = int(cs.wires_r[j])
        wo[ell + j] = int(cs.wires_o[j])

    # permutation: cycle the slots of each wire (setup.go:209-255)
    slots_of = {}
    cols = (wl, wr, wo)
    for col_idx, col in enumerate(cols):
        for row, w in enumerate(col):
            if w >= 0:
                slots_of.setdefault(w, []).append(col_idx * n + row)
    perm = list(range(3 * n))
    for slots in slots_of.values():
        for i, s in enumerate(slots):
            perm[s] = slots[(i + 1) % len(slots)]

    # sigma slot values: id(s) = k_col * omega^row
    P = _HostPoly(curve.fr, n) if host else _Poly(curve.fr, n)
    omega = curve.fr.root_of_unity(n)
    from gnark_tpu.backend.native_field import nat_for
    nat = nat_for(q)
    if nat.available:
        omega_pows = nat.unpack(nat.powers(omega, n))
    else:
        omega_pows = [1] * n
        for i in range(1, n):
            omega_pows[i] = omega_pows[i - 1] * omega % q
    g = curve.fr.multiplicative_generator % q
    k1, k2 = g, g * g % q
    ks = (1, k1, k2)

    def slot_id(s):
        return ks[s // n] * omega_pows[s % n] % q

    sigma_vals = tuple([slot_id(perm[c * n + r]) for r in range(n)]
                       for c in range(3))

    # interpolate + commit everything
    ql_c, qr_c, qm_c, qo_c, qc_c = (P.interpolate(v)
                                    for v in (ql, qr, qm, qo, qc))
    s1_c, s2_c, s3_c = (P.interpolate(v) for v in sigma_vals)

    commits = [kzg.commit(srs, c, host=host)
               for c in (ql_c, qr_c, qm_c, qo_c, qc_c, s1_c, s2_c, s3_c)]

    vk = PlonkVK(
        curve=curve, n=n, ell=ell, k1=k1, k2=k2, generator=omega,
        c_ql=commits[0], c_qr=commits[1], c_qm=commits[2], c_qo=commits[3],
        c_qc=commits[4], c_s1=commits[5], c_s2=commits[6], c_s3=commits[7],
        g2_gen=srs.g2_gen, g2_tau=srs.g2_tau, g1_gen=curve.g1_gen)

    # big-coset precomputations.  big = 4n normally, 8n for n < 8: the
    # blinded quotient has degree 3n+5, which only fits the 4n domain
    # from n = 8 up (setup.go:105-110 makes the same n<6 exception)
    big = _big_domain_size(n)
    ratio = big // n
    brev4 = bit_reverse_perm(big)
    coset = curve.fr.multiplicative_generator % q
    w4 = curve.fr.root_of_unity(big)
    # Z_H(x) = x^n - 1 on the coset: coset^n * w4^{ni} - 1
    # (w4^n has order big/n)
    w4n = pow(w4, n, q)
    cn = pow(coset, n, q)
    ninv = pow(n, -1, q)
    if nat.available:
        x64 = nat.powers(w4, big, start=coset)
        x_nat = nat.unpack(x64)
        zh_full = [(cn * pow(w4n, i % ratio, q) - 1) % q for i in range(big)]
        zh64 = nat.pack(zh_full)
        zh_inv = nat.unpack(nat.batch_inv(zh64))
        zeros = np.zeros_like(x64)
        l1_den64 = nat.batch_inv(nat.vecadd(x64, q - 1))
        # L1(x) = (x^n - 1) / (n (x - 1))
        l1_full = nat.unpack(nat.vecmul(nat.vecmul(zh64, l1_den64), ninv))
    else:
        x_nat = [0] * big
        t = coset
        for i in range(big):
            x_nat[i] = t
            t = t * w4 % q
        zh_full = [(cn * pow(w4n, i % ratio, q) - 1) % q for i in range(big)]
        zh_inv = _batch_inv_host(zh_full, q)
        # L1(x) = (x^n - 1) / (n (x - 1))
        l1_den = _batch_inv_host([(x - 1) % q for x in x_nat], q)
        l1_full = [(zh_full[i] * ninv % q) * l1_den[i] % q
                   for i in range(big)]

    if host:
        def layout(vals):
            return list(vals)  # natural order, int lists
    else:
        def layout(vals):
            return P.pack([vals[i] for i in brev4], big)

    pk = PlonkPK(
        curve=curve, srs=srs, vk=vk, n=n, ell=ell, k1=k1, k2=k2,
        ql_c=ql_c, qr_c=qr_c, qm_c=qm_c, qo_c=qo_c, qc_c=qc_c,
        s1_c=s1_c, s2_c=s2_c, s3_c=s3_c,
        sigma_vals=sigma_vals, omega_pows=omega_pows,
        sel_E=tuple(P.eval_coset4(c)
                    for c in (ql_c, qr_c, qm_c, qo_c, qc_c)),
        sig_E=tuple(P.eval_coset4(c) for c in (s1_c, s2_c, s3_c)),
        x_E=layout(x_nat),
        zh_inv_E=layout(zh_inv),
        l1_E=layout(l1_full),
        host_mode=host)
    logger.info(f"plonk setup: {m} gates, {ell} public, domain {n}")
    return pk, vk


# ---- prove -----------------------------------------------------------------------


def _point_bytes(p, nbytes: int = 48) -> bytes:
    """Uncompressed big-endian point encoding for transcript binding
    (deriveRandomness analog, verify.go:290-308)."""
    if p is None:
        return b"\x00" * (2 * nbytes)
    def enc(c):
        if isinstance(c, tuple):
            return b"".join(x.to_bytes(nbytes, "big") for x in c)
        return c.to_bytes(nbytes, "big")
    return enc(p[0]) + enc(p[1])


def _fp_bytes(curve) -> int:
    return (curve.fp.modulus.bit_length() + 7) // 8


def _fr_bytes(curve) -> int:
    return (curve.fr.modulus.bit_length() + 7) // 8


def _bind_public_data(fs: Transcript, vk: PlonkVK, public_inputs):
    """bindPublicData analog (verify.go:249-288): sigma + selector
    commitments + public inputs bound to the first challenge."""
    nb = _fp_bytes(vk.curve)
    for c in (vk.c_s1, vk.c_s2, vk.c_s3, vk.c_ql, vk.c_qr, vk.c_qm,
              vk.c_qo, vk.c_qc):
        fs.bind("gamma", _point_bytes(c, nb))
    frb = _fr_bytes(vk.curve)
    for x in public_inputs:
        fs.bind("gamma", int(x).to_bytes(frb, "big"))


def prove(cs, pk: PlonkPK, witness_values, rng=None,
          check: bool = True) -> PlonkProof:
    curve = pk.curve
    q = curve.fr.modulus
    n, ell = pk.n, pk.ell
    host = pk.host_mode
    P = _HostPoly(curve.fr, n) if host else _Poly(curve.fr, n)
    rnd = _sampler(rng)

    nb_fp, nb_fr = _fp_bytes(curve), _fr_bytes(curve)
    sol = scs_solver.solve(cs, witness_values, check=check)
    public_inputs = [v % q for v in witness_values[:ell]]

    # row value vectors (PI rows then gates, padded)
    lv = public_inputs + sol.l + [0] * (n - ell - len(sol.l))
    rv = [0] * ell + sol.r + [0] * (n - ell - len(sol.r))
    ov = [0] * ell + sol.o + [0] * (n - ell - len(sol.o))

    def blind(coeffs, nb):
        bs = [rnd(q) for _ in range(nb)]
        out = list(coeffs) + [0] * (nb)
        for i, b in enumerate(bs):
            out[i] = (out[i] - b) % q
            out[n + i] = (out[n + i] + b) % q
        return out

    l_c = blind(P.interpolate(lv), 2)
    r_c = blind(P.interpolate(rv), 2)
    o_c = blind(P.interpolate(ov), 2)

    c_l = kzg.commit(pk.srs, l_c, host=host)
    c_r = kzg.commit(pk.srs, r_c, host=host)
    c_o = kzg.commit(pk.srs, o_c, host=host)

    fs = Transcript(*CHALLENGES)
    _bind_public_data(fs, pk.vk, public_inputs)
    for c in (c_l, c_r, c_o):
        fs.bind("gamma", _point_bytes(c, nb_fp))
    gamma = fs.challenge_int("gamma", q)
    beta = fs.challenge_int("beta", q)

    # ---- Z permutation accumulator (computeBlindedZCanonical prove.go:566)
    ks = (1, pk.k1, pk.k2)
    sig = pk.sigma_vals
    vals = (lv, rv, ov)
    from gnark_tpu.backend.native_field import nat_for
    nat = nat_for(q)
    if nat.available:
        # numerator/denominator products + running Z on the C core
        w64 = nat.pack(pk.omega_pows)
        ones64 = nat.pack([1] * n)
        num64 = None
        den64 = None
        for c in range(3):
            v64 = nat.pack(vals[c])
            s64 = nat.pack(sig[c])
            # v + (beta*k_c)*w + gamma  /  v + beta*sigma_c + gamma
            nterm = nat.lincomb3(w64, ones64, v64, beta * ks[c] % q,
                                 gamma, 1)
            dterm = nat.lincomb3(s64, ones64, v64, beta, gamma, 1)
            num64 = nterm if num64 is None else nat.vecmul(num64, nterm)
            den64 = dterm if den64 is None else nat.vecmul(den64, dterm)
        ratio = nat.vecmul(num64, nat.batch_inv(den64))
        z64 = nat.prefix_mul(ratio, exclusive=True)
        z = nat.unpack(z64)
        if check:
            closing = nat.unpack(nat.vecmul(z64[-1:], ratio[-1:]))[0]
            assert closing == 1, \
                "permutation argument accumulator must close"
    else:
        num, den = [1] * n, [1] * n
        for row in range(n):
            w = pk.omega_pows[row]
            for c in range(3):
                v = vals[c][row]
                num[row] = num[row] * ((v + beta * ks[c] * w + gamma) % q) % q
                den[row] = den[row] * ((v + beta * sig[c][row] + gamma) % q) % q
        den_inv = _batch_inv_host(den, q)
        z = [1] * n
        for row in range(n - 1):
            z[row + 1] = z[row] * num[row] % q * den_inv[row] % q
        if check:
            assert z[n - 1] * num[n - 1] % q * den_inv[n - 1] % q == 1, \
                "permutation argument accumulator must close"
    z_c = blind(P.interpolate(z), 3)
    c_z = kzg.commit(pk.srs, z_c, host=host)
    fs.bind("alpha", _point_bytes(c_z, nb_fp))
    alpha = fs.challenge_int("alpha", q)

    # ---- quotient on the 4n coset (device, bit-reversed layout)
    F = P.F
    lE = P.eval_coset4(l_c)
    rE = P.eval_coset4(r_c)
    oE = P.eval_coset4(o_c)
    zE = P.eval_coset4(z_c)
    omega = pk.vk.generator
    if nat.available:
        zw_c = nat.unpack(nat.vecmul(nat.pack(z_c),
                                     nat.powers(omega, len(z_c))))
    else:
        zw_c = [z_c[i] * pow(omega, i, q) % q for i in range(len(z_c))]
    zwE = P.eval_coset4(zw_c)

    qlE, qrE, qmE, qoE, qcE = pk.sel_E
    s1E, s2E, s3E = pk.sig_E
    xE = pk.x_E

    pi_vals = public_inputs + [0] * (n - ell)
    piE = P.eval_coset4(P.interpolate(pi_vals))

    if host:
        def const(v):
            return v % q
    else:
        def const(v):
            return P.pack([v % q], 1)

    gammaP, betaP, alphaP = const(gamma), const(beta), const(alpha)
    k1P, k2P = const(pk.k1), const(pk.k2)

    gate = F.add(F.add(F.add(F.mul(qlE, lE), F.mul(qrE, rE)),
                       F.add(F.mul(F.mul(qmE, lE), rE), F.mul(qoE, oE))),
                 F.add(qcE, piE))
    bx = F.mul(betaP, xE)
    f1 = F.add(F.add(lE, bx), gammaP)
    f2 = F.add(F.add(rE, F.mul(bx, k1P)), gammaP)
    f3 = F.add(F.add(oE, F.mul(bx, k2P)), gammaP)
    g1 = F.add(F.add(lE, F.mul(betaP, s1E)), gammaP)
    g2 = F.add(F.add(rE, F.mul(betaP, s2E)), gammaP)
    g3 = F.add(F.add(oE, F.mul(betaP, s3E)), gammaP)
    perm = F.sub(F.mul(zE, F.mul(F.mul(f1, f2), f3)),
                 F.mul(zwE, F.mul(F.mul(g1, g2), g3)))
    lag1 = F.mul(F.sub(zE, F.ones_like(zE)), pk.l1_E)
    numE = F.add(gate, F.mul(alphaP, F.add(perm, F.mul(alphaP, lag1))))
    tE = F.mul(numE, pk.zh_inv_E)
    t_c = P.interp_coset4(tE)
    if check:
        assert all(v == 0 for v in t_c[3 * n + 6:]), "quotient degree overflow"
    h1, h2, h3 = (t_c[0:n + 2], t_c[n + 2:2 * n + 4],
                  t_c[2 * n + 4:3 * n + 6])
    c_h1 = kzg.commit(pk.srs, h1, host=host)
    c_h2 = kzg.commit(pk.srs, h2, host=host)
    c_h3 = kzg.commit(pk.srs, h3, host=host)
    for c in (c_h1, c_h2, c_h3):
        fs.bind("zeta", _point_bytes(c, nb_fp))
    zeta = fs.challenge_int("zeta", q)

    # ---- openings + linearization (computeLinearizedPolynomial prove.go:827)
    if nat.available:
        def ev(coeffs, x):
            return nat.horner(nat.pack(coeffs), x)
    else:
        def ev(coeffs, x):
            acc = 0
            for c in reversed(coeffs):
                acc = (acc * x + c) % q
            return acc

    l_bar = ev(l_c, zeta)
    r_bar = ev(r_c, zeta)
    o_bar = ev(o_c, zeta)
    s1_bar = ev(pk.s1_c, zeta)
    s2_bar = ev(pk.s2_c, zeta)
    zw_bar = ev(z_c, zeta * omega % q)

    zh_zeta = (pow(zeta, n, q) - 1) % q
    zeta_n2 = pow(zeta, n + 2, q)

    # r(X) = gate-with-evals + alpha * perm-with-evals + alpha^2 L1(zeta) Z(X)
    #        - Z_H(zeta) * (h1 + zeta^{n+2} h2 + zeta^{2(n+2)} h3)(X)
    fz = (l_bar + beta * zeta + gamma) % q
    fz = fz * ((r_bar + beta * pk.k1 * zeta + gamma) % q) % q
    fz = fz * ((o_bar + beta * pk.k2 * zeta + gamma) % q) % q
    gz_part = (l_bar + beta * s1_bar + gamma) * (r_bar + beta * s2_bar + gamma) % q
    l1_zeta = zh_zeta * pow(n, -1, q) % q * pow((zeta - 1) % q, -1, q) % q

    # r_poly's highest written index is max(len(z_c), len(s3_c), len(h*))-1,
    # so nlen entries suffice; oversizing previously produced an opening
    # quotient one coefficient longer than the SRS (ADVICE r1, high).
    nlen = max(len(z_c), len(pk.s3_c), len(h1), n)
    r_terms = [
        (pk.ql_c, l_bar), (pk.qr_c, r_bar), (pk.qm_c, l_bar * r_bar % q),
        (pk.qo_c, o_bar), (pk.qc_c, 1),
        (z_c, (alpha * fz + alpha * alpha % q * l1_zeta) % q),
        (pk.s3_c, (-alpha * zw_bar % q) * gz_part % q * beta % q),
        (h1, (-zh_zeta) % q),
        (h2, (-zh_zeta) * zeta_n2 % q),
        (h3, (-zh_zeta) * zeta_n2 % q * zeta_n2 % q),
    ]
    r_const = (- alpha * zw_bar % q * gz_part % q
               * ((o_bar + gamma) % q)) % q
    if nat.available:
        rp = np.zeros((nlen, nat.N), np.uint64)
        for coeffs, k in r_terms:
            arr = nat.pack(list(coeffs) + [0] * (nlen - len(coeffs)))
            rp = nat.vecadd(rp, nat.vecmul(arr, k))
        rp[0:1] = nat.vecadd(rp[0:1], r_const)
        r_poly = nat.unpack(rp)
    else:
        r_poly = [0] * nlen
        for coeffs, k in r_terms:
            for i, c in enumerate(coeffs):
                r_poly[i] = (r_poly[i] + k * c) % q
        r_poly[0] = (r_poly[0] + r_const) % q

    r_bar_val = ev(r_poly, zeta)
    if check:
        pi_zeta = _pi_at(public_inputs, zeta, n, omega, q)
        expect = (-pi_zeta + alpha * alpha % q * l1_zeta) % q
        assert r_bar_val == expect, "linearization identity failed"

    evals = [r_bar_val, l_bar, r_bar, o_bar, s1_bar, s2_bar]
    for v in evals + [zw_bar]:
        fs.bind("eta", v.to_bytes(nb_fr, "big"))
    eta = fs.challenge_int("eta", q)
    _, w_zeta = kzg.open_poly(
        pk.srs,
        kzg.fold_polys([r_poly, l_c, r_c, o_c, pk.s1_c, pk.s2_c], eta, q),
        zeta, host=host)
    # the folded claimed value must also be subtracted; open_poly already
    # divides exactly because fold(values) = folded(zeta)
    _, w_zw = kzg.open_poly(pk.srs, z_c, zeta * omega % q, host=host)

    return PlonkProof(
        c_l=c_l, c_r=c_r, c_o=c_o, c_z=c_z,
        c_h1=c_h1, c_h2=c_h2, c_h3=c_h3,
        evals=evals, w_zeta=w_zeta,
        z_omega_zeta=zw_bar, w_zeta_omega=w_zw)


def _pi_at(public_inputs, x, n, omega, q):
    """PI(x) = sum_i x_i * L_i(x), barycentric (verify.go:91-110)."""
    zh = (pow(x, n, q) - 1) % q
    ninv = pow(n, -1, q)
    acc, w = 0, 1
    for v in public_inputs:
        if v % q:
            acc = (acc + v * zh % q * ninv % q * w % q
                   * pow((x - w) % q, -1, q)) % q
        w = w * omega % q
    return acc


# ---- verify -----------------------------------------------------------------------


def verify(proof: PlonkProof, vk: PlonkVK, public_inputs) -> bool:
    curve = vk.curve
    q = curve.fr.modulus
    n = vk.n
    if len(public_inputs) != vk.ell:
        raise ValueError(f"want {vk.ell} public inputs")
    public_inputs = [v % q for v in public_inputs]
    host1 = curve.host_g1

    # on-curve + prime-subgroup validation of every proof point (the
    # reference subgroup-checks at deserialization, bn254/marshal.go
    # SetBytes; groth16.verify here does the same — ADVICE r1 medium)
    for p in (proof.c_l, proof.c_r, proof.c_o, proof.c_z, proof.c_h1,
              proof.c_h2, proof.c_h3, proof.w_zeta, proof.w_zeta_omega):
        if p is not None and (
                not host1.is_on_curve(p)
                or host1.scalar_mul(p, q) is not None):
            return False

    nb_fp, nb_fr = _fp_bytes(curve), _fr_bytes(curve)
    fs = Transcript(*CHALLENGES)
    _bind_public_data(fs, vk, public_inputs)
    for c in (proof.c_l, proof.c_r, proof.c_o):
        fs.bind("gamma", _point_bytes(c, nb_fp))
    gamma = fs.challenge_int("gamma", q)
    beta = fs.challenge_int("beta", q)
    fs.bind("alpha", _point_bytes(proof.c_z, nb_fp))
    alpha = fs.challenge_int("alpha", q)
    for c in (proof.c_h1, proof.c_h2, proof.c_h3):
        fs.bind("zeta", _point_bytes(c, nb_fp))
    zeta = fs.challenge_int("zeta", q)

    r_bar, l_bar, rr_bar, o_bar, s1_bar, s2_bar = [v % q for v in proof.evals]
    zw_bar = proof.z_omega_zeta % q
    omega = vk.generator

    zh_zeta = (pow(zeta, n, q) - 1) % q
    if zh_zeta == 0:
        return False
    l1_zeta = zh_zeta * pow(n, -1, q) % q * pow((zeta - 1) % q, -1, q) % q
    pi_zeta = _pi_at(public_inputs, zeta, n, omega, q)

    # quotient identity at zeta (verify.go:117-153)
    if r_bar != (-pi_zeta + alpha * alpha % q * l1_zeta) % q:
        return False

    # rebuild [r] (verify.go:195-206)
    fz = (l_bar + beta * zeta + gamma) % q
    fz = fz * ((rr_bar + beta * vk.k1 * zeta + gamma) % q) % q
    fz = fz * ((o_bar + beta * vk.k2 * zeta + gamma) % q) % q
    gz_part = ((l_bar + beta * s1_bar + gamma)
               * (rr_bar + beta * s2_bar + gamma)) % q
    zeta_n2 = pow(zeta, n + 2, q)

    terms = [
        (vk.c_ql, l_bar),
        (vk.c_qr, rr_bar),
        (vk.c_qm, l_bar * rr_bar % q),
        (vk.c_qo, o_bar),
        (vk.c_qc, 1),
        (proof.c_z, (alpha * fz + alpha * alpha % q * l1_zeta) % q),
        (vk.c_s3, (-alpha * zw_bar % q) * gz_part % q * beta % q),
        (vk.g1_gen, (-alpha * zw_bar % q) * gz_part % q
         * ((o_bar + gamma) % q) % q),
        (proof.c_h1, (-zh_zeta) % q),
        (proof.c_h2, (-zh_zeta) * zeta_n2 % q),
        (proof.c_h3, (-zh_zeta) * zeta_n2 % q * zeta_n2 % q),
    ]
    c_r_lin = None
    for point, scalar in terms:
        if point is not None and scalar % q:
            c_r_lin = host1.add(c_r_lin, host1.scalar_mul(point, scalar % q))

    # fold the batch at zeta (FoldProof analog)
    for v in proof.evals + [zw_bar]:
        fs.bind("eta", int(v).to_bytes(nb_fr, "big"))
    eta = fs.challenge_int("eta", q)
    batch_cs = [c_r_lin, proof.c_l, proof.c_r, proof.c_o, vk.c_s1, vk.c_s2]
    folded_c, folded_v, e = None, 0, 1
    for C, v in zip(batch_cs, proof.evals):
        if C is not None:
            folded_c = host1.add(folded_c, host1.scalar_mul(C, e))
        folded_v = (folded_v + e * v) % q
        e = e * eta % q

    fs.bind("u", _point_bytes(proof.w_zeta, nb_fp))
    fs.bind("u", _point_bytes(proof.w_zeta_omega, nb_fp))
    u = fs.challenge_int("u", q)

    from gnark_tpu.backend.kzg import SRS, batch_verify_multi_points
    srs_view = SRS(curve=curve, g1=[vk.g1_gen], g2_gen=vk.g2_gen,
                   g2_tau=vk.g2_tau)
    return batch_verify_multi_points(
        srs_view,
        [folded_c, proof.c_z],
        [zeta, zeta * omega % q],
        [folded_v, zw_bar],
        [proof.w_zeta, proof.w_zeta_omega],
        u=u)
