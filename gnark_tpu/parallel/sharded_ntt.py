"""Mesh-sharded NTT: Bailey four-step with all-to-all transposes.

The P6 strategy of SURVEY §2.8: the reference threads butterflies inside
one address space (gnark-crypto fft.Domain); on TPU the polynomial axis
is sharded over the mesh and the cross-chip butterfly super-stage
becomes data movement over ICI (`jax.lax.all_to_all`), the classic
distributed-NTT transpose.

Decomposition (n = A * B, A = number of devices, x row-major [A, B],
row a on device a):

    X[k1 + A*k2] = FFT_B over b of ( w_n^(k1*b) * FFT_A over a of x[a,b] )

  1. all_to_all: re-shard so each device holds all A rows for B/A cols
  2. local size-A column DFT (A = mesh size, tiny) + twiddle w_n^(k1*b)
  3. all_to_all back: device k1 holds row k1
  4. local size-B NTT along the row

Input x[a, b] = coeffs[a*B + b] (row-sharded, natural order); output
row k1 on device k1 holds X[k1 + A*k2] for all k2 — the strided layout;
`interleave()`/`deinterleave()` convert to/from natural order on host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from gnark_tpu.fields.spec import FieldSpec
from gnark_tpu.ops.limbs import field_ops
from gnark_tpu.ops.ntt import Domain, bit_reverse_perm


class ShardedDomain:
    """Forward/inverse NTT of size n over a mesh axis (natural order in,
    strided order out; see module docstring)."""

    def __init__(self, spec: FieldSpec, n: int, mesh: Mesh, axis: str):
        self.spec = spec
        self.n = n
        self.mesh = mesh
        self.axis = axis
        self.A = mesh.shape[axis]
        assert n % self.A == 0 and (n & (n - 1)) == 0
        assert (n // self.A) % self.A == 0, "4-step NTT needs n >= A^2"
        self.B = n // self.A
        self.F = field_ops(spec)
        self.local_domain = Domain(spec, self.B)
        # build twiddle tables eagerly: lazy construction inside the traced
        # shard_map kernel would leak tracers into the Domain table cache
        self.local_domain.table("tw")
        self.local_domain.table("itw")
        q = spec.modulus
        omega_n = spec.root_of_unity(n)
        self.omega_n = omega_n
        self.omega_n_inv = pow(omega_n, -1, q)
        # w_A = omega_n^B: primitive A-th root for the column DFT
        self._fwd = jax.jit(shard_map(
            self._make_kernel(inverse=False), mesh=mesh,
            in_specs=(P(None, axis),), out_specs=P(None, axis),
            check_rep=False))
        self._inv = jax.jit(shard_map(
            self._make_kernel(inverse=True), mesh=mesh,
            in_specs=(P(None, axis),), out_specs=P(None, axis),
            check_rep=False))

    # ---- twiddle tables (host-computed numpy, constants in the jaxpr) ----

    def _col_dft_mat(self, inverse):
        """[A, A] matrix of w_A^(jk) as Montgomery limb planes [A, A, L]."""
        q = self.spec.modulus
        w = pow(self.omega_n, self.B, q)
        if inverse:
            w = pow(w, -1, q)
        vals = [[pow(w, j * k, q) for k in range(self.A)]
                for j in range(self.A)]
        flat = self.spec.to_limbs([v for row in vals for v in row])
        return jnp.asarray(flat.reshape(self.spec.L, self.A, self.A))

    def _twiddle_block(self, inverse):
        """w_n^(k1*b) for all k1 in [A], b in [B]: [A, L, B] planes."""
        q = self.spec.modulus
        w = self.omega_n_inv if inverse else self.omega_n
        rows = []
        for k1 in range(self.A):
            base = pow(w, k1, q)
            vals, t = [], 1
            for _ in range(self.B):
                vals.append(t)
                t = t * base % q
            rows.append(self.spec.to_limbs(vals))
        return jnp.asarray(np.stack(rows))  # [A, L, B]

    def _make_kernel(self, inverse):
        F, A, B = self.F, self.A, self.B
        L = self.spec.L
        dft = self._col_dft_mat(inverse)        # [L, A, A]
        tw = self._twiddle_block(inverse)       # [A, L, B]
        dom = self.local_domain
        axis = self.axis
        q = self.spec.modulus
        # local ifft already scales by 1/B; the remaining factor is 1/A
        ainv = F.pack([pow(A, -1, q)]) if inverse else None
        brev_B = jnp.asarray(bit_reverse_perm(B).astype(np.int32))

        def kernel(x):  # x: [L, B] = row `a` of the matrix
            d = jax.lax.axis_index(axis)
            # 1) re-shard: split cols into A chunks, all_to_all so this
            # device ends with all A rows of its col chunk: [L, A, B/A]
            xs = x.reshape(L, A, B // A)
            xs = jax.lax.all_to_all(xs, axis, split_axis=1, concat_axis=1)
            # now xs[:, a, j] = row a, col (d*B/A + j)
            # 2) column DFT of size A: out[k1] = sum_a w_A^(k1 a) x[a]
            outs = []
            for k1 in range(A):
                acc = F.mul(xs[:, 0], dft[:, k1, 0][:, None])
                for a in range(1, A):
                    acc = F.add(acc, F.mul(xs[:, a], dft[:, k1, a][:, None]))
                outs.append(acc)
            ys = jnp.stack(outs, axis=1)        # [L, A, B/A] indexed [k1]
            # twiddle w_n^(k1 * b), b = d*(B/A) + j
            tw_loc = jax.lax.dynamic_slice_in_dim(
                tw, d * (B // A), B // A, axis=2)  # [A, L, B/A]
            ys = F.mul(ys, jnp.moveaxis(tw_loc, 0, 1))
            # 3) all_to_all back: device k1 gets its row: [L, A, B/A] ->
            ys = jax.lax.all_to_all(ys, axis, split_axis=1, concat_axis=1)
            # now ys[:, c, j] = col chunk c, this device's k1: row [L, B]
            row = ys.reshape(L, B)
            # 4) local size-B NTT (natural in -> natural out)
            if inverse:
                row = dom.ifft(jnp.take(row, brev_B, axis=1), "DIT")
                row = F.mul(row, ainv)
            else:
                row = dom.fft(jnp.take(row, brev_B, axis=1), "DIT")
            return row

        return kernel

    def fft(self, x):
        """x: [L, n] natural-order coeffs, row-sharded -> strided evals
        (device k1 row holds X[k1 + A*k2])."""
        return self._fwd(x)

    def ifft(self, x):
        return self._inv(x)

    # ---- strided-input forward transform (the mirror four-step) -----------

    def _make_kernel_strided(self):
        """Strided coeffs (device k1 holds c[k1 + A*k2]) -> natural-order
        evals (device d holds E[d*B .. (d+1)*B)).  The mirror of
        _make_kernel: local size-B NTT FIRST, then transpose, twiddle +
        size-A column DFT, transpose back.

          E[d*B + t] = sum_k1 w^(k1*(d*B+t)) * NTT_B(row k1)[t]
        """
        F, A, B = self.F, self.A, self.B
        L = self.spec.L
        q = self.spec.modulus
        dom = self.local_domain
        axis = self.axis
        brev_B = jnp.asarray(bit_reverse_perm(B).astype(np.int32))
        # dft_out[d, k1] = (w^B)^(k1*d) — same matrix as _col_dft_mat fwd
        dft = self._col_dft_mat(inverse=False)      # [L, A, A]
        # twiddle w^(k1*t), t in [0, B): [A, L, B]
        tw = self._twiddle_block(inverse=False)

        def kernel(u):  # u: [L, B] strided row k1 = this device
            # 1) local size-B NTT with root w^A (natural in/out)
            S = dom.fft(jnp.take(u, brev_B, axis=1), "DIT")   # [L, B]
            # 2) transpose: device c receives S_k1[t] for its t-chunk
            Ss = S.reshape(L, A, B // A)
            Ss = jax.lax.all_to_all(Ss, axis, split_axis=1, concat_axis=1)
            d = jax.lax.axis_index(axis)
            # 3) twiddle by w^(k1 * t), t = d*(B/A) + j
            tw_loc = jax.lax.dynamic_slice_in_dim(
                tw, d * (B // A), B // A, axis=2)             # [A, L, B/A]
            Ss = F.mul(Ss, jnp.moveaxis(tw_loc, 0, 1))
            # column DFT over k1: E_part[dd] = sum_k1 w_A^(k1*dd) Ss[k1]
            outs = []
            for dd in range(A):
                acc = F.mul(Ss[:, 0], dft[:, dd, 0][:, None])
                for k1 in range(1, A):
                    acc = F.add(acc, F.mul(Ss[:, k1], dft[:, dd, k1][:, None]))
                outs.append(acc)
            Es = jnp.stack(outs, axis=1)                      # [L, A, B/A]
            # 4) transpose back: device dd collects its t-chunks
            Es = jax.lax.all_to_all(Es, axis, split_axis=1, concat_axis=1)
            return Es.reshape(L, B)

        return kernel

    def fft_from_strided(self, x):
        if not hasattr(self, "_fwd_strided"):
            self._fwd_strided = jax.jit(shard_map(
                self._make_kernel_strided(), mesh=self.mesh,
                in_specs=(P(None, self.axis),), out_specs=P(None, self.axis),
                check_rep=False))
        return self._fwd_strided(x)

    # ---- sharded Groth16 quotient (computeH, prove.go:275) -----------------

    def coset_scale_strided(self, inverse=False):
        """g^j (or g^-j) in STRIDED layout as a device constant [L, n]
        (Montgomery form), for scaling coefficients that live in the
        strided order the ifft produces."""
        q = self.spec.modulus
        g = self.spec.multiplicative_generator % q
        if inverse:
            g = pow(g, -1, q)
        vals, t = [], 1
        for _ in range(self.n):
            vals.append(t)
            t = t * g % q
        nat = np.asarray(self.spec.to_limbs(vals))
        return jnp.asarray(self.interleave(nat))

    def compute_h(self, a, b, c):
        """Sharded quotient h = (A*B - C)/Z_H on the coset.

        a/b/c: [L, n] Montgomery evals on H, natural order, sharded over
        the mesh axis.  Returns h coefficients in STRIDED order (the
        caller permutes to whatever order its Z key points use).  Both
        all_to_all stages of each four-step transform ride the mesh —
        SURVEY §2.8 P6.
        """
        q = self.spec.modulus
        F = self.F
        g = self.spec.multiplicative_generator % q
        den = pow(pow(g, self.n, q) - 1, -1, q)
        den_pl = F.pack([den])
        gs = self.coset_scale_strided()
        gs_inv = self.coset_scale_strided(inverse=True)

        def coset_evals(x):
            return self.fft_from_strided(F.mul(self.ifft(x), gs))

        ae, be, ce = coset_evals(a), coset_evals(b), coset_evals(c)
        he = F.mul(F.sub(F.mul(ae, be), ce), den_pl)
        return F.mul(self.ifft(he), gs_inv)

    def strided_to_brev_perm(self) -> np.ndarray:
        """Permutation taking the strided layout to bit-reversed order:
        out[i] = strided_index_of(brev(i))."""
        n, A, B = self.n, self.A, self.B
        brev = bit_reverse_perm(n)
        # natural index j lives at strided position (j % A) * B + j // A
        pos = (brev % A) * B + brev // A
        return pos.astype(np.int32)

    # ---- host order conversion helpers ------------------------------------

    def deinterleave(self, X_strided: np.ndarray) -> np.ndarray:
        """[L, n] strided output rows -> natural order (host numpy)."""
        L = X_strided.shape[0]
        m = X_strided.reshape(L, self.A, self.B)
        return np.ascontiguousarray(
            np.moveaxis(m, 1, 2).reshape(L, self.n))

    def interleave(self, X_natural: np.ndarray) -> np.ndarray:
        L = X_natural.shape[0]
        m = X_natural.reshape(L, self.B, self.A)
        return np.ascontiguousarray(
            np.moveaxis(m, 2, 1).reshape(L, self.n))
