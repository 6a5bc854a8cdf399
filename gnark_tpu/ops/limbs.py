"""Montgomery limb-plane field arithmetic on TPU (pure-XLA implementation).

Element batches are ``uint32[L, n]`` (16-bit limbs in uint32 lanes, LSB limb
first, Montgomery form).  All loops over L are static Python loops — XLA
unrolls and fuses them into wide VPU code; loops over n are vectorized.

Design notes (vs the reference's gnark-crypto Go/asm 64-bit Montgomery,
SURVEY §2.9):
  * 16-bit limb radix so a full 16x16 product fits exactly in a uint32 lane
    (TPUs have no 64-bit integer multiply).
  * mul = full schoolbook product into 2L+1 lazy columns (each column
    < 2^22, far below uint32 overflow) followed by a 16-step Montgomery
    REDC with immediate per-step carry folding.
  * all comparisons/selections are branchless (masks + where) so every
    function is jit/vmap/shard_map-safe.
"""

from __future__ import annotations

import contextlib
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from gnark_tpu.fields.spec import FieldSpec, MASK, W

_U32 = jnp.uint32
_MASK = np.uint32(MASK)

# Trace-time switch for the MXU REDC route (see FieldOps.__init__).
# Module-global (tracing is single-threaded); default from the env so
# whole runs can opt in without code changes.
_MXU_REDC_ON = bool(os.environ.get("GNARK_TPU_MXU_REDC"))


@contextlib.contextmanager
def mxu_redc(enabled: bool = True):
    """Route REDC const-multiplies through the MXU for ops traced inside
    this context (narrow fields only; no-op for wide fields)."""
    global _MXU_REDC_ON
    prev = _MXU_REDC_ON
    _MXU_REDC_ON = enabled
    try:
        yield
    finally:
        _MXU_REDC_ON = prev


def _propagate(limbs):
    """Carry-propagate a list/array of uint32 columns to canonical 16-bit limbs.

    Returns (canonical [L, n], carry_out [n]).
    """
    out = []
    carry = jnp.zeros_like(limbs[0])
    for i in range(len(limbs)):
        v = limbs[i] + carry
        out.append(v & _MASK)
        carry = v >> W
    return jnp.stack(out), carry


def _sub_borrow(a, b):
    """a - b over limb planes. Returns (diff [L, n] canonical, borrow [n] 0/1)."""
    L = a.shape[0]
    out = []
    borrow = jnp.zeros(a.shape[1:], dtype=jnp.int32)
    for i in range(L):
        d = a[i].astype(jnp.int32) - b[i].astype(jnp.int32) - borrow
        out.append((d & jnp.int32(MASK)).astype(_U32))
        borrow = (d < 0).astype(jnp.int32)
    return jnp.stack(out), borrow


def _sub_const_borrow(a, c_limbs):
    """a - const over limb planes, const given as python-int limbs.
    Scalar literals (no captured arrays) keep kernels Pallas-lowerable."""
    L = a.shape[0]
    out = []
    borrow = jnp.zeros(a.shape[1:], dtype=jnp.int32)
    for i in range(L):
        d = a[i].astype(jnp.int32) - jnp.int32(int(c_limbs[i])) - borrow
        out.append((d & jnp.int32(MASK)).astype(_U32))
        borrow = (d < 0).astype(jnp.int32)
    return jnp.stack(out), borrow


def _rsub_const_borrow(c_limbs, a):
    """const - a over limb planes (for negation)."""
    L = a.shape[0]
    out = []
    borrow = jnp.zeros(a.shape[1:], dtype=jnp.int32)
    for i in range(L):
        d = jnp.int32(int(c_limbs[i])) - a[i].astype(jnp.int32) - borrow
        out.append((d & jnp.int32(MASK)).astype(_U32))
        borrow = (d < 0).astype(jnp.int32)
    return jnp.stack(out), borrow


def _int_bytes(v: int, nbytes: int):
    return np.array([(v >> (8 * i)) & 0xFF for i in range(nbytes)],
                    np.float32)


def _const_for(c, ndim):
    """Reshape an [L] or [L, 1] numpy constant for broadcasting against
    an [L, ...] operand with ndim total dims."""
    c = np.asarray(c, np.uint32).reshape(-1)
    return jnp.asarray(c.reshape((c.shape[0],) + (1,) * (ndim - 1)))


class FieldOps:
    """Vectorized prime-field ops bound to a FieldSpec.

    Satisfies the generic "field ops" protocol used by ops/ec.py so the same
    curve kernels run over fp (G1) and fp2 (G2) — replacing the reference's
    6x generated per-curve backends (internal/generator/backend/main.go:17).
    """

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.L = spec.L
        # wide fields (BW6: 40-48 limbs): the fully-unrolled O(L^2)
        # schoolbook graph makes XLA compiles explode (measured 173s for
        # ONE L=48 mul vs 1.4s at L=16); roll the row loop into a
        # fori_loop so the graph is O(L).  GNARK_TPU_ROLLED_MUL=1 forces
        # the rolled variant at every width — used by the multichip
        # dryrun, whose XLA-CPU compiles of real-width (L=16) graphs on
        # a 1-core host are wall-clock bound by graph size (the
        # MULTICHIP_r04 timeout), not execution.
        self._big = spec.L >= 24 or bool(
            os.environ.get("GNARK_TPU_ROLLED_MUL"))
        self._p = np.asarray(spec.p_limbs, np.uint32)
        self._r2 = np.asarray(spec.r2_limbs, np.uint32)
        self._one = np.asarray(spec.one_mont, np.uint32)
        pinv = (-pow(spec.modulus, -1, 1 << (W * spec.L))) % (1 << (W * spec.L))
        self._pinv = np.array(
            [(pinv >> (W * i)) & MASK for i in range(spec.L)], np.uint32)[:, None]
        # python-int limb tuples: embedded as scalar literals in traced
        # code (required for Pallas kernels — no captured array constants)
        self._p_ints = tuple(int(v) for v in self._p.reshape(-1))
        self._pinv_ints = tuple(int(v) for v in self._pinv.reshape(-1))
        # MXU route for the REDC constant products (narrow fields): the
        # two const-multiplies m = t_low * p' mod R and m * p are
        # byte-radix convolutions with a CONSTANT operand, i.e. matmuls
        #   [2L, 2L] @ [2L, n]  and  [4L, 2L] @ [2L, n]
        # over the bytes of the variable input.  bf16 x bf16 -> f32 is
        # exact here: inputs < 2^8, products < 2^16, column sums
        # < 2L * 255^2 < 2^24 (f32 integer-exact range).  This moves
        # ~2/3 of the per-mul multiply work from the VPU to the MXU.
        # Gated at trace time by mxu_redc() / GNARK_TPU_MXU_REDC (the
        # route changes every mul in the traced graph, incl. inside
        # Pallas kernel bodies — callers opt in per phase).  Valid for
        # ALL widths: the exactness bound 2L * 255^2 < 2^24 holds
        # through L = 128, and the matmul graph is O(1) in L (a plus
        # for wide fields, whose unrolled const-mul graphs are the
        # compile-time pain point).
        self._mxu_capable = True
        if self._mxu_capable:
            L2 = 2 * spec.L
            # byte values kept as python-int tuples: the conv matrices
            # are built IN-TRACE from iota + scalar literals (Pallas
            # kernels reject closed-over array constants; outside
            # Pallas XLA constant-folds the construction)
            self._pinv_bytes = tuple(
                int(v) for v in _int_bytes(pinv, L2))
            self._p_bytes = tuple(
                int(v) for v in _int_bytes(spec.modulus, L2))
        # jit the hot entry points so eager use (tests, host-driven phases)
        # doesn't pay per-op dispatch; inside an enclosing jit these inline.
        # Ops that reach _redc are cached per MXU-flag value (the flag is
        # read at trace time, so it must be part of the executable key).
        self.add = jax.jit(self.add)
        self.sub = jax.jit(self.sub)
        self.neg = jax.jit(self.neg)
        self.mul = self._jit_flagged(self.mul)
        self.sqr = self._jit_flagged(self.sqr)
        self.inv = self._jit_flagged(self.inv)
        self.batch_inv = self._jit_flagged(self.batch_inv)
        self.to_mont = self._jit_flagged(self.to_mont)
        self.from_mont = self._jit_flagged(self.from_mont)

    def _mxu_on(self):
        return self._mxu_capable and _MXU_REDC_ON

    def _jit_flagged(self, fn):
        cache = {}

        def wrapper(*args):
            key = self._mxu_on()
            if key not in cache:
                cache[key] = jax.jit(fn)
            return cache[key](*args)

        return wrapper

    # -- constructors ------------------------------------------------------

    def zeros(self, n):
        shape = (n,) if isinstance(n, int) else tuple(n)
        return jnp.zeros((self.L,) + shape, _U32)

    def ones(self, n):
        shape = (n,) if isinstance(n, int) else tuple(n)
        # scalar-literal construction (Pallas-safe: no hoisted array consts)
        return jnp.stack([jnp.full(shape, int(v), _U32)
                          for v in self._one.reshape(-1)])

    def ones_like(self, a):
        return jnp.stack([jnp.full(a.shape[1:], int(v), _U32)
                          for v in self._one.reshape(-1)])

    def const(self, value: int, n: int = 1):
        return jnp.broadcast_to(
            jnp.asarray(self.spec.to_limbs([value])), (self.L, n))

    def pack(self, ints):
        """Host ints -> device Montgomery limb planes."""
        return jnp.asarray(self.spec.to_limbs(list(ints)))

    def unpack(self, arr):
        """Device Montgomery limb planes -> host ints."""
        return self.spec.from_limbs(np.asarray(jax.device_get(arr)))

    # -- ring ops ------------------------------------------------------------

    def _cond_sub_p(self, x):
        """x - p if x >= p else x (x < 2p assumed; branchless)."""
        diff, borrow = _sub_const_borrow(x, self._p_ints)
        return jnp.where((borrow == 0)[None], diff, x)

    def _add_p(self, d):
        out = []
        carry = jnp.zeros(d.shape[1:], _U32)
        for i in range(self.L):
            v = d[i] + jnp.uint32(self._p_ints[i]) + carry
            out.append(v & _MASK)
            carry = v >> W
        return jnp.stack(out)

    def add(self, a, b):
        s, _ = _propagate(a + b)  # inputs < p < 2^(16L) so no carry out
        return self._cond_sub_p(s)

    def sub(self, a, b):
        a, b = jnp.broadcast_arrays(a, b)
        d, borrow = _sub_borrow(a, b)
        dp = self._add_p(d)
        return jnp.where((borrow == 0)[None], d, dp)

    def neg(self, a):
        d, _ = _rsub_const_borrow(self._p_ints, a)
        # -0 must stay 0
        return jnp.where(self.is_zero(a)[None], a, d)

    def double(self, a):
        return self.add(a, a)

    def mul_small(self, a, k: int):
        """a * k for a small plain python int 0 <= k < 2^12, WITHOUT
        Montgomery machinery: per-limb product + carry propagation +
        a log2(k) cascade of conditional subtractions of 2^j * p.

        A Montgomery-form input stays Montgomery form (k is a plain
        integer, not R-scaled), so this implements const-muls by small
        field constants — notably the RCB b3 = 3b multiplies (b3 = 9 /
        12 / 3 / 15 on the supported curves) at ~L mults instead of a
        full L^2-product const-mul + REDC.  Scalar literals only
        (Pallas-safe).  Input must be canonical (< p).
        """
        if k == 0:
            return jnp.zeros_like(a)
        if k == 1:
            return a
        assert 2 <= k < (1 << 12)
        L = self.L
        # per-limb product (< 2^28) then carry-propagate; the carry out
        # of the top limb needs one extra plane (result < k*p < 2^12 R)
        out = []
        carry = jnp.zeros(a.shape[1:], _U32)
        for i in range(L):
            v = a[i] * jnp.uint32(k) + carry
            out.append(v & _MASK)
            carry = v >> W
        r = jnp.stack(out + [carry])                  # [L+1, ...]
        # conditional subtraction cascade: r < k*p; subtract 2^j p for
        # j = floor(log2(k))..0 (each halves the residual bound)
        p = self.spec.modulus
        for j in range(k.bit_length() - 1, -1, -1):
            mp = (p << j)
            mp_limbs = tuple((mp >> (16 * i)) & 0xFFFF for i in range(L + 1))
            diff, borrow = _sub_const_borrow(r, mp_limbs)
            r = jnp.where((borrow == 0)[None], diff, r)
        return r[:L]

    def _mul_wide(self, a, b):
        """Full product columns [2L+1, ...] (lazy, each < 2^22) of
        canonical inputs.

        Unrolled shifted accumulation: for each limb i of `a`, the row
        product a_i * b contributes to columns [i, i+L) (lo parts) and
        [i+1, i+L+1) (hi parts).  Static pads + adds only — every op is
        elementwise, so XLA fuses the entire multiply into surrounding
        kernels without materializing an [L, L, n] intermediate (the
        HBM-traffic killer of outer-product formulations)."""
        L = self.L
        tail_pad = ((0, 0),) * (b.ndim - 1)
        cols = None
        for i in range(L):
            prod = a[i][None] * b          # [L, ...] exact 32-bit products
            lo = jnp.pad(prod & _MASK, ((i, L + 1 - i),) + tail_pad)
            hi = jnp.pad(prod >> W, ((i + 1, L - i),) + tail_pad)
            contrib = lo + hi
            cols = contrib if cols is None else cols + contrib
        return cols

    def _mul_wide_const(self, a, c_ints):
        """Product columns of a limb-plane batch with a constant given as
        python-int limbs (scalar literals — Pallas-safe, smaller graphs)."""
        L = self.L
        tail_pad = ((0, 0),) * (a.ndim - 1)
        cols = None
        for i in range(L):
            ci = int(c_ints[i])
            if ci == 0:
                continue
            prod = a * jnp.uint32(ci)
            lo = jnp.pad(prod & _MASK, ((i, L + 1 - i),) + tail_pad)
            hi = jnp.pad(prod >> W, ((i + 1, L - i),) + tail_pad)
            contrib = lo + hi
            cols = contrib if cols is None else cols + contrib
        if cols is None:                       # constant is 0
            cols = jnp.zeros((2 * L + 1,) + a.shape[1:], _U32)
        return cols

    def _mul_wide_const_low(self, a, c_ints):
        """LOW-L product columns of a * const (truncated triangle): only
        limb products with i + j < L contribute to columns [0, L) — the
        m = t_low * p' (mod R) step of REDC needs nothing above, so this
        skips ~half the products of the full const-mul."""
        L = self.L
        tail_pad = ((0, 0),) * (a.ndim - 1)
        cols = None
        for i in range(L):
            ci = int(c_ints[i])
            if ci == 0:
                continue
            hi_rows = L - 1 - i                 # rows j with i + j + 1 <= L-1
            prod = a[:L - i] * jnp.uint32(ci)   # rows j with i + j <= L-1
            lo = jnp.pad(prod & _MASK, ((i, 0),) + tail_pad)
            contrib = lo
            if hi_rows > 0:
                hi = jnp.pad(prod[:hi_rows] >> W, ((i + 1, 0),) + tail_pad)
                contrib = contrib + hi
            cols = contrib if cols is None else cols + contrib
        if cols is None:
            cols = jnp.zeros((L,) + a.shape[1:], _U32)
        return cols

    def _mul_wide_scan(self, a, b):
        """Rolled-loop variant of _mul_wide for wide fields: fori_loop
        over the L rows with dynamic-slice accumulation — O(L) graph,
        same lazy-column invariants (columns < 2*L*2^16 < 2^32)."""
        L = self.L
        shape = a.shape[1:]
        zero_row = jnp.zeros((1,) + shape, _U32)
        acc0 = jnp.zeros((2 * L + 1,) + shape, _U32)

        def body(i, acc):
            ai = jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False)
            prod = ai[None] * b                       # [L, ...]
            lo = prod & _MASK
            hi = prod >> W
            contrib = (jnp.concatenate([lo, zero_row], axis=0)
                       + jnp.concatenate([zero_row, hi], axis=0))
            seg = jax.lax.dynamic_slice_in_dim(acc, i, L + 1, axis=0)
            return jax.lax.dynamic_update_slice_in_dim(
                acc, seg + contrib, i, axis=0)

        return jax.lax.fori_loop(0, L, body, acc0)

    def _mul_wide_const_scan(self, a, c_ints):
        L = self.L
        shape = a.shape[1:]
        c_arr = jnp.asarray(np.array([int(v) for v in c_ints], np.uint32))
        zero_row = jnp.zeros((1,) + shape, _U32)
        acc0 = jnp.zeros((2 * L + 1,) + shape, _U32)

        def body(i, acc):
            ci = jax.lax.dynamic_index_in_dim(c_arr, i, 0, keepdims=False)
            prod = a * ci
            lo = prod & _MASK
            hi = prod >> W
            contrib = (jnp.concatenate([lo, zero_row], axis=0)
                       + jnp.concatenate([zero_row, hi], axis=0))
            seg = jax.lax.dynamic_slice_in_dim(acc, i, L + 1, axis=0)
            return jax.lax.dynamic_update_slice_in_dim(
                acc, seg + contrib, i, axis=0)

        return jax.lax.fori_loop(0, L, body, acc0)

    def _to_bytes(self, x):
        """[L, ...] canonical 16-bit limbs -> [2L, ...] byte planes."""
        lo = x & jnp.uint32(0xFF)
        hi = (x >> jnp.uint32(8)) & jnp.uint32(0xFF)
        # interleave: out[2i] = lo[i], out[2i+1] = hi[i]
        return jnp.stack([lo, hi], axis=1).reshape(
            (2 * x.shape[0],) + x.shape[1:])

    @staticmethod
    def _conv_mat_split(byte_vals, K):
        """[K, len(byte_vals)] bf16 byte-conv (Toeplitz) matrix with the
        EVEN output taps in rows [0, K/2) and the ODD taps in rows
        [K/2, K): mat[j, i] = byte_vals[2j - i] for j < K/2 and
        byte_vals[2(j - K/2) + 1 - i] above.  The halves make the
        byte->16-bit fold two contiguous row slices of one matmul (a
        strided slice of the result has no Mosaic lowering inside
        Pallas kernels).  Built from iota + scalar literals only (no
        captured array constants — Pallas-kernel safe; XLA constant-
        folds the construction outside Pallas)."""
        L2 = len(byte_vals)
        H = K // 2
        row = jax.lax.broadcasted_iota(jnp.int32, (K, L2), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (K, L2), 1)
        tap = jnp.where(row < H, 2 * row, 2 * (row - H) + 1)
        d = tap - col
        mat = jnp.zeros((K, L2), jnp.bfloat16)
        for k, v in enumerate(byte_vals):
            if v:
                mat = jnp.where(d == k, jnp.bfloat16(v), mat)
        return mat

    def _mxu_const_mul_folded(self, x_bytes, byte_vals, K):
        """Byte-conv product with a constant via MXU matmul, folded to
        16-bit-radix lazy columns.

        x_bytes: [2L, ...] u32 byte planes (< 2^8); byte_vals: python
        ints of the constant's 2L bytes; K: number of byte taps (even).
        Returns [K/2, ...] u32 lazy 16-bit-radix columns
        (< 257 * 2L * 255^2 < 2^32, exact: the dot accumulates in f32
        below 2^24 and the <<8 fold happens in uint32).

        Rank-N dot_general (contract x_bytes dim 0, keep the batch dims
        free) — no reshape, which keeps the op Mosaic-friendly inside
        Pallas kernels."""
        mat = self._conv_mat_split(byte_vals, K)
        # Mosaic has no direct u32<->bf16/f32 casts: hop through int32
        # (values < 2^8 and < 2^24 respectively, so every hop is exact)
        xb = x_bytes.astype(jnp.int32).astype(jnp.float32).astype(
            jnp.bfloat16)
        out = jax.lax.dot_general(
            mat, xb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out = out.astype(jnp.int32).astype(jnp.uint32)
        H = K // 2
        return out[:H] + (out[H:] << jnp.uint32(8))

    def _mul_wide_const_mxu(self, a, c_bytes):
        """MXU variant of _mul_wide_const: byte-conv matmul with the
        constant's 2L bytes, folded back to 2L 16-bit-radix lazy
        columns (< 2^32 — the same lazy invariant _redc consumes).
        c_bytes: python-int tuple of the constant's 2L bytes."""
        return self._mxu_const_mul_folded(
            self._to_bytes(a), c_bytes, 4 * self.L)

    def _redc_mxu(self, t):
        """REDC with the two const-multiplies on the MXU (see __init__)."""
        L = self.L
        L2 = 2 * L
        t_low, c_low = _propagate(t[:L])
        # m_pinv is the L2-tap (mod R) truncation; m_p the full 2*L2
        m, _ = _propagate(self._mxu_const_mul_folded(
            self._to_bytes(t_low), self._pinv_bytes, L2))  # m mod R
        mp = self._mxu_const_mul_folded(
            self._to_bytes(m), self._p_bytes, 2 * L2)
        # mp columns are lazy (< 2^30): same invariants as _redc below
        _, carry = _propagate(t_low + mp[:L])
        high = t[L:2 * L] + mp[L:2 * L]
        high = jnp.concatenate(
            [(high[0] + c_low + carry)[None], high[1:]], axis=0)
        res, _ = _propagate(high[:L])
        return self._cond_sub_p(res)

    def _redc(self, t):
        """Wide product columns -> canonical Montgomery-reduced value."""
        if self._mxu_on():
            return self._redc_mxu(t)
        L = self.L
        big = self._big
        t_low, c_low = _propagate(t[:L])               # canonical t mod R
        m = (self._mul_wide_const_scan(t_low, self._pinv_ints)[:L] if big
             else self._mul_wide_const_low(t_low, self._pinv_ints))
        m, _ = _propagate(m)                           # m mod R, canonical
        mp = (self._mul_wide_const_scan(m, self._p_ints) if big
              else self._mul_wide_const(m, self._p_ints))

        # u = (t + m*p)/R: low L columns of t+m*p are ≡ 0 mod R by
        # construction; all we need from them is their carry-out.
        _, carry = _propagate(t_low + mp[:L])
        high = t[L:2 * L] + mp[L:2 * L]
        # (concatenate, not .at[].add: scatter has no Pallas TPU lowering)
        high = jnp.concatenate(
            [(high[0] + c_low + carry)[None], high[1:]], axis=0)
        res, _ = _propagate(high[:L])
        # t + m*p < p^2 + R*p => u < 2p < R: top column provably empty.
        return self._cond_sub_p(res)

    def mul(self, a, b):
        """Montgomery product aR * bR -> abR mod p (separated REDC).

        t = a*b; m = (t mod R) * (-p^{-1} mod R) mod R; u = (t + m*p) / R.
        u < 2p for canonical inputs, one conditional subtract finishes.
        """
        a, b = jnp.broadcast_arrays(a, b)
        t = self._mul_wide_scan(a, b) if self._big else self._mul_wide(a, b)
        return self._redc(t)

    def _sqr_wide(self, a):
        """Symmetric schoolbook squaring: L(L+1)/2 limb products instead
        of L^2 (off-diagonal terms doubled after the lo/hi split, keeping
        every column below the 2^22 lazy bound)."""
        L = self.L
        tail_pad = ((0, 0),) * (a.ndim - 1)
        cols = None
        two = jnp.uint32(2)
        for i in range(L):
            prod = a[i][None] * a[i:]                  # rows j = i..L-1
            lo = prod & _MASK
            hi = prod >> W
            # double all off-diagonal rows (j > i); guard the final
            # single-row (diagonal-only) block: empty slices make Mosaic
            # reject 0-sized vectors
            if prod.shape[0] > 1:
                lo = jnp.concatenate([lo[:1], lo[1:] * two], axis=0)
                hi = jnp.concatenate([hi[:1], hi[1:] * two], axis=0)
            # row block occupies columns [2i, i+L) (lo), [2i+1, i+L+1) (hi)
            lo = jnp.pad(lo, ((2 * i, L + 1 - i),) + tail_pad)
            hi = jnp.pad(hi, ((2 * i + 1, L - i),) + tail_pad)
            contrib = lo + hi
            cols = contrib if cols is None else cols + contrib
        return cols

    def sqr(self, a):
        if self._big:
            return self.mul(a, a)
        return self._redc(self._sqr_wide(a))

    # -- predicates ----------------------------------------------------------

    def is_zero(self, a):
        return jnp.all(a == 0, axis=0)

    def eq(self, a, b):
        return jnp.all(a == b, axis=0)

    def select(self, mask, a, b):
        """mask [...] ? a : b  (elementwise over the batch axes)."""
        return jnp.where(jnp.asarray(mask)[None], a, b)

    # -- inversion / exponentiation -------------------------------------------

    def exp_const(self, a, e: int):
        """a^e for a fixed python-int exponent.

        Square-and-multiply driven by a lax.scan over the exponent bits so the
        compiled graph stays one butterfly-body deep regardless of |e|.
        """
        if e == 0:
            return self.ones_like(a)
        nbits = e.bit_length()
        bits = np.array([(e >> i) & 1 for i in range(nbits)], np.uint32)

        def body(carry, bit):
            result, base = carry
            result = jnp.where(bit > 0, self.mul(result, base), result)
            base = self.sqr(base)
            return (result, base), None

        (result, _), _ = jax.lax.scan(body, (self.ones_like(a), a), bits)
        return result

    def inv(self, a):
        """a^{-1} via Fermat (a^{p-2}); 0 maps to 0 (matching gnark fr.Inverse)."""
        return self.exp_const(a, self.spec.modulus - 2)

    def batch_inv(self, a):
        """Montgomery-trick batch inversion along the batch axis.

        O(1) inversions + O(n) muls (reference: fr.BatchInvert, used at
        internal/backend/bn254/cs/r1cs_sparse.go:107).  Zeros map to zero.
        """
        n = a.shape[1]
        zero_mask = self.is_zero(a)
        a_safe = jnp.where(zero_mask[None, :], self.ones(n), a)
        # inclusive prefix products (log-depth scan, work-efficient)
        prefix = jax.lax.associative_scan(self.mul, a_safe, axis=1)
        total_inv = self.inv(prefix[:, -1:])
        # backward pass: inv_i = prefix_{i-1} * suffix_inv_i
        # suffix_inv via reverse scan of inverses is cheaper as sequential
        # formulation: compute with a reversed associative scan on a_safe.
        rev = jnp.flip(a_safe, axis=1)
        suffix = jnp.flip(jax.lax.associative_scan(self.mul, rev, axis=1), axis=1)
        # inv_i = (prefix_{i-1}) * (suffix_{i+1}) * total_inv
        ones = self.ones(1)
        prefix_excl = jnp.concatenate([ones, prefix[:, :-1]], axis=1)
        suffix_excl = jnp.concatenate([suffix[:, 1:], ones], axis=1)
        out = self.mul(self.mul(prefix_excl, suffix_excl), total_inv)
        return jnp.where(zero_mask[None, :], jnp.zeros_like(a), out)

    # -- Montgomery form conversion -------------------------------------------

    def to_mont(self, a_regular):
        return self.mul(a_regular, jnp.asarray(self._r2))

    def from_mont(self, a_mont):
        one = jnp.zeros_like(a_mont).at[0].set(1)
        return self.mul(a_mont, one)


@functools.lru_cache(maxsize=None)
def field_ops(spec: FieldSpec) -> FieldOps:
    return FieldOps(spec)
