"""Multi-scalar multiplication (Pippenger) as a scatter-free TPU program.

THE prover hot loop (reference: gnark-crypto G1Jac.MultiExp called from
internal/backend/bn254/groth16/prove.go:160-241 with 4 concurrent MSMs).
The reference's bucket method scatter-accumulates into per-task buckets —
fast on CPUs, hostile to TPUs (no fast random scatter).  This kernel
reformulates bucket accumulation as *sorted prefix sums*:

  per window w (c-bit digits):
    1. digits = bits [cw, cw+c) of each scalar; points at infinity get
       digit 0 (bucket 0 is never used, so they vanish).
    2. argsort by digit; gather points into sorted order.
    3. within-lane prefix: reshape sorted points [R lanes, C = n/R];
       lax.scan over C does R-wide mixed-adds -> running prefix per lane.
       (work: n mixed adds, sequential depth C, fully vectorized.)
    4. lane offsets: Hillis-Steele inclusive scan over the R lane totals
       (log2(R) roll+add steps, one compiled body via lax.scan over the
       shift schedule).
    5. bucket sums by difference of prefixes at segment boundaries:
       bucket_b = prefix(end_b) - prefix(start_b - 1), boundaries from
       jnp.searchsorted on the sorted digits.  EC negation is free, so
       "difference" is one add of a negated point.
    6. S_w = sum_b b * bucket_b via a reverse (suffix) roll-scan plus a
       forward roll-scan: Sum_b b*B_b = Sum_b suffix_b.
  fold: Horner over windows, c doublings + 1 add per window (lax.scan).

Multi-chip: points/scalars shard over the mesh batch axis; each chip
computes its partial MSM and partials are tree-reduced with EC adds
(see parallel/sharded_msm.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gnark_tpu.ops.ec import CurveOps

# CPU-executability switch for the Pallas kernels: interpret mode runs
# kernel bodies as plain XLA ops, letting the full windowed pipeline be
# driven (slowly) on a CPU backend for correctness work when no TPU is
# attached.  Not a performance path.
import os as _os
_INTERPRET = bool(_os.environ.get("GNARK_TPU_PALLAS_INTERPRET"))


def window_digits(scalars, c: int, nwin: int | None = None):
    """uint32[Ls, n] regular-form scalars -> int32[nwin, n] window digits."""
    Ls, n = scalars.shape[0], scalars.shape[1:]
    total_bits = Ls * 16
    if nwin is None:
        nwin = -(-total_bits // c)
    pad_limbs = -(-(nwin * c) // 16) + 1 - Ls
    padded = jnp.concatenate(
        [scalars, jnp.zeros((max(1, pad_limbs),) + n, jnp.uint32)], axis=0)
    mask = np.uint32((1 << c) - 1)
    outs = []
    for w in range(nwin):
        q, sh = divmod(c * w, 16)
        d = padded[q] >> np.uint32(sh)
        if sh:
            d = d | (padded[q + 1] << np.uint32(16 - sh))
        outs.append(d & mask)
    return jnp.stack(outs).astype(jnp.int32)


def window_digits_signed(scalars, c: int):
    """Signed-digit recoding: scalar = sum_w d_w 2^(cw) with
    d_w in (-2^(c-1), 2^(c-1)].

    Buckets index |d| in [1, 2^(c-1)] — HALF the buckets of an unsigned
    c-bit window (the negative half is absorbed by free EC negation at
    the leaf), so c can grow by one at the same bucket-kernel cost and
    the window count drops (BN254: 29 signed c=9 windows vs 32 unsigned
    c=8).  Standard wNAF-family recoding; carries ripple across windows
    (vectorized over the point axis, the window loop unrolls in-trace).

    Returns (absd int32[nwin, n], sign uint32[nwin, n]); nwin includes
    one slack bit so the final carry can never be dropped.
    """
    Ls = scalars.shape[0]
    total_bits = Ls * 16
    nwin = -(-(total_bits + 1) // c)
    u = window_digits(scalars, c, nwin)           # unsigned base digits
    half, full = 1 << (c - 1), 1 << c
    carry = jnp.zeros(scalars.shape[1:], jnp.int32)
    absd, signs = [], []
    for w in range(nwin):
        t = u[w] + carry
        neg = t > half
        absd.append(jnp.where(neg, full - t, t))
        signs.append(neg.astype(jnp.uint32))
        carry = neg.astype(jnp.int32)
    return jnp.stack(absd), jnp.stack(signs)


def _roll_scan(G: CurveOps, P, n: int, reverse: bool = False):
    """Inclusive prefix (or suffix) scan of a point batch with EC add.

    Hillis-Steele with jnp.roll: one compiled add per lax.scan step,
    log2(n) steps.  Identity (infinity) is injected by zeroing Z on
    rolled-in lanes, which the unified add treats as the identity.
    """
    steps = max(1, (n - 1).bit_length())
    shifts = jnp.asarray([1 << i for i in range(steps)], jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)

    def body(P, shift):
        X, Y, Z = P
        r = -shift if reverse else shift
        Q = (jnp.roll(X, r, axis=-1), jnp.roll(Y, r, axis=-1),
             jnp.roll(Z, r, axis=-1))
        valid = (idx >= shift) if not reverse else (idx < n - shift)
        Q = (Q[0], Q[1], jnp.where(valid, Q[2], 0))  # broadcasts on last axis
        return G.add(P, Q), None

    P, _ = jax.lax.scan(body, P, shifts)
    return P


def _reduce(G: CurveOps, P, n: int):
    """Sum over the LAST axis of a point batch (prefix scan, take end)."""
    P = _roll_scan(G, P, n)
    return tuple(a[..., -1:] for a in P)


# below this size the windowed plan's compile cost dwarfs its runtime
# advantage: use the vectorized double-and-add ladder instead
LADDER_THRESHOLD = 512


class MSM:
    """A compiled MSM plan for a fixed (curve field ops, n, c, lanes)."""

    def __init__(self, G: CurveOps, n: int, scalar_limbs: int,
                 c: int | None = None, lanes: int | None = None,
                 method: str = "auto", signed: bool | None = None):
        self.G = G
        self.n = n
        self.scalar_limbs = scalar_limbs
        if method == "auto" and c is None and lanes is None:
            if jax.default_backend() != "cpu":
                # measured on v5e (docs/PERF.md): the Pallas-fused
                # windowed Pippenger wins from ~2^13 up; the fused
                # Pallas ladder has lower fixed cost below that.
                # Wide BASE fields (BW6: 761/633-bit fp) use the
                # rolled-loop field mul whose fori_loop body is not
                # Pallas-lowered — XLA path.  Towers over narrow base
                # fields (fp2 G2) are fine: check the BASE limb count.
                baseF = getattr(G.F, "base", G.F)
                if baseF.L >= 24:
                    method = "window"
                elif baseF is not G.F:
                    # tower fields (fp2 G2): the all-windows graph over
                    # 2L-limb elements exceeded the remote-compile
                    # payload cap (HTTP 413 at 2^16).  The per-chunk-jit
                    # orchestration ships <=8 windows per module, which
                    # should fit — opt in via GNARK_TPU_G2_WINDOWED=1
                    # (the fp2 ladder at 2^16 is ~4 s, the dominant term
                    # of the e2e prove; windowed projects ~0.6 s).
                    import os as _os
                    if _os.environ.get("GNARK_TPU_G2_WINDOWED") and \
                            n >= 8192:
                        method = "window_pallas"
                    else:
                        method = "ladder_pallas"
                else:
                    method = "window_pallas" if n >= 8192 else "ladder_pallas"
            elif n <= LADDER_THRESHOLD:
                method = "ladder"
        if method == "window_pallas" and getattr(G, "b", None) is None:
            # complete-formula ops need the curve coefficient
            method = "window"
        if signed is None:
            # signed-digit recoding is a measured win on the Pallas
            # windowed path (half the buckets -> c can grow by one at the
            # same bucket cost; docs/PERF.md round-4 table) and is only
            # implemented there — auto-select it exactly there.
            signed = method == "window_pallas"
        self.signed = signed
        if method in ("ladder", "ladder_pallas"):
            assert not signed, "signed digits: window_pallas only"
            self.c = self.nwin = self.R = self.C = self.n_pad = None
            self._impl = (self._run_ladder_pallas
                          if method == "ladder_pallas" else self._run_ladder)
            self._fn = jax.jit(self._impl)
            return
        total_bits = scalar_limbs * 16
        if method == "window_pallas" and getattr(G, "b", None) is None:
            # complete-formula ops need the curve coefficient
            method = "window"
        if method == "window_pallas":
            from gnark_tpu.ops.ec_complete import CompleteOps
            self.GC = CompleteOps(G.F, G.b)
            if lanes is None:
                lanes = 512          # VMEM tile width of the leaf kernel
            if signed:
                # signed digits: |d| <= 2^(c-1) — half the buckets of an
                # unsigned c-bit window, so c grows by one at the same
                # bucket cost and the window count drops (BN254: 29
                # signed c=9 windows vs 32 unsigned c=8).  The O(nb)
                # weighted-sum fold makes the bucket phase ~4*nb adds
                # (fold + tree-sum + extraction), so larger c pays.  When
                # digit|sign|index no longer packs in one u32 sort key,
                # _sort_gather switches to a two-operand lax.sort (key +
                # payload) — no hard c cap; 14 keeps the weighted-sum
                # kernel's VMEM-resident bucket blocks comfortable.
                if c is None:
                    def cost(cc):
                        nwin = -(-(total_bits + 1) // cc)
                        nb = 1 << (cc - 1)
                        lane = max(1, (lanes - 1).bit_length()) * lanes * 26
                        bucket = 4 * nb * 26
                        return nwin * (n * 11 + lane + bucket)

                    c = min(range(6, 15), key=cost)
                self.c = c
                self.nwin = -(-(total_bits + 1) // c)
                self.nb = 1 << (c - 1)
            elif c is None:
                # cost in field-muls: leaf = n mixed adds (11M)/window;
                # lane-offset scan = log2(R)*R full adds (26M); weighted
                # bucket reduction = 2 roll-scans over nb buckets.
                def cost(cc):
                    nwin = -(-total_bits // cc)
                    nb = (1 << cc) - 1
                    lane = (max(1, (lanes - 1).bit_length())) * lanes * 26
                    bucket = (2 * max(1, nb.bit_length()) + 2) * nb * 26
                    return nwin * (n * 11 + lane + bucket)

                # cap c at 8: larger windows' weighted-sum kernels
                # (nb >= 1024 lanes) hit pathological Mosaic compile
                # times (>1h at c=10); c=8 is within ~20% of the model
                # optimum through 2^20 and shares compiled kernels
                # across sizes
                c = min(range(4, 9), key=cost)
            if not signed:
                self.c = c
                self.nwin = -(-total_bits // c)
                self.nb = (1 << c) - 1
            self.R = lanes
            self.TILER = min(lanes, 1024)
            assert self.R % self.TILER == 0 and (
                _INTERPRET or self.R % 128 == 0)
            self.C = -(-n // self.R)
            self.n_pad = self.C * self.R
            # chunk windows so the materialized prefix-ROW arrays stay
            # under the HBM cap (matters at 2^20; one chunk at 2^16).
            # Row-gather peak-live model: the leaf kernel emits prefixes
            # directly as [n_pad, 3L]-row arrays (no flat transpose
            # copy), so peak ~= rows + the gathered sx/sy ~= 1.3x the
            # row bytes; with the PADDED row width below, cap=3.5e9
            # keeps peak under ~5 GB of the chip's 16 GB.
            import os as _os
            cap = float(_os.environ.get("GNARK_TPU_MSM_HBM_CAP", 3.5e9))
            # physical bytes per window of the prefix-ROW output: the
            # [n_pad, 3L] rows tile-pad the lane axis to a multiple of
            # 128 (3L = 48 -> 128 for L = 16), so budget the PADDED
            # width — the logical-width estimate undercounts 2.7x and
            # overflows HBM at 2^20 (peak live ~= rows + gathered
            # sx/sy ~= 1.3x rows)
            row_lanes = -(-3 * self.G.F.L // 128) * 128
            per_win = self.n_pad * 4 * row_lanes
            wmax = max(1, int(cap) // per_win)
            if getattr(G.F, "base", G.F) is not G.F:
                # tower fields: small chunks keep the shipped HLO under
                # the axon remote-compile payload cap (HTTP 413)
                wmax = min(wmax, 8)
            # balance chunk sizes (17+15 -> 16+16) and pad the window
            # count so every chunk shares ONE executable; padded top
            # windows have zero digits -> identity contributions
            nchunks = -(-self.nwin // wmax)
            self.wchunk = -(-self.nwin // nchunks)
            self.nwin_pad = nchunks * self.wchunk
            self._impl = self._run_window_pallas
            if nchunks == 1 and _os.environ.get(
                    "GNARK_TPU_MSM_SINGLEJIT", "1") != "0":
                # one chunk: run the whole plan as ONE jitted graph
                # (saves the prep/chunk/finish dispatch boundaries)
                self._fn = jax.jit(self._run_window_pallas)
            else:
                self._fn = self._run_window_chunked
                self._prep_jit = jax.jit(self._prep_window)
                self._chunk_jit = jax.jit(self._window_chunk)
                self._finish_jit = jax.jit(self._finish_window)
            return
        assert not signed, "signed digits: window_pallas only"
        if c is None:
            # cost model: per window, leaf phase = n mixed adds (~11 muls),
            # bucket phase = 2 roll-scans over 2^c buckets (~2c * 2^c full
            # adds, ~26 muls each).  Choose c minimizing total over windows.
            def cost(cc):
                nwin = -(-total_bits // cc)
                return nwin * (n * 11 + (2 * cc + 3) * (1 << cc) * 26)

            c = min(range(2, 16), key=cost)
        self.c = c
        self.nwin = -(-total_bits // c)
        if lanes is None:
            # R lanes: wide enough to fill the VPU, small enough that the
            # per-window lane-offset scan (R*log2(R) full adds) stays minor.
            lanes = int(min(max(8, n // 64), 4096))
        # pad n to a multiple of lanes
        self.C = -(-n // lanes)
        self.R = lanes
        self.n_pad = self.C * self.R
        self._impl = self._run
        self._fn = jax.jit(self._impl)

    def __call__(self, xs, ys, inf_mask, scalars):
        """xs, ys: [L, n] affine coords; inf_mask: [n] bool;
        scalars: [Ls, n] uint32 *regular form* limb planes.
        Returns a single Jacobian point (coords [L, 1])."""
        return self._fn(xs, ys, inf_mask, scalars)

    def _run_ladder_pallas(self, xs, ys, inf_mask, scalars):
        """Ladder MSM as ONE Pallas kernel per point-block: the whole
        256-step double-and-add loop runs with accumulator and point
        block resident in VMEM — no per-step HBM round-trips (the
        fusion-boundary traffic that bounds the XLA ladder).  Per-lane
        partial sums come back to XLA for the final log-depth reduction."""
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        G, F = self.G, self.G.F
        L = xs.shape[0]
        n = xs.shape[-1]
        total_bits = self.scalar_limbs * 16
        TILE = 512
        # Mosaic block shapes must be (8k, 128m)-aligned: pad to the tile
        if n % TILE:
            pad = TILE - n % TILE
            zc = jnp.zeros(xs.shape[:-1] + (pad,), xs.dtype)
            xs = jnp.concatenate([xs, zc], axis=-1)
            ys = jnp.concatenate([ys, zc], axis=-1)
            inf_mask = jnp.concatenate(
                [inf_mask, jnp.ones((pad,), bool)], axis=0)
            scalars = jnp.concatenate(
                [scalars, jnp.zeros((scalars.shape[0], pad), jnp.uint32)],
                axis=-1)
            n = n + pad

        limb = jax.lax.broadcasted_iota(jnp.int32, (total_bits, 1), 0) // 16
        shift = (jax.lax.broadcasted_iota(
            jnp.int32, (total_bits, 1), 0) % 16).astype(jnp.uint32)
        gathered = jnp.take(scalars, limb[:, 0], axis=0)
        bits = (gathered >> shift) & jnp.uint32(1)
        bits = jnp.flip(bits, axis=0)                  # [bits, n] MSB first
        infu = inf_mask.astype(jnp.uint32)[None]       # [1, n]

        def kernel(xs_ref, ys_ref, inf_ref, bits_ref, ox, oy, oz):
            px, py = xs_ref[:], ys_ref[:]
            pinf = inf_ref[0, :] != 0

            def body(i, acc):
                acc = G.double(acc)
                bit_row = bits_ref[i, :]
                sel = (bit_row == 0) | pinf
                return G.add_mixed(acc, (px, py), sel)

            z = jnp.zeros((L, TILE), jnp.uint32)
            init = (z, F.ones_like(z), z)
            X, Y, Z = jax.lax.fori_loop(0, total_bits, body, init)
            ox[:], oy[:], oz[:] = X, Y, Z

        shape = jax.ShapeDtypeStruct((L, n), jnp.uint32)
        blk = pl.BlockSpec((L, TILE), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
        X, Y, Z = pl.pallas_call(
            kernel,
            interpret=_INTERPRET,
            out_shape=(shape, shape, shape),
            grid=(n // TILE,),
            in_specs=[blk, blk,
                      pl.BlockSpec((1, TILE), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((total_bits, TILE), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=(blk, blk, blk),
        )(xs, ys, infu, bits)
        return _reduce(G, (X, Y, Z), n)

    def _run_ladder(self, xs, ys, inf_mask, scalars):
        """Small-n path: per-point double-and-add ladder vectorized over
        the point batch, then one batch reduction.  One scan body (1
        double + 1 masked mixed-add) -> minutes less XLA compile time
        than the windowed plan; runtime is fine below ~512 points."""
        G = self.G
        n = xs.shape[-1]
        total_bits = self.scalar_limbs * 16
        # bits [total_bits, n], MSB first
        limb = jax.lax.broadcasted_iota(
            jnp.int32, (total_bits, 1), 0) // 16
        shift = (jax.lax.broadcasted_iota(
            jnp.int32, (total_bits, 1), 0) % 16).astype(jnp.uint32)
        gathered = jnp.take(scalars, limb[:, 0], axis=0)   # [bits, n]
        bits = (gathered >> shift) & jnp.uint32(1)
        bits = jnp.flip(bits, axis=0)                      # MSB first

        def step(acc, bit_row):
            acc = G.double(acc)
            sel = (bit_row == 0) | inf_mask
            return G.add_mixed(acc, (xs, ys), sel), None

        acc, _ = jax.lax.scan(step, G.inf(n), bits)
        return _reduce(G, acc, n)

    def _run(self, xs, ys, inf_mask, scalars):
        G, F = self.G, self.G.F
        n, n_pad, R, C, c = self.n, self.n_pad, self.R, self.C, self.c
        pad = n_pad - n
        if pad:
            zpad = jnp.zeros(xs.shape[:-1] + (pad,), xs.dtype)
            xs = jnp.concatenate([xs, zpad], axis=-1)
            ys = jnp.concatenate([ys, zpad], axis=-1)
            inf_mask = jnp.concatenate(
                [inf_mask, jnp.ones((pad,), bool)], axis=0)
            scalars = jnp.concatenate(
                [scalars, jnp.zeros((scalars.shape[0], pad), jnp.uint32)],
                axis=-1)

        L = xs.shape[0]
        nwin = self.nwin
        digits = window_digits(scalars, c)                  # [nwin, n_pad]
        digits = jnp.where(inf_mask[None], 0, digits)

        bvals = jnp.arange(1, 1 << c, dtype=jnp.int32)      # buckets 1..2^c-1

        # ALL WINDOWS BATCHED: the per-window pipeline runs as one wide
        # vector program with a (nwin, ...) batch axis — the 32x window
        # serialization (outer scan) was the old path's TPU bottleneck,
        # not the sorts/gathers (37ms for all windows at 2^16).
        orders = jax.vmap(jnp.argsort)(digits)              # [nwin, n_pad]
        d_sorted = jnp.take_along_axis(digits, orders, axis=1)
        sx = jnp.take(xs, orders, axis=-1)                  # [L, nwin, n_pad]
        sy = jnp.take(ys, orders, axis=-1)
        sinf = jnp.take(inf_mask, orders)                   # [nwin, n_pad]

        # --- within-lane prefix (leaf mixed-adds), scan depth C ---
        def split(a):  # [..., n_pad] -> [C, ..., R]
            return jnp.moveaxis(a.reshape(a.shape[:-1] + (R, C)), -1, 0)

        def leaf(acc, t):
            tx, ty, ti = t
            acc = G.add_mixed(acc, (tx, ty), ti)
            return acc, acc

        totals, prefix = jax.lax.scan(
            leaf, G.inf((nwin, R)), (split(sx), split(sy), split(sinf)))
        # prefix coords [C, L, nwin, R] -> flat [L, nwin, n_pad]
        flat = tuple(
            jnp.moveaxis(a, 0, -1).reshape(L, nwin, n_pad) for a in prefix)

        # --- lane offsets (exclusive scan over lane totals [L, nwin, R]) ---
        incl = _roll_scan(G, totals, R)
        offs = tuple(jnp.roll(a, 1, axis=-1) for a in incl)
        offs = (offs[0], offs[1], offs[2].at[..., 0].set(0))  # lane 0: id

        # --- bucket sums from boundary prefixes ---
        ends = jax.vmap(
            lambda d: jnp.searchsorted(d, bvals, side="right"))(d_sorted) - 1
        starts = jax.vmap(
            lambda d: jnp.searchsorted(d, bvals, side="left"))(d_sorted) - 1

        def prefix_total(i):                                # i: [nwin, nb]
            gi = jnp.maximum(i, 0)
            idx = jnp.broadcast_to(gi[None], (L,) + gi.shape)
            P = tuple(jnp.take_along_axis(a, idx, axis=2) for a in flat)
            O = tuple(jnp.take_along_axis(a, idx // C, axis=2) for a in offs)
            T = G.add(P, O)
            return (T[0], T[1], jnp.where((i >= 0)[None], T[2], 0))

        buckets = G.add(prefix_total(ends), G.neg(prefix_total(starts)))

        # --- S_w = sum_b b * bucket_b = sum of suffix sums, per window ---
        nb = (1 << c) - 1
        suffix = _roll_scan(G, buckets, nb, reverse=True)
        S = _reduce(G, suffix, nb)                          # [L, nwin, 1]

        # --- Horner fold over windows, most-significant first ---
        def fold(T, S_w):
            T = jax.lax.fori_loop(0, c, lambda _, A: G.double(A), T)
            return G.add(T, S_w), None

        top = tuple(a[:, -1, :] for a in S)
        rest = tuple(jnp.moveaxis(a[:, -2::-1, :], 1, 0) for a in S)
        T, _ = jax.lax.scan(fold, top, rest)
        return T


    # ---- Pallas-fused windowed Pippenger --------------------------------

    def _leaf_prefix_pallas(self, sx, sy, nw):
        """Per-lane running prefix of mixed-adds as ONE Pallas kernel.

        Input layout [nw, C, L, R] (sorted index s = r*C + cstep); the
        point-at-infinity flag rides in bit 16 of y limb-plane 0 (limb
        planes are 16-bit values in uint32 lanes, so the top half is
        free).  Grid (nw, R/T, C): for each (window, lane-tile) the C
        accumulation steps run back-to-back with the accumulator in VMEM
        scratch — no per-step HBM round-trips, which is the ~4x
        fusion-boundary tax of the XLA formulation (docs/PERF.md).

        Prefixes stream out to HBM as POINT ROWS [nw, C*R, 3L] (row
        j = cstep*R + r holds X|Y|Z limbs of the prefix at sorted
        position s, where s = r*C + cstep): the bucket-boundary lookup
        then becomes a MAJOR-axis row gather, which the TPU does ~4.4x
        faster than minor-axis take_along_axis on [nw, L, C*R] planes
        (4.5 ms vs 19.9 ms for the 24x1025-boundary set at 2^16 —
        scripts/dev_gather_micro.py, round 4).
        """
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        GC, F = self.GC, self.G.F
        L, C, R, T = sx.shape[2], self.C, self.R, self.TILER

        def kernel(x_ref, y_ref, orows, ax, ay, az):
            cstep = pl.program_id(2)

            @pl.when(cstep == 0)
            def _():
                ax[:] = jnp.zeros((L, T), jnp.uint32)
                ay[:] = F.ones(T)
                az[:] = jnp.zeros((L, T), jnp.uint32)

            px = x_ref[0, 0]
            yr = y_ref[0, 0]
            flags = yr[0, :] >> jnp.uint32(16)
            pinf = (flags & jnp.uint32(1)) != 0
            py = jnp.concatenate(
                [yr[0:1] & jnp.uint32(0xFFFF), yr[1:]], axis=0)
            if self.signed:
                # bit 17: signed-digit sign — add -P instead of P
                psign = (flags >> jnp.uint32(1)) != 0
                py = F.select(psign, F.neg(py), py)
            acc = GC.add_mixed((ax[:], ay[:], az[:]), (px, py), pinf)
            ax[:], ay[:], az[:] = acc
            orows[0] = jnp.concatenate(
                [a.T for a in acc], axis=1)          # (T, 3L) point rows

        blk = pl.BlockSpec((1, 1, L, T), lambda w, r, cs: (w, cs, 0, r),
                           memory_space=pltpu.VMEM)
        # row output: rows j = cstep*R + r — block (1, T, 3L) at row
        # offset cstep*R + rtile*T
        oblk = pl.BlockSpec(
            (1, T, 3 * L), lambda w, r, cs: (w, cs * (R // T) + r, 0),
            memory_space=pltpu.VMEM)
        shape = jax.ShapeDtypeStruct((nw, C * R, 3 * L), jnp.uint32)
        scratch = pltpu.VMEM((L, T), jnp.uint32)
        return pl.pallas_call(
            kernel,
            interpret=_INTERPRET,
            grid=(nw, R // T, C),
            out_shape=shape,
            in_specs=[blk, blk],
            out_specs=oblk,
            scratch_shapes=[scratch, scratch, scratch],
        )(sx, sy)

    def _lane_offsets_pallas(self, totals, nw):
        """Exclusive lane-offset scan as ONE VMEM-resident Pallas kernel:
        Hillis-Steele over the R lane axis with full EC adds — the whole
        [L, nw, R] batch (~6 MB) lives in VMEM for all log2(R) steps
        (the XLA version round-trips HBM per step: measured 95 ms vs
        the ~4 M muls of actual work)."""
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        GC, F = self.GC, self.G.F
        R = self.R
        L = totals[0].shape[0]
        steps = max(1, (R - 1).bit_length())
        # pad the window axis to a multiple of 8 (Mosaic sublane tiling)
        nw8 = -(-nw // 8) * 8
        if nw8 != nw:
            totals = tuple(
                jnp.pad(a, ((0, 0), (0, nw8 - nw), (0, 0))) for a in totals)

        def kernel(tx, ty, tz, ox, oy, oz):
            X, Y, Z = tx[:], ty[:], tz[:]
            WBk = X.shape[1]
            one = F.ones((WBk, R))
            idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, R), 2)
            for i in range(steps):
                s = 1 << i
                Qx = jnp.concatenate([X[..., R - s:], X[..., :R - s]], axis=-1)
                Qy = jnp.concatenate([Y[..., R - s:], Y[..., :R - s]], axis=-1)
                Qz = jnp.concatenate([Z[..., R - s:], Z[..., :R - s]], axis=-1)
                # rolled-in lanes -> the identity CLASS (0 : 1 : 0): the
                # complete formulas need X = 0 and Y != 0, not just Z = 0
                v = idx >= s
                Qx = jnp.where(v, Qx, 0)
                Qy = jnp.where(v, Qy, one)
                Qz = jnp.where(v, Qz, 0)
                X, Y, Z = GC.add((X, Y, Z), (Qx, Qy, Qz))
            # exclusive shift by one lane; lane 0 = identity
            x0 = jnp.concatenate([X[..., R - 1:], X[..., :R - 1]], axis=-1)
            y0 = jnp.concatenate([Y[..., R - 1:], Y[..., :R - 1]], axis=-1)
            z0 = jnp.concatenate([Z[..., R - 1:], Z[..., :R - 1]], axis=-1)
            v = idx >= 1
            ox[:] = jnp.where(v, x0, 0)
            oy[:] = jnp.where(v, y0, one)
            oz[:] = jnp.where(v, z0, 0)

        WB = 8
        shape = jax.ShapeDtypeStruct((L, nw8, R), jnp.uint32)
        spec = pl.BlockSpec((L, WB, R), lambda w: (0, w, 0),
                            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            interpret=_INTERPRET,
            grid=(nw8 // WB,),
            out_shape=(shape, shape, shape),
            in_specs=[spec] * 3,
            out_specs=(spec, spec, spec),
        )(*totals)
        return tuple(a[:, :nw] for a in out)

    def _weighted_sum_pallas(self, buckets, nw):
        """S_w = sum_b (b+1) * bucket_b for each window, fully in VMEM.

        O(nb) halving fold instead of the old two O(nb log nb) suffix
        roll-scans: with H = m/2,

          sum_{j<m} (j+1) B_j
            = sum_{j<H} (j+1) (B_j + B_{H+j})  +  H * sum_{j<H} B_{H+j}

        so each level folds the bucket array in half (H adds), tree-sums
        the high half down to 128 lanes (H adds total), scales by H via
        log2(H) doublings of a 128-lane partial, and recurses — ~2*nb
        adds overall vs 2*nb*log2(nb).  At m = 128 lanes (the VPU tile
        floor) the remainder sum_{j<128} (j+1) B_j falls back to the
        two-suffix-scan trick, with the accumulated high-half partials W
        injected between the scans (scan2 sums lanes, so adding W
        lanewise before it folds W's 128 partial lanes in for free).
        The shrinking level widths also keep the Mosaic op count flat in
        nb, lifting the old c<=10 compile-blowup cap."""
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        nb = self.nb
        nbp = -(-nb // 128) * 128
        assert nbp & (nbp - 1) == 0, "bucket axis must pad to a power of 2"
        L = buckets[0].shape[0]
        nw8 = -(-nw // 8) * 8
        bX, bY, bZ = (
            jnp.pad(a, ((0, 0), (0, nw8 - nw), (0, nbp - nb)))
            for a in buckets)
        # padded BUCKET lanes participate in the fold/scans: they must be
        # the identity CLASS (0 : 1 : 0) — zero-padded Y breaks completeness
        if nbp != nb:
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nbp), 2)
            one = self.G.F.ones((1, 1))
            bY = jnp.where(lane < nb, bY, one)
        buckets = (bX, bY, bZ)

        GC = self.GC
        F = self.G.F

        def kernel(bx, by, bz, ox, oy, oz):
            B = (bx[:], by[:], bz[:])
            WBk = B[0].shape[1]
            W = None                     # scaled high-half partials [.., 128]
            m = nbp
            while m > 128:
                H = m // 2
                low = tuple(a[..., :H] for a in B)
                high = tuple(a[..., H:] for a in B)
                T, t = high, H
                while t > 128:           # tree-sum high half to 128 lanes
                    T = GC.add(tuple(a[..., : t // 2] for a in T),
                               tuple(a[..., t // 2:] for a in T))
                    t //= 2
                for _ in range(max(0, H.bit_length() - 1)):  # T *= H
                    T = GC.double(T)
                W = T if W is None else GC.add(W, T)
                B = GC.add(low, high)
                m = H
            # m == 128: suffix scan 1 -> suffix sums of B
            X, Y, Z = B
            one = F.ones((WBk, 128))
            idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
            for scan in range(2):
                for i in range(7):
                    s = 1 << i
                    Qx = jnp.concatenate([X[..., s:], X[..., :s]], axis=-1)
                    Qy = jnp.concatenate([Y[..., s:], Y[..., :s]], axis=-1)
                    Qz = jnp.concatenate([Z[..., s:], Z[..., :s]], axis=-1)
                    v = idx < 128 - s
                    Qx = jnp.where(v, Qx, 0)
                    Qy = jnp.where(v, Qy, one)
                    Qz = jnp.where(v, Qz, 0)
                    X, Y, Z = GC.add((X, Y, Z), (Qx, Qy, Qz))
                if scan == 0 and W is not None:
                    # scan2 sums all lanes: lanewise W rides along, its
                    # 128 partials reduce into lane 0 with the suffixes
                    X, Y, Z = GC.add((X, Y, Z), W)
            ox[:], oy[:], oz[:] = X, Y, Z

        # larger buckets = bigger VMEM-resident input blocks: shrink the
        # window-batch so (in + intermediates) stays under ~half of VMEM
        WB = 8 if nbp <= 2048 else (4 if nbp <= 4096 else
                                    (2 if nbp <= 8192 else 1))
        shape = jax.ShapeDtypeStruct((L, nw8, nbp), jnp.uint32)
        oshape = jax.ShapeDtypeStruct((L, nw8, 128), jnp.uint32)
        spec = pl.BlockSpec((L, WB, nbp), lambda w: (0, w, 0),
                            memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((L, WB, 128), lambda w: (0, w, 0),
                             memory_space=pltpu.VMEM)
        X, Y, Z = pl.pallas_call(
            kernel,
            interpret=_INTERPRET,
            grid=(nw8 // WB,),
            out_shape=(oshape, oshape, oshape),
            in_specs=[spec] * 3,
            out_specs=(ospec, ospec, ospec),
        )(*buckets)
        # lane 0 holds sum_b (b+1) * bucket_b (+ folded high-half terms)
        return tuple(a[:, :nw, 0:1] for a in (X, Y, Z))

    def _horner_fold_pallas(self, S):
        """Horner fold over windows in ONE kernel: ~nwin*(c+1) point ops
        on [L, 128] vectors (lane 0 live) — replaces a few hundred tiny
        dispatch-bound XLA ops on [L, 1] tensors."""
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        GC = self.GC
        nwin, c = S[0].shape[1], self.c
        L = S[0].shape[0]
        nw8 = -(-nwin // 8) * 8
        Sp = tuple(jnp.pad(a, ((0, 0), (0, nw8 - nwin), (0, 127)))
                   for a in S)

        def kernel(sx, sy, sz, ox, oy, oz):
            acc = (sx[:, nwin - 1, :], sy[:, nwin - 1, :],
                   sz[:, nwin - 1, :])
            for w in range(nwin - 2, -1, -1):
                for _ in range(c):
                    acc = GC.double(acc)
                acc = GC.add(acc, (sx[:, w, :], sy[:, w, :], sz[:, w, :]))
            ox[:], oy[:], oz[:] = acc

        shape = jax.ShapeDtypeStruct((L, 128), jnp.uint32)
        spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        X, Y, Z = pl.pallas_call(
            kernel,
            interpret=_INTERPRET,
            out_shape=(shape, shape, shape),
            in_specs=[spec] * 3,
            out_specs=(spec, spec, spec),
        )(*Sp)
        return (X[:, :1], Y[:, :1], Z[:, :1])

    def _sort_gather(self, ptrows, dg, nw, signs=None):
        """Sorted point layout for the leaf kernel, gather-friendly.

        Instead of argsort + a minor-axis `take` of the [L, n] limb
        planes (each gathered element a 16-limb strided column — the
        measured 84 ms wall at 2^16), pack (digit, index) into ONE
        uint32 sort key and gather whole 2L-limb point ROWS from the
        row-major [n_pad, 2L] mirror, then relayout with a regular
        (bandwidth-bound) transpose:
          key = digit << idx_bits | index  — one-array sort, stable by
          construction, yields d_sorted AND the permutation for free.
        Returns (sx, sy) in the kernel's [nw, C, L, R] blocked layout
        (sorted index s = r*C + cstep) and d_sorted [nw, n_pad] int32.
        """
        L = ptrows.shape[1] // 2
        n_pad, R, C = self.n_pad, self.R, self.C
        idx_bits = max(1, (n_pad - 1).bit_length())
        sbit = 1 if signs is not None else 0
        dig_bits = max(1, self.nb.bit_length())
        iota = jax.lax.broadcasted_iota(jnp.uint32, (nw, n_pad), 1)
        ssgn = None
        if dig_bits + sbit + idx_bits <= 32:
            # packed single-key sort: digit|sign|index in one u32 — one
            # array through the bitonic network, stable by construction
            key = (dg.astype(jnp.uint32) << np.uint32(idx_bits + sbit)) | iota
            if signs is not None:
                key = key | (signs << np.uint32(idx_bits))
            skey = jax.lax.sort(key, dimension=1)
            orders = (skey & np.uint32((1 << idx_bits) - 1)).astype(jnp.int32)
            d_sorted = (skey >> np.uint32(idx_bits + sbit)).astype(jnp.int32)
            if signs is not None:
                ssgn = (skey >> np.uint32(idx_bits)) & jnp.uint32(1)
        else:
            # two-operand sort (key = digit<<1|sign, payload = index):
            # lifts the packed-key cap so large windows (c up to 14) work
            # at 2^20+ point counts (VERDICT r3: idx_bits=20 capped c at
            # 11).  Keying on (digit, sign) keeps the permutation
            # byte-identical to the packed path.
            key = dg.astype(jnp.uint32) << np.uint32(sbit)
            if signs is not None:
                key = key | signs
            skey, spay = jax.lax.sort(
                (key, iota), dimension=1, is_stable=True, num_keys=1)
            orders = spay.astype(jnp.int32)
            d_sorted = (skey >> np.uint32(sbit)).astype(jnp.int32)
            if signs is not None:
                ssgn = skey & jnp.uint32(1)
        g = jnp.take(ptrows, orders, axis=0)        # [nw, n_pad, 2L] rows
        g = jnp.transpose(g.reshape(nw, R, C, 2 * L), (0, 2, 3, 1))
        sx, sy = g[:, :, :L], g[:, :, L:]
        if ssgn is not None:
            # sorted sign -> bit 17 of y limb-plane 0 (the leaf kernel
            # negates flagged points; EC negation is free)
            ssgn = jnp.transpose(ssgn.reshape(nw, R, C), (0, 2, 1))
            sy = sy.at[:, :, 0, :].add(ssgn << jnp.uint32(17))
        return sx, sy, d_sorted

    def _prep_window(self, xs, ys, inf_mask, scalars):
        """Pad inputs, extract (padded-to-nwin_pad) digits, and build the
        row-major point mirror the chunk pipeline gathers from."""
        n_pad, c = self.n_pad, self.c
        pad = n_pad - xs.shape[-1]
        if pad:
            zpad = jnp.zeros(xs.shape[:-1] + (pad,), xs.dtype)
            xs = jnp.concatenate([xs, zpad], axis=-1)
            ys = jnp.concatenate([ys, zpad], axis=-1)
            inf_mask = jnp.concatenate(
                [inf_mask, jnp.ones((pad,), bool)], axis=0)
            scalars = jnp.concatenate(
                [scalars, jnp.zeros((scalars.shape[0], pad), jnp.uint32)],
                axis=-1)
        wpad = self.nwin_pad - self.nwin
        if self.signed:
            digits, dsigns = window_digits_signed(scalars, c)
            digits = jnp.where(inf_mask[None], 0, digits)
            if wpad:
                digits = jnp.pad(digits, ((0, wpad), (0, 0)))
                dsigns = jnp.pad(dsigns, ((0, wpad), (0, 0)))
        else:
            digits = jnp.where(
                inf_mask[None], 0,
                window_digits(scalars, c, self.nwin_pad))
            dsigns = None
        infu = inf_mask.astype(jnp.uint32)

        # row-major point mirror [n_pad, 2L]; the infinity flag rides in
        # bit 16 of y limb-plane 0 (16-bit planes: the top half is free)
        # so sorted rows carry it without a post-gather scatter-update
        ysf = ys.at[0].add(infu << jnp.uint32(16))
        ptrows = jnp.concatenate([xs.T, ysf.T], axis=1)
        return ptrows, digits, dsigns

    def split_rows(self, rows):
        """[nw, k, 3L] leaf-kernel point rows -> 3 x [L, nw, k] limb
        planes (X, Y, Z).  Shared by _window_chunk and the dev/profiling
        scripts (scripts/dev_msm_*.py) so layout changes stay in sync."""
        L = self.G.F.L
        t = jnp.transpose(rows, (2, 0, 1))
        return (t[:L], t[L:2 * L], t[2 * L:])

    def _window_chunk(self, ptrows, dg, sg=None):
        """One window-chunk pipeline: sort+gather -> leaf prefix -> lane
        offsets -> bucket extraction -> weighted bucket sum.  Traceable;
        the single-chip path jits it ONCE and reuses the executable per
        chunk (window chunks are shape-identical by construction)."""
        L = ptrows.shape[1] // 2
        R, C = self.R, self.C
        nw = dg.shape[0]
        # bucket b's sorted segment ends where digits <= b end, and
        # starts right after bucket b-1's: ONE boundary array E_b
        # (b = 0..nb) gives every bucket as the difference of adjacent
        # global prefixes — half the gathers of the ends/starts pair,
        # and empty buckets (E_b == E_{b-1}) cancel to the identity in
        # the complete formulas without a validity select.
        bvals = jnp.arange(0, self.nb + 1, dtype=jnp.int32)
        sx, sy, d_sorted = self._sort_gather(ptrows, dg, nw, sg)

        # prefix point ROWS [nw, C*R, 3L] (row j = cstep*R + r) straight
        # out of the leaf kernel — boundary lookups are row gathers
        rows = self._leaf_prefix_pallas(sx, sy, nw)
        split_rows = self.split_rows

        # lane totals (prefix at cstep = C-1: the last R rows)
        totals = split_rows(rows[:, (C - 1) * R:, :])
        offs = self._lane_offsets_pallas(totals, nw)
        # lane-offset rows [nw, R, 3L] for the same row-gather trick
        orows = jnp.transpose(jnp.concatenate(offs, axis=0), (1, 2, 0))

        ends = jax.vmap(
            lambda d: jnp.searchsorted(d, bvals, side="right"))(
                d_sorted) - 1

        def prefix_total(i):
            gi = jnp.maximum(i, 0)                       # [nw, nb+1]
            j = (gi % C) * R + gi // C
            P = split_rows(
                jax.vmap(lambda r, e: jnp.take(r, e, axis=0))(rows, j))
            O = split_rows(
                jax.vmap(lambda r, e: jnp.take(r, e, axis=0))(
                    orows, gi // C))
            T = self.GC.add(P, O)
            # i < 0 (nothing at or below this digit) -> identity CLASS:
            # X = Z = 0 (completeness needs Y != 0, which a point has)
            valid = (i >= 0)[None]
            return (jnp.where(valid, T[0], 0), T[1],
                    jnp.where(valid, T[2], 0))

        PE = prefix_total(ends)                      # [L, nw, nb+1]
        buckets = self.GC.add(
            tuple(a[:, :, 1:] for a in PE),
            self.GC.neg(tuple(a[:, :, :-1] for a in PE)))

        # S_w = sum_b b * bucket_b (Pallas: suffix scan + reduction
        # with the bucket batch VMEM-resident)
        return self._weighted_sum_pallas(buckets, nw)

    def _finish_window(self, S_parts):
        S = tuple(jnp.concatenate([p[k] for p in S_parts], axis=1)
                  for k in range(3))
        # Horner fold in projective; convert to the Jacobian convention
        # the rest of the stack (to_affine etc) consumes.  Padded top
        # windows hold the identity class and fold away harmlessly.
        return self.GC.to_jacobian(self._horner_fold_pallas(S))

    def _run_window_pallas(self, xs, ys, inf_mask, scalars):
        """Whole MSM as ONE traceable graph (the shard_map path needs a
        single function; the single-chip path uses _run_window_chunked
        so chunks share one compiled executable)."""
        ptrows, digits, dsigns = self._prep_window(
            xs, ys, inf_mask, scalars)
        S_parts = []
        for w0 in range(0, self.nwin_pad, self.wchunk):
            dg = digits[w0:w0 + self.wchunk]
            sg = dsigns[w0:w0 + self.wchunk] if self.signed else None
            S_parts.append(self._window_chunk(ptrows, dg, sg))
        return self._finish_window(S_parts)

    def _run_window_chunked(self, xs, ys, inf_mask, scalars):
        """Host-orchestrated variant: prep / chunk / finish are separate
        jits and every chunk reuses ONE compiled executable — the
        shipped HLO and the compile wall-clock shrink by the chunk
        count (the 2^20 all-windows graph was a ~14-minute compile),
        and peak HBM holds one chunk's intermediates, not all windows'.
        Dispatch stays async (no host syncs between chunks)."""
        ptrows, digits, dsigns = self._prep_jit(xs, ys, inf_mask, scalars)
        S_parts = []
        for w0 in range(0, self.nwin_pad, self.wchunk):
            dg = digits[w0:w0 + self.wchunk]
            if self.signed:
                sg = dsigns[w0:w0 + self.wchunk]
                S_parts.append(self._chunk_jit(ptrows, dg, sg))
            else:
                S_parts.append(self._chunk_jit(ptrows, dg))
        return self._finish_jit(S_parts)


@functools.lru_cache(maxsize=None)
def _msm_cache(G, n, scalar_limbs, c, lanes, signed):
    return MSM(G, n, scalar_limbs, c, lanes, signed=signed)


def msm(G: CurveOps, xs, ys, inf_mask, scalars, c=None, lanes=None,
        signed=None):
    """One-shot MSM; plans are cached per (G, n, c, lanes, signed).
    signed=None auto-selects (True on the Pallas windowed path)."""
    plan = _msm_cache(G, xs.shape[-1], scalars.shape[0], c, lanes, signed)
    return plan(xs, ys, inf_mask, scalars)
