"""Bisect the complete-formula MSM kernels against host EC, tiny sizes."""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_compilation_cache", True)

import random
from gnark_tpu.curves import BN254
from gnark_tpu.ops.limbs import field_ops
from gnark_tpu.ops.ec import CurveOps
from gnark_tpu.ops.msm import MSM

curve = BN254
fp = field_ops(curve.fp)
G = CurveOps(fp, b=curve.b)
host = curve.host_g1
rng = random.Random(5)

plan = MSM(G, 8192, curve.fr.L, c=7, lanes=512, method="window_pallas")
GC = plan.GC
R = plan.R

which = sys.argv[1]


def host_pts(k):
    return [host.scalar_mul(curve.g1_gen, rng.randrange(1, 10**9))
            for _ in range(k)]


def pack_proj(plist, shape):
    """host points -> projective planes with the given batch shape."""
    flat = [p for p in plist]
    xs = fp.pack([p[0] for p in flat])
    ys = fp.pack([p[1] for p in flat])
    zs = fp.ones(len(flat))
    L = fp.L
    return (xs.reshape((L,) + shape), ys.reshape((L,) + shape),
            zs.reshape((L,) + shape))


def unpack_affine(P, idx):
    X, Y, Z = (np.asarray(a) for a in P)
    L = fp.L
    x = fp.unpack(jnp.asarray(X.reshape(L, -1)))
    y = fp.unpack(jnp.asarray(Y.reshape(L, -1)))
    z = fp.unpack(jnp.asarray(Z.reshape(L, -1)))
    q = curve.fp.modulus
    out = []
    for i in idx:
        if z[i] == 0:
            out.append(None)
            continue
        zi = pow(z[i], -1, q)
        out.append((x[i] * zi % q, y[i] * zi % q))
    return out


if which == "lane":
    nw = 2
    pts = host_pts(nw * R)
    totals = pack_proj(pts, (nw, R))
    offs = plan._lane_offsets_pallas(totals, nw)
    got = unpack_affine(offs, range(nw * R))
    ok = True
    for w in range(nw):
        acc = None
        for r in range(R):
            want = acc
            g = got[w * R + r]
            if g != want:
                print(f"lane MISMATCH w={w} r={r}")
                ok = False
                break
            acc = host.add(acc, pts[w * R + r])
        if not ok:
            break
    print("lane offsets:", "OK" if ok else "FAIL")

elif which == "wsum":
    nw = 2
    nb = (1 << plan.c) - 1
    pts = host_pts(nw * nb)
    buckets = pack_proj(pts, (nw, nb))
    S = plan._weighted_sum_pallas(buckets, nw)
    got = unpack_affine(S, range(nw))
    ok = True
    for w in range(nw):
        want = None
        for b in range(nb):
            want = host.add(want, host.scalar_mul(pts[w * nb + b], b + 1))
        if got[w] != want:
            print(f"wsum MISMATCH w={w}")
            ok = False
    print("wsum:", "OK" if ok else "FAIL")

elif which == "fold":
    nwin, c = plan.nwin, plan.c
    pts = host_pts(nwin)
    S = pack_proj(pts, (nwin, 1))
    T = plan._horner_fold_pallas(S)
    # T is projective [L, 1]
    got = unpack_affine(T, [0])[0]
    want = None
    for w in range(nwin - 1, -1, -1):
        if want is not None:
            want = host.scalar_mul(want, 1 << c)
        want = host.add(want, pts[w])
    print("fold:", "OK" if got == want else "FAIL")

elif which == "leaf":
    nw, C = 2, plan.C   # C for n=8192, R=512 -> 16
    n_pad = R * C
    pts = host_pts(64)
    idx = [rng.randrange(64) for _ in range(nw * n_pad)]
    L = fp.L
    sx = fp.pack([pts[i][0] for i in idx]).reshape(L, nw, C, R)
    sy = fp.pack([pts[i][1] for i in idx]).reshape(L, nw, C, R)
    sx = jnp.transpose(sx, (1, 2, 0, 3))
    sy = jnp.transpose(sy, (1, 2, 0, 3))
    rows = plan._leaf_prefix_pallas(sx, sy, nw)
    # rows [nw, C*R, 3L] (row j = cs*R + r): check lane r of window w at
    # step cs equals sum of points [w, 0..cs, r].  Flat index of the
    # split planes [L, nw, C*R] is w*(C*R) + cs*R + r = (w*C + cs)*R + r
    # — identical to the old [L, nw, C, R] flat order below.
    Pp = plan.split_rows(rows)                                  # [L,nw,C*R]
    got = unpack_affine(Pp, range(nw * C * R))
    ok = True
    for w in range(nw):
        for r in range(0, R, 97):
            acc = None
            for cs in range(C):
                # flat order of Pp: ((w*C)+cs)*R + r
                acc = host.add(acc, pts[idx[(w * C + cs) * R + r]])
                g = got[(w * C + cs) * R + r]
                if g != acc:
                    print(f"leaf MISMATCH w={w} r={r} cs={cs}")
                    ok = False
                    break
            if not ok:
                break
        if not ok:
            break
    print("leaf:", "OK" if ok else "FAIL")
