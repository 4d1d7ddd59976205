"""Brute-force NumPy oracle for tests: exact min distance over ALL triangles
(float64) + float64 x-ray parity sign, vectorized. Independent of both the
reference binary and the JAX pipeline; used to sanity-check either."""

from __future__ import annotations

import numpy as np


def point_triangle_distance_np(x0, x1, x2, x3):
    """Vectorized over leading dims; float64. Same case analysis as the
    reference kernel (cpu_lib/makelevelset3.cpp:49-70)."""

    def dot(a, b):
        return (a * b).sum(-1)

    def seg(x0, x1, x2):
        d = x2 - x1
        m2 = np.maximum(dot(d, d), 1e-300)
        s = np.clip(dot(x2 - x0, d) / m2, 0.0, 1.0)
        c = s[..., None] * x1 + (1 - s)[..., None] * x2
        return np.sqrt(dot(x0 - c, x0 - c))

    x13 = x1 - x3
    x23 = x2 - x3
    x03 = x0 - x3
    m13 = dot(x13, x13)
    m23 = dot(x23, x23)
    d = dot(x13, x23)
    invdet = 1.0 / np.maximum(m13 * m23 - d * d, 1e-300)
    a = dot(x13, x03)
    b = dot(x23, x03)
    w23 = invdet * (m23 * a - d * b)
    w31 = invdet * (m13 * b - d * a)
    w12 = 1 - w23 - w31
    c_in = w23[..., None] * x1 + w31[..., None] * x2 + w12[..., None] * x3
    d_in = np.sqrt(dot(x0 - c_in, x0 - c_in))
    d12 = seg(x0, x1, x2)
    d13 = seg(x0, x1, x3)
    d23 = seg(x0, x2, x3)
    d_edge = np.where(
        w23 > 0, np.minimum(d12, d13), np.where(w31 > 0, np.minimum(d12, d23), np.minimum(d13, d23))
    )
    inside = (w23 >= 0) & (w31 >= 0) & (w12 >= 0)
    return np.where(inside, d_in, d_edge)


def _orientation(x1, y1, x2, y2):
    area = y1 * x2 - x1 * y2
    s = np.sign(area)
    tie = np.where(y2 > y1, 1.0, np.where(y2 < y1, -1.0, np.where(x1 > x2, 1.0, np.where(x1 < x2, -1.0, 0.0))))
    return np.where(s != 0, s, tie), area


def brute_force_sdf(verts, tris, origin, dx, shape, return_parity=False):
    """(ni, nj, nk) float64 signed distances: true min over all triangles,
    float64 parity sign via the reference's counting rules.

    With return_parity=True returns (signed_phi, parity) so tests can compare
    inside/outside decisions exactly — comparing sign(phi) is ill-defined for
    cells lying exactly on the surface (phi == ±0)."""
    ni, nj, nk = shape
    origin = np.asarray(origin, np.float64)
    dx64 = np.float64(np.float32(dx))
    tv = verts.astype(np.float64)[tris.astype(np.int64)]  # (M, 3, 3)

    gi = origin[0] + dx64 * np.arange(ni)
    gj = origin[1] + dx64 * np.arange(nj)
    gk = origin[2] + dx64 * np.arange(nk)
    # world positions as float32 like the reference's Vec3f gx (:214)
    gx = np.stack(
        np.meshgrid(
            (np.arange(ni, dtype=np.float32) * np.float32(dx) + np.float32(origin[0])),
            (np.arange(nj, dtype=np.float32) * np.float32(dx) + np.float32(origin[1])),
            (np.arange(nk, dtype=np.float32) * np.float32(dx) + np.float32(origin[2])),
            indexing="ij",
        ),
        axis=-1,
    ).astype(np.float64)
    del gi, gj, gk

    pts = gx.reshape(-1, 3)
    dmin = np.full(len(pts), np.inf)
    chunk = 32768
    for s in range(0, len(pts), chunk):
        p = pts[s : s + chunk, None, :]
        d = point_triangle_distance_np(p, tv[None, :, 0], tv[None, :, 1], tv[None, :, 2])
        dmin[s : s + chunk] = d.min(axis=1)
    phi = dmin.reshape(ni, nj, nk)

    # parity: per triangle rasterize (j,k) bbox (float64), count at ceil(fi)
    f = (verts.astype(np.float64) - origin) / dx64
    ftv = f[tris.astype(np.int64)]  # (M, 3, 3)
    counts = np.zeros((ni, nj, nk), np.int64)
    for t in range(len(ftv)):
        (fip, fjp, fkp), (fiq, fjq, fkq), (fir, fjr, fkr) = ftv[t]
        j0 = int(np.clip(np.ceil(min(fjp, fjq, fjr)), 0, nj - 1))
        j1 = int(np.clip(np.floor(max(fjp, fjq, fjr)), 0, nj - 1))
        k0 = int(np.clip(np.ceil(min(fkp, fkq, fkr)), 0, nk - 1))
        k1 = int(np.clip(np.floor(max(fkp, fkq, fkr)), 0, nk - 1))
        if j1 < j0 or k1 < k0:
            continue
        jj, kk = np.meshgrid(np.arange(j0, j1 + 1), np.arange(k0, k1 + 1), indexing="ij")
        jj = jj.astype(np.float64)
        kk = kk.astype(np.float64)
        x1 = fjp - jj
        y1 = fkp - kk
        x2 = fjq - jj
        y2 = fkq - kk
        x3 = fjr - jj
        y3 = fkr - kk
        sa, a = _orientation(x2, y2, x3, y3)
        sb, b = _orientation(x3, y3, x1, y1)
        sc, c = _orientation(x1, y1, x2, y2)
        inside = (sa != 0) & (sb == sa) & (sc == sa)
        total = a + b + c
        total = np.where(total == 0, 1.0, total)
        fi = (a * fip + b * fiq + c * fir) / total
        bins = np.ceil(fi).astype(np.int64)
        jj_i = jj.astype(np.int64)
        kk_i = kk.astype(np.int64)
        sel = inside & (bins < ni)
        bsel = np.clip(bins[sel], 0, ni - 1)
        np.add.at(counts, (bsel, jj_i[sel], kk_i[sel]), 1)
    parity = (np.cumsum(counts, axis=0) % 2).astype(bool)
    signed = np.where(parity, -phi, phi)
    if return_parity:
        return signed, parity
    return signed
