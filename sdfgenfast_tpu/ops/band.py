"""Narrow-band exact distances: triangle->tile binning + batched tile kernel.

The reference computes narrow-band distances with a serial per-triangle loop
scattering into cells of each triangle's band-expanded bbox
(``cpu_lib/makelevelset3.cpp:203-220``), and the CUDA backend parallelizes over
triangles with 64-bit atomicCAS min (``gpu_lib/makelevelset3_gpu.cu:374-432``).

TPU-native design (no atomics, static shapes):
  1. HOST (NumPy): bin triangles to fixed-size grid tiles. Each triangle lands
     in every tile its band-expanded bbox overlaps. Per-tile candidate lists
     are padded to a common K. This replaces the scatter/atomic pattern with
     per-tile ownership: each cell is written by exactly one program.
  2. DEVICE (JAX): for each active tile, evaluate squared point-triangle
     distances for all (cell, candidate) pairs as one broadcast batch, take
     min+argmin over candidates, and row-scatter the finished tiles into the
     dense tiled grid. Inactive tiles keep the reference's upper-bound init
     ``(ni+nj+nk)*dx`` (cpu_lib/makelevelset3.cpp:197).

Band-membership decisions replicate the reference exactly: double-precision
grid coordinates (makelevelset3.cpp:206-208), C truncation-toward-zero, and
clamped index windows (makelevelset3.cpp:210-212).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..grid import GridSpec
from .geometry import gather_tri9, point_triangle_distance_sq_soa

__all__ = ["BandBinning", "bin_triangles", "band_distance_field"]

DEFAULT_TILE = (8, 8, 8)


@dataclasses.dataclass(frozen=True)
class BandBinning:
    """Host-side binning result; all arrays are NumPy, shapes static per mesh/grid.

    tile_shape:   (ti, tj, tk) cells per tile
    tiles_dim:    (nti, ntj, ntk) tile-grid dimensions (grid padded up)
    active_ids:   (A,) int32 linear tile index (i-major: ti*ntj*ntk + tj*ntk + tk)
    cand:         (A, K) int32 candidate triangle ids, padded with 0
    cand_valid:   (A, K) bool
    """

    tile_shape: Tuple[int, int, int]
    tiles_dim: Tuple[int, int, int]
    active_ids: np.ndarray
    cand: np.ndarray
    cand_valid: np.ndarray

    @property
    def num_active(self) -> int:
        return int(self.active_ids.shape[0])

    @property
    def max_candidates(self) -> int:
        return int(self.cand.shape[1])


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def triangle_grid_coords(verts: np.ndarray, tris: np.ndarray, grid: GridSpec):
    """Per-triangle vertex coordinates in grid units, float64 — the same
    high-precision conversion as cpu_lib/makelevelset3.cpp:206-208."""
    v64 = verts.astype(np.float64)
    origin = np.asarray(grid.origin, np.float64)
    f = (v64 - origin) / np.float64(np.float32(grid.dx))
    return f[tris.astype(np.int64)]  # (M, 3 verts, 3 axes)


def bin_triangles(
    verts: np.ndarray,
    tris: np.ndarray,
    grid: GridSpec,
    exact_band: int = 1,
    tile_shape: Tuple[int, int, int] = DEFAULT_TILE,
    pad_k_to: int = 8,
    prune: bool = True,
) -> BandBinning:
    """Bin each triangle into every tile overlapped by its band-expanded bbox.

    `prune=True` additionally drops pairs whose exact-overlap distance lower
    bound exceeds the band (~38% fewer pairs on curved meshes). The legacy
    `propagate`/`eikonal` far-field modes bin with prune=False: they rely on
    the L-inf dilation's extra seeds beyond the exact band."""
    ni, nj, nk = grid.shape
    ti, tj, tk = tile_shape
    nti, ntj, ntk = _round_up(ni, ti) // ti, _round_up(nj, tj) // tj, _round_up(nk, tk) // tk

    # native fast path (csrc/sdfbin.cpp): bit-identical two-pass counting
    # sort, ~20x the vectorized NumPy below at the 82k-triangle flagship.
    # A native-library FAILURE (nonzero rc) degrades to the NumPy path just
    # like unavailability — consistent with the parity/crossings fallbacks.
    from ..io import native as _native

    try:
        res = _native.bin_triangles_native(
            verts, tris, grid.origin, grid.dx, grid.shape, exact_band,
            tile_shape, pad_k_to, prune=prune,
        )
    except _native.NativeIOError:
        res = None
    if res is not None:
        active, cand, valid, tdim = res
        return BandBinning(tile_shape, tdim, active, cand, valid)

    f = triangle_grid_coords(verts, tris, grid)  # (M, 3, 3) float64
    fmin = f.min(axis=1)  # (M, 3)
    fmax = f.max(axis=1)

    # Reference window: i0 = clamp(int(min)-band, 0, ni-1),
    # i1 = clamp(int(max)+band+1, 0, ni-1)  (makelevelset3.cpp:210-212).
    # int() is C truncation toward zero.
    dims = np.array([ni, nj, nk], np.int64)
    lo = np.clip(np.trunc(fmin).astype(np.int64) - exact_band, 0, dims - 1)
    hi = np.clip(np.trunc(fmax).astype(np.int64) + exact_band + 1, 0, dims - 1)

    tlo = lo // np.array(tile_shape, np.int64)
    thi = hi // np.array(tile_shape, np.int64)
    spans = thi - tlo + 1  # (M, 3) tiles overlapped per axis
    counts = spans.prod(axis=1)

    total = int(counts.sum())
    if total == 0:
        return BandBinning(
            tile_shape,
            (nti, ntj, ntk),
            np.zeros((0,), np.int32),
            np.zeros((0, pad_k_to), np.int32),
            np.zeros((0, pad_k_to), bool),
        )

    # Expand (triangle, tile) pairs fully vectorized.
    tri_ids = np.repeat(np.arange(len(tris), dtype=np.int64), counts)
    # rank of each pair within its triangle's block
    offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
    rank = np.arange(total, dtype=np.int64) - np.repeat(offs, counts)
    sj = spans[tri_ids, 1]
    sk = spans[tri_ids, 2]
    dk = rank % sk
    dj = (rank // sk) % sj
    di = rank // (sk * sj)
    tile_i = tlo[tri_ids, 0] + di
    tile_j = tlo[tri_ids, 1] + dj
    tile_k = tlo[tri_ids, 2] + dk

    # Exact-overlap prune, bit-identical to csrc/sdfbin.cpp keep_tile (the
    # native library is built with -ffp-contract=off for exactly this):
    # drop a pair when a LOWER BOUND on dist(tile cell box, triangle)
    # exceeds band + eps — (1) the Euclidean bbox gap (the legacy window is
    # its L-inf version, which keeps diagonal-corner tiles), (2) the
    # distance from the tile box to the triangle's plane. Both bound the
    # true cell distance from below, so freeze-band winners are never lost.
    # Skipped entirely when pruning is off (legacy propagate/eikonal modes
    # keep the full L-inf window) — the geometry is pure wasted host time
    # there.
    if prune:
        e1 = f[:, 1, :] - f[:, 0, :]
        e2 = f[:, 2, :] - f[:, 0, :]
        nrm = np.cross(e1, e2)
        nlen = np.sqrt((nrm * nrm).sum(axis=1))
        dplane = (nrm * f[:, 0, :]).sum(axis=1)

        tix = np.stack([tile_i, tile_j, tile_k], axis=1).astype(np.float64)
        tsz = np.array(tile_shape, np.float64)
        blo = tix * tsz
        bhi = np.minimum((tix + 1.0) * tsz - 1.0,
                         (dims - 1).astype(np.float64))
        pf_min = fmin[tri_ids]
        pf_max = fmax[tri_ids]
        gap = np.maximum(0.0, np.maximum(blo - pf_max, pf_min - bhi))
        eps = 1e-6
        limit = float(exact_band) + eps
        keep = (gap * gap).sum(axis=1) <= limit * limit

        pn = nrm[tri_ids]
        has_n = nlen[tri_ids] > 1e-30
        center_dot = (pn * (0.5 * (blo + bhi))).sum(axis=1)
        radius = (np.abs(pn) * (0.5 * (bhi - blo))).sum(axis=1)
        with np.errstate(invalid="ignore", divide="ignore"):
            plane_gap = (np.abs(center_dot - dplane[tri_ids]) - radius) / nlen[
                tri_ids]
        keep &= ~(has_n & (plane_gap > limit))

        tri_ids = tri_ids[keep]
        tile_i, tile_j, tile_k = tile_i[keep], tile_j[keep], tile_k[keep]
    tile_lin = (tile_i * ntj + tile_j) * ntk + tile_k
    total = len(tri_ids)
    if total == 0:
        return BandBinning(
            tile_shape,
            (nti, ntj, ntk),
            np.zeros((0,), np.int32),
            np.zeros((0, pad_k_to), np.int32),
            np.zeros((0, pad_k_to), bool),
        )

    order = np.argsort(tile_lin, kind="stable")
    tile_lin = tile_lin[order]
    tri_ids = tri_ids[order]

    uniq, starts, per_tile = np.unique(tile_lin, return_index=True, return_counts=True)
    K = max(int(per_tile.max()), 1)
    K = _round_up(K, pad_k_to)

    A = len(uniq)
    cand = np.zeros((A, K), np.int32)
    valid = np.zeros((A, K), bool)
    # position of each pair within its tile group
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, per_tile)
    row = np.repeat(np.arange(A, dtype=np.int64), per_tile)
    cand[row, pos] = tri_ids.astype(np.int32)
    valid[row, pos] = True

    return BandBinning(tile_shape, (nti, ntj, ntk), uniq.astype(np.int32), cand, valid)


# ---------------------------------------------------------------------------
# Device kernel
# ---------------------------------------------------------------------------


def _tile_local_offsets(tile_shape):
    ti, tj, tk = tile_shape
    oi = jnp.arange(ti, dtype=jnp.int32).reshape(ti, 1, 1)
    oj = jnp.arange(tj, dtype=jnp.int32).reshape(1, tj, 1)
    ok = jnp.arange(tk, dtype=jnp.int32).reshape(1, 1, tk)
    off = jnp.stack(
        [
            jnp.broadcast_to(oi, tile_shape),
            jnp.broadcast_to(oj, tile_shape),
            jnp.broadcast_to(ok, tile_shape),
        ],
        axis=-1,
    )  # (ti, tj, tk, 3)
    return off.reshape(-1, 3)  # (C, 3)


@partial(
    jax.jit,
    static_argnames=("tile_shape", "tiles_dim", "grid_shape", "chunk"),
)
def band_distance_field(
    tri_verts: jnp.ndarray,  # (M, 3, 3) float32
    active_ids: jnp.ndarray,  # (A,)
    cand: jnp.ndarray,  # (A, K)
    cand_valid: jnp.ndarray,  # (A, K)
    origin: jnp.ndarray,  # (3,) float32 GLOBAL grid origin
    dx: jnp.ndarray,  # () float32
    tile_shape: Tuple[int, int, int],
    tiles_dim: Tuple[int, int, int],
    grid_shape: Tuple[int, int, int],
    chunk: int = 128,
    ijk_offset=None,  # (3,) int32 global index of local cell (0,0,0); None = zeros
    upper_override=None,  # () f32 init upper bound; None = (ni+nj+nk)*dx
):
    """Dense (ni, nj, nk) narrow-band (phi, closest_tri) from binned candidates.

    For sharded blocks, `ijk_offset` shifts cell indices to GLOBAL coordinates
    so world positions are bit-identical to the reference's f32(i)*dx+origin
    (makelevelset3.cpp:214), and `upper_override` carries the global-grid
    upper bound (ni+nj+nk)*dx.
    """
    ni, nj, nk = grid_shape
    nti, ntj, ntk = tiles_dim
    ti, tj, tk = tile_shape
    C = ti * tj * tk
    T = nti * ntj * ntk
    A = active_ids.shape[0]

    if upper_override is None:
        upper = (jnp.float32(ni + nj + nk)) * dx  # makelevelset3.cpp:197
    else:
        upper = upper_override
    if ijk_offset is None:
        ijk_offset = jnp.zeros((3,), jnp.int32)

    local = _tile_local_offsets(tile_shape)  # (C, 3) int32
    tri9 = tri_verts.reshape(-1, 9).T  # (9, M) — SoA: avoids (.., 3, 3) gathers
    # that TPU tiling would pad to (.., 4, 128)

    def tile_chunk(args):
        ids, cd, vd = args  # (B,), (B,K), (B,K)
        tile_k = ids % ntk
        tile_j = (ids // ntk) % ntj
        tile_i = ids // (ntk * ntj)
        base = jnp.stack([tile_i * ti, tile_j * tj, tile_k * tk], axis=-1)  # (B,3)
        cell_idx = base[:, None, :] + local[None, :, :] + ijk_offset[None, None, :]
        # World positions exactly as the reference: f32(i)*f32(dx) + f32(origin)
        # (makelevelset3.cpp:214).
        gx = cell_idx.astype(jnp.float32) * dx + origin  # (B, C, 3)

        ga, gb, gc = gather_tri9(tri9, cd)  # 3 x 3-tuples of (B, K)
        p = tuple(gx[:, :, None, ax] for ax in range(3))  # (B, C, 1)
        va = tuple(v[:, None, :] for v in ga)  # (B, 1, K)
        vb = tuple(v[:, None, :] for v in gb)
        vc = tuple(v[:, None, :] for v in gc)
        d2 = point_triangle_distance_sq_soa(p, va, vb, vc)  # (B, C, K)
        d2 = jnp.where(vd[:, None, :], d2, jnp.float32(jnp.inf))
        # Tie-break: the reference keeps the FIRST triangle achieving the min
        # (strict '<' update, makelevelset3.cpp:216-219); argmin picks the
        # lowest index among equals only if candidates are sorted by id —
        # binning emits ids in ascending order per tile, so this matches.
        amin = jnp.argmin(d2, axis=-1)  # (B, C)
        dmin2 = jnp.take_along_axis(d2, amin[..., None], axis=-1)[..., 0]
        tid = jnp.take_along_axis(cd, amin, axis=-1).astype(jnp.int32)
        # Adopt only below the init upper bound, like the strict '<' against
        # phi = (ni+nj+nk)*dx (makelevelset3.cpp:216).
        has = dmin2 < upper * upper
        phi = jnp.where(has, jnp.sqrt(dmin2), upper)
        tid = jnp.where(has, tid, -1)
        return phi.astype(jnp.float32), tid

    if A == 0:
        phi_rows = jnp.zeros((0, C), jnp.float32)
        tid_rows = jnp.zeros((0, C), jnp.int32)
    else:
        B = min(chunk, A)
        A_pad = _round_up(A, B)
        pad = A_pad - A
        ids_p = jnp.pad(active_ids, (0, pad))
        cand_p = jnp.pad(cand, ((0, pad), (0, 0)))
        valid_p = jnp.pad(cand_valid, ((0, pad), (0, 0)))
        phi_rows, tid_rows = jax.lax.map(
            tile_chunk,
            (
                ids_p.reshape(-1, B),
                cand_p.reshape(-1, B, cand.shape[1]),
                valid_p.reshape(-1, B, cand.shape[1]),
            ),
        )
        phi_rows = phi_rows.reshape(A_pad, C)[:A]
        tid_rows = tid_rows.reshape(A_pad, C)[:A]

    # Assemble dense tiled grid via contiguous row scatter, then untile.
    # mode='drop' makes the sentinel rows (index T) from host-side bucketing
    # disappear instead of clamping onto a real tile.
    phi_tiles = (
        jnp.full((T, C), upper, jnp.float32).at[active_ids].set(phi_rows, mode="drop")
    )
    tid_tiles = (
        jnp.full((T, C), -1, jnp.int32).at[active_ids].set(tid_rows, mode="drop")
    )

    def untile(x):
        x = x.reshape(nti, ntj, ntk, ti, tj, tk)
        x = x.transpose(0, 3, 1, 4, 2, 5).reshape(nti * ti, ntj * tj, ntk * tk)
        return x[:ni, :nj, :nk]

    return untile(phi_tiles), untile(tid_tiles)
