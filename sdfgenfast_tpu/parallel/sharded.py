"""Multi-chip SDF pipeline: grid-tile sharding over a (j, k) device mesh.

The reference's only parallelism is intra-process (k-slice threads on CPU,
``cpu_lib/makelevelset3.cpp:238-292``; CUDA blocks on GPU). This module is the
scale-out capability the TPU build adds: the voxel grid is sharded over a 2D
``jax.sharding.Mesh`` with named axes ("j", "k") and the whole pipeline runs
under ``shard_map``.

Design choices that make the domain decomposition cheap on ICI:
- The i-axis stays UNSHARDED, so the x-ray prefix parity (a cumsum along i,
  replacing the reference's serial per-column scans, makelevelset3.cpp:295-303)
  is local to every device — no segmented-scan collective at all.
- Narrow-band and sign binning are computed globally on host, then the active
  tiles are partitioned by owner device (tiles never straddle shard edges by
  construction), so each shard runs the identical single-device kernels.
- The far-field plane-scan propagation reads STALE halos: each pass starts
  with a corner-complete halo exchange (two-phase ppermute: j-planes first,
  then k-planes of the j-extended block so corners ride along), then all
  devices sweep locally in parallel. Stale boundaries are the deterministic
  analog of the reference CPU backend's intentional cross-slice race
  ("FluidX3D approach", makelevelset3.cpp:238): convergence is recovered by
  iterating passes until a psum'd changed-flag clears.
- Vertex gradients: tri_verts enter replicated; shard_map's transpose inserts
  the cross-device psum of the per-shard partial gradients automatically.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..grid import GridSpec
from ..mesh import Mesh as TriMesh
from ..ops import band as band_ops
from ..ops import sign as sign_ops
from ..ops.geometry import point_triangle_distance_sq
from ..pipeline import SDFConfig, _recompute_phi

__all__ = ["make_device_mesh", "ShardedBinned", "bin_mesh_sharded", "sharded_sdf"]


def make_device_mesh(devices=None, shape: Optional[Tuple[int, int]] = None) -> Mesh:
    """A 2D (j, k) device mesh; shape defaults to the most-square factoring."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        dj = int(np.sqrt(n))
        while n % dj:
            dj -= 1
        shape = (dj, n // dj)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names=("j", "k"))


# ---------------------------------------------------------------------------
# Host-side partitioned binning
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ShardedBinned:
    """Global binning partitioned by owner device.

    Band arrays have shape (Dj, Dk, A, K); active ids are LOCAL linear tile
    indices within each shard's block (sentinel == local tile count for pad
    rows, dropped by the scatter). f_hi/f_lo are replicated.
    """

    grid: GridSpec
    config: SDFConfig
    dims: Tuple[int, int]  # (Dj, Dk)
    block: Tuple[int, int, int]  # local (ni, nj_l, nk_l)
    band_tiles_local: Tuple[int, int, int]
    band_ids: np.ndarray
    band_cand: np.ndarray
    band_valid: np.ndarray
    sign_tiles_local: Tuple[int, int]
    sign_ids: np.ndarray
    sign_cand: np.ndarray
    sign_valid: np.ndarray
    f_hi: np.ndarray
    f_lo: np.ndarray
    tris: np.ndarray


def _partition_tiles(active_ids, cand, valid, tiles_dim, tiles_local, dims):
    """Split global active tiles by owner device; renumber ids locally."""
    if len(tiles_dim) == 3:
        nti, ntj, ntk = tiles_dim
        lti, ltj, ltk = tiles_local
        ti = active_ids // (ntj * ntk)
        tj = (active_ids // ntk) % ntj
        tk = active_ids % ntk
        dj = tj // ltj
        dk = tk // ltk
        local = (ti * ltj + (tj % ltj)) * ltk + (tk % ltk)
        local_total = lti * ltj * ltk
    else:
        ntj, ntk = tiles_dim
        ltj, ltk = tiles_local
        tj = active_ids // ntk
        tk = active_ids % ntk
        dj = tj // ltj
        dk = tk // ltk
        local = (tj % ltj) * ltk + (tk % ltk)
        local_total = ltj * ltk
    Dj, Dk = dims
    owner = (dj * Dk + dk).astype(np.int64)
    counts = np.bincount(owner, minlength=Dj * Dk)
    A = max(int(counts.max()), 1)
    A = -(-A // 8) * 8
    K = cand.shape[1]
    ids_out = np.full((Dj * Dk, A), local_total, np.int32)  # sentinel -> dropped
    cand_out = np.zeros((Dj * Dk, A, K), np.int32)
    valid_out = np.zeros((Dj * Dk, A, K), bool)
    order = np.argsort(owner, kind="stable")
    offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(len(owner)) - offs[owner[order]]
    ids_out[owner[order], pos] = local[order].astype(np.int32)
    cand_out[owner[order], pos] = cand[order]
    valid_out[owner[order], pos] = valid[order]
    return (
        ids_out.reshape(Dj, Dk, A),
        cand_out.reshape(Dj, Dk, A, K),
        valid_out.reshape(Dj, Dk, A, K),
    )


def bin_mesh_sharded(
    mesh: TriMesh, grid: GridSpec, dims: Tuple[int, int], config: SDFConfig = SDFConfig()
) -> ShardedBinned:
    Dj, Dk = dims
    ni, nj, nk = grid.shape
    if nj % Dj or nk % Dk:
        raise ValueError(f"grid (nj={nj}, nk={nk}) must divide over device mesh {dims}")
    nj_l, nk_l = nj // Dj, nk // Dk
    ti, tj, tk = config.tile_shape
    if nj_l % tj or nk_l % tk:
        raise ValueError("shard block must be a multiple of tile_shape")
    stj, stk = config.tile2d_shape
    if nj_l % stj or nk_l % stk:
        raise ValueError("shard block must be a multiple of tile2d_shape")

    mesh.validate_indices()
    bb = band_ops.bin_triangles(
        mesh.verts, mesh.tris, grid, config.exact_band, config.tile_shape
    )
    nti = -(-ni // ti)
    band_tiles_local = (nti, nj_l // tj, nk_l // tk)
    b_ids, b_cand, b_valid = _partition_tiles(
        bb.active_ids.astype(np.int64), bb.cand, bb.cand_valid,
        bb.tiles_dim, band_tiles_local, dims,
    )

    sb = sign_ops.bin_triangles_2d(mesh.verts, mesh.tris, grid, config.tile2d_shape)
    sign_tiles_local = (nj_l // stj, nk_l // stk)
    s_ids, s_cand, s_valid = _partition_tiles(
        sb.active_ids.astype(np.int64), sb.cand, sb.cand_valid,
        sb.tiles_dim, sign_tiles_local, dims,
    )

    return ShardedBinned(
        grid, config, dims, (ni, nj_l, nk_l),
        band_tiles_local, b_ids, b_cand, b_valid,
        sign_tiles_local, s_ids, s_cand, s_valid,
        sb.f_hi, sb.f_lo, mesh.tris.astype(np.int32),
    )


# ---------------------------------------------------------------------------
# Halo exchange + sharded sweeps (inside shard_map)
# ---------------------------------------------------------------------------


def _neighbor_shift(x, axis_name, src_offset, fill):
    """Device i receives x from device i + src_offset; edges receive `fill`."""
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        return jnp.full_like(x, fill)
    perm = [(i + src_offset, i) for i in range(n) if 0 <= i + src_offset < n]
    y = jax.lax.ppermute(x, axis_name, perm)  # non-receivers get zeros
    idx = jax.lax.axis_index(axis_name)
    at_edge = (idx == 0) if src_offset < 0 else (idx == n - 1)
    return jnp.where(at_edge, jnp.full_like(x, fill), y)


def _extend(x, axis_name, axis, fill):
    # lo halo = LAST plane of the previous device (src_offset -1);
    # hi halo = FIRST plane of the next device (src_offset +1).
    lo = _neighbor_shift(
        jax.lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis], axis=axis),
        axis_name, -1, fill,
    )
    hi = _neighbor_shift(jax.lax.slice_in_dim(x, 0, 1, axis=axis), axis_name, 1, fill)
    return jnp.concatenate([lo, x, hi], axis=axis)


def _exchange_tid_halos(tid):
    """Stale, corner-complete extended tid: (ni+2, nj_l+2, nk_l+2).

    j-phase first, then k-phase over the j-extended block (carries corners).
    The i-axis is unsharded: padded with -1 (no cell there).
    """
    t = _extend(tid, "j", 1, jnp.int32(-1))
    t = _extend(t, "k", 2, jnp.int32(-1))
    return jnp.pad(t, ((1, 1), (0, 0), (0, 0)), constant_values=-1)


def _nine_shifts(padded):
    """(9, A, B) stack of 3x3 shifts of a (A+2, B+2) padded plane."""
    A, B = padded.shape[0] - 2, padded.shape[1] - 2
    return jnp.stack(
        [padded[da : da + A, db : db + B] for da in (0, 1, 2) for db in (0, 1, 2)]
    )


def _plane_update(cur_phi, cur_tid, prev_padded_tid, gx, tri_verts):
    cand = _nine_shifts(prev_padded_tid)  # (9, A, B)
    valid = cand >= 0
    tv = tri_verts[jnp.maximum(cand, 0)]
    d2 = point_triangle_distance_sq(gx[None], tv[..., 0, :], tv[..., 1, :], tv[..., 2, :])
    d2 = jnp.where(valid, d2, jnp.float32(jnp.inf))
    amin = jnp.argmin(d2, axis=0)
    dmin2 = jnp.take_along_axis(d2, amin[None], axis=0)[0]
    best = jnp.take_along_axis(cand, amin[None], axis=0)[0]
    d = jnp.sqrt(dmin2)
    better = d < cur_phi  # strict, like check_neighbour (makelevelset3.cpp:97)
    return jnp.where(better, d, cur_phi), jnp.where(better, best, cur_tid)


def _sweep_axis_stale(phi, tid, ext_tid, tri_verts, pos_axes, axis, reverse):
    """One directional plane scan over the local block.

    phi/tid: (ni, nj_l, nk_l) current state (updated in scan order).
    ext_tid: (ni+2, nj_l+2, nk_l+2) stale halo-extended snapshot; supplies the
    initial carry plane and the out-of-block ring of every previous plane.
    """
    phi_t = jnp.moveaxis(phi, axis, 0)
    tid_t = jnp.moveaxis(tid, axis, 0)
    ext_t = jnp.moveaxis(ext_tid, axis, 0)  # (nA+2, B+2, C+2)
    nA, B, C = phi_t.shape

    other = [a for a in range(3) if a != axis]
    pa = pos_axes[axis]  # (nA,) world coords along scan axis (local block)
    pb = jnp.broadcast_to(pos_axes[other[0]][:, None], (B, C))
    pc = jnp.broadcast_to(pos_axes[other[1]][None, :], (B, C))

    ring = ext_t[1:-1]  # per-plane stale rings, scan-axis aligned with phi_t

    if reverse:
        phi_seq, tid_seq, ring_seq, pa_seq = (
            phi_t[::-1], tid_t[::-1], ring[::-1], pa[::-1],
        )
        init = ext_t[-1]
    else:
        phi_seq, tid_seq, ring_seq, pa_seq = phi_t, tid_t, ring, pa
        init = ext_t[0]

    def step(carry, xs):
        cur_phi, cur_tid, cur_ring, a_coord = xs
        coords = [None, None, None]
        coords[axis] = jnp.broadcast_to(a_coord, (B, C))
        coords[other[0]] = pb
        coords[other[1]] = pc
        gx = jnp.stack(coords, axis=-1)
        new_phi, new_tid = _plane_update(cur_phi, cur_tid, carry, gx, tri_verts)
        new_carry = cur_ring.at[1:-1, 1:-1].set(new_tid)
        return new_carry, (new_phi, new_tid)

    _, (out_phi, out_tid) = jax.lax.scan(step, init, (phi_seq, tid_seq, ring_seq, pa_seq))
    if reverse:
        out_phi = out_phi[::-1]
        out_tid = out_tid[::-1]
    return jnp.moveaxis(out_phi, 0, axis), jnp.moveaxis(out_tid, 0, axis)


def _sharded_propagate(phi, tid, tri_verts, pos_axes, max_passes):
    """Iterate 6 directional stale-halo scans until globally unchanged."""

    def one_pass(state):
        phi, tid, it, _ = state
        phi0 = phi
        ext = _exchange_tid_halos(tid)
        for axis in (0, 1, 2):
            for reverse in (False, True):
                phi, tid = _sweep_axis_stale(
                    phi, tid, ext, tri_verts, pos_axes, axis, reverse
                )
        changed_local = jnp.any(phi != phi0).astype(jnp.int32)
        changed = jax.lax.psum(jax.lax.psum(changed_local, "j"), "k") > 0
        return phi, tid, it + 1, changed

    def cond(state):
        _, _, it, changed = state
        return changed & (it < max_passes)

    phi, tid, _, _ = jax.lax.while_loop(
        cond, one_pass, (phi, tid, jnp.int32(0), jnp.bool_(True))
    )
    return phi, tid


# ---------------------------------------------------------------------------
# Full sharded pipeline
# ---------------------------------------------------------------------------


def _make_inner(block, band_tiles_local, tile_shape, sign_tiles_local,
                tile2d_shape, max_passes, band_chunk, sign_chunk):
    ni, nj_l, nk_l = block

    def inner(tri_verts, f_hi, f_lo, origin, dx,
              b_ids, b_cand, b_valid, s_ids, s_cand, s_valid):
        # squeeze the (1, 1) device-block axes shard_map leaves on inputs
        b_ids, b_cand, b_valid = b_ids[0, 0], b_cand[0, 0], b_valid[0, 0]
        s_ids, s_cand, s_valid = s_ids[0, 0], s_cand[0, 0], s_valid[0, 0]

        dj = jax.lax.axis_index("j")
        dk = jax.lax.axis_index("k")
        Dj = jax.lax.axis_size("j")
        Dk = jax.lax.axis_size("k")
        nj = nj_l * Dj
        nk = nk_l * Dk
        up = jnp.float32(ni + nj + nk) * dx  # makelevelset3.cpp:197

        j_off = (dj * nj_l).astype(jnp.int32)
        k_off = (dk * nk_l).astype(jnp.int32)
        ijk_off = jnp.stack([jnp.int32(0), j_off, k_off])
        # world coords of local cells from GLOBAL indices: f32(idx)*dx+origin,
        # bit-identical to the reference (makelevelset3.cpp:214)
        pos_axes = (
            jnp.arange(ni, dtype=jnp.float32) * dx + origin[0],
            (jnp.arange(nj_l, dtype=jnp.int32) + j_off).astype(jnp.float32) * dx
            + origin[1],
            (jnp.arange(nk_l, dtype=jnp.int32) + k_off).astype(jnp.float32) * dx
            + origin[2],
        )

        tv_ng = jax.lax.stop_gradient(tri_verts)

        phi0, tid0 = band_ops.band_distance_field(
            tv_ng, b_ids, b_cand, b_valid, origin, dx,
            tile_shape=tile_shape, tiles_dim=band_tiles_local,
            grid_shape=(ni, nj_l, nk_l), chunk=band_chunk,
            ijk_offset=ijk_off, upper_override=up,
        )

        parity = sign_ops.parity_field(
            f_hi, f_lo, s_ids, s_cand, s_valid,
            tile_shape=tile2d_shape, tiles_dim=sign_tiles_local,
            grid_shape=(ni, nj_l, nk_l), chunk=sign_chunk,
            jk_offset=jnp.stack([j_off, k_off]),
        )

        phi, tid = _sharded_propagate(phi0, tid0, tv_ng, pos_axes, max_passes)

        out = _recompute_phi(tri_verts, tid, parity, origin, dx, up, ijk_offset=ijk_off)
        return out[None, None]  # restore (1, 1) block axes

    return inner


@partial(
    jax.jit,
    static_argnames=(
        "mesh_obj", "block", "band_tiles_local", "tile_shape",
        "sign_tiles_local", "tile2d_shape", "max_passes", "band_chunk",
        "sign_chunk",
    ),
)
def _sharded_core(
    tri_verts, f_hi, f_lo,
    band_ids, band_cand, band_valid,
    sign_ids, sign_cand, sign_valid,
    origin, dx,
    *, mesh_obj, block, band_tiles_local, tile_shape,
    sign_tiles_local, tile2d_shape, max_passes, band_chunk, sign_chunk,
):
    """Returns phi blocks (Dj, Dk, ni, nj_l, nk_l), grid-sharded over the mesh."""
    inner = _make_inner(
        block, band_tiles_local, tile_shape, sign_tiles_local,
        tile2d_shape, max_passes, band_chunk, sign_chunk,
    )
    blk2 = P("j", "k", None)
    blk3 = P("j", "k", None, None)
    return shard_map(
        inner,
        mesh=mesh_obj,
        in_specs=(P(), P(), P(), P(), P(), blk2, blk3, blk3, blk2, blk3, blk3),
        out_specs=P("j", "k", None, None, None),
        check_vma=False,
    )(
        tri_verts, f_hi, f_lo, origin, dx,
        band_ids, band_cand, band_valid,
        sign_ids, sign_cand, sign_valid,
    )


def sharded_sdf(
    binned: ShardedBinned,
    device_mesh: Mesh,
    verts=None,
    assemble: bool = True,
):
    """Run the full sharded pipeline on `device_mesh`.

    `verts` may be a traced/device (N, 3) array for differentiation (binning
    is reused). Returns (ni, nj, nk) if assemble else the raw
    (Dj, Dk, ni, nj_l, nk_l) block array (still device-sharded).
    """
    cfg = binned.config
    if cfg.far_field != "exact":
        raise NotImplementedError("sharded pipeline currently supports far_field='exact'")
    v = jnp.asarray(verts if verts is not None else _require_verts(binned))
    tri_verts = v[jnp.asarray(binned.tris)]
    out = _sharded_core(
        tri_verts,
        jnp.asarray(binned.f_hi), jnp.asarray(binned.f_lo),
        jnp.asarray(binned.band_ids), jnp.asarray(binned.band_cand),
        jnp.asarray(binned.band_valid),
        jnp.asarray(binned.sign_ids), jnp.asarray(binned.sign_cand),
        jnp.asarray(binned.sign_valid),
        jnp.asarray(binned.grid.origin, jnp.float32), jnp.float32(binned.grid.dx),
        mesh_obj=device_mesh, block=binned.block,
        band_tiles_local=binned.band_tiles_local, tile_shape=cfg.tile_shape,
        sign_tiles_local=binned.sign_tiles_local, tile2d_shape=cfg.tile2d_shape,
        max_passes=cfg.max_passes, band_chunk=cfg.band_chunk,
        sign_chunk=cfg.sign_chunk,
    )
    if not assemble:
        return out
    # (Dj, Dk, ni, nj_l, nk_l) -> (ni, nj, nk)
    ni, nj_l, nk_l = binned.block
    Dj, Dk = binned.dims
    return (
        jnp.transpose(out, (2, 0, 3, 1, 4)).reshape(ni, Dj * nj_l, Dk * nk_l)
    )


def _require_verts(binned: ShardedBinned):
    raise ValueError("sharded_sdf needs `verts` (ShardedBinned stores only tris)")
