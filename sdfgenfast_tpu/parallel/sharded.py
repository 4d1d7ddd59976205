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
from ..ops import dense as dense_ops
from ..ops import jfa as jfa_ops
from ..ops import sign_host as sign_host_ops
from ..ops.geometry import gather_tri9, point_triangle_distance_sq_soa
from ..pipeline import SDFConfig, _recompute_phi, use_dense

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
    parity_packed: np.ndarray  # (Dj, Dk, ceil(ni/8), nj_l, nk_l) uint8
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
    mesh.validate_indices()
    if use_dense(config, len(mesh.tris)):
        # dense path needs no band binning; keep shard-shaped empty arrays so
        # the shard_map in_specs stay uniform
        band_tiles_local = (1, 1, 1)
        b_ids = np.zeros((Dj, Dk, 0), np.int32)
        b_cand = np.zeros((Dj, Dk, 0, 1), np.int32)
        b_valid = np.zeros((Dj, Dk, 0, 1), bool)
    else:
        bb = band_ops.bin_triangles(
            mesh.verts, mesh.tris, grid, config.exact_band, config.tile_shape
        )
        nti = -(-ni // ti)
        band_tiles_local = (nti, nj_l // tj, nk_l // tk)
        b_ids, b_cand, b_valid = _partition_tiles(
            bb.active_ids.astype(np.int64), bb.cand, bb.cand_valid,
            bb.tiles_dim, band_tiles_local, dims,
        )

    # host parity, globally (native C++ kernel), then packed per shard block
    packed = sign_host_ops.parity_packed_host(mesh.verts, mesh.tris, grid)
    packed_blocks = (
        packed.reshape(packed.shape[0], Dj, nj_l, Dk, nk_l)
        .transpose(1, 3, 0, 2, 4)
        .copy()
    )  # (Dj, Dk, ceil(ni/8), nj_l, nk_l)

    return ShardedBinned(
        grid, config, dims, (ni, nj_l, nk_l),
        band_tiles_local, b_ids, b_cand, b_valid,
        packed_blocks, mesh.tris.astype(np.int32),
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


def _sharded_refine(d2, tid, tri9, pos_axes, max_passes):
    """Jacobi 26-neighbor polish with per-pass corner-complete halo exchange.

    Each pass reads only pass-start state (true Jacobi), so a sharded pass is
    bit-identical to the single-device refine pass in ops/jfa.py — sharded
    and single-device results agree exactly at convergence."""
    shape = d2.shape
    p = (
        jnp.broadcast_to(pos_axes[0][:, None, None], shape),
        jnp.broadcast_to(pos_axes[1][None, :, None], shape),
        jnp.broadcast_to(pos_axes[2][None, None, :], shape),
    )
    def eval_tid(t):
        a, b, c = gather_tri9(tri9, t)
        dd = point_triangle_distance_sq_soa(p, a, b, c)
        return jnp.where(t >= 0, dd, jnp.float32(jnp.inf))

    ni, nj_l, nk_l = shape
    offs = jnp.asarray(jfa_ops._OFFSETS, dtype=jnp.int32)

    def one_pass(state):
        d2_best, tid, it, _ = state
        ext = _exchange_tid_halos(tid)  # (ni+2, nj_l+2, nk_l+2), pass-start
        # fori_loop over dynamic slices, not 26 static shifts: XLA hoists the
        # unrolled shift buffers simultaneously and OOMs at large grids (same
        # fix as ops/jfa.py refine_closest)

        def body(k, carry):
            d2_new, tid_new = carry
            o = offs[k]
            cand = jax.lax.dynamic_slice(
                ext, (1 - o[0], 1 - o[1], 1 - o[2]), (ni, nj_l, nk_l)
            )
            d2c = eval_tid(cand)
            better = d2c < d2_new
            return (
                jnp.where(better, d2c, d2_new),
                jnp.where(better, cand, tid_new),
            )

        d2_new, tid_new = jax.lax.fori_loop(
            0, len(jfa_ops._OFFSETS), body, (d2_best, tid)
        )
        changed_local = jnp.any(tid_new != tid).astype(jnp.int32)
        changed = jax.lax.psum(jax.lax.psum(changed_local, "j"), "k") > 0
        return d2_new, tid_new, it + 1, changed

    def cond(state):
        _, _, it, changed = state
        return changed & (it < max_passes)

    d2f, tid, _, _ = jax.lax.while_loop(
        cond, one_pass, (d2, tid, jnp.int32(0), jnp.bool_(True))
    )
    return d2f, tid


def _make_inner(block, band_tiles_local, tile_shape, max_passes, band_chunk,
                jfa_tile_shape):
    ni, nj_l, nk_l = block

    def inner(tri_verts, origin, dx, b_ids, b_cand, b_valid, parity_packed):
        # squeeze the (1, 1) device-block axes shard_map leaves on inputs
        b_ids, b_cand, b_valid = b_ids[0, 0], b_cand[0, 0], b_valid[0, 0]
        parity_packed = parity_packed[0, 0]

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

        parity = sign_host_ops.unpack_parity_device(parity_packed, ni)

        # ---- far field: REPLICATED tile JFA + per-shard evaluation ----
        lti, ltj, ltk = band_tiles_local
        ji, jj2, jk2 = jfa_tile_shape
        r1, r2, r3 = tile_shape[0] // ji, tile_shape[1] // jj2, tile_shape[2] // jk2
        # global JFA tile grid (i covered by local tiles; j/k by all shards)
        gjfa = (lti * r1, ltj * r2 * Dj, ltk * r3 * Dk)
        band_tile_off = jnp.stack(
            [jnp.int32(0), (dj * ltj).astype(jnp.int32), (dk * ltk).astype(jnp.int32)]
        )
        seed_local = jfa_ops.tile_seed_field(
            tv_ng, b_ids, b_cand, b_valid,
            band_tiles_local, tile_shape, gjfa, jfa_tile_shape, origin, dx,
            band_tile_offset=band_tile_off,
        )  # dense GLOBAL-sized field, -1 outside this shard's tiles
        # combine across shards: disjoint ownership -> elementwise max
        seed = jax.lax.pmax(jax.lax.pmax(seed_local, "j"), "k")

        jfa1, jfa2 = jfa_ops.tile_jfa_closest(
            tv_ng, seed, gjfa, jfa_tile_shape, origin, dx
        )
        cands_all = jfa_ops.neighborhood_candidates(jfa1, jfa2)  # (T_glob, 56)
        cands_all = cands_all.reshape(gjfa[0], gjfa[1], gjfa[2], 56)
        local_jfa = (lti * r1, ltj * r2, ltk * r3)
        cands = jax.lax.dynamic_slice(
            cands_all,
            (0, dj * ltj * r2, dk * ltk * r3, 0),
            (local_jfa[0], local_jfa[1], local_jfa[2], 56),
        ).reshape(-1, 56)

        T_loc = cands.shape[0]
        phi_far, tid_far = band_ops.band_distance_field(
            tv_ng,
            jnp.arange(T_loc, dtype=jnp.int32),
            jnp.maximum(cands, 0),
            cands >= 0,
            origin, dx,
            tile_shape=jfa_tile_shape, tiles_dim=local_jfa,
            grid_shape=(ni, nj_l, nk_l), chunk=band_chunk,
            ijk_offset=ijk_off, upper_override=up,
        )
        better = phi_far < phi0
        phi = jnp.where(better, phi_far, phi0)
        tid = jnp.where(better, tid_far, tid0)

        tri9 = tv_ng.reshape(-1, 9).T
        _, tid = _sharded_refine(jnp.square(phi), tid, tri9, pos_axes, max_passes)

        out = _recompute_phi(tri_verts, tid, parity, origin, dx, up, ijk_offset=ijk_off)
        return out[None, None]  # restore (1, 1) block axes

    return inner


def _make_inner_dense(block, skip_recompute, interpret):
    """Dense all-triangles shard kernel: every shard evaluates every triangle
    against its local cells — no band binning, no JFA, no halo exchange at
    all (the per-cell result never depends on neighbor shards). Cell coords
    use GLOBAL indices, so results are bit-identical to single-device runs."""
    ni, nj_l, nk_l = block

    def inner(tri_verts, origin, dx, b_ids, b_cand, b_valid, parity_packed):
        parity_packed = parity_packed[0, 0]
        dj = jax.lax.axis_index("j")
        dk = jax.lax.axis_index("k")
        nj = nj_l * jax.lax.axis_size("j")
        nk = nk_l * jax.lax.axis_size("k")
        up = jnp.float32(ni + nj + nk) * dx
        ijk_off = jnp.stack(
            [jnp.int32(0), (dj * nj_l).astype(jnp.int32), (dk * nk_l).astype(jnp.int32)]
        )

        tv_ng = jax.lax.stop_gradient(tri_verts)
        phi_d, tid = dense_ops.dense_distance_field(
            tv_ng, origin, dx, grid_shape=(ni, nj_l, nk_l),
            ijk_offset=ijk_off, interpret=interpret,
        )
        parity = sign_host_ops.unpack_parity_device(parity_packed, ni)
        if skip_recompute:
            out = jnp.where(parity, -phi_d, phi_d)
        else:
            out = _recompute_phi(tri_verts, tid, parity, origin, dx, up,
                                 ijk_offset=ijk_off)
        return out[None, None]

    return inner


@partial(
    jax.jit,
    static_argnames=(
        "mesh_obj", "block", "band_tiles_local", "tile_shape",
        "max_passes", "band_chunk", "jfa_tile_shape", "dense", "skip_recompute",
    ),
)
def _sharded_core(
    tri_verts,
    band_ids, band_cand, band_valid, parity_packed,
    origin, dx,
    *, mesh_obj, block, band_tiles_local, tile_shape, max_passes, band_chunk,
    jfa_tile_shape, dense=False, skip_recompute=False,
):
    """Returns phi blocks (Dj, Dk, ni, nj_l, nk_l), grid-sharded over the mesh."""
    if dense:
        interpret = jax.default_backend() != "tpu"
        inner = _make_inner_dense(block, skip_recompute, interpret)
    else:
        inner = _make_inner(block, band_tiles_local, tile_shape, max_passes,
                            band_chunk, jfa_tile_shape)
    blk2 = P("j", "k", None)
    blk3 = P("j", "k", None, None)
    blk4 = P("j", "k", None, None, None)
    return shard_map(
        inner,
        mesh=mesh_obj,
        in_specs=(P(), P(), P(), blk2, blk3, blk3, blk4),
        out_specs=P("j", "k", None, None, None),
        check_vma=False,
    )(
        tri_verts, origin, dx,
        band_ids, band_cand, band_valid, parity_packed,
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
    # concrete (non-traced) verts cannot be differentiated through anyway, so
    # the dense path may apply the sign directly instead of re-evaluating
    # distances through the differentiable recompute
    skip_recompute = not isinstance(verts, jax.core.Tracer)
    v = jnp.asarray(verts if verts is not None else _require_verts(binned))
    tri_verts = v[jnp.asarray(binned.tris)]
    out = _sharded_core(
        tri_verts,
        jnp.asarray(binned.band_ids), jnp.asarray(binned.band_cand),
        jnp.asarray(binned.band_valid),
        jnp.asarray(binned.parity_packed),
        jnp.asarray(binned.grid.origin, jnp.float32), jnp.float32(binned.grid.dx),
        mesh_obj=device_mesh, block=binned.block,
        band_tiles_local=binned.band_tiles_local, tile_shape=cfg.tile_shape,
        max_passes=cfg.max_passes, band_chunk=cfg.band_chunk,
        jfa_tile_shape=cfg.jfa_tile_shape,
        dense=use_dense(cfg, len(binned.tris)),
        skip_recompute=skip_recompute,
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
