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
- The far field runs the closest-point jump flood (ops/vdt.py) with a
  stride ladder capped at config.vdt_max_hop <= the shard block: each
  Jacobi round exchanges one corner-complete max_hop-deep halo slab
  (two-phase ppermute: j-planes first, then k-planes of the j-extended
  block so corners ride along) and is bit-identical to the single-device
  round of the same capped ladder. The final Lipschitz relaxation
  exchanges 1-cell halos the same way.
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
from ..ops import vdt as vdt_ops
from ..ops import dense as dense_ops
from ..ops import sign_host as sign_host_ops
from ..ops import tiled as tiled_ops
from ..pipeline import SDFConfig, _recompute_phi, use_dense

__all__ = ["make_device_mesh", "ShardedBinned", "bin_mesh_sharded",
           "sharded_sdf", "halo_comms_model"]


def halo_comms_model(grid_shape, dims, max_hop, extra_rounds=None,
                     chamfer_passes=2):
    """Exact per-round communication accounting of the sharded far field.

    The compiled program's collectives are fully determined by the config:
    each capped-ladder VDT round exchanges ONE corner-complete halo of depth
    s on each sharded axis via two ppermute phases (j-planes of the (5, ni,
    nj_l, nk_l) state, then k-planes of the j-extended block), and each
    chamfer pass exchanges 1-cell halos of the (ni, nj_l, nk_l) scalar
    field the same way. Each phase sends BOTH directions (lo and hi
    neighbors). Returns the round-by-round byte counts so real-slice
    deployments can size max_hop:

    total VDT bytes/device ~= sum_s 2 * 5 * 4 * ni * s * (nk_l + (nj_l+2s))
    — larger hops mean FEWER rounds (the ladder repeats the cap until the
    full reach is covered) at proportionally larger slabs, so TOTAL bytes
    are nearly hop-independent while ppermute LATENCY counts scale with
    round count: on real ICI (~1 us/collective, ~100 GB/s/link) the slabs
    are bandwidth-sized from ~1 MB up, so the policy is max_hop = the shard
    block (the largest legal value), which `sharded_sdf` applies when
    config.vdt_max_hop is None.
    """
    ni, nj, nk = grid_shape
    Dj, Dk = dims
    nj_l, nk_l = nj // Dj, nk // Dk
    if extra_rounds is None:
        extra_rounds = 2 if max(grid_shape) <= 256 else 4
    strides = vdt_ops.stride_ladder(
        max(grid_shape), max_hop=max_hop, extra_rounds=extra_rounds)
    rounds = []
    f32 = 4
    for s_ in strides:
        # j phase: two directed sends of (5, ni, s, nk_l); k phase operates
        # on the j-extended block: (5, ni, nj_l + 2s, s)
        j_bytes = 2 * 5 * f32 * ni * s_ * nk_l
        k_bytes = 2 * 5 * f32 * ni * (nj_l + 2 * s_) * s_
        rounds.append({"stride": int(s_), "halo_bytes": j_bytes + k_bytes})
    cham_bytes = chamfer_passes * (
        2 * f32 * ni * nk_l + 2 * f32 * ni * (nj_l + 2))
    return {
        "grid": list(grid_shape),
        "device_mesh": [Dj, Dk],
        "max_hop": int(max_hop),
        "vdt_rounds": len(strides),
        "rounds": rounds,
        "vdt_total_bytes_per_device": int(sum(r["halo_bytes"]
                                              for r in rounds)),
        "chamfer_bytes_per_device": int(cham_bytes),
        "ppermute_calls": 2 * len(strides) + 2 * chamfer_passes,
    }


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
        # same >=3-cell seed band as the single-device exact path (pipeline
        # bin_mesh) so sharded and single-device results match exactly
        seed_band = max(config.exact_band, 3)
        bb = band_ops.bin_triangles(
            mesh.verts, mesh.tris, grid, seed_band, config.tile_shape
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


def _extend(x, axis_name, axis, fill, depth: int = 1):
    # lo halo = LAST `depth` planes of the previous device (src_offset -1);
    # hi halo = FIRST `depth` planes of the next device (src_offset +1).
    lo = _neighbor_shift(
        jax.lax.slice_in_dim(x, x.shape[axis] - depth, x.shape[axis], axis=axis),
        axis_name, -1, fill,
    )
    hi = _neighbor_shift(
        jax.lax.slice_in_dim(x, 0, depth, axis=axis), axis_name, 1, fill
    )
    return jnp.concatenate([lo, x, hi], axis=axis)


def _sharded_chamfer(phi, dx, passes):
    """Lipschitz relaxation with corner-complete cross-shard halos.

    Each pass reads only pass-start state (the halo exchange snapshots it),
    so a sharded pass is bit-identical to the single-device
    ``ops/vdt.chamfer_relax`` pass and sharded results match single-device
    exactly at any pass count."""
    ni, nj_l, nk_l = phi.shape
    offs = jnp.asarray(vdt_ops._OFFSETS26, dtype=jnp.int32)
    step = jnp.sqrt(
        jnp.sum(jnp.asarray(vdt_ops._OFFSETS26, jnp.float32) ** 2, axis=-1)
    ) * dx
    big = jnp.float32(3e38)

    for _ in range(passes):
        ext = _extend(phi, "j", 1, big)
        ext = _extend(ext, "k", 2, big)
        ext = jnp.pad(ext, ((1, 1), (0, 0), (0, 0)), constant_values=big)

        def body(k, acc):
            o = offs[k]
            nb = jax.lax.dynamic_slice(
                ext, (1 + o[0], 1 + o[1], 1 + o[2]), (ni, nj_l, nk_l)
            )
            return jnp.minimum(acc, nb + step[k])

        phi = jax.lax.fori_loop(0, offs.shape[0], body, phi)
    return phi


def _make_inner(block, band_tiles_local, tile_shape, band_chunk,
                strides, chamfer_passes, seed_band, skip_recompute):
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

        tv_ng = jax.lax.stop_gradient(tri_verts)

        phi_rows, tid_rows = tiled_ops.tile_candidate_rows(
            tv_ng, b_ids, b_cand, b_valid, origin, dx,
            tile_shape=tile_shape, tiles_dim=band_tiles_local,
            grid_shape=(ni, nj_l, nk_l), chunk=band_chunk,
            ijk_offset=ijk_off, upper_override=up,
        )
        table = tiled_ops.tri_affine_table(
            tv_ng - origin.astype(tv_ng.dtype)
        )
        cp_rows = tiled_ops.closest_point_rows(
            table, b_ids, tid_rows, dx,
            tile_shape=tile_shape, tiles_dim=band_tiles_local,
            chunk=band_chunk, ijk_offset=ijk_off, far=vdt_ops.FAR,
        )
        phi0, tid0 = tiled_ops.scatter_untile(
            phi_rows, tid_rows, b_ids, up,
            tile_shape, band_tiles_local, (ni, nj_l, nk_l),
        )
        cpx, cpy, cpz = (
            tiled_ops.scatter_rows(
                r, b_ids, vdt_ops.FAR, tile_shape, band_tiles_local,
                (ni, nj_l, nk_l),
            )
            for r in cp_rows
        )

        def halo_extend(state, s):
            # corner-complete s-deep halos on the sharded j/k axes of the
            # CHANNEL-FIRST (5, ni, nj_l, nk_l) state; the (unsharded) i
            # axis is handled inside the VDT round
            ext = _extend(state, "j", 2, vdt_ops.FAR, depth=s)
            return _extend(ext, "k", 3, vdt_ops.FAR, depth=s)

        freeze = (tid0 >= 0) & (phi0 <= jnp.float32(seed_band) * dx)
        phi, tid = vdt_ops.vdt_far_field(
            cpx, cpy, cpz, tid0, phi0, dx, strides, freeze_mask=freeze,
            ijk_offset=(0, j_off, k_off), halo_extend=halo_extend,
        )
        if chamfer_passes > 0:
            phi = _sharded_chamfer(phi, dx, chamfer_passes)

        parity = sign_host_ops.unpack_parity_device(parity_packed, ni)
        if skip_recompute:
            out = jnp.where(parity, -phi, phi)
        else:
            out = _recompute_phi(tri_verts, tid, parity, origin, dx, up,
                                 ijk_offset=ijk_off)
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
        "band_chunk", "strides", "chamfer_passes", "seed_band", "dense",
        "skip_recompute",
    ),
)
def _sharded_core(
    tri_verts,
    band_ids, band_cand, band_valid, parity_packed,
    origin, dx,
    *, mesh_obj, block, band_tiles_local, tile_shape, band_chunk,
    strides, chamfer_passes, seed_band=3, dense=False, skip_recompute=False,
):
    """Returns phi blocks (Dj, Dk, ni, nj_l, nk_l), grid-sharded over the mesh."""
    if dense:
        interpret = jax.default_backend() != "tpu"
        inner = _make_inner_dense(block, skip_recompute, interpret)
    else:
        inner = _make_inner(block, band_tiles_local, tile_shape,
                            band_chunk, strides, chamfer_passes, seed_band,
                            skip_recompute)
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
    dense = use_dense(cfg, len(binned.tris))
    ni, nj_l, nk_l = binned.block
    if dense:
        strides = ()
    else:
        cap = cfg.vdt_max_hop
        if cap is None or cap > min(nj_l, nk_l):
            raise ValueError(
                "sharded runs need config.vdt_max_hop <= the shard block on "
                f"the sharded axes (min(nj_l, nk_l) = {min(nj_l, nk_l)}); a "
                "single-device run with the same vdt_max_hop matches "
                "bit-exactly"
            )
        Dj, Dk = binned.dims
        gshape = (ni, nj_l * Dj, nk_l * Dk)
        extra = cfg.vdt_extra_rounds
        if extra is None:
            extra = 2 if max(gshape) <= 256 else 4
        strides = vdt_ops.stride_ladder(
            max(gshape), max_hop=cap, extra_rounds=extra
        )
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
        band_chunk=cfg.band_chunk, strides=strides,
        chamfer_passes=cfg.chamfer_passes,
        seed_band=max(cfg.exact_band, 3),
        dense=dense,
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
