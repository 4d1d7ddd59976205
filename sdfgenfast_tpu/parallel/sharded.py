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
  construction), so each shard runs the identical single-device kernels —
  on TPU that includes the fused Pallas CSR band kernel
  (ops/band_pallas.py): per-shard CSR segments with shard-LOCAL output rows
  but GLOBAL coordinate ids, so per-cell arithmetic matches single-device
  bit-for-bit.
- The far field default is the sharded PYRAMID schedule — the same
  coarse-to-fine closest-point transform the single-chip bench runs
  (ops/vdt.vdt_pyramid_far_field), distributed as: local min-downsamples
  (shard blocks are even multiples, so local pairing == global pairing);
  the coarsest level (~48-class, a few MB) is all_gather'ed and its full
  jump-flood ladder runs REPLICATED on every device (identical inputs ->
  identical results, zero further comms); the descent's short-stride
  (<= 8) repair rounds run locally on corner-complete halo-extended
  blocks (two-phase ppermute: j-planes, then k-planes of the j-extended
  block), each round bit-equal to the single-device Jacobi round. On TPU
  the rounds execute through the Pallas round kernel with the shard's
  global position offset (ops/vdt_pallas.py pos_offset).
- Setting config.vdt_max_hop selects the legacy capped-ladder schedule
  instead: every Jacobi round exchanges one max_hop-deep halo slab and is
  bit-identical to a single-device run of the same capped ladder.
- The final Lipschitz relaxation extends once by `passes` cells and runs
  the fused chamfer (Pallas on TPU) locally — ring-by-ring, the interior
  equals the global pass sequence exactly.
- Vertex gradients: tri_verts enter replicated; shard_map's transpose inserts
  the cross-device psum of the per-shard partial gradients automatically.

Equality contract: a sharded run equals the single-device run of the same
config on any mesh shape — with one caveat for the pyramid schedule: the
single-device path may permute grid axes for lane efficiency
(pipeline._vdt_axis_perm), which reorders the (order-sensitive, greedy)
downsample tournaments. The sharded pyramid always runs unpermuted, so
exact equality holds when the perm is the identity (any grid whose k axis
is the largest dim — all equality-test grids); for other grids both
results are valid overestimates within the same golden bars.
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
from ..ops import sign as sign_ops
from ..ops import sign_host as sign_host_ops
from ..ops import tiled as tiled_ops
from ..pipeline import SDFConfig, _recompute_phi, use_dense

__all__ = ["make_device_mesh", "ShardedBinned", "bin_mesh_sharded",
           "sharded_sdf", "halo_comms_model"]


def halo_comms_model(grid_shape, dims, max_hop=None, extra_rounds=None,
                     chamfer_passes=2):
    """Exact per-round communication accounting of the sharded far field.

    The compiled program's collectives are fully determined by the config.
    `max_hop=None` models the DEFAULT pyramid schedule: zero comms for the
    local downsamples, one two-phase all_gather of the (tiny) coarsest
    state (ring cost (D-1)/D of the full level state per axis), then for
    each descent level the short-stride (<= 8) repair rounds each exchange
    one corner-complete s-deep halo via two ppermute phases (j-planes of
    the (5, ni_l, nj_l, nk_l) level state, then k-planes of the j-extended
    block). An integer max_hop models the legacy capped ladder instead:
    each round exchanges one max_hop-capped slab the same two-phase way.
    Each phase sends BOTH directions (lo and hi neighbors). The final
    chamfer exchanges one `passes`-deep halo (one two-phase exchange
    total).

    Capped-ladder total ~= sum_s 2*5*4*ni*s*(nk_l + (nj_l+2s)) — hop-size
    changes rounds, not total bytes. The pyramid total is far smaller: the
    long-range strides run on the gathered coarse grid (replicated compute,
    zero comms), so only ~10 short-stride rounds exchange halos — the same
    reason it wins on wall-clock single-device. Policy: the pyramid is the
    default; cap the ladder only when bit-equality with a specific capped
    single-device run is required.
    """
    ni, nj, nk = grid_shape
    Dj, Dk = dims
    nj_l, nk_l = nj // Dj, nk // Dk
    f32 = 4
    rounds = []
    gathers = []
    if max_hop is None:
        lshapes = vdt_ops.pyramid_level_shapes(grid_shape)
        L = len(lshapes)
        ni_c, nj_c, nk_c = lshapes[-1]
        # two-phase ring all_gather of the coarsest (5, ni_c, ...) state
        state_c = 5 * f32 * ni_c * (nj_c // Dj) * (nk_c // Dk)
        gathers.append({"phase": "all_gather_j",
                        "bytes": int(state_c * (Dj - 1))})
        gathers.append({"phase": "all_gather_k",
                        "bytes": int(state_c * Dj * (Dk - 1) // 1)})
        for lvl in range(L - 2, -1, -1):
            ni_lvl, njl, nkl = (lshapes[lvl][0],
                                nj_l >> lvl, nk_l >> lvl)
            sched = (vdt_ops.PYRAMID_COARSE_ROUNDS if lvl > 0
                     else tuple(vdt_ops.PYRAMID_LEVEL_ROUNDS) + (1, 1))
            for s_ in sched:
                j_bytes = 2 * 5 * f32 * ni_lvl * s_ * nkl
                k_bytes = 2 * 5 * f32 * ni_lvl * (njl + 2 * s_) * s_
                rounds.append({"level": lvl, "stride": int(s_),
                               "halo_bytes": j_bytes + k_bytes})
    else:
        if extra_rounds is None:
            extra_rounds = 2 if max(grid_shape) <= 256 else 4
        strides = vdt_ops.stride_ladder(
            max(grid_shape), max_hop=max_hop, extra_rounds=extra_rounds)
        for s_ in strides:
            # j phase: two directed sends of (5, ni, s, nk_l); k phase
            # operates on the j-extended block: (5, ni, nj_l + 2s, s)
            j_bytes = 2 * 5 * f32 * ni * s_ * nk_l
            k_bytes = 2 * 5 * f32 * ni * (nj_l + 2 * s_) * s_
            rounds.append({"stride": int(s_),
                           "halo_bytes": j_bytes + k_bytes})
    p = chamfer_passes
    cham_bytes = (2 * f32 * ni * p * nk_l
                  + 2 * f32 * ni * (nj_l + 2 * p) * p)
    return {
        "grid": list(grid_shape),
        "device_mesh": [Dj, Dk],
        "schedule": "pyramid" if max_hop is None else "capped_ladder",
        "max_hop": None if max_hop is None else int(max_hop),
        "vdt_rounds": len(rounds),
        "rounds": rounds,
        "coarse_gathers": gathers,
        "vdt_total_bytes_per_device": int(
            sum(r["halo_bytes"] for r in rounds)
            + sum(g["bytes"] for g in gathers)),
        "chamfer_bytes_per_device": int(cham_bytes),
        "ppermute_calls": 2 * len(rounds) + 2,
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
    # Per-shard CSR candidate layout for the Pallas band kernel (TPU path;
    # built whenever tile_shape is (8,8,8) and far_field == "exact").
    # Shapes are padded to COMMON buckets across shards so shard_map specs
    # stay uniform. band_gids carry GLOBAL tile ids (coordinate stream).
    csr_pair: Optional[np.ndarray] = None   # (Dj, Dk, P_pad) int32
    csr_off: Optional[np.ndarray] = None    # (Dj, Dk, A) int32
    csr_cnt: Optional[np.ndarray] = None    # (Dj, Dk, A) int32
    band_gids: Optional[np.ndarray] = None  # (Dj, Dk, A) int32
    band_tiles_global: Optional[Tuple[int, int, int]] = None
    kcap: int = 0
    # sign_mode="device": per-shard 2D (j, k) sign-tile candidates for the
    # on-device double-float SOS predicates (ops/sign.parity_field with a
    # (j, k) offset); parity_packed is then empty. Local tile ids use the
    # local-tile-count sentinel for pad rows (dropped by the scatter).
    sign_ids: Optional[np.ndarray] = None    # (Dj, Dk, A2) int32
    sign_cand: Optional[np.ndarray] = None   # (Dj, Dk, A2, K2) int32
    sign_valid: Optional[np.ndarray] = None  # (Dj, Dk, A2, K2) bool
    f_hi: Optional[np.ndarray] = None        # (M, 3, 3) f32, replicated
    f_lo: Optional[np.ndarray] = None        # (M, 3, 3) f32, replicated
    sign_tiles_local: Optional[Tuple[int, int]] = None


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
    global_total = int(np.prod(tiles_dim))
    ids_out = np.full((Dj * Dk, A), local_total, np.int32)  # sentinel -> dropped
    gids_out = np.full((Dj * Dk, A), global_total, np.int32)
    cand_out = np.zeros((Dj * Dk, A, K), np.int32)
    valid_out = np.zeros((Dj * Dk, A, K), bool)
    order = np.argsort(owner, kind="stable")
    offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(len(owner)) - offs[owner[order]]
    ids_out[owner[order], pos] = local[order].astype(np.int32)
    gids_out[owner[order], pos] = active_ids[order].astype(np.int32)
    cand_out[owner[order], pos] = cand[order]
    valid_out[owner[order], pos] = valid[order]
    return (
        ids_out.reshape(Dj, Dk, A),
        cand_out.reshape(Dj, Dk, A, K),
        valid_out.reshape(Dj, Dk, A, K),
        gids_out.reshape(Dj, Dk, A),
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
    csr = {}
    tiles_global = None
    if use_dense(config, len(mesh.tris)):
        # dense path needs no band binning; keep shard-shaped empty arrays so
        # the shard_map in_specs stay uniform
        band_tiles_local = (1, 1, 1)
        b_ids = np.zeros((Dj, Dk, 0), np.int32)
        b_cand = np.zeros((Dj, Dk, 0, 1), np.int32)
        b_valid = np.zeros((Dj, Dk, 0, 1), bool)
        b_gids = np.zeros((Dj, Dk, 0), np.int32)
    else:
        # same seed band and prune policy as the single-device binning
        # (pipeline.bin_mesh): exact mode widens the band to >= 3 cells and
        # prunes; eikonal keeps the user band and the full L-inf window
        seed_band = (max(config.exact_band, 3)
                     if config.far_field == "exact" else config.exact_band)
        bb = band_ops.bin_triangles(
            mesh.verts, mesh.tris, grid, seed_band, config.tile_shape,
            prune=config.far_field == "exact",
        )
        nti = -(-ni // ti)
        band_tiles_local = (nti, nj_l // tj, nk_l // tk)
        tiles_global = tuple(int(x) for x in bb.tiles_dim)
        b_ids, b_cand, b_valid, b_gids = _partition_tiles(
            bb.active_ids.astype(np.int64), bb.cand, bb.cand_valid,
            bb.tiles_dim, band_tiles_local, dims,
        )
        if (config.far_field == "exact"
                and tuple(config.tile_shape) == (8, 8, 8)):
            csr = _shard_csr(b_cand, b_valid, len(mesh.tris))

    sign_kw = {}
    if config.sign_mode == "device":
        # on-device double-float SOS sign: partition the 2D (j, k) sign
        # tiles by owner shard; each shard runs ops/sign.parity_field on
        # its own rays with a global (j, k) offset — the i (ray) axis is
        # unsharded, so no collectives are needed and per-cell parity is
        # bit-identical to a single-device device-sign run
        tj2, tk2 = config.tile2d_shape
        if nj_l % tj2 or nk_l % tk2:
            raise ValueError(
                f"sign_mode='device' needs shard blocks divisible by "
                f"tile2d_shape {config.tile2d_shape} "
                f"(got nj_l={nj_l}, nk_l={nk_l})")
        sb = sign_ops.bin_triangles_2d(
            mesh.verts, mesh.tris, grid, config.tile2d_shape)
        sign_tiles_local = (nj_l // tj2, nk_l // tk2)
        s_ids, s_cand, s_valid, _ = _partition_tiles(
            sb.active_ids.astype(np.int64), sb.cand, sb.cand_valid,
            sb.tiles_dim, sign_tiles_local, dims,
        )
        packed_blocks = np.zeros((Dj, Dk, 0, nj_l, nk_l), np.uint8)
        sign_kw = dict(sign_ids=s_ids, sign_cand=s_cand,
                       sign_valid=s_valid, f_hi=sb.f_hi, f_lo=sb.f_lo,
                       sign_tiles_local=sign_tiles_local)
    elif config.sign_mode == "host":
        # host parity, globally (native C++ kernel), packed per shard block
        packed = sign_host_ops.parity_packed_host(mesh.verts, mesh.tris, grid)
        packed_blocks = (
            packed.reshape(packed.shape[0], Dj, nj_l, Dk, nk_l)
            .transpose(1, 3, 0, 2, 4)
            .copy()
        )  # (Dj, Dk, ceil(ni/8), nj_l, nk_l)
    else:
        raise ValueError(f"unknown sign_mode: {config.sign_mode}")

    return ShardedBinned(
        grid, config, dims, (ni, nj_l, nk_l),
        band_tiles_local, b_ids, b_cand, b_valid,
        packed_blocks, mesh.tris.astype(np.int32),
        csr_pair=csr.get("pair"), csr_off=csr.get("off"),
        csr_cnt=csr.get("cnt"), band_gids=b_gids,
        band_tiles_global=tiles_global, kcap=csr.get("kcap", 0),
        **sign_kw,
    )


def _shard_csr(b_cand: np.ndarray, b_valid: np.ndarray, num_tris: int):
    """Per-shard CSR arrays for the Pallas band kernel, padded to common
    buckets across shards (shard_map inputs must be shape-uniform)."""
    from ..ops import band_pallas

    Dj, Dk, A, _K = b_cand.shape
    pairs, offs, cnts = [], [], []
    for dj in range(Dj):
        for dk in range(Dk):
            p, o, c = band_pallas.band_csr_from_binning(
                b_cand[dj, dk], b_valid[dj, dk], num_tris)
            pairs.append(p)
            offs.append(o)
            cnts.append(c)
    P = max(len(p) for p in pairs)
    P_pad = max(-(-P // 128) * 128, 128)
    pair_out = np.full((Dj * Dk, P_pad), num_tris, np.int32)
    off_out = np.zeros((Dj * Dk, A), np.int32)
    cnt_out = np.zeros((Dj * Dk, A), np.int32)
    kcap = 64
    for s, (p, o, c) in enumerate(zip(pairs, offs, cnts)):
        pair_out[s, :len(p)] = p
        off_out[s, :len(o)] = o
        cnt_out[s, :len(c)] = c
        kcap = max(kcap, -(-int(c.max() or 1) // 64) * 64)
    return {
        "pair": pair_out.reshape(Dj, Dk, P_pad),
        "off": off_out.reshape(Dj, Dk, A),
        "cnt": cnt_out.reshape(Dj, Dk, A),
        "kcap": int(kcap),
    }


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


def _sharded_propagate(phi, tid, tri_verts, origin, dx, max_passes,
                       j_off, k_off):
    """Legacy ``far_field="propagate"`` under shard_map — bit-identical to
    ops/sweep.propagate_closest_triangles (the reference CPU backend's
    2x8 directional Gauss-Seidel sweeps re-expressed as plane scans,
    cpu_lib/makelevelset3.cpp:243-292).

    A directional plane scan is sequential along its axis, so a sweep
    ALONG a sharded axis runs as D serialized rounds (one shard row per
    round) forwarding the carry plane by ppermute; every shard executes
    each round's scan (SPMD) and rows not on turn discard the result —
    wall-clock matches the single-device scan while FLOPs multiply by D.
    Sweeps along the unsharded i axis run locally, with corner-complete
    one-cell (j, k) halos of the carried plane per step. The shared
    plane_update kernel (ops/sweep.py) guarantees identical arithmetic,
    including argmin tie order, so the per-pass fixed-point test — and
    therefore the pass count — matches a single-device run exactly.
    A compatibility mode, not a fast path."""
    from ..ops import sweep as sweep_ops

    ni, nj_l, nk_l = phi.shape
    pos_i = jnp.arange(ni, dtype=jnp.float32) * dx + origin[0]
    # global coordinates of this shard's rows: f32(int) conversion is exact,
    # so these equal slices of the single-device jnp.arange(n, f32) tables
    pos_j = (j_off + jnp.arange(nj_l, dtype=jnp.int32)).astype(jnp.float32) \
        * dx + origin[1]
    pos_k = (k_off + jnp.arange(nk_l, dtype=jnp.int32)).astype(jnp.float32) \
        * dx + origin[2]
    neg1 = jnp.int32(-1)

    def shift_stack(ext, R, Cn):
        # (9, R, Cn) candidate planes from a 1-cell-extended (R+2, Cn+2)
        # plane, in sweep_ops._SHIFTS order (argmin tie order matters)
        return jnp.stack([
            ext[1 - dr:1 - dr + R, 1 - dc:1 - dc + Cn]
            for dr, dc in sweep_ops._SHIFTS
        ])

    def sweep_i(phi, tid, reverse):
        # planes are (nj_l, nk_l): both plane axes sharded -> collective
        # corner-complete extension of the carried plane each step
        pb = jnp.broadcast_to(pos_j[:, None], (nj_l, nk_l))
        pc = jnp.broadcast_to(pos_k[None, :], (nj_l, nk_l))

        def step(prev_tid, xs):
            cur_phi, cur_tid, a_coord = xs
            ext = _extend(_extend(prev_tid, "j", 0, neg1), "k", 1, neg1)
            cand = shift_stack(ext, nj_l, nk_l)
            gx = jnp.stack(
                [jnp.broadcast_to(a_coord, (nj_l, nk_l)), pb, pc], -1)[None]
            new_phi, new_tid = sweep_ops.plane_update(
                cand, cur_phi, cur_tid, tri_verts, gx)
            return new_tid, (new_phi, new_tid)

        phi_seq = phi[::-1] if reverse else phi
        tid_seq = tid[::-1] if reverse else tid
        pos_seq = pos_i[::-1] if reverse else pos_i
        _, (out_phi, out_tid) = jax.lax.scan(
            step, tid_seq[0], (phi_seq[1:], tid_seq[1:], pos_seq[1:]))
        out_phi = jnp.concatenate([phi_seq[:1], out_phi], axis=0)
        out_tid = jnp.concatenate([tid_seq[:1], out_tid], axis=0)
        if reverse:
            out_phi, out_tid = out_phi[::-1], out_tid[::-1]
        return out_phi, out_tid

    def sweep_sharded(phi, tid, axis, reverse):
        # sweep ALONG sharded axis 1 (j) or 2 (k): D serialized rounds
        name = "j" if axis == 1 else "k"
        D = jax.lax.axis_size(name)
        my = jax.lax.axis_index(name)
        pos_a = pos_j if axis == 1 else pos_k
        # plane axes: (i, other-sharded-axis)
        o_name = "k" if axis == 1 else "j"
        Cn = nk_l if axis == 1 else nj_l
        pb = jnp.broadcast_to(pos_i[:, None], (ni, Cn))
        po = pos_k if axis == 1 else pos_j
        pc = jnp.broadcast_to(po[None, :], (ni, Cn))

        phi_t = jnp.moveaxis(phi, axis, 0)
        tid_t = jnp.moveaxis(tid, axis, 0)
        if reverse:
            phi_t, tid_t, pos_seq = phi_t[::-1], tid_t[::-1], pos_a[::-1]
        else:
            pos_seq = pos_a

        def step(prev_tid, xs):
            cur_phi, cur_tid, a_coord = xs
            ext = jnp.pad(prev_tid, ((1, 1), (0, 0)), constant_values=-1)
            ext = _extend(ext, o_name, 1, neg1)
            cand = shift_stack(ext, ni, Cn)
            coords = [None, None, None]
            coords[axis] = jnp.broadcast_to(a_coord, (ni, Cn))
            coords[0] = pb
            coords[2 if axis == 1 else 1] = pc
            gx = jnp.stack(coords, -1)[None]
            new_phi, new_tid = sweep_ops.plane_update(
                cand, cur_phi, cur_tid, tri_verts, gx)
            return new_tid, (new_phi, new_tid)

        carry = tid_t[0]
        for r in range(D):
            active_row = (D - 1 - r) if reverse else r
            if r > 0:
                # the carry plane moves to the next shard row: receive from
                # the previous round's active row
                carry = _neighbor_shift(carry, name,
                                        1 if reverse else -1, neg1)
            if r == 0:
                # the scan's first plane stays unchanged (it IS the carry)
                carry_out, (s_phi, s_tid) = jax.lax.scan(
                    step, carry,
                    (phi_t[1:], tid_t[1:], pos_seq[1:]))
                new_phi_t = jnp.concatenate([phi_t[:1], s_phi], axis=0)
                new_tid_t = jnp.concatenate([tid_t[:1], s_tid], axis=0)
            else:
                carry_out, (new_phi_t, new_tid_t) = jax.lax.scan(
                    step, carry, (phi_t, tid_t, pos_seq))
            onturn = my == active_row
            phi_t = jnp.where(onturn, new_phi_t, phi_t)
            tid_t = jnp.where(onturn, new_tid_t, tid_t)
            carry = carry_out
        if reverse:
            phi_t, tid_t = phi_t[::-1], tid_t[::-1]
        return jnp.moveaxis(phi_t, 0, axis), jnp.moveaxis(tid_t, 0, axis)

    def one_pass(state):
        phi, tid, it, _ = state
        phi0 = phi
        for axis in (0, 1, 2):
            for reverse in (False, True):
                if axis == 0:
                    phi, tid = sweep_i(phi, tid, reverse)
                else:
                    phi, tid = sweep_sharded(phi, tid, axis, reverse)
        delta = jnp.any(phi != phi0)
        changed = jax.lax.psum(
            jax.lax.psum(delta.astype(jnp.int32), "j"), "k") > 0
        return phi, tid, it + 1, changed

    def cond(state):
        _, _, it, changed = state
        return changed & (it < max_passes)

    state = (phi, tid, jnp.int32(0), jnp.bool_(True))
    phi, tid, _, _ = jax.lax.while_loop(cond, one_pass, state)
    return phi, tid


def _sharded_chamfer(phi, dx, passes, use_pallas=False):
    """Lipschitz relaxation with corner-complete cross-shard halos.

    One `passes`-deep halo exchange, then ALL passes run locally on the
    extended block (the fused Pallas chamfer on TPU, the jnp reference
    rounds elsewhere) and the interior is sliced back. Ring by ring, every
    interior cell sees exactly the values the global pass sequence would
    produce (extension depth == passes), so sharded results equal the
    single-device ``ops/vdt.chamfer_relax`` bitwise — while paying 2
    ppermute phases TOTAL instead of 2 per pass."""
    ni, nj_l, nk_l = phi.shape
    big = jnp.float32(3e38)
    p = passes
    ext = _extend(phi, "j", 1, big, depth=p)
    ext = _extend(ext, "k", 2, big, depth=p)
    if use_pallas:
        from ..ops.vdt_pallas import pallas_chamfer

        out = pallas_chamfer(ext, dx, passes=passes)
    else:
        out = vdt_ops.chamfer_relax(ext, dx, passes=passes)
    return jax.lax.slice(out, (0, p, p), (ni, p + nj_l, p + nk_l))


def _state_halo_extend(state, s):
    # corner-complete s-deep halos on the sharded j/k axes of the
    # CHANNEL-FIRST (5, ni, nj_l, nk_l) state; the (unsharded) i
    # axis is handled inside the VDT round
    ext = _extend(state, "j", 2, vdt_ops.FAR, depth=s)
    return _extend(ext, "k", 3, vdt_ops.FAR, depth=s)


def _halo_pyramid_round(state, dx, stride, scale, j_off_l, k_off_l,
                        use_pallas):
    """One Jacobi repair round on a halo-extended shard block, bit-equal to
    the single-device ``vdt._jacobi_round`` on the full level grid: the
    corner-complete stride-deep halo supplies exactly the round-start
    neighbor state the global round reads. On TPU the round executes
    through the Pallas kernel over the EXTENDED block (positions shifted to
    global level indices via pos_offset), the interior sliced back —
    identical candidates, identical merges."""
    _, ni, nj_l, nk_l = state.shape
    s = stride
    ext = _state_halo_extend(state, s)
    if use_pallas:
        from ..ops.vdt_pallas import pallas_round_phase

        off = jnp.stack([jnp.int32(0),
                         (j_off_l - s).astype(jnp.int32),
                         (k_off_l - s).astype(jnp.int32)])
        out = pallas_round_phase(ext, dx, (s,), scale, pos_offset=off)
        return jax.lax.slice(
            out, (0, 0, s, s), (5, ni, s + nj_l, s + nk_l))
    px, py, pz = vdt_ops._level_pos_axes(
        (ni, nj_l, nk_l), dx, scale, offsets=(0, j_off_l, k_off_l))
    offs = jnp.asarray(vdt_ops._OFFSETS26)
    return vdt_ops._halo_round(state, px, py, pz, s, offs,
                               lambda st, s_: _state_halo_extend(st, s_))


def _sharded_pyramid(cpx, cpy, cpz, tid0, phi0, dx, freeze_mask,
                     j_off, k_off, gdims, use_pallas,
                     extra_polish: int = 2):
    """The coarse-to-fine closest-point far field, distributed.

    Runs the EXACT single-device schedule (``vdt.vdt_pyramid_far_field``
    with the shared PYRAMID_*_ROUNDS constants, unpermuted): local
    min-downsamples (block pairing == global pairing since shard offsets
    are even), an all_gather'ed coarsest level whose full jump-flood ladder
    runs replicated on every device, then halo-extended Jacobi repair
    rounds on the way down. Every arithmetic step matches the single-device
    run bit-for-bit (see the module docstring for the axis-perm caveat).
    """
    ni, nj_l, nk_l = cpx.shape
    gni, gnj, gnk = gdims
    offs = jnp.asarray(vdt_ops._OFFSETS26)
    lshapes = vdt_ops.pyramid_level_shapes(gdims)
    L = len(lshapes)

    px, py, pz = vdt_ops._level_pos_axes(
        (ni, nj_l, nk_l), dx, 1, offsets=(0, j_off, k_off))
    d2 = vdt_ops._dist2(px, py, pz, cpx, cpy, cpz)
    state = vdt_ops.pack_state(cpx, cpy, cpz, tid0, d2)

    # seed pyramid: local downsamples (offsets shift re-score positions to
    # global level indices; shard offsets are even at every level built)
    levels = [(state, 1)]
    joffs = [j_off]
    koffs = [k_off]
    for _ in range(L - 1):
        prev, scale = levels[-1]
        levels.append((
            vdt_ops._downsample2(prev, dx, scale,
                                 offsets=(0, joffs[-1], koffs[-1])),
            scale * 2,
        ))
        joffs.append(joffs[-1] // 2)
        koffs.append(koffs[-1] // 2)

    # coarsest level: gather the full grid (a few MB) and run the complete
    # single-device ladder REPLICATED — identical inputs on every device
    # give identical results with zero further communication
    s_loc, scale_c = levels[-1]
    full = jax.lax.all_gather(s_loc, "j", axis=2, tiled=True)
    full = jax.lax.all_gather(full, "k", axis=3, tiled=True)
    pos_c = vdt_ops._level_pos_axes(full.shape[1:], dx, scale_c)
    ladder = list(vdt_ops.stride_ladder(max(lshapes[-1]), extra_rounds=1))
    for st in (x for x in ladder if x > 8):
        full = vdt_ops._jacobi_round(full, *pos_c, st, offs)
    small = tuple(x for x in ladder if x <= 8)
    if use_pallas:
        from ..ops.vdt_pallas import pallas_round_phase

        full = pallas_round_phase(full, dx, small, scale_c)
    else:
        for st in small:
            full = vdt_ops._jacobi_round(full, *pos_c, st, offs)
    s = jax.lax.dynamic_slice(
        full, (0, 0, joffs[-1], koffs[-1]), s_loc.shape)

    # descend: upsample-merge locally + halo-extended repair rounds
    for lvl in range(L - 2, -1, -1):
        fine, scale_l = levels[lvl]
        pos_l = vdt_ops._level_pos_axes(
            fine.shape[1:], dx, scale_l, offsets=(0, joffs[lvl], koffs[lvl]))
        s = vdt_ops._upsample_merge(s, fine, *pos_l)
        rounds = (vdt_ops.PYRAMID_COARSE_ROUNDS if lvl > 0
                  else tuple(vdt_ops.PYRAMID_LEVEL_ROUNDS)
                  + (1,) * extra_polish)
        for st in rounds:
            s = _halo_pyramid_round(s, dx, st, scale_l, joffs[lvl],
                                    koffs[lvl], use_pallas)

    phi = jnp.sqrt(jnp.maximum(s[4], 0.0))
    out_tid = vdt_ops.unpack_tid(s[3])
    return (
        jnp.where(freeze_mask, phi0, jnp.minimum(phi, phi0)),
        jnp.where(freeze_mask, tid0, out_tid),
    )


def _make_inner(block, band_tiles_local, tile_shape, band_chunk,
                strides, chamfer_passes, seed_band, skip_recompute,
                pyramid=False, use_pallas=False, kcap=0, gdims=None,
                band_tiles_global=None, eikonal_iters=0,
                sign_device=False, tile2d_shape=None,
                sign_tiles_local=None, sign_chunk=64,
                propagate_passes=0):
    ni, nj_l, nk_l = block

    def inner(tri_verts, origin, dx, b_ids, b_cand, b_valid, parity_packed,
              pair, off, cnt, gids, s_ids, s_cand, s_valid, f_hi, f_lo):
        # squeeze the (1, 1) device-block axes shard_map leaves on inputs
        b_ids, b_cand, b_valid = b_ids[0, 0], b_cand[0, 0], b_valid[0, 0]
        parity_packed = parity_packed[0, 0]
        pair, off, cnt, gids = pair[0, 0], off[0, 0], cnt[0, 0], gids[0, 0]
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

        def local_parity():
            """This shard's (ni, nj_l, nk_l) inside/outside parity: host
            transport (bit-packed) or the on-device double-float SOS
            predicates on the shard's own (j, k) rays — the ray (i) axis
            is unsharded, so parity needs no collectives either way."""
            if sign_device:
                return sign_ops.parity_field(
                    f_hi, f_lo, s_ids, s_cand, s_valid,
                    tile_shape=tile2d_shape, tiles_dim=sign_tiles_local,
                    grid_shape=(ni, nj_l, nk_l), chunk=sign_chunk,
                    jk_offset=jnp.stack([j_off, k_off]))
            return sign_host_ops.unpack_parity_device(parity_packed, ni)

        tv_ng = jax.lax.stop_gradient(tri_verts)

        if propagate_passes > 0:
            # legacy 'propagate' mode: same band evaluator as single-device,
            # then the directional plane scans with serialized cross-shard
            # rounds (_sharded_propagate) and the differentiable recompute
            phi0, tid0 = band_ops.band_distance_field(
                tv_ng, b_ids, b_cand, b_valid, origin, dx,
                tile_shape=tile_shape, tiles_dim=band_tiles_local,
                grid_shape=(ni, nj_l, nk_l), chunk=band_chunk,
                ijk_offset=ijk_off, upper_override=up,
            )
            phi_p, tid_p = _sharded_propagate(
                phi0, tid0, tv_ng, origin, dx, propagate_passes,
                j_off, k_off)
            out = _recompute_phi(tri_verts, tid_p, local_parity(), origin,
                                 dx, up, ijk_offset=ijk_off)
            return out[None, None]

        if eikonal_iters > 0:
            # Eikonal mode (the CUDA backend's semantics,
            # gpu_lib/makelevelset3_gpu.cu:487-551), sharded: the SAME
            # band evaluator as single-device (band_distance_field with
            # global cell coordinates), then the Jacobi |grad phi|=1
            # relaxation with one-cell cross-shard halos per iteration —
            # the 6-point stencil needs no corners, so each axis extends
            # independently. Matches the single-device mode bit-for-bit.
            from ..ops import sweep as sweep_ops

            phi0, tid0 = band_ops.band_distance_field(
                tv_ng, b_ids, b_cand, b_valid, origin, dx,
                tile_shape=tile_shape, tiles_dim=band_tiles_local,
                grid_shape=(ni, nj_l, nk_l), chunk=band_chunk,
                ijk_offset=ijk_off, upper_override=up,
            )
            frozen = tid0 >= 0
            inf = jnp.float32(jnp.inf)

            def ext_fn(p, axis):
                return _extend(p, "j" if axis == 1 else "k", axis, inf)

            phi = sweep_ops.eikonal_far_field_impl(
                phi0, frozen, dx, eikonal_iters, extend_fn=ext_fn)
            parity = local_parity()
            # mirror the single-device mode: the frozen band is recomputed
            # differentiably, the far field keeps the Eikonal estimates
            band_phi = _recompute_phi(tri_verts, tid0, parity, origin, dx,
                                      up, ijk_offset=ijk_off)
            far_phi = jnp.where(parity, -phi, phi)
            return jnp.where(frozen, band_phi, far_phi)[None, None]

        if use_pallas and kcap > 0:
            # fused Pallas CSR band kernel — the SAME kernel the single-chip
            # bench runs (ops/band_pallas.py): rows are shard-LOCAL tiles,
            # coordinates come from the GLOBAL tile ids, so per-cell values
            # match the single-device run bit-for-bit
            from ..ops import band_pallas

            T = int(np.prod(band_tiles_local))
            phi_r, tid_r, cpx_r, cpy_r, cpz_r = band_pallas.band_rows_pallas(
                tv_ng - origin.astype(tv_ng.dtype),
                pair, b_ids, off, cnt, dx,
                kcap=kcap, tiles_dim=band_tiles_local,
                grid_shape=(ni, nj_l, nk_l),
                coord_ids=gids, coord_tiles_dim=band_tiles_global,
                coord_grid_shape=gdims,
            )
            active = jnp.zeros((T + 1,), bool).at[b_ids].set(True)
            am = active[:T, None]

            def unt(rows, fill):
                rows = jnp.where(am, rows[:T], fill)
                return tiled_ops.untile_rows(
                    rows, tile_shape, band_tiles_local, (ni, nj_l, nk_l))

            phi0 = unt(phi_r, up)
            tid0 = unt(tid_r, jnp.int32(-1))
            cpx = unt(cpx_r, vdt_ops.FAR)
            cpy = unt(cpy_r, vdt_ops.FAR)
            cpz = unt(cpz_r, vdt_ops.FAR)
        else:
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

        # the stage barrier the single-device core needs (fusing band into
        # the VDT loops miscompiled there; keep the same boundary here)
        phi0, tid0, cpx, cpy, cpz = jax.lax.optimization_barrier(
            (phi0, tid0, cpx, cpy, cpz)
        )

        freeze = (tid0 >= 0) & (phi0 <= jnp.float32(seed_band) * dx)
        if pyramid:
            phi, tid = _sharded_pyramid(
                cpx, cpy, cpz, tid0, phi0, dx, freeze, j_off, k_off,
                gdims, use_pallas,
            )
        else:
            phi, tid = vdt_ops.vdt_far_field(
                cpx, cpy, cpz, tid0, phi0, dx, strides, freeze_mask=freeze,
                ijk_offset=(0, j_off, k_off),
                halo_extend=_state_halo_extend,
            )
        if chamfer_passes > 0:
            phi = _sharded_chamfer(phi, dx, chamfer_passes,
                                   use_pallas=use_pallas and pyramid)

        parity = local_parity()
        if skip_recompute:
            out = jnp.where(parity, -phi, phi)
        else:
            out = _recompute_phi(tri_verts, tid, parity, origin, dx, up,
                                 ijk_offset=ijk_off)
        return out[None, None]  # restore (1, 1) block axes

    return inner


def _make_inner_dense(block, skip_recompute, interpret,
                      sign_device=False, tile2d_shape=None,
                      sign_tiles_local=None, sign_chunk=64):
    """Dense all-triangles shard kernel: every shard evaluates every triangle
    against its local cells — no band binning, no JFA, no halo exchange at
    all (the per-cell result never depends on neighbor shards). Cell coords
    use GLOBAL indices, so results are bit-identical to single-device runs."""
    ni, nj_l, nk_l = block

    def inner(tri_verts, origin, dx, b_ids, b_cand, b_valid, parity_packed,
              s_ids, s_cand, s_valid, f_hi, f_lo):
        parity_packed = parity_packed[0, 0]
        s_ids, s_cand, s_valid = s_ids[0, 0], s_cand[0, 0], s_valid[0, 0]
        dj = jax.lax.axis_index("j")
        dk = jax.lax.axis_index("k")
        nj = nj_l * jax.lax.axis_size("j")
        nk = nk_l * jax.lax.axis_size("k")
        up = jnp.float32(ni + nj + nk) * dx
        j_off = (dj * nj_l).astype(jnp.int32)
        k_off = (dk * nk_l).astype(jnp.int32)
        ijk_off = jnp.stack([jnp.int32(0), j_off, k_off])

        tv_ng = jax.lax.stop_gradient(tri_verts)
        phi_d, tid = dense_ops.dense_distance_field(
            tv_ng, origin, dx, grid_shape=(ni, nj_l, nk_l),
            ijk_offset=ijk_off, interpret=interpret,
        )
        if sign_device:
            parity = sign_ops.parity_field(
                f_hi, f_lo, s_ids, s_cand, s_valid,
                tile_shape=tile2d_shape, tiles_dim=sign_tiles_local,
                grid_shape=(ni, nj_l, nk_l), chunk=sign_chunk,
                jk_offset=jnp.stack([j_off, k_off]))
        else:
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
        "skip_recompute", "pyramid", "use_pallas", "kcap", "gdims",
        "band_tiles_global", "eikonal_iters",
        "sign_device", "tile2d_shape", "sign_tiles_local", "sign_chunk",
        "propagate_passes",
    ),
)
def _sharded_core(
    tri_verts,
    band_ids, band_cand, band_valid, parity_packed,
    origin, dx,
    csr_pair, csr_off, csr_cnt, band_gids,
    sign_ids, sign_cand, sign_valid, f_hi, f_lo,
    *, mesh_obj, block, band_tiles_local, tile_shape, band_chunk,
    strides, chamfer_passes, seed_band=3, dense=False, skip_recompute=False,
    pyramid=False, use_pallas=False, kcap=0, gdims=None,
    band_tiles_global=None, eikonal_iters=0,
    sign_device=False, tile2d_shape=None, sign_tiles_local=None,
    sign_chunk=64, propagate_passes=0,
):
    """Returns phi blocks (Dj, Dk, ni, nj_l, nk_l), grid-sharded over the mesh."""
    sign_kw = dict(sign_device=sign_device, tile2d_shape=tile2d_shape,
                   sign_tiles_local=sign_tiles_local, sign_chunk=sign_chunk)
    if dense:
        interpret = jax.default_backend() != "tpu"
        inner = _make_inner_dense(block, skip_recompute, interpret, **sign_kw)

        def inner_w(tv, o, d, bi, bc, bv, pp, _p, _o, _c, _g,
                    si, sc, sv, fh, fl):
            return inner(tv, o, d, bi, bc, bv, pp, si, sc, sv, fh, fl)
    else:
        inner_w = _make_inner(block, band_tiles_local, tile_shape,
                              band_chunk, strides, chamfer_passes, seed_band,
                              skip_recompute, pyramid=pyramid,
                              use_pallas=use_pallas, kcap=kcap, gdims=gdims,
                              band_tiles_global=band_tiles_global,
                              eikonal_iters=eikonal_iters,
                              propagate_passes=propagate_passes, **sign_kw)
    blk2 = P("j", "k", None)
    blk3 = P("j", "k", None, None)
    blk4 = P("j", "k", None, None, None)
    return shard_map(
        inner_w,
        mesh=mesh_obj,
        in_specs=(P(), P(), P(), blk2, blk3, blk3, blk4,
                  blk2, blk2, blk2, blk2,
                  blk2, blk3, blk3, P(), P()),
        out_specs=P("j", "k", None, None, None),
        check_vma=False,
    )(
        tri_verts, origin, dx,
        band_ids, band_cand, band_valid, parity_packed,
        csr_pair, csr_off, csr_cnt, band_gids,
        sign_ids, sign_cand, sign_valid, f_hi, f_lo,
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
    if cfg.far_field not in ("exact", "eikonal", "propagate"):
        raise ValueError(f"unknown far_field mode: {cfg.far_field}")
    dense = use_dense(cfg, len(binned.tris))
    ni, nj_l, nk_l = binned.block
    Dj, Dk = binned.dims
    gdims = (ni, nj_l * Dj, nk_l * Dk)
    eikonal = cfg.far_field == "eikonal"
    propagate = cfg.far_field == "propagate" and not dense
    prop_passes = cfg.max_passes if propagate else 0
    eik_iters = 0
    if eikonal:
        eik_iters = (cfg.eikonal_iters if cfg.eikonal_iters is not None
                     else 2 * max(gdims))
    pyramid = (not dense and not eikonal and not propagate
               and cfg.vdt_max_hop is None
               and cfg.vdt_extra_rounds is None)
    strides = ()
    if pyramid:
        _validate_pyramid_blocks(gdims, binned.block, binned.dims)
    elif not dense and not eikonal and not propagate:
        cap = cfg.vdt_max_hop
        if cap is None or cap > min(nj_l, nk_l):
            raise ValueError(
                "the capped-ladder sharded mode (config.vdt_extra_rounds "
                "set) needs config.vdt_max_hop <= the shard block on the "
                f"sharded axes (min(nj_l, nk_l) = {min(nj_l, nk_l)}); a "
                "single-device run with the same vdt_max_hop matches "
                "bit-exactly"
            )
        extra = cfg.vdt_extra_rounds
        if extra is None:
            extra = 2 if max(gdims) <= 256 else 4
        strides = vdt_ops.stride_ladder(
            max(gdims), max_hop=cap, extra_rounds=extra
        )
    # concrete (non-traced) verts cannot be differentiated through anyway, so
    # the dense path may apply the sign directly instead of re-evaluating
    # distances through the differentiable recompute
    skip_recompute = not isinstance(verts, jax.core.Tracer)
    v = jnp.asarray(verts if verts is not None else _require_verts(binned))
    tri_verts = v[jnp.asarray(binned.tris)]
    use_pallas = (pyramid and binned.csr_pair is not None
                  and jax.default_backend() == "tpu")
    dummy2 = np.zeros((Dj, Dk, 0), np.int32)
    sign_device = binned.sign_ids is not None
    out = _sharded_core(
        tri_verts,
        jnp.asarray(binned.band_ids),
        # the Pallas band never reads the (A, K) matrices — don't ship them
        jnp.zeros((Dj, Dk, 0, 1), np.int32) if use_pallas
        else jnp.asarray(binned.band_cand),
        jnp.zeros((Dj, Dk, 0, 1), bool) if use_pallas
        else jnp.asarray(binned.band_valid),
        jnp.asarray(binned.parity_packed),
        jnp.asarray(binned.grid.origin, jnp.float32), jnp.float32(binned.grid.dx),
        jnp.asarray(binned.csr_pair) if use_pallas else jnp.asarray(dummy2),
        jnp.asarray(binned.csr_off) if use_pallas else jnp.asarray(dummy2),
        jnp.asarray(binned.csr_cnt) if use_pallas else jnp.asarray(dummy2),
        jnp.asarray(binned.band_gids) if use_pallas else jnp.asarray(dummy2),
        jnp.asarray(binned.sign_ids) if sign_device else jnp.asarray(dummy2),
        jnp.asarray(binned.sign_cand) if sign_device
        else jnp.zeros((Dj, Dk, 0, 1), np.int32),
        jnp.asarray(binned.sign_valid) if sign_device
        else jnp.zeros((Dj, Dk, 0, 1), bool),
        jnp.asarray(binned.f_hi) if sign_device
        else jnp.zeros((0, 3, 3), jnp.float32),
        jnp.asarray(binned.f_lo) if sign_device
        else jnp.zeros((0, 3, 3), jnp.float32),
        sign_device=sign_device, tile2d_shape=cfg.tile2d_shape,
        sign_tiles_local=binned.sign_tiles_local, sign_chunk=cfg.sign_chunk,
        propagate_passes=prop_passes,
        mesh_obj=device_mesh, block=binned.block,
        band_tiles_local=binned.band_tiles_local, tile_shape=cfg.tile_shape,
        band_chunk=cfg.band_chunk, strides=strides,
        chamfer_passes=cfg.chamfer_passes,
        seed_band=max(cfg.exact_band, 3),
        dense=dense,
        skip_recompute=skip_recompute,
        pyramid=pyramid,
        use_pallas=use_pallas,
        kcap=binned.kcap if use_pallas else 0,
        gdims=gdims,
        band_tiles_global=binned.band_tiles_global,
        eikonal_iters=eik_iters,
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


def _validate_pyramid_blocks(gdims, block, dims):
    """The pyramid's halo repair rounds (stride <= 8) need each level's
    local block to cover the halo depth on any axis that is actually
    sharded. Blocks are tile-8 multiples, so this only bites tiny blocks on
    deep pyramids."""
    L = len(vdt_ops.pyramid_level_shapes(gdims))
    if L == 1:
        # single-level pyramid (grid <= _COARSE_MAX): the whole state is
        # gathered and the full ladder runs replicated — no halo rounds, so
        # any block size works
        return
    _, nj_l, nk_l = block
    Dj, Dk = dims
    need = 8 << (L - 2)
    if (Dj > 1 and nj_l < need) or (Dk > 1 and nk_l < need):
        raise ValueError(
            f"sharded pyramid far field needs shard blocks >= {need} cells "
            f"on sharded axes for this grid (got nj_l={nj_l}, nk_l={nk_l}); "
            "use fewer devices on that axis, or set config.vdt_max_hop for "
            "the capped-ladder schedule"
        )
