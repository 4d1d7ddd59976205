"""End-to-end SDF pipeline: the TPU-native ``make_level_set3``.

Orchestrates the same four stages as the reference entry points
(``cpu_lib/makelevelset3.cpp:192-304``, ``gpu_lib/makelevelset3_gpu.cu:595-777``):

  1. narrow-band exact distances + closest-triangle ids   (ops/band.py)
  2. x-ray intersection parity                            (ops/sign.py)
  3. far-field completion                                 (ops/sweep.py)
  4. sign application                                     (here)

plus one capability the reference lacks: the returned grid is differentiable
w.r.t. vertex positions. The final phi is *recomputed* from the propagated
closest-triangle ids — exactly the invariant the reference maintains (phi(cell)
== point_triangle_distance(cell, closest_tri(cell)) at every update site,
makelevelset3.cpp:96-99, 215-218) — so autodiff flows through one distance
evaluation per cell via the barycentric closest point, with the discrete
id/parity fields held constant (envelope theorem). `jax.checkpoint` keeps the
backward memory at O(grid) instead of O(grid x intermediates).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .grid import GridSpec
from .mesh import Mesh
from .platform import is_tpu_platform
from .ops import band as band_ops
from .ops import dense as dense_ops
from .ops import vdt as vdt_ops
from .ops import sign as sign_ops
from .ops import sign_host as sign_host_ops
from .ops import sweep as sweep_ops
from .ops import tiled as tiled_ops
from .ops.geometry import gather_tri9, point_triangle_distance_sq_soa

__all__ = ["SDFConfig", "Binned", "bin_mesh", "sdf_from_tri_verts", "make_level_set3"]


@dataclasses.dataclass(frozen=True)
class SDFConfig:
    """Pipeline configuration (the reference's build+runtime knobs rolled
    into one dataclass, per SURVEY §5 "config/flag system").

    SHARDED MODES (parallel/sharded.sharded_sdf): every mode shards.
    ``far_field="exact"`` (the default pyramid schedule, or the capped
    ladder when ``vdt_max_hop`` is set) and ``far_field="eikonal"`` are
    the fast paths; ``far_field="propagate"`` (legacy) runs with
    serialized cross-shard plane scans (bit-equal, compat-only speed).
    Both sign modes shard (``"host"`` ships per-shard packed parity,
    ``"device"`` partitions the 2D sign tiles and runs the double-float
    SOS predicates per shard — the ray axis is unsharded, no collectives).
    """

    exact_band: int = 1
    # "exact": band + closest-point jump-flood far field (CPU-backend
    # semantics, default); "propagate": directional plane scans (legacy);
    # "eikonal": CUDA-backend semantics.
    far_field: str = "exact"
    # "host": parity computed in NumPy float64 during binning (exact reference
    # parity, fastest); "device": double-float SOS predicates on device
    # (self-contained, but this backend compiles the long df chains slowly).
    # Both shard (device mode partitions the 2D sign tiles per shard).
    sign_mode: str = "host"
    # host-mode parity transport to the device: "packed" ships the bit-packed
    # (ni/8, nj, nk) field (one fused unpack op); "crossings" ships only the
    # per-column crossing positions ((C, nj, nk) int16) and reconstructs
    # parity on device as XOR of compares; "auto" (default) picks whichever
    # is smaller (crossings wins whenever max crossings/column < ni/16 —
    # every benchmark mesh; the host link costs ~50 ms/MB, round-5 measure)
    parity_transport: str = "auto"
    tile_shape: Tuple[int, int, int] = band_ops.DEFAULT_TILE
    tile2d_shape: Tuple[int, int] = sign_ops.DEFAULT_TILE_2D
    # safety cap only — the propagation while_loop exits as soon as a full
    # pass changes nothing. A sharded pass serializes shard rows WITHIN each
    # directional sweep (parallel/sharded._sharded_propagate), so a pass
    # means the same global sweep sequence in both settings and the cap
    # needs no shard adjustment.
    max_passes: int = 64
    # "exact" mode far field (ops/vdt.py): extra stride-1 polish rounds of
    # the closest-point jump flood (None = auto: 2 for grids <= 256, 4 for
    # deeper grids — sampled-oracle max error at 512-cubed was 0.35dx with
    # 2 and 0.12dx with 4), and an optional stride cap. Sharded runs need
    # max_hop <= the shard block on the sharded axes (one halo slab per
    # round); single-device results with the same cap match shard runs
    # bit-exactly. None = full ladder (fastest, single-device default).
    vdt_extra_rounds: Optional[int] = None
    vdt_max_hop: Optional[int] = None
    # Lipschitz (chamfer) relaxation passes on the final unsigned field —
    # tightens the rare residual far-field overestimates at negligible cost
    chamfer_passes: int = 2
    # meshes with at most this many triangles skip binning/band/JFA entirely:
    # one fused Pallas kernel evaluates every cell against every triangle
    # (exact everywhere, seconds to compile). 0 disables the dense path.
    dense_max_tris: int = dense_ops.DENSE_MAX_TRIS
    eikonal_iters: Optional[int] = None  # default 2*max(n), like .cu:690
    band_chunk: int = 128
    sign_chunk: int = 64


@dataclasses.dataclass(frozen=True)
class Binned:
    """Host-side preprocessing product: static-shape candidate lists.

    Rebinning is required when vertices move across cell boundaries; for
    gradient-based mesh optimization, rebin per step (cheap NumPy) or reuse
    while displacements stay below one cell.
    """

    grid: GridSpec
    config: SDFConfig
    band: Optional[band_ops.BandBinning]  # None on the dense path
    sign: Optional[sign_ops.SignBinning]
    tris: np.ndarray  # (M, 3) int32
    parity_packed: Optional[np.ndarray] = None  # host-mode parity, packbits(i)
    # CSR candidate layout for the Pallas band kernel (ops/band_pallas.py):
    # pair ids (P,), per-active-tile offsets/counts (A_pad,), both padded to
    # jit-stable buckets; kcap = static per-tile DMA window (max count)
    band_csr: Optional[dict] = None
    # host-parity "crossings" transport: (C, nj, nk) int16 per-column x-ray
    # crossing positions (None when parity_packed is used instead)
    parity_crossings: Optional[np.ndarray] = None
    # the band (in cells) the candidate lists were binned with: the freeze
    # threshold (cells whose band value is treated as provably exact) must
    # never exceed it — a wider freeze would pin non-minimal upper bounds
    seed_band: int = 3
    # device-resident payload of everything make_level_set3 ships to the
    # chip, uploaded as ONE blob at bin time (upload.py) and unpacked
    # INSIDE the consuming jit ({"__blob__", "__meta__"}): the tunnel
    # costs ~27 ms fixed per transfer and ~25 ms per dispatch, so separate
    # uploads/dispatches cost more than all kernels combined
    device: Optional[dict] = None


def _bucket(n: int, minimum: int = 64, shift: int = 4) -> int:
    """Round up to a coarse bucket to bound jit recompilations.

    `shift` sets the granularity (quantum = 2^(bits-shift)): 4 keeps padding
    waste under ~6% — round-3 used shift 2, whose up-to-33% padding was pure
    wasted band work (sphere82k: A 9097 -> 12288).
    """
    if n <= minimum:
        return minimum
    p = 1 << max(int(n - 1).bit_length() - shift, 3)
    return -(-n // p) * p


def _dx_scalar(dx):
    """Normalize dx to a 0-d value INSIDE a jit.

    The hot paths ship dx (and origin) to the device once, in the binning
    blob, as a (1,) array — a fresh `jnp.float32(dx)` per call costs a
    ~27 ms fixed tunnel transfer (measured round 5). Legacy paths still
    pass a scalar; both trace to the same program."""
    return jnp.asarray(dx).reshape(())


def _vdt_axis_perm(grid_shape):
    """Axis order for the pyramid VDT: largest dim on lanes (k), next on
    sublanes (j) — minimizes the lane-padded cell count roundup(k, 128) *
    j * i. Identity when it's already minimal (ties keep identity)."""
    best = (0, 1, 2)

    def padded_cells(p):
        d = [grid_shape[p[0]], grid_shape[p[1]], grid_shape[p[2]]]
        return d[0] * d[1] * (-(-d[2] // 128) * 128)

    import itertools

    for p in itertools.permutations((0, 1, 2)):
        if padded_cells(p) < padded_cells(best):
            best = p
    return best


def use_dense(config: SDFConfig, num_tris: int) -> bool:
    """True when the fused all-triangles kernel replaces band+JFA."""
    cap = min(config.dense_max_tris, dense_ops.DENSE_MAX_TRIS)
    return config.far_field == "exact" and 0 < num_tris <= cap


def _upload_binned(mesh, parity, crossings, csr=None, grid=None):
    """One-blob device upload of the per-binning pipeline inputs.

    origin/dx ride in the blob too: a fresh `jnp.asarray(origin)` /
    `jnp.float32(dx)` per call each cost a ~27 ms fixed-overhead tunnel
    transfer — measured round 5, they were most of the warm-call wall at
    box256 (the dense kernel itself is ~10 ms)."""
    from .upload import pack_device_blob

    arrays = {
        "verts": np.ascontiguousarray(mesh.verts, np.float32),
        "tris": mesh.tris.astype(np.int32),
    }
    if grid is not None:
        arrays["origin"] = np.asarray(grid.origin, np.float32)
        arrays["dxv"] = np.asarray([grid.dx], np.float32)
    if parity is not None:
        arrays["parity"] = parity
    if crossings is not None:
        arrays["crossings"] = crossings
    if csr is not None:
        arrays["pair"] = csr["pair"]
        arrays["off"] = csr["off"]
        arrays["cnt"] = csr["cnt"]
        if "ids" in csr:
            arrays["ids"] = csr["ids"]
    return pack_device_blob(arrays, unpack_now=False)


def _host_parity_choose(mesh, grid, mode, min_cross_rows=0):
    """Host parity in the requested transport: (packed, crossings), one None.

    "auto" computes the SOS predicates ONCE (as crossings) and ships
    whichever encoding is smaller — the packed field, when it wins, is
    derived from the crossings (sign_host.packed_from_crossings), never a
    second predicate pass. Crossings win whenever max crossings/column
    < ni/16 (every benchmark mesh; the host link costs ~16 ms/MB)."""
    if mode == "auto":
        cross = sign_host_ops.crossings_host(
            mesh.verts, mesh.tris, grid, min_rows=min_cross_rows)
        # smaller transport wins: C int16 rows/column vs ni/8 bit bytes
        if cross.shape[0] * 2 < -(-grid.shape[0] // 8):
            return None, cross
        return sign_host_ops.packed_from_crossings(
            cross, grid.shape[0]), None
    if mode == "crossings":
        return None, sign_host_ops.crossings_host(
            mesh.verts, mesh.tris, grid, min_rows=min_cross_rows)
    if mode != "packed":
        raise ValueError(f"unknown parity_transport: {mode}")
    return sign_host_ops.parity_packed_host(
        mesh.verts, mesh.tris, grid), None


def bin_mesh(mesh: Mesh, grid: GridSpec, config: SDFConfig = SDFConfig(),
             min_cross_rows: int = 0) -> Binned:
    """Host-side preprocessing for `make_level_set3`. `min_cross_rows` pads
    the crossings transport's row bucket so batches of similar meshes share
    one traced program (api.generate_sdf_batch passes a running maximum)."""
    mesh.validate_indices()
    if use_dense(config, len(mesh.tris)) and config.sign_mode == "host":
        # "auto" picks the smaller transport here too (round-4 always
        # shipped packed on the dense path: at box256 that was a 4.6 MB
        # upload where the crossings are ~0.6 MB — ~65 ms of tunnel time)
        packed, cross = _host_parity_choose(mesh, grid,
                                            config.parity_transport,
                                            min_cross_rows)
        if cross is not None:
            return Binned(grid, config, None, None,
                          mesh.tris.astype(np.int32), None,
                          parity_crossings=cross,
                          device=_upload_binned(mesh, None, cross, grid=grid))
        return Binned(grid, config, None, None,
                      mesh.tris.astype(np.int32), packed,
                      device=_upload_binned(mesh, packed, None, grid=grid))
    # The FDT far field draws its candidates from band-result winners; a
    # >=3-cell seed band makes the 27-neighborhood union cover the true
    # closest triangle for near-band cells (measured: max far-field error
    # 0.37dx at band 1 -> 0.023dx at band 3). A wider user band is honored.
    seed_band = max(config.exact_band, 3 if config.far_field == "exact" else config.exact_band)
    bin_band = seed_band  # recorded in Binned: the freeze threshold ceiling
    bb = band_ops.bin_triangles(
        mesh.verts, mesh.tris, grid, seed_band, config.tile_shape,
        prune=config.far_field == "exact",
    )

    def pad_band(bb):
        bb_ids, bb_cand, bb_valid = pad_rows(bb, _bucket(bb.num_active))
        T_band = int(np.prod(bb.tiles_dim))
        bb_ids[bb.num_active :] = T_band  # sentinel row: dropped by scatter
        return dataclasses.replace(
            bb, active_ids=bb_ids, cand=bb_cand, cand_valid=bb_valid
        )

    def pad_rows(b, target):
        a = b.active_ids.shape[0]
        pad = target - a
        return (
            np.pad(b.active_ids, (0, pad)),
            np.pad(b.cand, ((0, pad), (0, 0))),
            np.pad(b.cand_valid, ((0, pad), (0, 0))),
        )

    def build_csr(bb):
        from .ops import band_pallas
        pair, off, cnt = band_pallas.band_csr_from_binning(
            bb.cand, bb.cand_valid, int(len(mesh.tris))
        )
        A_pad = _bucket(bb.num_active)
        off = np.pad(off, (0, A_pad - len(off)))
        cnt = np.pad(cnt, (0, A_pad - len(cnt)))
        P_pad = _bucket(len(pair), minimum=128)  # quantum 1/16: <6% pad
        pair = np.pad(pair, (0, P_pad - len(pair)),
                      constant_values=len(mesh.tris))
        kcap = max(-(-int(cnt.max() or 1) // 64) * 64, 64)
        # padded active ids ride in the same blob (every separate upload
        # costs ~22 ms of tunnel fixed overhead)
        ids, _, _ = pad_rows(bb, A_pad)
        ids[bb.num_active:] = int(np.prod(bb.tiles_dim))
        return {"pair": pair, "off": off, "cnt": cnt, "kcap": kcap,
                "ids": ids}

    if config.sign_mode == "host":
        packed, cross = _host_parity_choose(mesh, grid,
                                            config.parity_transport,
                                            min_cross_rows)
        csr = build_csr(bb)
        return Binned(grid, config, pad_band(bb), None,
                      mesh.tris.astype(np.int32), packed,
                      band_csr=csr, seed_band=bin_band,
                      parity_crossings=cross,
                      device=_upload_binned(mesh, packed, cross, csr, grid=grid))
    elif config.sign_mode != "device":
        raise ValueError(f"unknown sign_mode: {config.sign_mode}")

    sb = sign_ops.bin_triangles_2d(mesh.verts, mesh.tris, grid, config.tile2d_shape)

    sb_ids, sb_cand, sb_valid = pad_rows(sb, _bucket(sb.active_ids.shape[0]))
    T_sign = int(np.prod(sb.tiles_dim))
    sb_ids[len(sb.active_ids) :] = T_sign  # sentinel: dropped by scatter
    sb = dataclasses.replace(sb, active_ids=sb_ids, cand=sb_cand, cand_valid=sb_valid)

    csr = build_csr(bb)
    return Binned(grid, config, pad_band(bb), sb, mesh.tris.astype(np.int32),
                  band_csr=csr, seed_band=bin_band,
                  device=_upload_binned(mesh, None, None, csr, grid=grid))


# ---------------------------------------------------------------------------
# Differentiable final distance evaluation
# ---------------------------------------------------------------------------


def _recompute_phi(tri_verts, tid, parity, origin, dx, upper, ijk_offset=None,
                   chunk_cells: int = 1 << 20):
    """phi(cell) = sign * point_triangle_distance(cell, tri_verts[tid]).

    tid/parity are integer fields (implicitly non-differentiable); gradients
    flow to tri_verts through the closest-point evaluation only. `ijk_offset`
    shifts local block indices to global ones for sharded evaluation.

    Memory layout: gathers go through a (9, N) transposed triangle table and
    flat cell chunks — a (N, 3, 3) gather would be padded by TPU tiling to
    (N, 4, 128) (2000x waste at grid scale).
    """
    ni, nj, nk = tid.shape
    if ijk_offset is None:
        ijk_offset = jnp.zeros((3,), jnp.int32)
    tri9 = tri_verts.reshape(-1, 9).T  # (9, M)

    N = ni * nj * nk
    CH = min(chunk_cells, N)
    n_chunks = -(-N // CH)
    pad = n_chunks * CH - N
    flat_tid = jnp.pad(tid.reshape(-1), (0, pad)).reshape(n_chunks, CH)
    flat_par = jnp.pad(parity.reshape(-1), (0, pad)).reshape(n_chunks, CH)
    base = (jnp.arange(n_chunks, dtype=jnp.int32) * CH)

    @partial(jax.checkpoint, policy=jax.checkpoint_policies.nothing_saveable)
    def slab(args):
        t, par, b0 = args
        idx = b0 + jnp.arange(CH, dtype=jnp.int32)
        ci = idx // (nj * nk) + ijk_offset[0]
        cj = (idx // nk) % nj + ijk_offset[1]
        ck = idx % nk + ijk_offset[2]
        p = (
            ci.astype(jnp.float32) * dx + origin[0],
            cj.astype(jnp.float32) * dx + origin[1],
            ck.astype(jnp.float32) * dx + origin[2],
        )
        a, bb, c = gather_tri9(tri9, t)  # 9 x (CH,) 1-D gathers
        d2 = point_triangle_distance_sq_soa(p, a, bb, c)
        d = jnp.sqrt(jnp.maximum(d2, jnp.float32(1e-30)))
        d = jnp.where(t >= 0, d, upper)
        return jnp.where(par, -d, d)

    if n_chunks == 1:
        out = slab((flat_tid[0], flat_par[0], base[0]))[None]
    else:
        out = jax.lax.map(slab, (flat_tid, flat_par, base))
    return out.reshape(-1)[:N].reshape(ni, nj, nk)


# ---------------------------------------------------------------------------
# Jitted device core
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=(
        "grid_shape", "tile_shape", "tiles_dim", "strides",
        "chamfer_passes", "band_chunk", "seed_band", "jacobi", "apply_sign",
        "pyramid", "extra_polish", "use_pallas", "band_kcap",
    ),
)
def _exact_core(
    verts, tris, band_ids, band_cand, band_valid, parity_packed, origin, dx,
    pair_cand=None, tile_off=None, tile_cnt=None,
    *, grid_shape, tile_shape, tiles_dim, strides, chamfer_passes,
    band_chunk, seed_band, jacobi, apply_sign, pyramid=False, extra_polish=2,
    use_pallas=False, band_kcap=0,
):
    """The default single-program pipeline for binned meshes.

    band (MXU-form per-tile eval, exact distances AND exact closest points)
    -> closest-point jump flooding over the cell grid (ops/vdt.py: pure
    rolls + elementwise, no gathers) -> Lipschitz relaxation ->
    (optionally) fused host-parity sign. ONE jit: through the axon tunnel
    every separate dispatch costs a ~25 ms synchronous round trip, so stage
    fusion is itself a first-order optimization.

    Mirrors the reference pipeline's stages (narrow band
    cpu_lib/makelevelset3.cpp:203-220, id-propagating far field :243-292,
    sign application :295-303) with TPU-shaped algorithms.
    """
    ni, nj, nk = grid_shape
    dx = _dx_scalar(dx)
    upper = (jnp.float32(ni + nj + nk)) * dx
    # triangle-vertex gather INSIDE the jit: through the axon tunnel every
    # separate dispatch costs a ~25 ms synchronous round trip
    tri_verts = verts[tris]

    if use_pallas and band_kcap > 0 and tile_shape == (8, 8, 8):
        # fused Pallas band: distances + winner ids + closest points in one
        # kernel over CSR candidate segments (ops/band_pallas.py), then a
        # pure reshape/transpose untile — no scatter, no winner re-gather
        from .ops import band_pallas

        T = int(np.prod(tiles_dim))
        phi_r, tid_r, cpx_r, cpy_r, cpz_r = band_pallas.band_rows_pallas(
            tri_verts - origin.astype(tri_verts.dtype),
            pair_cand, band_ids, tile_off, tile_cnt, dx,
            kcap=band_kcap, tiles_dim=tiles_dim, grid_shape=grid_shape,
        )
        # rows never written by the kernel (inactive tiles) hold garbage
        active = jnp.zeros((T + 1,), bool).at[band_ids].set(True)
        am = active[:T, None]

        def unt(rows, fill):
            rows = jnp.where(am, rows[:T], fill)
            return tiled_ops.untile_rows(rows, tile_shape, tiles_dim,
                                         grid_shape)

        phi0 = unt(phi_r, upper)
        tid0 = unt(tid_r, jnp.int32(-1))
        cpx = unt(cpx_r, vdt_ops.FAR)
        cpy = unt(cpy_r, vdt_ops.FAR)
        cpz = unt(cpz_r, vdt_ops.FAR)
    else:
        phi_rows, tid_rows = tiled_ops.tile_candidate_rows(
            tri_verts, band_ids, band_cand, band_valid, origin, dx,
            tile_shape=tile_shape, tiles_dim=tiles_dim, grid_shape=grid_shape,
            chunk=band_chunk,
        )
        table = tiled_ops.tri_affine_table(
            tri_verts - origin.astype(tri_verts.dtype)
        )
        cp_rows = tiled_ops.closest_point_rows(
            table, band_ids, tid_rows, dx,
            tile_shape=tile_shape, tiles_dim=tiles_dim, chunk=band_chunk,
            far=vdt_ops.FAR,
        )

        phi0, tid0 = tiled_ops.scatter_untile(
            phi_rows, tid_rows, band_ids, upper, tile_shape, tiles_dim,
            grid_shape
        )
        cpx, cpy, cpz = (
            tiled_ops.scatter_rows(
                r, band_ids, vdt_ops.FAR, tile_shape, tiles_dim, grid_shape
            )
            for r in cp_rows
        )

    # Fusing the band evaluation into the VDT's jump-flood loops miscompiles
    # on the TPU backend (the fused program returned values BELOW the
    # stagewise composition of the identical stages — judge: an
    # undershooting distance field is impossible by construction). The
    # barrier pins the stage boundary without a dispatch round trip.
    phi0, tid0, cpx, cpy, cpz = jax.lax.optimization_barrier(
        (phi0, tid0, cpx, cpy, cpz)
    )

    freeze = (tid0 >= 0) & (phi0 <= jnp.float32(seed_band) * dx)
    if pyramid:
        # (A per-cell exact re-evaluation from the winning tid would tighten
        # the far field further — 0.16 -> 0.14 dx on the goldens — but the
        # XLA gather it needs measured 1.1 s at 256-class on the real chip,
        # dwarfing the whole pipeline. The differentiable path still pays it
        # in `_recompute_stage`, where gradient flow requires it anyway.)
        #
        # Axis permutation: the VDT's k axis lives on TPU lanes and pads to
        # a 128 multiple (the torus' 75-deep k would waste 1.7x), so run
        # the pyramid with the grid axes reordered to put the LARGEST dim
        # on lanes. The VDT is axis-symmetric (per-axis positions + the
        # matching cp channel order); cells are cubic, so only the channel
        # order and the field transposes need permuting.
        perm = _vdt_axis_perm(grid_shape)
        if perm == (0, 1, 2):
            phi, tid = vdt_ops.vdt_pyramid_far_field(
                cpx, cpy, cpz, tid0, phi0, dx, freeze_mask=freeze,
                extra_polish=extra_polish, use_pallas=use_pallas,
            )
        else:
            cps = (cpx, cpy, cpz)
            t = lambda x: jnp.transpose(x, perm)  # noqa: E731
            phi_p, tid_p = vdt_ops.vdt_pyramid_far_field(
                t(cps[perm[0]]), t(cps[perm[1]]), t(cps[perm[2]]),
                t(tid0), t(phi0), dx, freeze_mask=t(freeze),
                extra_polish=extra_polish, use_pallas=use_pallas,
            )
            inv = tuple(np.argsort(perm))
            phi = jnp.transpose(phi_p, inv)
            tid = jnp.transpose(tid_p, inv)
    else:
        phi, tid = vdt_ops.vdt_far_field(
            cpx, cpy, cpz, tid0, phi0, dx, strides, freeze_mask=freeze,
            jacobi=jacobi,
        )
    if chamfer_passes > 0:
        if use_pallas:
            from .ops.vdt_pallas import pallas_chamfer

            phi = pallas_chamfer(phi, dx, passes=chamfer_passes)
        else:
            phi = vdt_ops.chamfer_relax(phi, dx, passes=chamfer_passes)

    if apply_sign:
        parity = _parity_device(parity_packed, ni)
        return jnp.where(parity, -phi, phi), tid
    return phi, tid


@partial(jax.jit, static_argnames=("chunk_cells",))
def _recompute_stage(tri_verts, tid, parity, origin, dx, chunk_cells=1 << 20):
    dx = _dx_scalar(dx)
    upper = jnp.float32(sum(tid.shape)) * dx  # makelevelset3.cpp:197
    return _recompute_phi(tri_verts, tid, parity, origin, dx, upper,
                          chunk_cells=chunk_cells)


@partial(jax.jit, static_argnames=("ni",))
def _unpack_parity_stage(parity_packed, ni):
    return _parity_device(parity_packed, ni)


def _parity_device(parity_data, ni):
    """Device-side parity reconstruction for either host transport: the
    bit-packed field (uint8) or per-column crossing positions (int16)."""
    if parity_data.dtype == jnp.int16:
        return sign_host_ops.parity_from_crossings_device(parity_data, ni)
    return sign_host_ops.unpack_parity_device(parity_data, ni)


@jax.jit
def _sign_apply_stage(phi, parity):
    return jnp.where(parity, -phi, phi)


@partial(jax.jit, static_argnames=("ni",))
def _sign_apply_packed_stage(phi, parity_packed, ni):
    """Fused unpack+apply: one kernel, one read of phi, no bool field in HBM."""
    parity = sign_host_ops.unpack_parity_device(parity_packed, ni)
    return jnp.where(parity, -phi, phi)


@partial(jax.jit, static_argnames=("grid_shape", "interpret"))
def _dense_sign_core(verts, tris, parity_packed, origin, dx, *,
                     grid_shape, interpret):
    """The whole non-differentiable dense path as ONE dispatch: vertex
    gather -> fused all-triangles Pallas kernel -> packed-parity sign.
    Through the axon tunnel each separate dispatch costs a ~25 ms
    synchronous round trip — at box256's ~130 ms budget (10x the RTX-4090
    anchor) the old 3-dispatch structure spent over half the budget idle."""
    dx = _dx_scalar(dx)
    tri_verts = verts[tris]
    phi_d, tid = dense_ops.dense_distance_field(
        tri_verts, origin, dx, grid_shape=grid_shape, interpret=interpret)
    parity = _parity_device(parity_packed, grid_shape[0])
    return jnp.where(parity, -phi_d, phi_d), tid


@partial(jax.jit, static_argnames=("meta", "grid_shape", "interpret"))
def _dense_sign_blob_core(blob, *, meta, grid_shape, interpret):
    """Blob-direct dense path: the upload is a bare device_put and this ONE
    dispatch does unpack + gather + dense kernel + sign. Each separate
    dispatch costs a ~25 ms synchronous tunnel round trip, and the
    separate at-bin-time unpack dispatch was another ~25 ms — at box256's
    ~130 ms end-to-end budget (10x the RTX-4090 anchor) both matter."""
    from .upload import unpack_blob

    v = unpack_blob(blob, meta)
    parity = v.get("parity", v.get("crossings"))
    return _dense_sign_core(v["verts"], v["tris"], parity, v["origin"],
                            v["dxv"], grid_shape=grid_shape,
                            interpret=interpret)


@partial(jax.jit, static_argnames=(
    "meta", "grid_shape", "tile_shape", "tiles_dim", "chamfer_passes",
    "band_chunk", "seed_band", "band_kcap"))
def _exact_blob_core(blob, *, meta, grid_shape, tile_shape, tiles_dim,
                     chamfer_passes, band_chunk, seed_band, band_kcap):
    """Blob-direct fused exact path (Pallas CSR band + pyramid VDT + fused
    sign) — ONE dispatch per call; see _dense_sign_blob_core."""
    from .upload import unpack_blob

    v = unpack_blob(blob, meta)
    parity = v.get("parity", v.get("crossings"))
    di = jnp.zeros((0,), jnp.int32)
    return _exact_core(
        v["verts"], v["tris"], v["ids"], di, di, parity,
        v["origin"], v["dxv"], v["pair"], v["off"], v["cnt"],
        grid_shape=grid_shape, tile_shape=tile_shape, tiles_dim=tiles_dim,
        strides=(), chamfer_passes=chamfer_passes, band_chunk=band_chunk,
        seed_band=seed_band, jacobi=False, apply_sign=True, pyramid=True,
        use_pallas=True, band_kcap=band_kcap)


def sdf_from_tri_verts(
    tri_verts,  # (M, 3, 3) f32 — differentiable input
    f_hi,
    f_lo,  # (M, 3, 3) f32 sign-pass df coordinates (non-diff; device mode)
    band_ids,
    band_cand,
    band_valid,
    sign_ids,
    sign_cand,
    sign_valid,
    parity_packed,  # packed host parity (host mode) or None
    origin,
    dx,
    *,
    grid_shape,
    tile_shape,
    tiles_dim,
    tile2d_shape,
    tiles2d_dim,
    far_field="exact",
    max_passes=8,
    eikonal_iters=None,
    band_chunk=128,
    sign_chunk=64,
    vdt_extra_rounds=None,
    vdt_max_hop=None,
    chamfer_passes=2,
    seed_band=3,
    sign_mode="host",
    dense_max_tris=dense_ops.DENSE_MAX_TRIS,
    skip_recompute=False,
    pair_cand=None,
    tile_off=None,
    tile_cnt=None,
    band_kcap=0,
    verts=None,  # (N, 3) f32 + (M, 3) i32: lets the jitted cores gather
    tris=None,   # tri_verts in-program (one dispatch fewer per call)
):
    """Full pipeline, orchestrated as SEPARATELY-JITTED stages.

    One fused program triggers super-linear compile times on this backend
    (~10 min for the 64-grid pipeline vs ~2 min as stages); only the final
    `_recompute_stage` is differentiable, everything upstream is integer
    fields behind stop_gradient, so stage boundaries cost nothing."""
    ni, nj, nk = grid_shape

    if verts is None or tris is None:
        verts = jax.lax.stop_gradient(tri_verts).reshape(-1, 3)
        tris = jnp.arange(verts.shape[0], dtype=jnp.int32).reshape(-1, 3)
    num_tris = int(tris.shape[0])
    tv_ng = None if tri_verts is None else jax.lax.stop_gradient(tri_verts)

    cfg_for_dense = SDFConfig(far_field=far_field, dense_max_tris=dense_max_tris)
    if use_dense(cfg_for_dense, num_tris):
        if sign_mode == "host" and skip_recompute:
            # non-differentiable callers: gather + dense kernel + fused
            # unpack+sign as ONE dispatch
            from .platform import is_tpu_platform as _tpu

            return _dense_sign_core(
                verts, tris, parity_packed, origin, dx,
                grid_shape=grid_shape, interpret=not _tpu())
        if tv_ng is None:
            tv_ng = verts[tris]
            tri_verts = tv_ng
        phi_d, tid = dense_ops.dense_distance_field(
            tv_ng, origin, dx, grid_shape=grid_shape
        )
        if sign_mode == "host":
            parity = _unpack_parity_stage(parity_packed, ni)
        else:
            parity = sign_ops.parity_field(
                f_hi, f_lo, sign_ids, sign_cand, sign_valid,
                tile_shape=tile2d_shape, tiles_dim=tiles2d_dim,
                grid_shape=grid_shape, chunk=sign_chunk,
            )
            if skip_recompute:
                return _sign_apply_stage(phi_d, parity), tid
        return _recompute_stage(tri_verts, tid, parity, origin, dx), tid

    if far_field == "exact":
        # ONE fused program: band + closest-point jump-flood far field
        # (+ fused sign for non-differentiable callers)
        fuse_sign = sign_mode == "host" and skip_recompute
        # Schedule selection: the capped ladder (vdt_max_hop) is the sharded
        # bit-equality mode; an explicit vdt_extra_rounds keeps the legacy
        # flat ladder. The default is the coarse-to-fine pyramid (same
        # overestimate-only invariants, ~10x cheaper at 256-class grids).
        pyramid = vdt_max_hop is None and vdt_extra_rounds is None
        extra = vdt_extra_rounds
        if extra is None:
            extra = 2 if max(grid_shape) <= 256 else 4
        strides = () if pyramid else vdt_ops.stride_ladder(
            max(grid_shape), max_hop=vdt_max_hop, extra_rounds=extra,
        )
        use_pal = pyramid and is_tpu_platform()
        dummy = jnp.zeros((0,), jnp.int32)
        phi, tid = _exact_core(
            verts, tris, band_ids, band_cand, band_valid,
            parity_packed if sign_mode == "host" else jnp.zeros((0,), jnp.uint8),
            origin, dx,
            pair_cand if pair_cand is not None else dummy,
            tile_off if tile_off is not None else dummy,
            tile_cnt if tile_cnt is not None else dummy,
            grid_shape=grid_shape, tile_shape=tile_shape, tiles_dim=tiles_dim,
            strides=strides, chamfer_passes=chamfer_passes,
            band_chunk=band_chunk, seed_band=seed_band,
            jacobi=vdt_max_hop is not None, apply_sign=fuse_sign,
            pyramid=pyramid, use_pallas=use_pal,
            band_kcap=band_kcap if pair_cand is not None else 0,
        )
        if fuse_sign:
            return phi, tid
        if sign_mode == "host":
            parity = _unpack_parity_stage(parity_packed, ni)
        else:
            parity = sign_ops.parity_field(
                f_hi, f_lo, sign_ids, sign_cand, sign_valid,
                tile_shape=tile2d_shape, tiles_dim=tiles2d_dim,
                grid_shape=grid_shape, chunk=sign_chunk,
            )
        if skip_recompute:
            return _sign_apply_stage(phi, parity), tid
        if tri_verts is None:
            tri_verts = verts[tris]
        return _recompute_stage(tri_verts, tid, parity, origin, dx), tid

    if tv_ng is None:
        tv_ng = verts[tris]
        tri_verts = tv_ng
    phi0, tid0 = band_ops.band_distance_field(
        tv_ng,
        band_ids,
        band_cand,
        band_valid,
        origin,
        dx,
        tile_shape=tile_shape,
        tiles_dim=tiles_dim,
        grid_shape=grid_shape,
        chunk=band_chunk,
    )

    if sign_mode == "host":
        parity = _unpack_parity_stage(parity_packed, ni)
    else:
        parity = sign_ops.parity_field(
            f_hi,
            f_lo,
            sign_ids,
            sign_cand,
            sign_valid,
            tile_shape=tile2d_shape,
            tiles_dim=tiles2d_dim,
            grid_shape=grid_shape,
            chunk=sign_chunk,
        )

    if far_field == "propagate":
        # legacy mode: directional plane scans to the 26-neighbor fixed point
        phi, tid = sweep_ops.propagate_closest_triangles(
            phi0, tid0, tv_ng, origin, dx, max_passes=max_passes
        )
        return _recompute_stage(tri_verts, tid, parity, origin, dx), tid
    elif far_field == "eikonal":
        iters = eikonal_iters if eikonal_iters is not None else 2 * max(grid_shape)
        frozen = tid0 >= 0
        phi = sweep_ops.eikonal_far_field(phi0, frozen, dx, iters)
        # Differentiable on the frozen band only; far field follows Eikonal
        # estimates (matching the CUDA backend's semantics, .cu:487-551).
        band_phi = _recompute_stage(tri_verts, tid0, parity, origin, dx)
        far_phi = jnp.where(parity, -phi, phi)
        return jnp.where(frozen, band_phi, far_phi), tid0
    else:
        raise ValueError(f"unknown far_field mode: {far_field}")


# ---------------------------------------------------------------------------
# Public orchestration
# ---------------------------------------------------------------------------


def _device_row_pad(b_ids, rows_total):
    """Append one junk row target so sentinel row indices scatter harmlessly."""
    return rows_total + 1


def make_level_set3(
    mesh: Mesh,
    grid: GridSpec,
    config: SDFConfig = SDFConfig(),
    binned: Optional[Binned] = None,
    verts: Optional[jnp.ndarray] = None,
    return_tid: bool = False,
):
    """Compute the signed distance field for `mesh` on `grid`.

    `verts` may override mesh.verts with a traced/device array to obtain
    gradients; binning is reused (valid while verts stay within their cells).
    Returns float32 (ni, nj, nk) [and closest-triangle ids if return_tid].
    """
    if mesh.is_empty:
        raise ValueError(
            "Cannot generate SDF from empty mesh (vertices or triangles are empty)"
        )
    if binned is None:
        binned = bin_mesh(mesh, grid, config)
    dev = binned.device or {}

    # BLOB FAST PATH: when the binning shipped one un-unpacked blob and the
    # call is the fused non-differentiable host-sign form, run the whole
    # pipeline as ONE dispatch that unpacks in-program (upload stays a bare
    # device_put; a separate unpack dispatch costs another ~25 ms tunnel
    # round trip).
    blob_ok = ("__blob__" in dev and verts is None
               and config.sign_mode == "host"
               and config.far_field == "exact")
    if blob_ok and use_dense(config, int(binned.tris.shape[0])):
        statics = dict(meta=dev["__meta__"], grid_shape=grid.shape,
                       interpret=not is_tpu_platform())
        if is_tpu_platform():
            # AOT warm start (aot.py): skip the multi-second re-trace in
            # fresh processes; falls back to the plain jit call
            from .aot import call_aot
            phi, tid = call_aot(_dense_sign_blob_core, "_dense_sign_blob_core",
                                statics, dev["__blob__"])
        else:
            phi, tid = _dense_sign_blob_core(dev["__blob__"], **statics)
        return (phi, tid) if return_tid else phi
    if (blob_ok and binned.band_csr is not None and is_tpu_platform()
            and config.vdt_max_hop is None
            and config.vdt_extra_rounds is None
            and binned.band is not None
            and binned.band.tile_shape == (8, 8, 8)):
        from .aot import call_aot
        phi, tid = call_aot(
            _exact_blob_core, "_exact_blob_core",
            dict(meta=dev["__meta__"], grid_shape=grid.shape,
                 tile_shape=binned.band.tile_shape,
                 tiles_dim=binned.band.tiles_dim,
                 chamfer_passes=config.chamfer_passes,
                 band_chunk=config.band_chunk,
                 seed_band=min(max(config.exact_band, 3), binned.seed_band),
                 band_kcap=binned.band_csr["kcap"]),
            dev["__blob__"])
        return (phi, tid) if return_tid else phi

    # every other path consumes individual arrays: materialize them from
    # the blob once (cached in the same dict)
    from .upload import unpack_device_dict

    dev = unpack_device_dict(dev)
    v = (dev.get("verts") if verts is None and "verts" in dev
         else jnp.asarray(mesh.verts if verts is None else verts))
    tris = dev.get("tris")
    if tris is None:
        tris = jnp.asarray(binned.tris)
    # only differentiable callers need tri_verts materialized out here (the
    # gradient flows through this gather); the fused cores gather in-jit
    tri_verts = v[tris] if verts is not None else None

    if config.sign_mode == "host":
        dummy = jnp.zeros((0,), jnp.float32)
        if "parity" in dev:
            parity_dev = dev["parity"]
        elif "crossings" in dev:
            parity_dev = dev["crossings"]
        else:
            parity_dev = jnp.asarray(
                binned.parity_packed if binned.parity_packed is not None
                else binned.parity_crossings)
        sign_args = dict(
            f_hi=dummy, f_lo=dummy,
            sign_ids=dummy, sign_cand=dummy, sign_valid=dummy,
            parity_packed=parity_dev,
            tile2d_shape=(1, 1), tiles2d_dim=(1, 1),
        )
    else:
        sign_args = dict(
            f_hi=jnp.asarray(binned.sign.f_hi),
            f_lo=jnp.asarray(binned.sign.f_lo),
            sign_ids=jnp.asarray(binned.sign.active_ids),
            sign_cand=jnp.asarray(binned.sign.cand),
            sign_valid=jnp.asarray(binned.sign.cand_valid),
            parity_packed=jnp.zeros((0,), jnp.uint8),
            tile2d_shape=binned.sign.tile_shape,
            tiles2d_dim=binned.sign.tiles_dim,
        )

    # on the Pallas band path the (A, K) candidate matrices are never read
    # — shipping them anyway would cost ~4 MB of tunnel upload per call.
    # The predicate must MATCH sdf_from_tri_verts' schedule selection: an
    # explicit vdt_max_hop/vdt_extra_rounds selects the flat (non-pyramid)
    # ladder whose band runs through the XLA tile path, which needs the
    # (A, K) matrices (dropping them crashed tile_candidate_rows at K=0).
    pallas_band = (binned.band_csr is not None and is_tpu_platform()
                   and config.far_field == "exact"
                   and config.vdt_max_hop is None
                   and config.vdt_extra_rounds is None
                   and (binned.band.tile_shape if binned.band else None)
                   == (8, 8, 8))
    if binned.band is not None:
        di = jnp.zeros((0,), jnp.int32)
        band_args = dict(
            band_ids=dev.get("ids", None) if "ids" in dev
            else jnp.asarray(binned.band.active_ids),
            band_cand=di if pallas_band
            else jnp.asarray(binned.band.cand),
            band_valid=di if pallas_band
            else jnp.asarray(binned.band.cand_valid),
            tile_shape=binned.band.tile_shape,
            tiles_dim=binned.band.tiles_dim,
        )
    else:  # dense path: band binning skipped entirely
        dummy = jnp.zeros((0,), jnp.int32)
        band_args = dict(
            band_ids=dummy, band_cand=dummy, band_valid=dummy,
            tile_shape=config.tile_shape, tiles_dim=(1, 1, 1),
        )

    phi, tid = sdf_from_tri_verts(
        tri_verts,
        sign_args["f_hi"],
        sign_args["f_lo"],
        band_args["band_ids"],
        band_args["band_cand"],
        band_args["band_valid"],
        sign_args["sign_ids"],
        sign_args["sign_cand"],
        sign_args["sign_valid"],
        sign_args["parity_packed"],
        # origin/dx prefer the blob-resident copies: fresh per-call
        # conversions each cost a fixed ~27 ms tunnel transfer
        (dev["origin"] if "origin" in dev and config.far_field == "exact"
         else jnp.asarray(grid.origin, jnp.float32)),
        (dev["dxv"] if "dxv" in dev and config.far_field == "exact"
         else jnp.float32(grid.dx)),
        grid_shape=grid.shape,
        tile_shape=band_args["tile_shape"],
        tiles_dim=band_args["tiles_dim"],
        tile2d_shape=sign_args["tile2d_shape"],
        tiles2d_dim=sign_args["tiles2d_dim"],
        far_field=config.far_field,
        max_passes=config.max_passes,
        eikonal_iters=config.eikonal_iters,
        band_chunk=config.band_chunk,
        sign_chunk=config.sign_chunk,
        vdt_extra_rounds=config.vdt_extra_rounds,
        vdt_max_hop=config.vdt_max_hop,
        chamfer_passes=config.chamfer_passes,
        # the freeze threshold is capped by the band actually binned with:
        # freezing wider would pin non-minimal band upper bounds (the
        # 0.35dx-class error the seed-band widening was added to fix)
        seed_band=min(max(config.exact_band, 3), binned.seed_band),
        sign_mode=config.sign_mode,
        dense_max_tris=config.dense_max_tris,
        skip_recompute=verts is None,
        pair_cand=(dev.get("pair", None) if "pair" in dev
                   else (jnp.asarray(binned.band_csr["pair"])
                         if binned.band_csr else None)),
        tile_off=(dev.get("off", None) if "off" in dev
                  else (jnp.asarray(binned.band_csr["off"])
                        if binned.band_csr else None)),
        tile_cnt=(dev.get("cnt", None) if "cnt" in dev
                  else (jnp.asarray(binned.band_csr["cnt"])
                        if binned.band_csr else None)),
        band_kcap=binned.band_csr["kcap"] if binned.band_csr else 0,
        verts=v,
        tris=tris,
    )
    if return_tid:
        return phi, tid
    return phi
