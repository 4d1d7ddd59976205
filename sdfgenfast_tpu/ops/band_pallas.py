"""Pallas TPU kernel for the narrow-band tile evaluation.

Replaces the XLA path (``ops/tiled.tile_candidate_rows`` +
``closest_point_rows`` + ``scatter_untile``) on real TPUs. The XLA path
measured ~290 ms at the 100k-triangle flagships — dominated by materialized
(B, C, K, 6) form tensors, a separate winner-gather pass for closest points,
and a row scatter. This kernel fuses all three:

  * CSR candidate layout: each active tile's candidate list lives in a
    contiguous (8-aligned) segment of one (P, 16) pair table — no per-tile
    K padding to the global max (the torus' K_max=416 vs median 163 wasted
    2.5x work in the padded (A, K) layout).
  * One grid step per active tile; the tile's segment is DMA'd to VMEM
    double-buffered (next tile's segment prefetches during compute).
  * The pair table holds the 9 GRID-LOCAL vertex coordinates (+ the
    bitcast candidate id); all affine coefficients are computed in-kernel
    per CHUNK(=16)-candidate chunk on (16, 1) vectors — gathering 12
    floats per pair (jnp.take rows, ~1.1 G elem/s measured) instead of a
    40-float coefficient row more than halves the device gather cost.
  * Distances use the same evaluation as the XLA path (and the reference,
    cpu_lib/makelevelset3.cpp:21-70): plane distance via the unit normal
    for barycentric-inside cells, cancellation-free difference-form
    clamped-edge distances otherwise; min over the 3 edges equals the
    region minimum.
  * Ties keep the LOWEST candidate id (candidate segments are ascending,
    so this equals the reference's first-wins strict '<').
  * The winner's closest point rides along as p - dd (dd is the winning
    difference vector, already computed for the distance), eliminating the
    separate closest_point_rows gather pass entirely.

Output: five (T+1, 512) row arrays (phi, tid-bits, cpx, cpy, cpz) in tile-row
layout; inactive-tile rows are filled by a cheap XLA select afterwards, and
``tiled.scatter_rows``-style untiling assembles the dense grids. Row T is a
junk target for padded steps.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["band_csr_from_binning", "band_rows_pallas", "CHUNK"]

CHUNK = 16  # candidates per inner step (two sublane tiles: halves loop overhead)
_SENT = np.float32(3e18)  # sentinel vertex coordinate: far away, degenerate


def band_csr_from_binning(cand, cand_valid, num_tris):
    """(A, K) padded candidate lists -> CSR arrays for the kernel.

    Returns (pair_cand (P,) int32, off (A,) int32, cnt (A,) int32) with each
    tile's segment padded to a CHUNK multiple using sentinel id `num_tris`
    (the sentinel table row: all vertices at 3e18 -> its distance ~2.7e37
    never wins and its id is never emitted).
    """
    counts = cand_valid.sum(axis=1).astype(np.int64)
    padded = -(-np.maximum(counts, 1) // CHUNK) * CHUNK
    off = np.concatenate([[0], np.cumsum(padded)[:-1]]).astype(np.int64)
    # binning emits PREFIX-dense rows (valid[i, :counts[i]] all True), so a
    # segment is just the row prefix + sentinel pad — one boolean mask over
    # the (A, Kp) grid builds the whole CSR array
    A, K = cand.shape
    Kp = max(K, int(padded.max()) if A else CHUNK)
    cols = np.arange(Kp)
    vals = np.where(cols[None, :] < counts[:, None],
                    np.pad(cand, ((0, 0), (0, Kp - K))), num_tris)
    pair = vals[cols[None, :] < padded[:, None]].astype(np.int32)
    return pair, off.astype(np.int32), padded.astype(np.int32)


def _band_kernel(ids_ref, cid_ref, off_ref, cnt_ref, dx_ref, pair_ref,
                 phi_ref, tid_ref, cpx_ref, cpy_ref, cpz_ref,
                 scratch, sems, *, kcap, ntj, ntk, dims_sum):
    # ids_ref: OUTPUT row ids (local tile index; consumed by the out index
    # map). cid_ref: COORDINATE tile ids decomposed with the (ntj, ntk)
    # statics — identical to ids_ref single-device; under shard_map they
    # carry GLOBAL tile ids so cell positions are global while rows stay
    # shard-local (sharded results must match single-device bit-for-bit).
    a = pl.program_id(0)
    n = pl.num_programs(0)
    dxf = dx_ref[0]
    upper = jnp.float32(dims_sum) * dxf  # makelevelset3.cpp:197
    upper_sq = upper * upper

    def start(slot, step):
        pltpu.make_async_copy(
            pair_ref.at[pl.ds(pl.multiple_of(off_ref[step], 8), kcap), :],
            scratch.at[slot],
            sems.at[slot],
        ).start()

    @pl.when(a == 0)
    def _():
        start(0, 0)

    @pl.when(a + 1 < n)  # no unwaited DMA may remain after the last step
    def _():
        start((a + 1) % 2, jnp.minimum(a + 1, n - 1))
    pltpu.make_async_copy(
        pair_ref.at[pl.ds(pl.multiple_of(off_ref[a], 8), kcap), :],
        scratch.at[a % 2], sems.at[a % 2],
    ).wait()
    tbl = scratch.at[a % 2]

    # tile cell positions, grid-local: cells c = (li*8 + lj)*8 + lk
    t = cid_ref[a]
    tk = t % ntk
    tj = (t // ntk) % ntj
    ti = t // (ntk * ntj)
    c = jax.lax.broadcasted_iota(jnp.int32, (1, 512), 1)
    x = (ti * 8 + c // 64).astype(jnp.float32) * dxf      # (1, 512)
    y = (tj * 8 + (c // 8) % 8).astype(jnp.float32) * dxf
    z = (tk * 8 + c % 8).astype(jnp.float32) * dxf

    inf = jnp.float32(jnp.inf)
    init = (
        jnp.full((1, 512), inf, jnp.float32),   # best d2
        jnp.full((1, 512), inf, jnp.float32),   # best tid bits (+inf = none)
        jnp.zeros((1, 512), jnp.float32),       # ddx of winner (p - cp)
        jnp.zeros((1, 512), jnp.float32),
        jnp.zeros((1, 512), jnp.float32),
    )

    def chunk_step(i, carry):
        best_d2, best_tb, bdx, bdy, bdz = carry
        c0 = pl.multiple_of(i * CHUNK, 8)

        def cf(col):
            return tbl[pl.ds(c0, CHUNK), col:col + 1]  # (CHUNK, 1)

        ax, ay, az = cf(0), cf(1), cf(2)
        bx, by, bz = cf(3), cf(4), cf(5)
        cx, cy, cz = cf(6), cf(7), cf(8)
        tidb = cf(9)

        # --- per-candidate affine coefficients on (CHUNK, 1) vectors ---
        def edge_coef(x1x, x1y, x1z, x2x, x2y, x2z):
            # s_raw = dot(x2 - p, x2 - x1)/|x2-x1|^2 expanded: e.p + e0,
            # with w = x1 - x2 and dd = (p - x2) - s*w
            wx, wy, wz = x1x - x2x, x1y - x2y, x1z - x2z
            m2 = wx * wx + wy * wy + wz * wz
            inv = 1.0 / jnp.maximum(m2, jnp.float32(1e-30))
            ex, ey, ez = wx * inv, wy * inv, wz * inv
            e0 = -(x2x * wx + x2y * wy + x2z * wz) * inv
            return (wx, wy, wz), (ex, ey, ez, e0)

        w_ab, e_ab = edge_coef(ax, ay, az, bx, by, bz)
        w_ac, e_ac = edge_coef(ax, ay, az, cx, cy, cz)
        w_bc, e_bc = edge_coef(bx, by, bz, cx, cy, cz)

        x13x, x13y, x13z = ax - cx, ay - cy, az - cz
        x23x, x23y, x23z = bx - cx, by - cy, bz - cz
        m13 = x13x * x13x + x13y * x13y + x13z * x13z
        m23 = x23x * x23x + x23y * x23y + x23z * x23z
        d = x13x * x23x + x13y * x23y + x13z * x23z
        invdet = 1.0 / jnp.maximum(m13 * m23 - d * d, jnp.float32(1e-30))
        g23x = invdet * (m23 * x13x - d * x23x)
        g23y = invdet * (m23 * x13y - d * x23y)
        g23z = invdet * (m23 * x13z - d * x23z)
        g23c = -(g23x * cx + g23y * cy + g23z * cz)
        g31x = invdet * (m13 * x23x - d * x13x)
        g31y = invdet * (m13 * x23y - d * x13y)
        g31z = invdet * (m13 * x23z - d * x13z)
        g31c = -(g31x * cx + g31y * cy + g31z * cz)

        crx = x13y * x23z - x13z * x23y
        cry = x13z * x23x - x13x * x23z
        crz = x13x * x23y - x13y * x23x
        cr2 = crx * crx + cry * cry + crz * crz
        rn = jax.lax.rsqrt(jnp.maximum(cr2, jnp.float32(1e-37)))
        nx, ny, nz = crx * rn, cry * rn, crz * rn
        h0 = -(nx * cx + ny * cy + nz * cz)
        degen = cr2 <= jnp.float32(1e-30)

        # --- (CHUNK, 512) evaluation ---
        h = nx * x + ny * y + nz * z + h0
        w23 = g23x * x + g23y * y + g23z * z + g23c
        w31 = g31x * x + g31y * y + g31z * z + g31c
        w12 = 1.0 - w23 - w31
        inside = (jnp.minimum(jnp.minimum(w23, w31), w12) >= 0.0) & (~degen)

        ubx, uby, ubz = x - bx, y - by, z - bz
        ucx, ucy, ucz = x - cx, y - cy, z - cz

        def edge_d2(e, w, ux, uy, uz):
            ex, ey, ez, e0 = e
            wx, wy, wz = w
            s = jnp.clip(ex * x + ey * y + ez * z + e0, 0.0, 1.0)
            ddx = ux - s * wx
            ddy = uy - s * wy
            ddz = uz - s * wz
            return ddx * ddx + ddy * ddy + ddz * ddz, (ddx, ddy, ddz)

        dab, dd_ab = edge_d2(e_ab, w_ab, ubx, uby, ubz)
        dac, dd_ac = edge_d2(e_ac, w_ac, ucx, ucy, ucz)
        dbc, dd_bc = edge_d2(e_bc, w_bc, ucx, ucy, ucz)
        d_edge = jnp.minimum(dab, jnp.minimum(dac, dbc))
        din = h * h
        d2 = jnp.where(inside, din, d_edge)

        # winner dd (p - cp): inside -> h*n; else the winning edge's dd
        ab_best = (dab <= dac) & (dab <= dbc)
        ac_best = (~ab_best) & (dac <= dbc)

        def pick_dd(i3):
            e = jnp.where(ab_best, dd_ab[i3],
                          jnp.where(ac_best, dd_ac[i3], dd_bc[i3]))
            return jnp.where(inside, h * (nx, ny, nz)[i3], e)

        ddx, ddy, ddz = pick_dd(0), pick_dd(1), pick_dd(2)

        # --- chunk reduction: first-wins == lowest id among d2 ties ---
        # (bitcast id bits sort like the non-negative ints they carry)
        cmin = jnp.min(d2, axis=0, keepdims=True)          # (1, 512)
        at_min = d2 == cmin
        tb = jnp.min(jnp.where(at_min, tidb, inf), axis=0, keepdims=True)
        win = at_min & (tidb == tb)
        wdx = jnp.min(jnp.where(win, ddx, inf), axis=0, keepdims=True)
        wdy = jnp.min(jnp.where(win, ddy, inf), axis=0, keepdims=True)
        wdz = jnp.min(jnp.where(win, ddz, inf), axis=0, keepdims=True)

        # merge with carry: strict '<' keeps earlier (lower-id) candidates
        better = cmin < best_d2
        return (
            jnp.where(better, cmin, best_d2),
            jnp.where(better, tb, best_tb),
            jnp.where(better, wdx, bdx),
            jnp.where(better, wdy, bdy),
            jnp.where(better, wdz, bdz),
        )

    best_d2, best_tb, bdx, bdy, bdz = jax.lax.fori_loop(
        0, cnt_ref[a] // CHUNK, chunk_step, init)

    # adopt only below the reference's init upper bound (ni+nj+nk)*dx
    has = best_d2 < upper_sq
    phi_ref[0, 0, :] = jnp.where(has, jnp.sqrt(best_d2), upper)[0]
    none_bits = jax.lax.bitcast_convert_type(
        jnp.full((1, 512), -1, jnp.int32), jnp.float32)
    tid_ref[0, 0, :] = jnp.where(has, best_tb, none_bits)[0]
    far = jnp.float32(3e18)
    cpx_ref[0, 0, :] = jnp.where(has, x - bdx, far)[0]
    cpy_ref[0, 0, :] = jnp.where(has, y - bdy, far)[0]
    cpz_ref[0, 0, :] = jnp.where(has, z - bdz, far)[0]


def band_rows_pallas(
    tri_local,   # (M, 3, 3) f32 GRID-LOCAL vertices (origin subtracted)
    pair_cand,   # (P,) int32 CSR candidate ids (sentinel M for pads)
    active_ids,  # (A_pad,) int32 linear tile ids (sentinel T for pads)
    tile_off,    # (A_pad,) int32 segment starts (8-aligned)
    tile_cnt,    # (A_pad,) int32 segment lengths (8-aligned; 0 for pads)
    dx,
    *,
    kcap: int,
    tiles_dim,
    grid_shape,
    interpret: bool = False,
    coord_ids=None,      # (A_pad,) int32 tile ids used for CELL POSITIONS,
    coord_tiles_dim=None,  # decomposed with these tile dims. Defaults to
    coord_grid_shape=None,  # active_ids/tiles_dim/grid_shape; sharded
    #   callers pass GLOBAL ids/dims here (rows stay shard-local via
    #   active_ids) so per-shard results match single-device bit-for-bit.
):
    """(T+1, 512) rows of (phi, tid, cpx, cpy, cpz) for all active tiles.

    Rows not written by any step (inactive tiles) contain GARBAGE — callers
    select them against an active-row mask (see pipeline._exact_core).
    """
    nti, ntj, ntk = tiles_dim
    T = nti * ntj * ntk
    if coord_ids is None:
        coord_ids = active_ids
    if coord_tiles_dim is None:
        coord_tiles_dim = tiles_dim
    if coord_grid_shape is None:
        coord_grid_shape = grid_shape
    _, cntj, cntk = coord_tiles_dim
    ni, nj, nk = coord_grid_shape
    A = int(active_ids.shape[0])
    M = tri_local.shape[0]

    # (M+1, 12) vertex table (sentinel row: all coords 3e18 -> degenerate,
    # d2 ~ 2.7e37, never wins), gathered to (P, 12) pair rows + id bits
    v12 = jnp.concatenate(
        [tri_local.reshape(M, 9), jnp.zeros((M, 3), jnp.float32)], axis=1)
    sent = jnp.full((1, 12), _SENT, jnp.float32)
    v12 = jnp.concatenate([v12, sent], axis=0)
    rows = jnp.take(v12, pair_cand, axis=0)  # (P, 12)
    # id bits biased by 0x40000000: raw small ids bitcast to DENORMAL floats,
    # which the VPU flushes to zero in min/compare — the bias maps every id
    # to a normal float in [2, 4), keeping bit order == id order
    idb = jax.lax.bitcast_convert_type(
        pair_cand | jnp.int32(0x40000000), jnp.float32)[:, None]
    # lane-pad to the full 128 tile: Mosaic only DMAs lane-aligned slices,
    # and XLA pads a (P, 16) array to (P, 128) physically anyway
    pair_tbl = jnp.concatenate(
        [rows[:, :9], idb, jnp.zeros((rows.shape[0], 118), jnp.float32)],
        axis=1)  # (P, 128)
    # slack so the fixed-size (kcap, 128) window DMA stays in bounds
    pair_tbl = jnp.pad(pair_tbl, ((0, kcap), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(A,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # dx
            pl.BlockSpec(memory_space=pl.ANY),    # pair table
        ],
        out_specs=tuple(
            pl.BlockSpec((1, 1, 512),
                         lambda a, ids, cids, off, cnt: (ids[a], 0, 0))
            for _ in range(5)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, kcap, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_shape = tuple(
        jax.ShapeDtypeStruct((T + 1, 1, 512), jnp.float32) for _ in range(5))
    phi, tidb, cpx, cpy, cpz = pl.pallas_call(
        partial(_band_kernel, kcap=kcap, ntj=cntj, ntk=cntk,
                dims_sum=ni + nj + nk),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(active_ids, coord_ids, tile_off, tile_cnt,
      jnp.asarray(dx, jnp.float32).reshape(1), pair_tbl)
    raw = jax.lax.bitcast_convert_type(tidb, jnp.int32)
    tid = jnp.where(raw >= 0, raw - jnp.int32(0x40000000), -1)
    return (phi.reshape(T + 1, 512), tid.reshape(T + 1, 512),
            cpx.reshape(T + 1, 512), cpy.reshape(T + 1, 512),
            cpz.reshape(T + 1, 512))
