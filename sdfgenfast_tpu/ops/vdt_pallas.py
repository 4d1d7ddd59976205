"""Pallas TPU kernels for 26-offset Jacobi VDT rounds.

The jnp reference round (``ops/vdt._jacobi_round``) pads the full (5, ni, nj,
nk) state and re-reads it once per offset: ~26 full passes over HBM per round
— measured ~150 ms per full-resolution round at 256-class grids, the single
largest cost of the pyramid schedule. This kernel streams each (i, j) block
(plus halos) into VMEM ONCE and evaluates all 26 candidates from registers:
per-round HBM traffic drops to ~(2-6)x the state size (halo overlap) + 1x
write — a large reduction, and the candidate math runs from VMEM.

Bit-equality with the jnp round (asserted by tests/test_vdt_pallas.py on the
real chip): candidate visit order, the `_dist2` operation order, and the
strict `<` merge are identical; out-of-bounds candidates are masked to +inf
here where the jnp round reads FAR-padded cells (squared distance ~2.7e37) —
both strictly lose every comparison, so adopted values agree bitwise.

Mosaic constraint shaping (probed on the chip):
  * DMA source slices on the SUBLANE dim (dim 2, j) need offsets provably
    divisible by 8 — affine-in-program-id or `pl.multiple_of` values pass.
    The j halo is therefore a fixed 8 (>= any supported stride) and all j
    strip sources are 8-aligned; edge strips clamp to in-bounds rows that
    the global-validity mask then invalidates (exactly where the jnp round
    reads FAR pads).
  * The i dim (dim 1) is untiled: fully dynamic clamped offsets are legal
    for both DMA sources and VMEM destinations. The scratch holds BI+4s
    rows with the FIXED mapping scratch row x <-> global i0-2s+x; the
    clamped window lands at a dynamic destination offset so every in-kernel
    read is a STATIC slice. Scratch rows the window does not cover map to
    out-of-grid globals, which the validity mask excludes.
  * Static unaligned sublane slices of VMEM vector loads are legal, so
    in-kernel candidate reads use static offsets.
  * DMA destination lane offsets must be 128-aligned, so the scratch holds
    exactly nk lanes (no k halo): k-offset candidates are produced by an
    in-register lane rotate (pltpu.roll) whose wrapped lanes the validity
    mask invalidates. The state needs no halo storage in HBM.

Grid-shape contract: the kernel requires ni % BI == 0 and nj % BJ == 0 (a
ragged last i block would misalign DMA'd rows against out rows).
``pallas_round_phase`` pads once with FAR cells around a whole sequence of
rounds (FAR donors lose every comparison, so the crop is exact) — padding
per round would cost a full-state copy each time.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .vdt import FAR, _OFFSETS26, _dist2

__all__ = ["pallas_jacobi_round", "pallas_round_phase", "supports_pallas_round"]

_INF = np.float32(np.inf)
_HJ = 8   # j halo width: the sublane tile (alignment unit) >= max stride
_BI = 16
_BJ = 16
_MAX_STRIDE = 8


def supports_pallas_round(shape, max_stride: int) -> bool:
    _, ni, nj, nk = (0, *shape) if len(shape) == 3 else shape
    return (
        max_stride <= _MAX_STRIDE
        and ni >= _BI + 2 * max_stride
        and nj >= _BJ + 2 * _HJ
        and nk >= 32  # lane-padding a very shallow k wastes >4x the work
    )


def _round_kernel(dx_ref, off_ref, state_ref, out_ref, scratch, sems, *,
                  stride, ni, nj, nk, scale, vni, vnj, vnk):
    # ni/nj/nk: the ARRAY dims (block-padded); vni/vnj/vnk: the VALID cell
    # domain. Donors at or beyond the valid bounds are masked to +inf — the
    # jnp Jacobi round reads fresh FAR pads there every round, so without
    # this split a multi-round phase would let pad cells adopt interior
    # values in round k and re-donate them in round k+1 (measured 0.0015
    # divergence from the pure Jacobi composition at 128-class grids).
    s = stride
    BI, BJ = _BI, _BJ
    WI = BI + 2 * s
    bi = pl.program_id(0)
    bj = pl.program_id(1)
    nbj = pl.num_programs(1)
    last = (bi == pl.num_programs(0) - 1) & (bj == nbj - 1)
    dxf = dx_ref[0]

    def window_copies(slot, bi_, bj_):
        """Copy descriptors for the (bi_, bj_) block's window into
        scratch[slot]: one clamped i window (untiled dim: dynamic offsets
        legal; scratch row x holds global i0 - 2s + x) x three
        provably-8-aligned j strips."""
        i0_ = bi_ * BI
        j0_ = bj_ * BJ
        si_ = jnp.clip(i0_ - s, 0, ni - WI)
        dst_i = si_ - i0_ + 2 * s
        strips_j = (  # (dst offset, length, src start)
            (0, _HJ, pl.multiple_of(jnp.clip(j0_ - _HJ, 0, nj - _HJ), 8)),
            (_HJ, BJ, j0_),
            (_HJ + BJ, _HJ,
             pl.multiple_of(jnp.clip(j0_ + BJ, 0, nj - _HJ), 8)),
        )
        return [
            pltpu.make_async_copy(
                state_ref.at[:, pl.ds(si_, WI), pl.ds(sj_, lj), :],
                scratch.at[slot, :, pl.ds(dst_i, WI), pl.ds(dj_, lj), :],
                sems.at[slot, b],
            )
            for b, (dj_, lj, sj_) in enumerate(strips_j)
        ]

    def start_window(slot, bi_, bj_):
        for c in window_copies(slot, bi_, bj_):
            c.start()

    # double-buffered window pipeline: prefetch the NEXT block's window
    # while computing this one (the serialized form left the VPU idle for
    # the full DMA on every block — ~40% of round time at 512-class)
    g = bi * nbj + bj
    slot = jax.lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        start_window(0, 0, 0)

    @pl.when(~last)  # no unwaited DMA may remain after the final step
    def _():
        nbi_ = bj + 1 < nbj
        start_window(1 - slot,
                     jnp.where(nbi_, bi, bi + 1),
                     jnp.where(nbi_, bj + 1, 0))

    i0 = bi * BI
    j0 = bj * BJ
    # cell world positions (pyramid level `scale`): f32(index * scale) * dx.
    # off_ref shifts ARRAY-local indices to GLOBAL level indices for the
    # position math only (sharded halo-extended blocks; zeros single-device)
    # — the validity mask below stays array-local, since the extended block
    # IS the donor domain there (matching vdt._halo_round).
    gi = i0 + jax.lax.broadcasted_iota(jnp.int32, (BI, 1, 1), 0)
    gj = j0 + jax.lax.broadcasted_iota(jnp.int32, (1, BJ, 1), 1)
    gk = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nk), 2)
    px = ((gi + off_ref[0]) * scale).astype(jnp.float32) * dxf
    py = ((gj + off_ref[1]) * scale).astype(jnp.float32) * dxf
    pz = ((gk + off_ref[2]) * scale).astype(jnp.float32) * dxf

    for c in window_copies(slot, bi, bj):
        c.wait()
    win = scratch.at[slot]

    best = win[:, 2 * s:2 * s + BI, _HJ:_HJ + BJ, :]

    for oi, oj, ok in _OFFSETS26.tolist():
        a = 2 * s + oi * s  # static: in [s, 3s]
        b = _HJ + oj * s
        cand = win[:, a:a + BI, b:b + BJ, :]
        if ok:
            # k-offset via lane rotate (shift must be non-negative; rotating
            # by nk - d rotates left by d); wrapped lanes are masked below
            cand = pltpu.roll(cand, (-ok * s) % nk, axis=3)
        cd2 = _dist2(px, py, pz, cand[0], cand[1], cand[2])
        # candidates beyond the grid don't exist: the jnp round reads FAR
        # pads there (cd2 ~ 2.7e37, never adopted); mask to +inf
        gci = gi + oi * s
        gcj = gj + oj * s
        gck = gk + ok * s
        valid = ((gci >= 0) & (gci < vni) & (gcj >= 0) & (gcj < vnj)
                 & (gck >= 0) & (gck < vnk))
        cd2 = jnp.where(valid, cd2, _INF)
        better = cd2 < best[4]
        upd = jnp.concatenate([cand[:4], cd2[None]], axis=0)
        best = jnp.where(better[None], upd, best)

    out_ref[:] = best


def _call_round(state, dx, stride: int, scale: int, interpret: bool,
                pos_off=None, valid_dims=None):
    """One round on a block-aligned state (ni % BI == 0, nj % BJ == 0).

    `valid_dims`: the unpadded cell domain (donors beyond it are +inf every
    round, like the jnp round's fresh FAR pads)."""
    _, ni, nj, nk = state.shape
    vni, vnj, vnk = valid_dims if valid_dims is not None else (ni, nj, nk)
    if pos_off is None:
        pos_off = jnp.zeros((3,), jnp.int32)
    return pl.pallas_call(
        partial(_round_kernel, stride=stride, ni=ni, nj=nj, nk=nk,
                scale=scale, vni=vni, vnj=vnj, vnk=vnk),
        grid=(ni // _BI, nj // _BJ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (5, _BI, _BJ, nk), lambda bi, bj: (0, bi, bj, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((5, ni, nj, nk), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 5, _BI + 4 * stride, _BJ + 2 * _HJ, nk),
                       jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            # the 26-way unrolled merge chain peaks above the 16 MB scoped
            # default (window + best + per-offset temps); the physical VMEM
            # budget on v5e+ is far larger
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(jnp.asarray(dx, jnp.float32).reshape(1), pos_off, state)


def pallas_round_phase(state, dx, strides, scale: int = 1,
                       interpret: bool = False, pos_offset=None):
    """Run a sequence of Jacobi rounds, padding to block multiples ONCE.

    Pad cells hold FAR closest points: as donors they lose every comparison
    (the validity mask also excludes them), and their own contents are
    cropped, so results equal the jnp rounds on the unpadded state bitwise.

    `pos_offset` (3,) int32 shifts array-local indices to global LEVEL
    indices for the position math (sharded halo-extended blocks); None
    means zeros (single-device).
    """
    from .vdt import _jacobi_round, _level_pos_axes

    _, ni, nj, nk = state.shape
    if not supports_pallas_round(state.shape, max(strides)):
        pos = _level_pos_axes((ni, nj, nk), dx, scale, offsets=pos_offset)
        offs = jnp.asarray(_OFFSETS26)
        for s in strides:
            state = _jacobi_round(state, *pos, s, offs)
        return state

    if pos_offset is not None:
        pos_offset = jnp.asarray(pos_offset, jnp.int32)
    ni_p = -(-ni // _BI) * _BI
    nj_p = -(-nj // _BJ) * _BJ
    nk_p = -(-nk // 128) * 128  # lane alignment (e.g. the torus' 75-deep k)
    padded = state
    if (ni_p, nj_p, nk_p) != (ni, nj, nk):
        padded = jnp.pad(
            state,
            ((0, 0), (0, ni_p - ni), (0, nj_p - nj), (0, nk_p - nk)),
            constant_values=FAR,
        )
    for s in strides:
        padded = _call_round(padded, dx, s, scale, interpret, pos_offset,
                             valid_dims=(ni, nj, nk))
    return padded[:, :ni, :nj, :nk]


def pallas_jacobi_round(state, dx, stride: int, scale: int = 1,
                        interpret: bool = False):
    """Single-round convenience wrapper over `pallas_round_phase`."""
    return pallas_round_phase(state, dx, (stride,), scale, interpret)


# ---------------------------------------------------------------------------
# Chamfer (min-plus Lipschitz relaxation) kernel
# ---------------------------------------------------------------------------

_CBI, _CBJ = 32, 16


def _chamfer_kernel(steps_ref, phi_ref, out_ref, scratch, sems, *,
                    passes, ni, nj, nk):
    """All `passes` 26-offset min-plus passes in ONE kernel: the window halo
    is `passes` deep, each in-kernel pass consumes one ring (cells within
    the remaining ring see their complete neighborhoods, so the core block
    equals the global pass sequence bitwise). Same scratch geometry as the
    VDT round kernel: scratch row x <-> global i0 - 2p + x."""
    p = passes
    BI, BJ = _CBI, _CBJ
    WI = BI + 2 * p       # DMA'd i rows
    VI = BI + 2 * p       # working window i size
    VJ = BJ + 2 * p
    bi = pl.program_id(0)
    bj = pl.program_id(1)
    big = jnp.float32(3e38)

    i0 = bi * BI
    j0 = bj * BJ
    si = jnp.clip(i0 - p, 0, ni - WI)
    dst_i = si - i0 + 2 * p  # in [p, 2p]
    strips_j = (
        (0, _HJ, pl.multiple_of(jnp.clip(j0 - _HJ, 0, nj - _HJ), 8)),
        (_HJ, BJ, j0),
        (_HJ + BJ, _HJ, pl.multiple_of(jnp.clip(j0 + BJ, 0, nj - _HJ), 8)),
    )
    copies = [
        pltpu.make_async_copy(
            phi_ref.at[pl.ds(si, WI), pl.ds(sj_, lj), :],
            scratch.at[pl.ds(dst_i, WI), pl.ds(dj_, lj), :],
            sems.at[b],
        )
        for b, (dj_, lj, sj_) in enumerate(strips_j)
    ]
    for c in copies:
        c.start()

    # globals of the working window (scratch rows [p, p+VI), j [_HJ-p, ..))
    gi = i0 - p + jax.lax.broadcasted_iota(jnp.int32, (VI, 1, 1), 0)
    gj = j0 - p + jax.lax.broadcasted_iota(jnp.int32, (1, VJ, 1), 1)
    for c in copies:
        c.wait()

    # mask window cells outside the grid to BIG (the jnp pass pads with
    # BIG) and write back, so per-offset REF slices see masked values.
    # Candidate slices read one row/col beyond the masked window at the
    # extreme offsets; those garbage reads only ever reach ring-r cells
    # whose pass-(r+1) values are discarded (halo = passes), exactly the
    # shrinking-validity argument of the VDT round kernel.
    inb = (gi >= 0) & (gi < ni) & (gj >= 0) & (gj < nj)
    w = jnp.where(inb, scratch[p:p + VI, _HJ - p:_HJ - p + VJ, :], big)
    scratch[p:p + VI, _HJ - p:_HJ - p + VJ, :] = w

    gk = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nk), 2)
    for step in range(passes):
        acc = w
        for m, (oi, oj, ok) in enumerate(_OFFSETS26.tolist()):
            cand = scratch[p + oi:p + oi + VI,
                           _HJ - p + oj:_HJ - p + oj + VJ, :]
            if ok:
                # k-shift via lane rotate; wrapped lanes masked below
                cand = pltpu.roll(cand, (-ok) % nk, axis=2)
                kv = (gk + ok >= 0) & (gk + ok < nk)
                cand = jnp.where(kv, cand, big)
            acc = jnp.minimum(acc, cand + steps_ref[m])
        w = acc
        if step + 1 < passes:
            scratch[p:p + VI, _HJ - p:_HJ - p + VJ, :] = w

    out_ref[:] = w[p:p + BI, p:p + BJ, :]


def pallas_chamfer(phi, dx, passes: int = 2, interpret: bool = False):
    """26-offset min-plus relaxation, `passes` passes fused in one kernel.

    Bit-equal to ops/vdt.chamfer_relax (same offset order, same min/add
    sequence); falls back to it for unsupported shapes.
    """
    from .vdt import chamfer_relax

    ni, nj, nk = phi.shape
    if (passes > 4 or ni < _CBI + 2 * passes or nj < _CBJ + 2 * _HJ
            or nk < 32):
        return chamfer_relax(phi, dx, passes=passes)
    nj_p = -(-nj // _CBJ) * _CBJ
    ni_p = -(-ni // _CBI) * _CBI
    nk_p = -(-nk // 128) * 128
    padded = phi
    if (ni_p, nj_p, nk_p) != (ni, nj, nk):
        padded = jnp.pad(
            phi, ((0, ni_p - ni), (0, nj_p - nj), (0, nk_p - nk)),
            constant_values=np.float32(3e38))
    steps = (np.sqrt((_OFFSETS26.astype(np.float64) ** 2).sum(-1))
             .astype(np.float32))
    steps = jnp.asarray(steps) * jnp.asarray(dx, jnp.float32)
    out = pl.pallas_call(
        partial(_chamfer_kernel, passes=passes, ni=ni_p, nj=nj_p, nk=nk_p),
        grid=(ni_p // _CBI, nj_p // _CBJ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (_CBI, _CBJ, nk_p), lambda bi, bj: (bi, bj, 0)),
        out_shape=jax.ShapeDtypeStruct((ni_p, nj_p, nk_p), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_CBI + 4 * passes, _CBJ + 2 * _HJ, nk_p),
                       jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(steps, padded)
    return out[:ni, :nj, :nk]
