"""Cell-level vector distance transform (closest-point jump flooding).

The far-field completion that finally matches the reference's accuracy
profile everywhere. The reference propagates closest-triangle IDS cell to
cell and re-evaluates distances exactly at each adoption
(``cpu_lib/makelevelset3.cpp:243-292``); on TPU, re-evaluating a neighbor's
id means an HBM gather per cell — measured at ~1e8 gathered elements/s,
hopeless at grid scale.

Propagating the closest POINT instead (Danielsson's vector distance
transform, with jump-flooding strides) keeps the exactness where it
matters and needs NO gathers at all:

  - every propagated cp is an exact point ON some triangle of the mesh, so
    |p - cp| is always >= the true distance (never an underestimate);
  - a cell one hop from its donor sees the donor's cp misaligned from its
    own ideal foot point by O(dx), giving |p - cp| - true = O(dx^2 / d) —
    the error SHRINKS with depth, exactly where tile-granular methods
    degrade (measured: the 82k-tri sphere at depth 40-70dx had 0.35dx
    tile-JFA error vs <=0.1dx for the VDT);
  - a candidate evaluation is 8 elementwise ops on shifted fields.

Rounds run a jump-flooding stride ladder (max_dim/2, .., 1, + extra
polish rounds), each round JACOBI (all 26 strided candidates evaluated
against round-start state) so results are order-independent. For sharded
runs the ladder is CAPPED at `max_hop` <= the shard block (capped strides
repeat until coverage is restored), so every round needs only a
max_hop-deep halo slab on the sharded axes — and Jacobi semantics with
round-start halos make sharded blocks bit-identical to a single-device run
of the same (capped) ladder.

Shifts fill with FAR (never wrap — wrapped donors are masked), so donor
reachability is identical in both settings. The winning triangle id rides
along for the differentiable recompute (d(p, tri(tid)) <= |p - cp| since
cp lies on that triangle, so the recompute only tightens the field).

Seeds come from the narrow band's exact closest points (``ops/tiled``
emits them from the same affine forms as the distances, matching
``cpu_lib/makelevelset3.cpp:49-70``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "FAR",
    "coarse_init",
    "stride_ladder",
    "vdt_far_field",
    "chamfer_relax",
]

_OFFSETS26 = np.array(
    [
        (a, b, c)
        for a in (-1, 0, 1)
        for b in (-1, 0, 1)
        for c in (-1, 0, 1)
        if (a, b, c) != (0, 0, 0)
    ],
    np.int32,
)

# plain float: a module-level jnp constant would initialise the XLA
# backend at import time and break jax.distributed workers
FAR = np.float32(3e18)


def _dist2(px, py, pz, cx, cy, cz):
    dxp = px - cx
    dyp = py - cy
    dzp = pz - cz
    return dxp * dxp + dyp * dyp + dzp * dzp


def _pos_axes(shape, dx, offsets=None):
    """Grid-local world coords per axis; `offsets` shifts to global indices."""
    if offsets is None:
        offsets = (0, 0, 0)
    ni, nj, nk = shape
    px = ((jnp.arange(ni, dtype=jnp.int32) + offsets[0]).astype(jnp.float32) * dx)
    py = ((jnp.arange(nj, dtype=jnp.int32) + offsets[1]).astype(jnp.float32) * dx)
    pz = ((jnp.arange(nk, dtype=jnp.int32) + offsets[2]).astype(jnp.float32) * dx)
    return px[:, None, None], py[None, :, None], pz[None, None, :]


def _gs_round(state, px, py, pz, stride):
    """One Gauss-Seidel jump-flood round: candidates come from the RUNNING
    state (adopted values re-donate within the round), which converges
    noticeably faster than Jacobi — measured 0.085dx vs 0.19dx residual on
    the 82k-sphere golden at the same ladder.

    Implemented as a fori_loop whose body pads the CARRY and reads the
    candidate with one dynamic slice. A python-unrolled chain of 26 static
    shifts MISCOMPILES on the TPU backend when jitted (jit and eager
    disagreed by 8dx on identical inputs; judge-style repro in
    tests/test_vdt.py::test_jit_matches_eager) — the loop form compiles
    correctly and was verified jit==eager on the real chip."""
    ni, nj, nk = state.shape[:3]
    s = stride
    offs = jnp.asarray(_OFFSETS26)

    def body(m, best):
        o = offs[m] * stride
        ext = jnp.pad(
            best, ((s, s), (s, s), (s, s), (0, 0)), constant_values=FAR
        )
        cand = jax.lax.dynamic_slice(
            ext, (s + o[0], s + o[1], s + o[2], 0), (ni, nj, nk, best.shape[-1])
        )
        cd2 = _dist2(px, py, pz, cand[..., 0], cand[..., 1], cand[..., 2])
        better = cd2 < best[..., 4]
        best = jnp.where(better[..., None], cand, best)
        return best.at[..., 4].set(jnp.where(better, cd2, best[..., 4]))

    return jax.lax.fori_loop(0, offs.shape[0], body, state)


def _jacobi_round_padded(state, px, py, pz, stride, offs):
    """Jacobi round via ONE pad + 26 dynamic slices of the round-start
    state. A traced-shift `jnp.roll` lowers to two dynamic slices + concat
    PER AXIS (~6 grid copies per offset, measured ~150 ms/round at the
    256-class grid); the padded form reads each candidate with a single
    slice. Memory: (n+2s)^3 transient — use only for small strides."""
    ni, nj, nk = state.shape[:3]
    s = stride
    ext = jnp.pad(
        state,
        ((s, s), (s, s), (s, s), (0, 0)),
        constant_values=FAR,
    )

    def body(m, best):
        o = offs[m] * stride
        cand = jax.lax.dynamic_slice(
            ext, (s + o[0], s + o[1], s + o[2], 0), (ni, nj, nk, state.shape[-1])
        )
        cd2 = _dist2(px, py, pz, cand[..., 0], cand[..., 1], cand[..., 2])
        better = cd2 < best[..., 4]
        best = jnp.where(better[..., None], cand, best)
        return best.at[..., 4].set(jnp.where(better, cd2, best[..., 4]))

    return jax.lax.fori_loop(0, offs.shape[0], body, state)


def coarse_init(state, dx, cs: int):
    """Initialize the far field from a coarse-lattice VDT.

    Takes the per-(cs-block) best seed (min d2 cell of each block), runs the
    full jump-flood ladder on the (n/cs)^3 lattice (cheap), and gives every
    cell the better of its own seed and its coarse node's closest point.
    After this, fine strides <= cs complete the field — the large-stride
    rounds (the expensive ones at full grid size) are never needed.
    """
    ni, nj, nk = state.shape[:3]
    p1, p2, p3 = (-ni) % cs, (-nj) % cs, (-nk) % cs
    ext = jnp.pad(
        state, ((0, p1), (0, p2), (0, p3), (0, 0)), constant_values=FAR
    )
    T1, T2, T3 = ext.shape[0] // cs, ext.shape[1] // cs, ext.shape[2] // cs

    blk = (
        ext.reshape(T1, cs, T2, cs, T3, cs, 5)
        .transpose(0, 2, 4, 1, 3, 5, 6)
        .reshape(T1, T2, T3, cs * cs * cs, 5)
    )
    # block representative: the cell with min d2 (first-wins on ties)
    d2b = blk[..., 4]
    dmin = jnp.min(d2b, axis=-1)
    ismin = d2b <= dmin[..., None]
    first = ismin & (jnp.cumsum(ismin.astype(jnp.int32), axis=-1) == 1)
    coarse = jnp.sum(blk * first[..., None].astype(jnp.float32), axis=-2)

    # coarse node positions: its block's corner cell — consistent with the
    # d2 channel being re-evaluated below at those positions
    cpx = ((jnp.arange(T1, dtype=jnp.float32) * cs) * dx)[:, None, None]
    cpy = ((jnp.arange(T2, dtype=jnp.float32) * cs) * dx)[None, :, None]
    cpz = ((jnp.arange(T3, dtype=jnp.float32) * cs) * dx)[None, None, :]
    cd2 = _dist2(cpx, cpy, cpz, coarse[..., 0], coarse[..., 1], coarse[..., 2])
    coarse = coarse.at[..., 4].set(cd2)

    for s in stride_ladder(max(T1, T2, T3), extra_rounds=1):
        coarse = _gs_round(coarse, cpx, cpy, cpz, s)

    # upsample: every cell adopts its coarse node's cp if better
    up = jnp.repeat(
        jnp.repeat(jnp.repeat(coarse, cs, axis=0), cs, axis=1), cs, axis=2
    )[:ni, :nj, :nk]
    px, py, pz = _pos_axes((ni, nj, nk), dx)
    ud2 = _dist2(px, py, pz, up[..., 0], up[..., 1], up[..., 2])
    better = ud2 < state[..., 4]
    out = jnp.where(better[..., None], up, state)
    return out.at[..., 4].set(jnp.where(better, ud2, out[..., 4]))


def _halo_round(state, px, py, pz, stride, offs, halo_extend):
    """Jacobi round for sharded blocks: j/k candidates come from the
    (stride-deep, corner-complete) extended round-start state; the
    (unsharded) i axis uses roll + range masking like the local round."""
    ni, nj, nk = state.shape[:3]
    ext = halo_extend(state, stride)  # (ni, nj + 2s, nk + 2s, 5)
    ii = jax.lax.broadcasted_iota(jnp.int32, (ni, 1, 1), 0)

    def body(m, best):
        o = offs[m] * stride
        cand = jax.lax.dynamic_slice(
            ext, (0, stride + o[1], stride + o[2], 0), (ni, nj, nk, 5)
        )
        cand = jnp.roll(cand, -o[0], axis=0)
        in_range = (ii + o[0] >= 0) & (ii + o[0] < ni)
        cd2 = _dist2(px, py, pz, cand[..., 0], cand[..., 1], cand[..., 2])
        cd2 = jnp.where(in_range, cd2, jnp.float32(jnp.inf))
        better = cd2 < best[..., 4]
        best = jnp.where(better[..., None], cand, best)
        return best.at[..., 4].set(jnp.where(better, cd2, best[..., 4]))

    return jax.lax.fori_loop(0, offs.shape[0], body, state)


def stride_ladder(max_dim: int, max_hop=None, extra_rounds: int = 2):
    """The jump-flood stride schedule.

    Full ladder: max_dim/2, /4, .., 1 (+ extra stride-1 polish). With a
    `max_hop` cap (sharded: cap <= shard block so one halo slab suffices),
    the capped stride repeats until the same total reach is covered."""
    s = 1
    while s * 2 < max_dim:
        s *= 2
    strides = []
    while s >= 1:
        strides.append(s)
        s //= 2
    if max_hop is not None and strides and strides[0] > max_hop:
        capped = [x for x in strides if x <= max_hop]
        reach_missing = sum(x for x in strides if x > max_hop)
        repeats = -(-reach_missing // max_hop)
        strides = [max_hop] * repeats + capped
    return tuple(strides + [1] * extra_rounds)


def vdt_far_field(
    cpx, cpy, cpz,  # (ni, nj, nk) f32 seed closest points (grid-local), FAR empty
    tid,  # (ni, nj, nk) int32 seed ids, -1 empty
    phi_seed,  # (ni, nj, nk) f32 band evaluator distances (upper if unseeded)
    dx,
    strides,
    freeze_mask=None,  # bool: cells whose phi_seed is provably EXACT
    ijk_offset=None,  # (3,) python ints: global index of local cell (0,0,0)
    halo_extend=None,  # sharded: halo_extend(state, s) -> j/k s-extended state
    jacobi=False,  # True: pure Jacobi rounds (sharded bit-equality); False:
    #              Gauss-Seidel stride-1 polish rounds (faster convergence)
    coarse_stride=None,  # run coarse_init first (fast-path experiment);
    #              strides should then start at <= coarse_stride
):
    """Closest-point jump flooding over the cell grid.

    Returns (phi, tid). Cells in `freeze_mask` are FROZEN to their exact
    evaluator distances and ids — the binning guarantees exactness for
    cells whose band value is <= seed_band*dx, and a reconstructed cp can
    sit ~1e-5 off the surface (affine rounding at region boundaries), so a
    donated |p - cp_donor| could undercut the exact value at ulp scale.
    Cells OUTSIDE the mask may hold non-minimal band upper bounds (an
    active tile evaluates all of its cells against its candidate list,
    exact only within the true band) and must stay refinable.
    Elsewhere phi = |p - cp| of the converged closest points, an
    O(dx^2/d) overestimate.
    """
    ni, nj, nk = cpx.shape
    px, py, pz = _pos_axes((ni, nj, nk), dx, ijk_offset)
    d2 = _dist2(px, py, pz, cpx, cpy, cpz)
    state = jnp.stack([cpx, cpy, cpz, tid.astype(jnp.float32), d2], axis=-1)

    if coarse_stride is not None and halo_extend is None:
        state = coarse_init(state, dx, coarse_stride)

    offs = jnp.asarray(_OFFSETS26)
    for stride in strides:
        if halo_extend is not None:
            state = _halo_round(state, px, py, pz, stride, offs, halo_extend)
        elif not jacobi and stride == 1:
            state = _gs_round(state, px, py, pz, stride)
        else:
            state = _jacobi_round_padded(state, px, py, pz, stride, offs)

    phi = jnp.sqrt(jnp.maximum(state[..., 4], 0.0))
    out_tid = state[..., 3].astype(jnp.int32)
    if freeze_mask is None:
        freeze_mask = tid >= 0
    return (
        jnp.where(freeze_mask, phi_seed, jnp.minimum(phi, phi_seed)),
        jnp.where(freeze_mask, tid, out_tid),
    )


def chamfer_relax(phi, dx, passes: int = 2):
    """Lipschitz relaxation of an everywhere->=true unsigned distance field.

    phi_new(p) = min(phi(p), min_o phi(p+o) + |o|*dx) over the 26-offset
    stencil. Every value in `phi` is the distance to some ACTUAL surface
    point, hence >= the true distance; the triangle inequality gives
    phi(q) + |p-q| >= true(q) + |p-q| >= true(p), so the relaxation is
    monotone non-increasing AND never drops below the true distance —
    exact cells stay exact. It tightens the rare residual overestimates of
    the VDT at negligible cost (26 shifted min-adds per pass).
    """
    ni, nj, nk = phi.shape
    offs = jnp.asarray(_OFFSETS26, jnp.int32)
    step = jnp.sqrt(
        jnp.sum(jnp.asarray(_OFFSETS26, jnp.float32) ** 2, axis=-1)
    ) * dx
    big = jnp.float32(3e38)

    def one_pass(phi):
        ext = jnp.pad(phi, 1, constant_values=big)

        def body(k, acc):
            o = offs[k]
            nb = jax.lax.dynamic_slice(
                ext, (1 + o[0], 1 + o[1], 1 + o[2]), (ni, nj, nk)
            )
            return jnp.minimum(acc, nb + step[k])

        return jax.lax.fori_loop(0, 26, body, phi)

    for _ in range(passes):
        phi = one_pass(phi)
    return phi
