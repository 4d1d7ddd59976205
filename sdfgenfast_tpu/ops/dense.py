"""Dense all-triangles distance field — a fused Pallas TPU kernel.

For meshes with few triangles (the reference's own headline benchmark mesh
has 36, ``tests/benchmark_performance.cpp:151``) the tile-JFA machinery is
pure overhead: evaluating EVERY cell against EVERY triangle is cheaper than
one JFA round, produces the mathematically exact unsigned distance field
everywhere (strictly stronger than the reference's propagated far field,
``cpu_lib/makelevelset3.cpp:243-292``), and compiles in seconds instead of
minutes because the program is one small kernel instead of an unrolled
26-offset x strides JFA cascade.

Kernel shape: the grid is laid out as (ni*nj, nk) — row r is the (i, j) =
(r // nj, r % nj) cell column, lanes are k. Each program owns ``_SUBLANES``
rows and runs a fori_loop over triangles, broadcasting one triangle's 9
coordinates from SMEM (scalar memory — free broadcasts, no gathers, no lane
padding) against the whole cell block on the VPU. min+argmin stay in
registers; ties keep the lowest triangle id (strict ``<``), matching the
reference's first-wins tie-break (``cpu_lib/makelevelset3.cpp:215-218``).
The final (ni*nj, nk) -> (ni, nj, nk) reshape splits the leading axis only,
so XLA emits no data movement for it.

The per-(cell, triangle) math is the shared ``point_triangle_distance_sq_soa``
— identical operation order to the band/JFA path and the reference's
``point_triangle_distance`` (``cpu_lib/makelevelset3.cpp:49-70``). All
per-triangle subexpressions (edge vectors, Gram terms) are scalar ops on the
SMEM values; only the point-dependent terms run as vector ops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .geometry import point_triangle_distance_sq_soa

__all__ = ["dense_distance_field", "DENSE_MAX_TRIS"]

# SMEM budget gate: (9, M) f32 triangle table must fit scalar memory with
# room to spare. 1024 tris = 36 KB. Above this the tiled band+JFA path wins
# anyway (dense cost scales as cells x tris).
DENSE_MAX_TRIS = 1024

_SUBLANES = 32  # grid rows (i*nj + j cell columns) per program


def _dense_kernel(params_ref, off_ref, tri9_ref, d_ref, tid_ref, *, nj, m):
    base = pl.program_id(0) * _SUBLANES
    sub = jax.lax.broadcasted_iota(jnp.int32, d_ref.shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, d_ref.shape, 1)
    r = base + sub
    ci = r // nj + off_ref[0, 0]
    cj = r - (r // nj) * nj + off_ref[0, 1]
    ck = lane + off_ref[0, 2]

    ox = params_ref[0, 0]
    oy = params_ref[0, 1]
    oz = params_ref[0, 2]
    dx = params_ref[0, 3]
    p = (
        ci.astype(jnp.float32) * dx + ox,
        cj.astype(jnp.float32) * dx + oy,
        ck.astype(jnp.float32) * dx + oz,
    )

    init = (
        jnp.full(d_ref.shape, jnp.inf, jnp.float32),
        jnp.full(d_ref.shape, -1, jnp.int32),
    )

    def body(t, carry):
        best_d2, best_t = carry
        a = (tri9_ref[0, t], tri9_ref[1, t], tri9_ref[2, t])
        b = (tri9_ref[3, t], tri9_ref[4, t], tri9_ref[5, t])
        c = (tri9_ref[6, t], tri9_ref[7, t], tri9_ref[8, t])
        d2 = point_triangle_distance_sq_soa(p, a, b, c)
        better = d2 < best_d2
        return jnp.where(better, d2, best_d2), jnp.where(better, t, best_t)

    best_d2, best_t = jax.lax.fori_loop(0, m, body, init)
    d_ref[:] = jnp.sqrt(best_d2)
    tid_ref[:] = best_t


def dense_distance_field(tri_verts, origin, dx, *, grid_shape, ijk_offset=None,
                         interpret=None):
    """Exact min distance + argmin triangle id for every grid cell.

    tri_verts: (M, 3, 3) f32; origin: (3,) f32; dx: f32 scalar. `ijk_offset`
    ((3,) int32) shifts local block indices to global ones for sharded
    evaluation (cell coords use GLOBAL indices, so per-shard results are
    bit-identical to a single-device run).
    Returns (phi, tid): (ni, nj, nk) f32 unsigned distances and int32 ids.
    """
    if interpret is None:
        # Mosaic targets real TPUs only; interpret everywhere else (tests
        # run on the forced-CPU backend). Resolved here, outside jit, so the
        # jit cache key reflects the actual mode.
        interpret = jax.default_backend() != "tpu"
    if ijk_offset is None:
        ijk_offset = jnp.zeros((3,), jnp.int32)
    return _dense_impl(tri_verts, origin, dx, ijk_offset,
                       grid_shape=grid_shape, interpret=interpret)


@partial(jax.jit, static_argnames=("grid_shape", "interpret"))
def _dense_impl(tri_verts, origin, dx, ijk_offset, *, grid_shape, interpret):
    ni, nj, nk = grid_shape
    m = int(tri_verts.shape[0])
    if m > DENSE_MAX_TRIS:
        raise ValueError(f"dense path capped at {DENSE_MAX_TRIS} triangles, got {m}")

    tri9 = tri_verts.reshape(m, 9).T  # (9, M) SoA for SMEM residence
    params = jnp.stack(
        [origin[0], origin[1], origin[2], jnp.float32(dx)]
    ).reshape(1, 4)
    offs = ijk_offset.astype(jnp.int32).reshape(1, 3)

    rows = ni * nj
    nb = -(-rows // _SUBLANES)
    rows_pad = nb * _SUBLANES

    d, tid = pl.pallas_call(
        partial(_dense_kernel, nj=nj, m=m),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((_SUBLANES, nk), lambda b: (b, 0)),
            pl.BlockSpec((_SUBLANES, nk), lambda b: (b, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows_pad, nk), jnp.float32),
            jax.ShapeDtypeStruct((rows_pad, nk), jnp.int32),
        ),
        interpret=interpret,
    )(params, offs, tri9)

    phi = d[:rows].reshape(grid_shape)
    return phi, tid[:rows].reshape(grid_shape)
