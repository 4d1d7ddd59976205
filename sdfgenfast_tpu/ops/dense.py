"""Dense all-triangles distance field — a fused Pallas TPU kernel.

For meshes with few triangles (the reference's own headline benchmark mesh
has 36, ``tests/benchmark_performance.cpp:151``) the tile-JFA machinery is
pure overhead: evaluating EVERY cell against EVERY triangle is cheaper than
one JFA round, produces the mathematically exact unsigned distance field
everywhere (strictly stronger than the reference's propagated far field,
``cpu_lib/makelevelset3.cpp:243-292``), and compiles in seconds instead of
minutes because the program is one small kernel instead of an unrolled
26-offset x strides JFA cascade.

Kernel shape: the grid is flattened to (rows, 128) cell blocks; each program
owns ``SUBLANES`` rows (SUBLANES*128 cells) held in registers/VMEM, and runs
a fori_loop over triangles. Per iteration it broadcasts one triangle's 9
coordinates from SMEM (scalar memory — free broadcasts, no gathers, no lane
padding) against the whole cell block on the VPU. min+argmin stay in
registers; ties keep the lowest triangle id (strict ``<``), matching the
reference's first-wins tie-break (``cpu_lib/makelevelset3.cpp:215-218``).

The per-(cell, triangle) math is the shared ``point_triangle_distance_sq_soa``
— identical operation order to the band/JFA path and the reference's
``point_triangle_distance`` (``cpu_lib/makelevelset3.cpp:49-70``).
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

_SUBLANES = 32  # cells per program = _SUBLANES * 128 = 4096
_LANES = 128


def _dense_kernel(params_ref, off_ref, tri9_ref, d2_ref, tid_ref, *, grid_shape, m):
    ni, nj, nk = grid_shape
    base = pl.program_id(0) * (_SUBLANES * _LANES)
    row = jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, _LANES), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, _LANES), 1)
    idx = base + row * _LANES + col
    # padded tail cells compute junk at clamped coords; sliced off by caller
    idx = jnp.minimum(idx, ni * nj * nk - 1)
    ci = idx // (nj * nk) + off_ref[0, 0]
    rem = idx % (nj * nk)
    cj = rem // nk + off_ref[0, 1]
    ck = rem % nk + off_ref[0, 2]

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
        jnp.full((_SUBLANES, _LANES), jnp.inf, jnp.float32),
        jnp.full((_SUBLANES, _LANES), -1, jnp.int32),
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
    d2_ref[:] = best_d2
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

    n = ni * nj * nk
    block = _SUBLANES * _LANES
    nb = -(-n // block)

    d2, tid = pl.pallas_call(
        partial(_dense_kernel, grid_shape=grid_shape, m=m),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((_SUBLANES, _LANES), lambda b: (b, 0)),
            pl.BlockSpec((_SUBLANES, _LANES), lambda b: (b, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb * _SUBLANES, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((nb * _SUBLANES, _LANES), jnp.int32),
        ),
        interpret=interpret,
    )(params, offs, tri9)

    phi = jnp.sqrt(d2.reshape(-1)[:n]).reshape(grid_shape)
    return phi, tid.reshape(-1)[:n].reshape(grid_shape)
