#!/usr/bin/env python
"""Per-stage wall-clock breakdown of the single-device pipeline on the real
chip. Through the axon tunnel every separate dispatch costs a ~25 ms
synchronous round trip, so the production path runs as ONE jit
(pipeline._exact_core); here the stages are timed separately to attribute
device time.

Usage: python tools/profile_stages.py [Nx ...] [sphere] [e2e]   (default 256)
Optionally set PROFILE_TRACE=/tmp/trace to also capture a jax.profiler trace
of the steady-state end-to-end run.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

cache_dir = os.path.join(REPO, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def force_honest_timing():
    """The axon tunnel's block_until_ready is a no-op until the first
    device->host transfer, after which dispatch turns synchronous (~25 ms
    RTT per call) and wall-clock times become real. Trigger that mode up
    front so every number below is honest."""
    x = jnp.ones((8, 128), jnp.float32)
    y = jax.jit(lambda v: v + 1.0)(x)
    np.asarray(y)


from sdfgenfast_tpu.grid import sizing_mode2a_proportional
from sdfgenfast_tpu.mesh import box_mesh, icosphere
from sdfgenfast_tpu.ops import tiled as tiled_ops
from sdfgenfast_tpu.ops import vdt as vdt_ops
from sdfgenfast_tpu.pipeline import (
    SDFConfig, bin_mesh, make_level_set3, _unpack_parity_stage,
)


def timed(name, fn, *args, repeats=3, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"  {name:28s} {min(ts)*1e3:9.2f} ms", flush=True)
    return out


def profile_dense(mesh, grid, cfg):
    """Stage breakdown of the dense Pallas path (meshes <= dense_max_tris)."""
    from sdfgenfast_tpu.ops.dense import dense_distance_field
    from sdfgenfast_tpu.pipeline import _sign_apply_stage

    t0 = time.perf_counter()
    binned = bin_mesh(mesh, grid, cfg)
    print(f"  {'bin_mesh (host parity)':28s} {(time.perf_counter()-t0)*1e3:9.2f} ms")

    tri_verts = jnp.asarray(mesh.verts)[jnp.asarray(binned.tris)]
    origin = jnp.asarray(grid.origin, jnp.float32)
    dx = jnp.float32(grid.dx)

    parity = timed("unpack_parity", _unpack_parity_stage,
                   jnp.asarray(binned.parity_packed), grid.shape[0])
    phi, tid = timed("dense kernel", dense_distance_field,
                     tri_verts, origin, dx, grid_shape=grid.shape)
    timed("sign apply", _sign_apply_stage, phi, parity)
    run_e2e(mesh, grid, cfg, binned)


def run_e2e(mesh, grid, cfg, binned):
    trace_dir = os.environ.get("PROFILE_TRACE", "")
    full = make_level_set3(mesh, grid, cfg, binned=binned)  # compile
    full.block_until_ready()
    for r in range(3):
        t0 = time.perf_counter()
        full = make_level_set3(mesh, grid, cfg, binned=binned)
        full.block_until_ready()
        t = time.perf_counter() - t0
        print(f"  {'END-TO-END (warm)':28s} {t*1e3:9.2f} ms "
              f"-> {grid.num_cells/t/1e6:.0f}M vox/s", flush=True)
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            full = make_level_set3(mesh, grid, cfg, binned=binned)
            full.block_until_ready()
        print(f"  trace written to {trace_dir}")


def profile(nx, mesh_name="box", force_tiled=False):
    if mesh_name == "box":
        mesh = box_mesh((3, 4, 5), (-1, -1, -1))
    elif mesh_name == "torus":
        from sdfgenfast_tpu.mesh import torus_mesh
        mesh = torus_mesh()
    else:
        mesh = icosphere(6, radius=1.0)
    mn, mx = mesh.bounds()
    grid = sizing_mode2a_proportional(mn, mx, nx, 1)
    cfg = SDFConfig(dense_max_tris=0) if force_tiled else SDFConfig()
    print(f"== Nx={nx} ({mesh_name}, {mesh.num_tris} tris): grid={grid.shape}, "
          f"cells={grid.num_cells/1e6:.2f}M ==", flush=True)

    from sdfgenfast_tpu.pipeline import use_dense
    if use_dense(cfg, mesh.num_tris):
        return profile_dense(mesh, grid, cfg)

    t0 = time.perf_counter()
    binned = bin_mesh(mesh, grid, cfg)
    print(f"  {'bin_mesh (host)':28s} {(time.perf_counter()-t0)*1e3:9.2f} ms "
          f"(A={binned.band.num_active}, K={binned.band.max_candidates})",
          flush=True)

    tris = jnp.asarray(binned.tris)
    tri_verts = jnp.asarray(mesh.verts)[tris]
    origin = jnp.asarray(grid.origin, jnp.float32)
    dx = jnp.float32(grid.dx)
    ni, nj, nk = grid.shape
    upper = jnp.float32(ni + nj + nk) * dx

    bb = binned.band
    b_ids = jnp.asarray(bb.active_ids)
    b_cand = jnp.asarray(bb.cand)
    b_valid = jnp.asarray(bb.cand_valid)

    band = jax.jit(partial(
        tiled_ops.tile_candidate_rows,
        tile_shape=bb.tile_shape, tiles_dim=bb.tiles_dim,
        grid_shape=grid.shape, chunk=cfg.band_chunk,
    ))
    phi_rows, tid_rows = timed(
        "band rows (eval)", band, tri_verts, b_ids, b_cand, b_valid, origin, dx
    )

    table = tiled_ops.tri_affine_table(tri_verts - origin)
    cps = jax.jit(partial(
        tiled_ops.closest_point_rows,
        tile_shape=bb.tile_shape, tiles_dim=bb.tiles_dim, chunk=cfg.band_chunk,
    ))
    cp_rows = timed("closest-point rows", cps, table, b_ids, tid_rows, dx)

    scat = jax.jit(partial(
        tiled_ops.scatter_untile,
        tile_shape=bb.tile_shape, tiles_dim=bb.tiles_dim, grid_shape=grid.shape,
    ))
    phi0, tid0 = timed("scatter/untile", scat, phi_rows, tid_rows, b_ids, upper)
    cpx, cpy, cpz = (
        tiled_ops.scatter_rows(r, b_ids, vdt_ops.FAR, bb.tile_shape,
                               bb.tiles_dim, grid.shape)
        for r in cp_rows
    )

    extra = cfg.vdt_extra_rounds
    if extra is None:  # the pipeline's auto policy (pipeline.py)
        extra = 2 if max(grid.shape) <= 256 else 4
    strides = vdt_ops.stride_ladder(
        max(grid.shape), max_hop=cfg.vdt_max_hop, extra_rounds=extra,
    )
    vdt = jax.jit(partial(vdt_ops.vdt_far_field, strides=strides))
    print(f"    (VDT strides {strides})")
    phi, tid = timed("VDT far field", vdt, cpx, cpy, cpz, tid0, phi0, dx)

    cham = jax.jit(partial(vdt_ops.chamfer_relax, passes=cfg.chamfer_passes))
    phi = timed("chamfer relax", cham, phi, dx)

    parity = timed("unpack_parity", _unpack_parity_stage,
                   jnp.asarray(binned.parity_packed), ni)

    run_e2e(mesh, grid, cfg, binned)


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:] if a.isdigit()] or [256]
    mesh_name = ("torus" if "torus" in sys.argv
                 else "sphere" if "sphere" in sys.argv else "box")
    force_honest_timing()
    for nx in sizes:
        profile(nx, mesh_name, force_tiled="tiled" in sys.argv)
