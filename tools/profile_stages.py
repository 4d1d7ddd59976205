#!/usr/bin/env python
"""Per-stage wall-clock breakdown of the single-device pipeline on the real
chip: runs each jitted stage of sdf_from_tri_verts separately with
block_until_ready between, at the benchmark's grid sizes.

Usage: python tools/profile_stages.py [Nx ...]   (default 256)
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

cache_dir = os.path.join(REPO, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as _jnp


def force_honest_timing():
    """The axon tunnel's block_until_ready is a no-op until the first
    device->host transfer, after which dispatch turns synchronous (~24 ms
    RTT per call) and wall-clock times become real. Trigger that mode up
    front so every number below is honest."""
    x = _jnp.ones((8, 128), _jnp.float32)
    y = jax.jit(lambda v: v + 1.0)(x)
    np.asarray(y)


from sdfgenfast_tpu.grid import sizing_mode2a_proportional
from sdfgenfast_tpu.mesh import box_mesh, icosphere
from sdfgenfast_tpu.ops import band as band_ops
from sdfgenfast_tpu.pipeline import (
    SDFConfig, bin_mesh, make_level_set3,
    _jfa_stage, _merge_stage, _refine_stage, _recompute_stage,
    _unpack_parity_stage,
)


def timed(name, fn, *args, repeats=3, **kw):
    out = fn(*args, **kw)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out
    )
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
            out,
        )
        ts.append(time.perf_counter() - t0)
    print(f"  {name:28s} {min(ts)*1e3:9.2f} ms")
    return out


def profile_dense(mesh, grid, cfg):
    """Stage breakdown of the dense Pallas path (meshes <= dense_max_tris)."""
    from sdfgenfast_tpu.ops import sign_host as sign_host_ops
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

    trace_dir = os.environ.get("PROFILE_TRACE", "")
    t0 = time.perf_counter()
    full = make_level_set3(mesh, grid, cfg, binned=binned)
    full.block_until_ready()
    print(f"  {'END-TO-END (warm)':28s} {(time.perf_counter()-t0)*1e3:9.2f} ms")
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            full = make_level_set3(mesh, grid, cfg, binned=binned)
            full.block_until_ready()
        print(f"  trace written to {trace_dir}")


def profile(nx, mesh_name="box", force_tiled=False):
    if mesh_name == "box":
        mesh = box_mesh((3, 4, 5), (-1, -1, -1))
    else:
        mesh = icosphere(6, radius=1.0)
    mn, mx = mesh.bounds()
    grid = sizing_mode2a_proportional(mn, mx, nx, 1)
    cfg = SDFConfig(dense_max_tris=0) if force_tiled else SDFConfig()
    print(f"== Nx={nx} ({mesh_name}, {mesh.num_tris} tris): grid={grid.shape}, "
          f"cells={grid.num_cells/1e6:.2f}M ==")

    from sdfgenfast_tpu.pipeline import use_dense
    if use_dense(cfg, mesh.num_tris):
        return profile_dense(mesh, grid, cfg)

    t0 = time.perf_counter()
    binned = bin_mesh(mesh, grid, cfg)
    print(f"  {'bin_mesh (host)':28s} {(time.perf_counter()-t0)*1e3:9.2f} ms "
          f"(A={binned.band.num_active}, K={binned.band.max_candidates})")

    tris = jnp.asarray(binned.tris)
    tri_verts = jnp.asarray(mesh.verts)[tris]
    origin = jnp.asarray(grid.origin, jnp.float32)
    dx = jnp.float32(grid.dx)
    ni, nj, nk = grid.shape
    upper = jnp.float32(ni + nj + nk) * dx

    b_ids = jnp.asarray(binned.band.active_ids)
    b_cand = jnp.asarray(binned.band.cand)
    b_valid = jnp.asarray(binned.band.cand_valid)

    phi0, tid0 = timed(
        "band_distance_field", band_ops.band_distance_field,
        tri_verts, b_ids, b_cand, b_valid, origin, dx,
        tile_shape=binned.band.tile_shape, tiles_dim=binned.band.tiles_dim,
        grid_shape=grid.shape, chunk=cfg.band_chunk,
    )

    parity = timed(
        "unpack_parity", _unpack_parity_stage,
        jnp.asarray(binned.parity_packed), ni,
    )

    r = tuple(t // j for t, j in zip(cfg.tile_shape, cfg.jfa_tile_shape))
    jfa_tiles_dim = tuple(n * rr for n, rr in zip(binned.band.tiles_dim, r))
    cands = timed(
        "jfa_stage (seed+jfa+cands)", _jfa_stage,
        tri_verts, b_ids, b_cand, b_valid, origin, dx,
        jfa_tiles_dim=jfa_tiles_dim, jfa_tile_shape=cfg.jfa_tile_shape,
        band_tile_shape=cfg.tile_shape, band_tiles_dim=binned.band.tiles_dim,
    )
    T = cands.shape[0]
    print(f"    (JFA tiles T={T}, cand width={cands.shape[1]})")

    phi_far, tid_far = timed(
        "far-field eval (56 cand)", band_ops.band_distance_field,
        tri_verts, jnp.arange(T, dtype=jnp.int32), jnp.maximum(cands, 0),
        cands >= 0, origin, dx,
        tile_shape=cfg.jfa_tile_shape, tiles_dim=jfa_tiles_dim,
        grid_shape=grid.shape, chunk=cfg.band_chunk,
    )

    phi, tid = timed("merge", _merge_stage, phi_far, tid_far, phi0, tid0)
    phi, tid = timed(
        "refine_stage", _refine_stage, phi, tid, tri_verts, origin, dx,
        max_passes=cfg.max_passes,
    )
    out = timed(
        "recompute (diff stage)", _recompute_stage,
        tri_verts, tid, parity, origin, dx, upper,
    )

    trace_dir = os.environ.get("PROFILE_TRACE", "")
    t0 = time.perf_counter()
    full = make_level_set3(mesh, grid, cfg, binned=binned)
    full.block_until_ready()
    print(f"  {'END-TO-END (warm)':28s} {(time.perf_counter()-t0)*1e3:9.2f} ms")
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            full = make_level_set3(mesh, grid, cfg, binned=binned)
            full.block_until_ready()
        print(f"  trace written to {trace_dir}")


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:] if a.isdigit()] or [256]
    mesh_name = "sphere" if "sphere" in sys.argv else "box"
    force_honest_timing()
    for nx in sizes:
        profile(nx, mesh_name, force_tiled="tiled" in sys.argv)
