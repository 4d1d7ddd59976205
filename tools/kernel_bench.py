#!/usr/bin/env python
"""Microbench: amortized device time of individual pipeline stages.

Enqueues REPS iterations back-to-back and blocks once, so dispatch/tunnel
latency overlaps and the per-iteration time approaches the true device time.

Usage: python tools/kernel_bench.py [Nx ...]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from sdfgenfast_tpu.grid import sizing_mode2a_proportional
from sdfgenfast_tpu.mesh import box_mesh
from sdfgenfast_tpu.ops.dense import dense_distance_field
from sdfgenfast_tpu.pipeline import (
    SDFConfig, bin_mesh, _sign_apply_packed_stage,
)

REPS = 20


def amortized(name, fn, *args, reps=REPS):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"  {name:32s} {dt*1e3:9.3f} ms/iter")
    return out, dt


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [64, 128, 256]
    mesh = box_mesh((3, 4, 5), (-1, -1, -1))
    mn, mx = mesh.bounds()
    for nx in sizes:
        grid = sizing_mode2a_proportional(mn, mx, nx, 1)
        cfg = SDFConfig()
        binned = bin_mesh(mesh, grid, cfg)
        tv = jnp.asarray(mesh.verts)[jnp.asarray(binned.tris)]
        origin = jnp.asarray(grid.origin, jnp.float32)
        dx = jnp.float32(grid.dx)
        packed = jnp.asarray(binned.parity_packed)
        print(f"== Nx={nx}: grid={grid.shape} cells={grid.num_cells/1e6:.2f}M ==")

        (phi, tid), t_k = amortized(
            "dense kernel", lambda: dense_distance_field(
                tv, origin, dx, grid_shape=grid.shape)
        )
        _, t_s = amortized(
            "fused unpack+sign", lambda: _sign_apply_packed_stage(
                phi, packed, grid.shape[0])
        )
        v = grid.num_cells / (t_k + t_s)
        print(f"  -> kernel+sign amortized: {v/1e6:.1f}M voxels/s")


if __name__ == "__main__":
    main()
