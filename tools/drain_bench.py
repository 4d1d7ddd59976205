#!/usr/bin/env python
"""Verify axon-tunnel blocking semantics and measure TRUE device kernel time.

Fresh process: enqueue N kernel iterations with per-call block_until_ready
(suspected no-op pre-D2H), then drain with one tiny device->host transfer.
If block_until_ready were honest, the drain would be ~one RTT; if it is a
no-op, the drain contains the N kernel executions -> drain/N = true kernel
time.
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
from sdfgenfast_tpu.pipeline import SDFConfig, bin_mesh

N = int(os.environ.get("N", "16"))


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    mesh = box_mesh((3, 4, 5), (-1, -1, -1))
    mn, mx = mesh.bounds()
    grid = sizing_mode2a_proportional(mn, mx, nx, 1)
    binned = bin_mesh(mesh, grid, SDFConfig())
    tv = jnp.asarray(mesh.verts)[jnp.asarray(binned.tris)]
    origin = jnp.asarray(grid.origin, jnp.float32)
    dx = jnp.float32(grid.dx)
    run = lambda: dense_distance_field(tv, origin, dx, grid_shape=grid.shape)

    # compile (traces + compiles; no D2H)
    t0 = time.perf_counter()
    phi, tid = run()
    phi.block_until_ready()
    print(f"compile+first: {time.perf_counter()-t0:.2f}s")

    t0 = time.perf_counter()
    for _ in range(N):
        phi, tid = run()
        phi.block_until_ready()
    t_enq = time.perf_counter() - t0

    t0 = time.perf_counter()
    val = np.asarray(jax.jit(lambda p: p[0, 0, 0])(phi))
    t_drain = time.perf_counter() - t0
    print(f"enqueue {N} iters w/ block_until_ready: {t_enq*1e3:.1f} ms "
          f"({t_enq/N*1e3:.2f} ms/iter)")
    print(f"drain (tiny D2H): {t_drain*1e3:.1f} ms -> true kernel "
          f"~{t_drain/N*1e3:.2f} ms/iter upper bound (N enqueued iters "
          f"pending at most)")
    cells = grid.num_cells
    tot = t_enq + t_drain
    print(f"amortized incl. drain: {tot/(N+1)*1e3:.2f} ms/iter = "
          f"{cells*(N+1)/tot/1e6:.0f}M voxels/s  (cells={cells/1e6:.1f}M)")

    # now in sync mode: each call should cost RTT + kernel
    t0 = time.perf_counter()
    for _ in range(3):
        phi, tid = run()
        phi.block_until_ready()
    print(f"post-D2H sync-mode per-call: {(time.perf_counter()-t0)/3*1e3:.2f} ms")

    # RTT floor: trivial jit call in sync mode
    f = jax.jit(lambda x: x + 1.0)
    y = f(jnp.float32(1.0)); y.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        y = f(y); y.block_until_ready()
    print(f"sync-mode RTT floor (tiny jit): {(time.perf_counter()-t0)/5*1e3:.2f} ms")
    print("val", val)


if __name__ == "__main__":
    main()
