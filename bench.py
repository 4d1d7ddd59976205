#!/usr/bin/env python
"""Benchmark harness: voxels/sec/chip on the reference's headline workload.

Reproduces the reference benchmark's configuration
(tests/benchmark_performance.cpp:151,181-185): the bundled 3x4x5 box STL at
CLI mode-2a grids Nx in {64, 128, 256}, timing full SDF generation (host
binning + device compute, steady-state after compile).

Baseline anchor (BASELINE.md): 256-class grid on an RTX 4090 = 36.9M cells /
1.29 s ~= 28.6M voxels/s. vs_baseline = our voxels/s / 28.6e6.

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_VOXELS_PER_SEC = 36.9e6 / 1.29  # RTX 4090, README.md:260


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_config(mesh, grid, config, repeats=3):
    import jax
    from sdfgenfast_tpu.pipeline import bin_mesh, make_level_set3

    t0 = time.perf_counter()
    binned = bin_mesh(mesh, grid, config)
    t_bin = time.perf_counter() - t0

    # warmup / compile
    t0 = time.perf_counter()
    phi = make_level_set3(mesh, grid, config, binned=binned)
    phi.block_until_ready()
    t_compile = time.perf_counter() - t0

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        b = bin_mesh(mesh, grid, config)  # host preprocessing counts
        phi = make_level_set3(mesh, grid, config, binned=b)
        phi.block_until_ready()
        times.append(time.perf_counter() - t0)
    t = float(np.median(times))
    return {
        "cells": grid.num_cells,
        "time_s": t,
        "bin_s": t_bin,
        "compile_s": t_compile,
        "voxels_per_sec": grid.num_cells / t,
        "inside_frac": float((np.asarray(phi) < 0).mean()),
    }


def main():
    import jax

    # persistent compile cache: repeated driver runs skip the (slow) XLA
    # compiles for already-seen shapes
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        log(f"compilation cache unavailable: {e}")

    from sdfgenfast_tpu.grid import sizing_mode2a_proportional
    from sdfgenfast_tpu.mesh import box_mesh
    from sdfgenfast_tpu.pipeline import SDFConfig

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")

    mesh = box_mesh((3, 4, 5), (-1, -1, -1))
    mn, mx = mesh.bounds()

    # optional size filter (e.g. `python bench.py 128`) — used to warm the
    # persistent compile cache one size at a time
    sizes = tuple(int(a) for a in sys.argv[1:]) or (64, 128, 256)
    results = {}
    for nx in sizes:
        grid = sizing_mode2a_proportional(mn, mx, nx, 1)
        cfg = SDFConfig()
        r = bench_config(mesh, grid, cfg, repeats=3 if nx < 256 else 2)
        results[nx] = r
        log(
            f"Nx={nx}: grid={grid.shape} cells={r['cells']/1e6:.2f}M "
            f"time={r['time_s']*1e3:.1f}ms compile={r['compile_s']:.1f}s "
            f"-> {r['voxels_per_sec']/1e6:.1f}M voxels/s (inside {r['inside_frac']:.3f})"
        )

    top = max(sizes)
    v = results[top]["voxels_per_sec"]
    print(
        json.dumps(
            {
                "metric": f"voxels/sec/chip @ mode2a Nx={top} (3x4x5 box STL)",
                "value": round(v, 1),
                "unit": "voxels/s",
                "vs_baseline": round(v / BASELINE_VOXELS_PER_SEC, 3),
                "detail": {
                    str(nx): {
                        "cells": r["cells"],
                        "time_ms": round(r["time_s"] * 1e3, 2),
                        "compile_s": round(r["compile_s"], 2),
                        "mvoxels_per_sec": round(r["voxels_per_sec"] / 1e6, 2),
                    }
                    for nx, r in results.items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()
