#!/usr/bin/env python
"""Batch-generation throughput (BASELINE config 5's building block).

Measures `api.generate_sdf_batch` on the real device: N distinct
100k-class meshes on one shared 256-class grid, one compiled program
reused across the batch (bucketed shapes), each mesh's host binning
overlapped with the previous mesh's device compute. Reports aggregate
voxels/s, per-mesh wall, and the overlap gain vs the same meshes run
strictly sequentially (bin k -> compute k -> fetch k).

Publishes BASELINE.json["published"]["batch_throughput"]. Publication is
guarded by the same tunnel-phase rule as bench.py: the RTT probe must be
healthy, or the run refuses to publish.

Usage: python tools/batch_bench.py [N] [publish]
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    n_meshes = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    publish = "publish" in sys.argv[1:]

    import jax

    cache_dir = os.path.join(REPO, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    # force the tunnel into synchronous-dispatch mode (see bench.py)
    np.asarray(jax.jit(lambda v: v + 1.0)(jnp.ones((8, 128), jnp.float32)))

    sys.path.insert(0, os.path.join(REPO))
    from bench import probe_rtt, _RTT_HEALTHY_S
    from sdfgenfast_tpu import generate_sdf_batch
    from sdfgenfast_tpu.mesh import icosphere

    # N distinct meshes: jittered icosphere(6) (81,920 tris each) — realistic
    # "same family, different geometry" batch; identical array SHAPES so one
    # compiled program serves the whole batch
    rng = np.random.default_rng(0)
    meshes = []
    for _ in range(n_meshes):
        m = icosphere(6, radius=1.0)
        v = m.verts + rng.normal(0, 0.003, m.verts.shape).astype(np.float32)
        meshes.append((v, m.tris))

    n = 256
    origin, dx = (-1.3, -1.3, -1.3), 2.6 / n
    cells = n ** 3

    # warm: compile + seed the jit/persistent caches (first mesh's shapes)
    t0 = time.perf_counter()
    generate_sdf_batch(meshes[:1], origin, dx, n, n, n)
    warm_s = time.perf_counter() - t0
    print(f"warm/compile: {warm_s:.1f}s", file=sys.stderr)

    rtt = probe_rtt()
    print(f"tunnel rtt: {rtt * 1e3:.0f} ms", file=sys.stderr)

    # batched (overlapped) run
    t0 = time.perf_counter()
    out = generate_sdf_batch(meshes, origin, dx, n, n, n)
    t_batch = time.perf_counter() - t0
    assert len(out) == n_meshes and out[0].shape == (n, n, n)

    # strictly sequential: same calls, but fetch each result before binning
    # the next (defeats the one-deep overlap)
    t0 = time.perf_counter()
    for pair in meshes:
        generate_sdf_batch([pair], origin, dx, n, n, n)
    t_seq = time.perf_counter() - t0

    row = {
        "workload": f"{n_meshes} x icosphere(6) (81,920 tris) @ {n}^3",
        "batch_s": round(t_batch, 3),
        "sequential_s": round(t_seq, 3),
        "per_mesh_ms": round(t_batch / n_meshes * 1e3, 1),
        "mvoxels_per_sec": round(cells * n_meshes / t_batch / 1e6, 1),
        "overlap_gain": round(t_seq / t_batch, 3),
        "rtt_ms": round(rtt * 1e3, 1),
        "inside_frac": round(float((out[0] < 0).mean()), 3),
    }
    print(json.dumps(row, indent=2))

    if publish:
        if rtt > _RTT_HEALTHY_S:
            print("REFUSING to publish: degraded tunnel phase",
                  file=sys.stderr)
            sys.exit(1)
        path = os.path.join(REPO, "BASELINE.json")
        with open(path) as f:
            base = json.load(f)
        base.setdefault("published", {})["batch_throughput"] = row
        with open(path, "w") as f:
            json.dump(base, f, indent=2)
        print("published to BASELINE.json", file=sys.stderr)


if __name__ == "__main__":
    main()
