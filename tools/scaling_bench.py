#!/usr/bin/env python
"""Device-scaling efficiency table for the sharded band+VDT pipeline — the
TPU analog of the reference's thread-scaling benchmark
(tests/benchmark_performance.cpp:147-290, README.md:266-273).

Runs the identical sharded workload on 1, 2, 4, 8 devices of a virtual CPU
mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8) and reports
voxels/s plus parallel efficiency vs the 1-device run. Virtual CPU devices
share the host's cores, so ABSOLUTE numbers mean nothing — the table is
the TREND evidence (communication overhead / load balance of the halo
exchanges and the replicated-seed psum) until a real multi-chip slice is
available; the same code path runs unchanged there.

Usage: python tools/scaling_bench.py [Nx] (default 128)
Writes the table to stdout (markdown) and updates BASELINE.json.published.
"""

import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from sdfgenfast_tpu import GridSpec, SDFConfig
from sdfgenfast_tpu.mesh import icosphere
from sdfgenfast_tpu.parallel import bin_mesh_sharded, make_device_mesh, sharded_sdf


def bench(devs, mesh, grid, cfg, repeats=3):
    dmesh = make_device_mesh(jax.devices()[:devs])
    sb = bin_mesh_sharded(mesh, grid, dmesh.devices.shape, cfg)
    out = sharded_sdf(sb, dmesh, verts=mesh.verts)  # compile
    jax.block_until_ready(out)
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = sharded_sdf(sb, dmesh, verts=mesh.verts)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return grid.num_cells / min(ts), np.asarray(out)


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    mesh = icosphere(4, radius=1.0)
    # grid divisible by every tested mesh shape. Default schedule = the
    # PYRAMID (the fast path the single-chip bench runs, now sharded);
    # pass --ladder to measure the legacy capped ladder instead.
    grid = GridSpec((-1.3, -1.3, -1.3), 2.6 / nx, (nx, nx, nx))
    ladder = "--ladder" in sys.argv
    cfg = SDFConfig(dense_max_tris=0, vdt_max_hop=8 if ladder else None)

    from sdfgenfast_tpu.parallel.sharded import halo_comms_model
    cm = halo_comms_model(grid.shape, (2, 4),
                          max_hop=8 if ladder else None)
    print(f"comms model [{cm['schedule']}] on (2,4): "
          f"{cm['vdt_rounds']} halo rounds, "
          f"{cm['ppermute_calls']} ppermute calls, "
          f"{cm['vdt_total_bytes_per_device']/1e6:.2f} MB/device VDT "
          f"(+{cm['chamfer_bytes_per_device']/1e6:.3f} MB chamfer)",
          file=sys.stderr, flush=True)

    rows = []
    ref_v = None
    ref_phi = None
    for d in (1, 2, 4, 8):
        v, phi = bench(d, mesh, grid, cfg)
        if ref_v is None:
            ref_v, ref_phi = v, phi
        else:
            np.testing.assert_allclose(phi, ref_phi, atol=5e-5, rtol=1e-6)
        eff = v / (ref_v * d)
        rows.append((d, v, v / ref_v, eff))
        print(f"devices={d}: {v/1e6:.2f}M voxels/s  speedup {v/ref_v:.2f}x  "
              f"efficiency {eff*100:.0f}%", file=sys.stderr, flush=True)

    print(f"\n| devices | Mvoxels/s | speedup | efficiency |")
    print("|---|---|---|---|")
    for d, v, s, e in rows:
        print(f"| {d} | {v/1e6:.2f} | {s:.2f}x | {e*100:.0f}% |")

    # publish into BASELINE.json
    path = os.path.join(REPO, "BASELINE.json")
    with open(path) as f:
        base = json.load(f)
    base.setdefault("published", {})["device_scaling_virtual_cpu_mesh"] = {
        "workload": f"icosphere(4) {mesh.num_tris} tris, grid {list(grid.shape)}, "
                    + ("band+VDT sharded path, vdt_max_hop=8" if ladder
                       else "band+PYRAMID sharded path (default schedule)"),
        "note": "virtual CPU devices share host cores; trend evidence only",
        "comms_model_2x4": cm,
        "rows": [
            {"devices": d, "mvoxels_per_sec": round(v / 1e6, 2),
             "speedup": round(s, 2), "efficiency": round(e, 3)}
            for d, v, s, e in rows
        ],
    }
    with open(path, "w") as f:
        json.dump(base, f, indent=2)
    print("published to BASELINE.json", file=sys.stderr)


if __name__ == "__main__":
    main()
