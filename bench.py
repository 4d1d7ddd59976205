#!/usr/bin/env python
"""Benchmark harness: voxels/sec/chip across the reference's benchmark
configurations plus BASELINE.json's flagship configs.

Workloads (all timed as honest end-to-end: host binning + parity + upload +
device compute, steady state after compile):

  box64/128/256   the reference's own benchmark sweep — the 3x4x5 box at
                  CLI mode-2a grids (tests/benchmark_performance.cpp:151,
                  181-185), rebuilt with the reference STL's 36-triangle
                  tessellation -> the dense Pallas path.
  sphere82k@256   icosphere(6), 81,920 triangles at the 256-class grid —
                  the bunny-class config (BASELINE.json config 3); binned
                  band + closest-point-jump-flood path.
  torus100k@256   a 100,352-triangle torus at the 256-class grid — the
                  north-star mesh size (BASELINE.json "100k-triangle mesh").
  sphere82k@512   the 512^3 wall-clock metric (BASELINE.json config 4): a
                  true 512-cubed grid, 134M cells.
  torus100k@512   the 100k-triangle mesh at its proportional 512-class grid.

Baseline anchor (BASELINE.md): 36.9M cells / 1.29 s on an RTX 4090 for the
box at the 256-class grid ~= 28.6M voxels/s. vs_baseline numbers are
against that single anchor; note the RTX-4090 figure is for the 36-triangle
box — BASELINE.md's own caveat says the 100k-triangle configs would need
re-baselining on the GPU (near-band cost scales with triangle count), so
the large-mesh rows UNDERSTATE the chip-for-chip ratio.

Prints ONE JSON line on stdout; diagnostics go to stderr. The headline
value is the box @ 256 (the same mesh the RTX-4090 anchor measured);
`detail` carries every row.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_VOXELS_PER_SEC = 36.9e6 / 1.29  # RTX 4090, reference README.md:260


def log(*a):
    print(*a, file=sys.stderr, flush=True)


_RTT_HEALTHY_S = 0.08  # healthy tunnel sync RTT ~25 ms; degraded ~370 ms


_PROBE_FN = None


def probe_rtt():
    """Min of 3 tiny synchronous round trips — the tunnel phase detector.

    The axon tunnel has multi-minute DEGRADED PHASES (sync RTT 25 ms ->
    ~370 ms, uploads 5x slower). A tiny dispatch+transfer measures the
    current phase directly, independent of our kernels."""
    import jax
    import jax.numpy as jnp

    global _PROBE_FN
    if _PROBE_FN is None:
        # module-level cache: a fresh lambda per probe would recompile the
        # trivial program (~0.4 s) on every probe
        _PROBE_FN = jax.jit(lambda v: v + 1.0)
    f = _PROBE_FN
    x = jnp.ones((8, 128), jnp.float32)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_config(mesh, grid, config, repeats=3, budget_s=360.0):
    from sdfgenfast_tpu.pipeline import bin_mesh, make_level_set3

    t0 = time.perf_counter()
    binned = bin_mesh(mesh, grid, config)
    t_bin = time.perf_counter() - t0

    # warmup / compile
    t0 = time.perf_counter()
    phi = make_level_set3(mesh, grid, config, binned=binned)
    phi.block_until_ready()
    t_compile = time.perf_counter() - t0
    # one more untimed warm call: the tunnel's first post-compile dispatch
    # regularly carries a multi-second straggler
    phi = make_level_set3(mesh, grid, config, binned=binned)
    phi.block_until_ready()

    # Phase-robust sampling: take reps only while the tunnel is HEALTHY
    # (probe RTT < 80 ms); in a degraded phase, wait it out (phases last
    # minutes) instead of recording 2-5x-inflated walls. Stop once the two
    # smallest healthy samples agree within 10% (a reproducible minimum)
    # after `repeats` healthy reps, or when the budget runs out — then fall
    # back to whatever was measured.
    times = []
    rtts = []
    start = time.perf_counter()
    waited = 0.0
    while time.perf_counter() - start < budget_s:
        rtt = probe_rtt()
        rtts.append(rtt)
        if rtt > _RTT_HEALTHY_S and len(times) < repeats * 3:
            log(f"  [degraded tunnel: rtt {rtt*1e3:.0f} ms — waiting]")
            time.sleep(15.0)
            waited += 15.0
            continue
        t0 = time.perf_counter()
        b = bin_mesh(mesh, grid, config)  # host preprocessing counts
        phi = make_level_set3(mesh, grid, config, binned=b)
        phi.block_until_ready()
        times.append(time.perf_counter() - t0)
        if len(times) >= repeats:
            lo = sorted(times)[:2]
            if lo[1] <= 1.1 * lo[0]:
                break
    log(f"  reps: {[round(x, 3) for x in times]} "
        f"(rtt min {min(rtts)*1e3:.0f} ms, waited {waited:.0f}s degraded)")
    # min, not median: the remote-tunnel device adds multi-second stragglers
    # run-to-run (identical compiled programs measured 0.38s and 6.2s within
    # minutes); the minimum is the reproducible steady-state figure
    t = float(np.min(times))
    return {
        "cells": grid.num_cells,
        "tris": mesh.num_tris,
        "time_s": t,
        "bin_s": t_bin,
        "compile_s": t_compile,
        "voxels_per_sec": grid.num_cells / t,
        "inside_frac": float((np.asarray(phi) < 0).mean()),
        "rtt_ms": round(min(rtts) * 1e3, 1),
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
    from sdfgenfast_tpu.mesh import Mesh, box_mesh, icosphere, torus_mesh
    from sdfgenfast_tpu.pipeline import SDFConfig

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")

    # The axon tunnel's block_until_ready is a NO-OP until the first
    # device->host transfer, after which dispatch turns synchronous and
    # wall-clock times become real. Force that mode up front so every
    # number below is honest (without this, a single-config run reports
    # dispatch-only latencies).
    import jax.numpy as jnp
    np.asarray(jax.jit(lambda v: v + 1.0)(jnp.ones((8, 128), jnp.float32)))

    def box36():
        # the reference's benchmark STL box carries 36 triangles (SURVEY:
        # tests/resources/test_x3y4z5_bin.stl); our writer emits 12. Split
        # each face triangle 1->3 at its centroid so the dense kernel does
        # the same per-cell work the RTX-4090 anchor paid for.
        m = box_mesh((3, 4, 5), (-1, -1, -1))
        cent = m.verts[m.tris].mean(axis=1).astype(np.float32)
        nv = len(m.verts)
        tris = []
        for i, (a, b, c) in enumerate(m.tris):
            d = nv + i
            tris += [(a, b, d), (b, c, d), (c, a, d)]
        return Mesh(np.concatenate([m.verts, cent]),
                    np.asarray(tris, np.uint32))

    box = box36()
    sphere = icosphere(6, radius=1.0)
    torus = torus_mesh()  # 100,352 triangles

    # optional name filter (e.g. `python bench.py box256 sphere82k_256`) —
    # used to warm the persistent compile cache one config at a time
    configs = [
        ("box64", box, 64, SDFConfig(), 5),
        ("box128", box, 128, SDFConfig(), 5),
        ("box256", box, 256, SDFConfig(), 5),
        ("sphere82k_256", sphere, 256, SDFConfig(), 5),
        ("torus100k_256", torus, 256, SDFConfig(), 5),
        # BASELINE's 512^3 wall-clock metric: a true 512-cubed grid (134M
        # cells, the sphere bbox is cubic) plus the flagship torus at its
        # proportional 512-class grid. Axis-separated large-stride rounds
        # keep the full jump-flood ladder within HBM at this size.
        ("sphere82k_512", sphere, 512, SDFConfig(), 4),
        ("torus100k_512", torus, 512, SDFConfig(), 4),
    ]
    wanted = set(sys.argv[1:])
    if wanted:
        configs = [c for c in configs if c[0] in wanted]

    # honest per-config reference numbers (tools/rebaseline_reference.py):
    # measured reference-binary CPU walls on THESE meshes/grids, plus an
    # RTX-4090 estimate via the reference's own 37.6x GPU speedup
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BASELINE.json")) as f:
            rebase = json.load(f).get("published", {}).get(
                "reference_rebaseline", {}).get("rows", {})
    except Exception:
        rebase = {}

    results = {}
    for name, mesh, nx, cfg, reps in configs:
        mn, mx = mesh.bounds()
        grid = sizing_mode2a_proportional(mn, mx, nx, 1)
        try:
            r = bench_config(mesh, grid, cfg, repeats=reps)
        except Exception as e:
            log(f"{name}: FAILED ({type(e).__name__}: {e})")
            continue
        r["grid"] = list(grid.shape)
        ref = rebase.get(name)
        vs_ref = ""
        if ref:
            cpu1 = ref["cpu_1t"]["voxels_per_sec"]
            gpue = ref["rtx4090_est"]["voxels_per_sec"]
            r["vs_ref_cpu_1t"] = round(r["voxels_per_sec"] / cpu1, 1)
            r["vs_ref_gpu_est"] = round(r["voxels_per_sec"] / gpue, 2)
            vs_ref = (f", {r['vs_ref_cpu_1t']:.0f}x ref-cpu-1t, "
                      f"{r['vs_ref_gpu_est']:.1f}x est-RTX4090")
        results[name] = r
        log(
            f"{name}: grid={grid.shape} cells={r['cells']/1e6:.2f}M "
            f"tris={r['tris']} time={r['time_s']*1e3:.1f}ms "
            f"(bin {r['bin_s']*1e3:.0f}ms, compile {r['compile_s']:.1f}s) "
            f"-> {r['voxels_per_sec']/1e6:.1f}M voxels/s "
            f"({r['voxels_per_sec']/BASELINE_VOXELS_PER_SEC:.2f}x anchor"
            f"{vs_ref}, inside {r['inside_frac']:.3f})"
        )

    # keep BASELINE.json's published table in sync with the harness
    try:
        base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BASELINE.json")
        with open(base_path) as f:
            base = json.load(f)
        base.setdefault("published", {})["single_chip_bench"] = {
            "anchor": "RTX 4090 box @ 256-class = 28.6M voxels/s",
            "rows": {
                name: {
                    "grid": r["grid"], "tris": r["tris"],
                    "time_ms": round(r["time_s"] * 1e3, 1),
                    "mvoxels_per_sec": round(r["voxels_per_sec"] / 1e6, 2),
                    "vs_anchor": round(
                        r["voxels_per_sec"] / BASELINE_VOXELS_PER_SEC, 3),
                }
                for name, r in results.items()
            },
        }
        with open(base_path, "w") as f:
            json.dump(base, f, indent=2)
    except Exception as e:
        log(f"BASELINE.json publish skipped: {e}")

    head = results.get("box256") or next(iter(results.values()), None)
    if head is None:
        print(json.dumps({"metric": "bench failed", "value": 0,
                          "unit": "voxels/s", "vs_baseline": 0}))
        return
    v = head["voxels_per_sec"]
    print(
        json.dumps(
            {
                "metric": "voxels/sec/chip @ 256-class grid (3x4x5 box STL, "
                          "the RTX-4090 anchor workload)",
                "value": round(v, 1),
                "unit": "voxels/s",
                "vs_baseline": round(v / BASELINE_VOXELS_PER_SEC, 3),
                "detail": {
                    name: {
                        "grid": r["grid"],
                        "tris": r["tris"],
                        "cells": r["cells"],
                        "time_ms": round(r["time_s"] * 1e3, 2),
                        "bin_ms": round(r["bin_s"] * 1e3, 1),
                        "compile_s": round(r["compile_s"], 2),
                        "mvoxels_per_sec": round(r["voxels_per_sec"] / 1e6, 2),
                        "vs_baseline_anchor": round(
                            r["voxels_per_sec"] / BASELINE_VOXELS_PER_SEC, 3
                        ),
                        **{k: r[k] for k in
                           ("vs_ref_cpu_1t", "vs_ref_gpu_est") if k in r},
                    }
                    for name, r in results.items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()
