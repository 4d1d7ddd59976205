#!/usr/bin/env python
"""Microbenchmarks that ground the Pallas kernel designs in measured numbers:
  1. VPU peak: sustained fp32 elementwise throughput in a Pallas kernel.
  2. Grid-step overhead: many tiny grid steps vs few large ones.
  3. HBM stream: pure copy bandwidth through a Pallas kernel.
Run on the real chip. Prints ops/s and GB/s.
"""

import os
import sys
import time
from functools import partial

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

cache_dir = os.path.join(REPO, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def force_honest_timing():
    x = jnp.ones((8, 128), jnp.float32)
    np.asarray(jax.jit(lambda v: v + 1.0)(x))


INNER = 8  # chained invocations per jit call: amortizes the ~25 ms tunnel RTT


def chain(call):
    """x -> call applied INNER times, dependently chained (no DCE/overlap)."""
    @jax.jit
    def f(x):
        for _ in range(INNER):
            x = call(x)
        return x
    return f


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return (min(ts) - 0.0) / INNER  # per-invocation; RTT amortized over INNER


# --- 1. VPU peak: fma chain ------------------------------------------------
def vpu_peak():
    SUB, LANES, CHAIN = 256, 512, 512

    def kernel(x_ref, o_ref):
        a = x_ref[:]
        b = a * 1.000001 + 0.5

        def body(i, carry):
            a, b = carry
            a = a * b + 1.0
            b = b * a + 0.5
            return a, b

        a, b = jax.lax.fori_loop(0, CHAIN, body, (a, b))
        o_ref[:] = a + b

    nb = 64
    x = jnp.ones((SUB * nb, LANES), jnp.float32)
    f = chain(lambda x: pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((SUB, LANES), lambda b: (b, 0))],
        out_specs=pl.BlockSpec((SUB, LANES), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((SUB * nb, LANES), jnp.float32),
    )(x))
    t = timeit(f, x)
    flops = SUB * nb * LANES * CHAIN * 4  # 2 fma = 4 flops per chain step
    print(f"VPU fma chain: {flops/t/1e12:.2f} Tflop/s  ({t*1e3:.2f} ms)")


# --- 1b. VPU with select/compare mix (closer to our kernels) ----------------
def vpu_mixed():
    SUB, LANES, CHAIN = 256, 512, 256

    def kernel(x_ref, o_ref):
        a = x_ref[:]
        b = a + 0.25
        best = a * 0.0 + 3e18

        def body(i, carry):
            a, b, best = carry
            d = a * b + 1.0         # fma
            d = d * d               # mul
            m = d < best            # cmp
            best = jnp.where(m, d, best)  # select
            a = a + 0.125
            b = b * 0.999
            return a, b, best

        a, b, best = jax.lax.fori_loop(0, CHAIN, body, (a, b, best))
        o_ref[:] = best

    nb = 64
    x = jnp.ones((SUB * nb, LANES), jnp.float32)
    f = chain(lambda x: pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((SUB, LANES), lambda b: (b, 0))],
        out_specs=pl.BlockSpec((SUB, LANES), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((SUB * nb, LANES), jnp.float32),
    )(x))
    t = timeit(f, x)
    ops = SUB * nb * LANES * CHAIN * 7
    print(f"VPU mixed (fma/mul/cmp/sel): {ops/t/1e12:.2f} Tops/s  ({t*1e3:.2f} ms)")


# --- 2. grid-step overhead --------------------------------------------------
def grid_overhead():
    # many tiny steps: each step copies a (128, 48) block
    for nsteps, SUB in [(10000, 128), (1250, 1024)]:
        def kernel(x_ref, o_ref):
            o_ref[:] = x_ref[:] * 2.0

        x = jnp.ones((nsteps * SUB, 48), jnp.float32)
        f = chain(lambda x, n=nsteps, s=SUB: pl.pallas_call(
            kernel,
            grid=(n,),
            in_specs=[pl.BlockSpec((s, 48), lambda b: (b, 0))],
            out_specs=pl.BlockSpec((s, 48), lambda b: (b, 0)),
            out_shape=jax.ShapeDtypeStruct((n * s, 48), jnp.float32),
        )(x))
        t = timeit(f, x)
        print(f"grid steps={nsteps} block=({SUB},48): {t*1e3:.2f} ms "
              f"-> {t/nsteps*1e9:.0f} ns/step, {x.size*4*2/t/1e9:.0f} GB/s")


# --- 3. HBM stream ----------------------------------------------------------
def hbm_stream():
    SUB, LANES = 512, 512
    nb = 256

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    x = jnp.ones((SUB * nb, LANES), jnp.float32)
    f = chain(lambda x: pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((SUB, LANES), lambda b: (b, 0))],
        out_specs=pl.BlockSpec((SUB, LANES), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((SUB * nb, LANES), jnp.float32),
    )(x))
    t = timeit(f, x)
    nbytes = x.size * 4 * 2
    print(f"HBM stream: {nbytes/t/1e9:.0f} GB/s ({t*1e3:.2f} ms for {nbytes/1e6:.0f} MB)")


if __name__ == "__main__":
    force_honest_timing()
    hbm_stream()
    vpu_peak()
    vpu_mixed()
    grid_overhead()
