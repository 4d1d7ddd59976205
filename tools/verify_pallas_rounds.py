#!/usr/bin/env python
"""On-chip bit-equality check: Mosaic-compiled VDT rounds vs the jnp rounds.

The CI suite covers the kernel logic in interpret mode (tests/
test_vdt_pallas.py); this script asserts the COMPILED kernel produces
bit-identical results on the real TPU, at full 256-class size, for every
stride the pyramid uses. Exits nonzero on any mismatch.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from sdfgenfast_tpu.ops import vdt as V
from sdfgenfast_tpu.ops.vdt_pallas import pallas_round_phase


def main():
    rng = np.random.default_rng(0)
    dims = [(256, 256, 256), (256, 256, 75), (128, 137, 128), (100, 41, 75)]
    dx = np.float32(0.01)
    ok = True
    for ni, nj, nk in dims:
        state = np.full((5, ni, nj, nk), V.FAR, np.float32)
        n_seed = ni * nj * nk // 80
        ii = rng.integers(0, ni, n_seed)
        jj = rng.integers(0, nj, n_seed)
        kk = rng.integers(0, nk, n_seed)
        cp = (rng.normal(size=(3, n_seed)).astype(np.float32) * 0.5
              + np.stack([ii, jj, kk]).astype(np.float32) * dx)
        state[0, ii, jj, kk] = cp[0]
        state[1, ii, jj, kk] = cp[1]
        state[2, ii, jj, kk] = cp[2]
        state[3, ii, jj, kk] = np.asarray(jax.lax.bitcast_convert_type(
            jnp.asarray(rng.integers(0, 1 << 24, n_seed), jnp.int32),
            jnp.float32))
        px, py, pz = V._level_pos_axes((ni, nj, nk), dx, 1)
        st = jnp.asarray(state)
        st = st.at[4].set(V._dist2(px, py, pz, st[0], st[1], st[2]))
        offs = jnp.asarray(V._OFFSETS26)

        for stride in (8, 4, 2, 1):
            a = jax.jit(
                lambda s, t=stride: V._jacobi_round(s, px, py, pz, t, offs)
            )(st)
            b = jax.jit(
                lambda s, t=stride: pallas_round_phase(s, dx, (t,))
            )(st)
            eq = np.array_equal(np.asarray(a), np.asarray(b))
            print(f"dims={ni}x{nj}x{nk} stride={stride}: bit-equal={eq}")
            ok &= eq
    if not ok:
        sys.exit(1)
    print("ALL BIT-EQUAL")


if __name__ == "__main__":
    main()
