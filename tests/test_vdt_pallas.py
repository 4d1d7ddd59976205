"""Pallas VDT round kernel vs the jnp reference round.

CI runs on the forced-CPU backend, so the kernel is exercised in Pallas
interpret mode here — that validates the kernel's index/mask/merge logic
(window assembly, clamped strips, lane rotates) against the jnp round. The
payload channels (cp x/y/z + tid bits) must match BIT-FOR-BIT — any indexing
or masking bug garbles them outright; the d2 channel is allowed 2 ulp
because interpret mode contracts the three squared differences with a
different FMA pattern than XLA:CPU uses for the jnp round. On the real chip
the Mosaic-compiled kernel is bit-equal on ALL channels — asserted at full
256-class size by tools/verify_pallas_rounds.py."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdfgenfast_tpu.ops import vdt as V
from sdfgenfast_tpu.ops.vdt_pallas import (
    pallas_round_phase,
    supports_pallas_round,
)


def _assert_round_equal(a, b):
    """Interpret-mode equality: d2 within ulp everywhere; payload channels
    (cp x/y/z + tid bits) identical except where the ulp-perturbed d2
    flipped a strict-`<` near-tie (then both donors' distances must agree
    to ulp — a different-but-equally-close donor, not an indexing bug)."""
    a, b = np.asarray(a), np.asarray(b)
    np.testing.assert_allclose(a[4], b[4], rtol=5e-7)
    differs = (a[:4] != b[:4]).any(axis=0)
    if differs.any():
        # near-ties only, and rare
        assert differs.mean() < 1e-3, f"{differs.sum()} payload mismatches"
        np.testing.assert_allclose(a[4][differs], b[4][differs], rtol=5e-7)


def _random_state(rng, ni, nj, nk, dx, n_seed=4000):
    state = np.full((5, ni, nj, nk), V.FAR, np.float32)
    ii = rng.integers(0, ni, n_seed)
    jj = rng.integers(0, nj, n_seed)
    kk = rng.integers(0, nk, n_seed)
    cp = (rng.normal(size=(3, n_seed)).astype(np.float32) * 0.3
          + np.stack([ii, jj, kk]).astype(np.float32) * dx)
    state[0, ii, jj, kk] = cp[0]
    state[1, ii, jj, kk] = cp[1]
    state[2, ii, jj, kk] = cp[2]
    tidbits = jax.lax.bitcast_convert_type(
        jnp.asarray(rng.integers(0, 1 << 24, n_seed), jnp.int32), jnp.float32
    )
    state[3, ii, jj, kk] = np.asarray(tidbits)
    px, py, pz = V._level_pos_axes((ni, nj, nk), dx, 1)
    st = jnp.asarray(state)
    return st.at[4].set(V._dist2(px, py, pz, st[0], st[1], st[2]))


def _jnp_phase(state, dx, strides, scale=1):
    pos = V._level_pos_axes(state.shape[1:], dx, scale)
    offs = jnp.asarray(V._OFFSETS26)
    for s in strides:
        state = V._jacobi_round(state, *pos, s, offs)
    return state


@pytest.mark.parametrize("stride", [1, 2, 4, 8])
def test_round_bit_equal_interpret(stride):
    rng = np.random.default_rng(stride)
    dx = np.float32(0.02)
    st = _random_state(rng, 48, 48, 128, dx)
    assert supports_pallas_round(st.shape, stride)
    a = _jnp_phase(st, dx, (stride,))
    b = pallas_round_phase(st, dx, (stride,), interpret=True)
    _assert_round_equal(a, b)


@pytest.mark.parametrize("stride", [1, 2, 4])
def test_round_ragged_dims_bit_equal(stride):
    """nj/nk not multiples of the block/lane sizes: pad+crop must be exact.

    Single rounds only: across multiple rounds a near-tie donor flip from
    interpret-mode FMA noise cascades into legitimately-different (equally
    valid) d2 values, which the per-round ulp assert can't bound."""
    rng = np.random.default_rng(7)
    dx = np.float32(0.02)
    st = _random_state(rng, 40, 41, 75, dx, n_seed=2500)
    a = _jnp_phase(st, dx, (stride,))
    b = pallas_round_phase(st, dx, (stride,), interpret=True)
    _assert_round_equal(a, b)


def test_phase_scale_positions():
    """Pyramid-level scale: positions are f32(index*scale)*dx in both."""
    rng = np.random.default_rng(11)
    dx = np.float32(0.01)
    st = _random_state(rng, 32, 32, 128, dx, n_seed=1000)
    a = _jnp_phase(st, dx, (2, 1), scale=4)
    b = pallas_round_phase(st, dx, (2, 1), scale=4, interpret=True)
    _assert_round_equal(a, b)


def test_unsupported_shapes_fall_back():
    rng = np.random.default_rng(3)
    dx = np.float32(0.02)
    st = _random_state(rng, 16, 16, 16, dx, n_seed=200)
    assert not supports_pallas_round(st.shape, 1)
    a = _jnp_phase(st, dx, (1,))
    b = pallas_round_phase(st, dx, (1,), interpret=True)  # jnp fallback
    _assert_round_equal(a, b)
