"""Dense all-triangles Pallas kernel: oracle parity, path equivalence, grads.

Small meshes (<= SDFConfig.dense_max_tris) take the fused dense kernel path
through make_level_set3; these tests pin that path against the float64
brute-force oracle AND against the tiled band+JFA path (dense_max_tris=0
forces the latter), so both implementations keep end-to-end coverage.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sdfgenfast_tpu import GridSpec, SDFConfig, box_mesh, make_level_set3
from sdfgenfast_tpu.mesh import icosphere
from sdfgenfast_tpu.ops.dense import DENSE_MAX_TRIS, dense_distance_field
from sdfgenfast_tpu.pipeline import bin_mesh, use_dense
from oracle import brute_force_sdf

SURF_EPS = 1e-5


class TestDenseKernel:
    def test_matches_oracle_unsigned(self):
        m = icosphere(1, radius=1.0, center=(0.05, -0.03, 0.08))
        tv = jnp.asarray(m.verts)[jnp.asarray(m.tris.astype(np.int32))]
        gs = (14, 17, 19)
        origin = (-1.31, -1.24, -1.18)
        dx = 0.17
        phi, tid = dense_distance_field(
            tv, jnp.asarray(origin, jnp.float32), jnp.float32(dx), grid_shape=gs
        )
        ref = np.abs(brute_force_sdf(m.verts, m.tris, origin, dx, gs))
        np.testing.assert_allclose(np.asarray(phi), ref, rtol=2e-5, atol=2e-6)
        # every argmin id actually achieves the min distance
        assert (np.asarray(tid) >= 0).all() and (np.asarray(tid) < len(m.tris)).all()

    def test_matches_oracle_off_origin(self):
        # coefficients are built in grid-local coordinates, so a mesh (and
        # grid) modeled ~1e3 from the world origin keeps difference-form
        # accuracy instead of cancelling O(|p|*eps) terms
        off = 1000.0
        m = icosphere(1, radius=1.0, center=(off + 0.05, off - 0.03, off + 0.08))
        tv = jnp.asarray(m.verts)[jnp.asarray(m.tris.astype(np.int32))]
        gs = (14, 17, 19)
        origin = (off - 1.31, off - 1.24, off - 1.18)
        dx = 0.17
        phi, _ = dense_distance_field(
            tv, jnp.asarray(origin, jnp.float32), jnp.float32(dx), grid_shape=gs
        )
        ref = np.abs(brute_force_sdf(m.verts, m.tris, origin, dx, gs))
        np.testing.assert_allclose(np.asarray(phi), ref, rtol=2e-4, atol=2e-4)

    def test_degenerate_triangle_gets_point_distance(self):
        # zero-area triangle: the separable kernel must fall through to the
        # edge/point distance (makelevelset3.cpp:49-70), not the undefined
        # inside-plane branch
        pt = np.array([0.5, 0.5, 0.5], np.float32)
        tv = jnp.asarray(np.broadcast_to(pt, (1, 3, 3)).copy())
        gs = (10, 10, 10)
        phi, _ = dense_distance_field(
            tv, jnp.zeros((3,), jnp.float32), jnp.float32(0.1), grid_shape=gs
        )
        idx = np.stack(np.meshgrid(*[np.arange(10)] * 3, indexing="ij"), -1)
        ref = np.linalg.norm(idx * 0.1 - pt, axis=-1)
        np.testing.assert_allclose(np.asarray(phi), ref, rtol=1e-5, atol=1e-6)

    def test_segment_triangle_gets_segment_distance(self):
        # two coincident vertices -> segment; edge path must handle it
        tv = jnp.asarray(
            [[[0.2, 0.5, 0.5], [0.8, 0.5, 0.5], [0.8, 0.5, 0.5]]], jnp.float32
        )
        phi, _ = dense_distance_field(
            tv, jnp.zeros((3,), jnp.float32), jnp.float32(0.1),
            grid_shape=(10, 10, 10),
        )
        # cell (5,5,5) = (0.5,0.5,0.5) lies on the segment; (5,5,8) is 0.3 off
        assert abs(float(phi[5, 5, 5])) < 1e-6
        np.testing.assert_allclose(float(phi[5, 5, 8]), 0.3, rtol=1e-5)

    def test_soa_fallback_matches_oracle_and_sep(self):
        # icosphere(3) = 1280 tris exceeds DENSE_MAX_TRIS; cap a slice at 512
        # so the SoA fallback (> _SEP_MAX_TRIS=384) keeps oracle coverage,
        # and compare sep vs SoA on the same mesh
        from sdfgenfast_tpu.ops import dense as dense_mod

        m = icosphere(3, radius=1.0, center=(0.02, -0.01, 0.03))
        tris = m.tris[:512]
        tv = jnp.asarray(m.verts)[jnp.asarray(tris.astype(np.int32))]
        gs = (9, 10, 11)
        origin = (-1.2, -1.15, -1.1)
        dx = 0.24
        assert tv.shape[0] > dense_mod._SEP_MAX_TRIS
        phi_soa, _ = dense_distance_field(
            tv, jnp.asarray(origin, jnp.float32), jnp.float32(dx), grid_shape=gs
        )
        ref = np.abs(brute_force_sdf(m.verts, tris, origin, dx, gs))
        np.testing.assert_allclose(np.asarray(phi_soa), ref, rtol=2e-5, atol=2e-6)

        # same mesh through the separable kernel (cap raised via monkeypath of
        # the module constant is avoided: take a <=384 subset both kernels see)
        tris384 = m.tris[:384]
        tv384 = jnp.asarray(m.verts)[jnp.asarray(tris384.astype(np.int32))]
        phi_sep, _ = dense_distance_field(
            tv384, jnp.asarray(origin, jnp.float32), jnp.float32(dx), grid_shape=gs
        )
        ref384 = np.abs(brute_force_sdf(m.verts, tris384, origin, dx, gs))
        np.testing.assert_allclose(np.asarray(phi_sep), ref384, rtol=2e-5, atol=2e-6)

    def test_cap_enforced(self):
        cfg = SDFConfig()
        assert use_dense(cfg, 36)
        assert use_dense(cfg, DENSE_MAX_TRIS)
        assert not use_dense(cfg, DENSE_MAX_TRIS + 1)
        assert not use_dense(SDFConfig(dense_max_tris=0), 36)
        assert not use_dense(SDFConfig(far_field="eikonal"), 36)


class TestDensePipelinePath:
    def test_dense_equals_tiled_path(self):
        m = icosphere(2, radius=1.0, center=(0.1, -0.05, 0.07))
        g = GridSpec((-1.5, -1.5, -1.5), 0.14, (22, 23, 24))
        dense = np.asarray(make_level_set3(m, g, SDFConfig()))
        tiled = np.asarray(make_level_set3(m, g, SDFConfig(dense_max_tris=0)))
        # identical signs; magnitudes agree to f32 roundoff in the band and
        # the tiled path's small fixed-point slack in the far field
        assert ((dense < 0) == (tiled < 0)).all()
        np.testing.assert_allclose(dense, tiled, atol=0.05 * g.dx)

    def test_dense_skips_band_binning(self):
        m = box_mesh((2, 2, 2))
        g = GridSpec((-0.5, -0.5, -0.5), 0.25, (12, 12, 12))
        binned = bin_mesh(m, g, SDFConfig())
        assert binned.band is None  # 12 tris -> dense path, no band binning
        binned_tiled = bin_mesh(m, g, SDFConfig(dense_max_tris=0))
        assert binned_tiled.band is not None

    def test_dense_far_field_is_exact(self):
        # the dense kernel gives the true min distance EVERYWHERE — strictly
        # stronger than the propagated far field's fixed-point guarantee
        m = box_mesh((3, 4, 5), (-1, -1, -1))
        g = GridSpec((-1.5, -1.5, -1.5), 0.5, (14, 16, 18))
        phi = np.asarray(make_level_set3(m, g, SDFConfig()))
        ref = brute_force_sdf(m.verts, m.tris, g.origin, g.dx, g.shape)
        np.testing.assert_allclose(
            np.abs(phi), np.abs(ref), rtol=5e-5, atol=2e-6
        )


class TestDenseGradients:
    def test_grad_matches_finite_differences(self):
        m = icosphere(1, radius=0.93, center=(0.013, 0.021, -0.017))
        g = GridSpec((-1.3, -1.3, -1.3), 2.6 / 16, (16, 16, 16))
        cfg = SDFConfig()
        binned = bin_mesh(m, g, cfg)
        assert binned.band is None  # proves the dense path is the one tested

        # random-weighted sum: avoids the mass cancellation a plain sum-of-
        # squares hits (f32 accumulation noise would swamp the FD signal)
        w = jnp.asarray(np.random.default_rng(1).standard_normal(g.shape), jnp.float32)

        def loss(v):
            phi = make_level_set3(m, g, cfg, binned=binned, verts=v)
            return jnp.sum(phi * w)

        grad = np.asarray(jax.grad(loss)(jnp.asarray(m.verts)))
        assert np.isfinite(grad).all()
        eps = 1e-3
        for i, ax in [(0, 0), (5, 1), (17, 2)]:
            vp = m.verts.copy()
            vp[i, ax] += eps
            vm = m.verts.copy()
            vm[i, ax] -= eps
            fd = (float(loss(jnp.asarray(vp))) - float(loss(jnp.asarray(vm)))) / (
                2 * eps
            )
            assert abs(fd - grad[i, ax]) < 2e-2 * max(1.0, abs(fd)), (
                f"vert {i} axis {ax}: fd={fd} ad={grad[i, ax]}"
            )
