"""Golden tests for camera rays and along-ray sampling."""

import jax
import jax.numpy as jnp
import numpy as np

from playableenvironments_tpu.core import rays, transforms3d as t3d


def test_camera_rays_geometry():
    h, w, focal = 4, 6, 10.0
    directions, origins, normals = rays.camera_rays(h, w, focal)
    assert directions.shape == (h, w, 3)
    np.testing.assert_allclose(np.asarray(origins), np.zeros(3))
    np.testing.assert_allclose(np.asarray(normals), [0, 0, -1])
    # Pixel (0, 0): top-left -> x = -w/2 / f, y = +h/2 / f, z = -1
    np.testing.assert_allclose(
        np.asarray(directions[0, 0]), [-w / 2 / focal, h / 2 / focal, -1.0], atol=1e-6
    )
    # y decreases with the row index, x increases with the column index.
    assert float(directions[1, 0, 1]) < float(directions[0, 0, 1])
    assert float(directions[0, 1, 0]) > float(directions[0, 0, 0])


def test_camera_rays_batched_focal():
    focal = jnp.asarray([[10.0, 20.0], [30.0, 40.0]])
    directions, origins, normals = rays.camera_rays(4, 4, focal)
    assert directions.shape == (2, 2, 4, 4, 3)
    assert origins.shape == (2, 2, 3)
    # Doubling the focal halves the x offset of the corner ray.
    np.testing.assert_allclose(
        np.asarray(directions[0, 1, 0, 0, 0]) * 2, np.asarray(directions[0, 0, 0, 0, 0]), atol=1e-6
    )


def test_transform_points_matches_matmul(rng):
    pts = jnp.asarray(rng.normal(size=(5, 3)), dtype=jnp.float32)
    m = t3d.euler_translation_to_matrix(
        jnp.asarray([0.2, 0.3, -0.1]), jnp.asarray([1.0, 2.0, 3.0])
    )
    out = rays.transform_points(pts, m)
    hom = np.concatenate([np.asarray(pts), np.ones((5, 1), np.float32)], axis=-1)
    expected = (np.asarray(m) @ hom.T).T[:, :3]
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_transform_rays_shapes_and_rigidity():
    m = t3d.euler_translation_to_matrix(
        jnp.asarray([0.1, -0.4, 0.9]), jnp.asarray([5.0, 0.0, -2.0])
    )
    origins = jnp.zeros((3,))
    directions = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    normals = jnp.asarray([0.0, 0.0, -1.0])
    o2, d2, n2 = rays.transform_rays(origins, directions, normals, m)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(m[:3, 3]), atol=1e-6)
    # Directions only rotate: norms preserved.
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(d2), axis=-1), [1.0, 1.0], atol=1e-5
    )
    np.testing.assert_allclose(np.linalg.norm(np.asarray(n2)), 1.0, atol=1e-5)


def test_stratified_positions_unperturbed():
    origins = jnp.asarray([0.0, 0.0, 0.0])
    directions = jnp.asarray([[0.0, 0.0, 1.0]])
    pts, t = rays.stratified_ray_positions(
        origins, directions, 1.0, 3.0, positions_count=5, perturb=False
    )
    np.testing.assert_allclose(np.asarray(t[0]), [1.0, 1.5, 2.0, 2.5, 3.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(pts[0, :, 2]), [1.0, 1.5, 2.0, 2.5, 3.0], atol=1e-5)


def test_stratified_positions_perturbed_within_bins(key):
    origins = jnp.zeros((2, 3))
    directions = jnp.ones((2, 7, 3))
    z_near = jnp.full((2, 7), 1.0)
    z_far = jnp.full((2, 7), 5.0)
    _, t = rays.stratified_ray_positions(
        origins, directions, z_near, z_far, positions_count=16, perturb=True, key=key
    )
    t = np.asarray(t)
    assert t.shape == (2, 7, 16)
    # Samples stay ordered and within bounds.
    assert np.all(np.diff(t, axis=-1) >= 0)
    assert np.all(t >= 1.0 - 1e-5) and np.all(t <= 5.0 + 1e-5)
    # And are actually randomized (not the linspace).
    assert np.std(t[..., 1] - t[..., 0]) > 1e-4


def test_sample_pdf_concentrates_on_heavy_bin(key):
    # Three bins [0,1,2,3] with nearly all the weight in the middle bin.
    bins = jnp.asarray([[0.0, 1.0, 2.0, 3.0]])
    weights = jnp.asarray([[0.01, 1.0, 0.01]])
    samples = rays.sample_pdf(bins, weights, 1000, perturb=True, key=key)
    samples = np.asarray(samples)[0]
    frac_middle = np.mean((samples >= 1.0) & (samples <= 2.0))
    assert frac_middle > 0.9
    assert samples.min() >= 0.0 and samples.max() <= 3.0


def test_sample_pdf_deterministic_grid():
    bins = jnp.asarray([[0.0, 1.0, 2.0]])
    weights = jnp.asarray([[1.0, 1.0]])
    samples = np.asarray(rays.sample_pdf(bins, weights, 5, perturb=False))
    # Uniform weights -> evenly spaced samples across [0, 2].
    np.testing.assert_allclose(samples[0], [0.0, 0.5, 1.0, 1.5, 2.0], atol=1e-4)


def test_weighted_ray_positions_merges_and_sorts(key):
    origins = jnp.zeros((1, 3))
    directions = jnp.asarray([[[0.0, 0.0, 1.0]]])
    ref_t = jnp.asarray([[[1.0, 2.0, 3.0, 4.0]]])
    weights = jnp.asarray([[[0.1, 0.8, 0.8, 0.1]]])
    pts, t = rays.weighted_ray_positions(
        origins, directions, 8, ref_t, weights, perturb=False
    )
    t = np.asarray(t)[0, 0]
    assert t.shape == (12,)  # 8 new + 4 reference
    assert np.all(np.diff(t) >= 0)
    assert np.all((t >= 1.0 - 1e-5) & (t <= 4.0 + 1e-5))
    np.testing.assert_allclose(np.asarray(pts)[0, 0, :, 2], t, atol=1e-5)


def test_sampling_is_jittable(key):
    @jax.jit
    def f(key):
        origins = jnp.zeros((2, 3))
        directions = jnp.ones((2, 4, 3))
        pts, t = rays.stratified_ray_positions(
            origins, directions, 0.5, 2.0, 8, perturb=True, key=key
        )
        return pts.sum() + t.sum()

    assert np.isfinite(float(f(key)))
