"""Golden tests for AABB utilities and the ray/AABB slab test."""

import jax.numpy as jnp
import numpy as np

from playableenvironments_tpu.core import bbox

UNIT_BOX = jnp.asarray([[0.0, 1.0], [0.0, 1.0], [0.0, 1.0]])


def test_corners_ordering():
    corners = np.asarray(bbox.aabb_corners(UNIT_BOX))
    # Reference contract (bounding_box.py:58-98): 0 = all-low, 6 = all-high.
    np.testing.assert_allclose(corners[0], [0, 0, 0])
    np.testing.assert_allclose(corners[6], [1, 1, 1])
    # All 8 distinct corners of the cube present.
    assert len({tuple(c) for c in corners.tolist()}) == 8


def test_contains():
    inside = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [0.7, 0.4, 0.1]])
    outside = jnp.asarray([[0.0, 0.0, -0.1], [2.0, 1.0, 0.0], [1.1, 0.4, 0.1]])
    assert bool(jnp.all(bbox.aabb_contains(UNIT_BOX, inside)))
    assert not bool(jnp.any(bbox.aabb_contains(UNIT_BOX, outside)))


def test_size_center():
    box = jnp.asarray([[-1.0, 3.0], [0.0, 2.0], [-2.0, -1.0]])
    np.testing.assert_allclose(bbox.aabb_size(box), [4.0, 2.0, 1.0])
    np.testing.assert_allclose(bbox.aabb_center(box), [1.0, 1.0, -1.5])


def test_edge_points_on_box_surface():
    pts = np.asarray(bbox.aabb_edge_points(UNIT_BOX, points_per_edge=3))
    assert pts.shape == (8 + 12 * 3, 3)
    # Every edge point has at least two coordinates at a box face.
    on_face = np.isclose(pts, 0.0) | np.isclose(pts, 1.0)
    assert np.all(on_face.sum(axis=-1) >= 2)


def test_ray_aabb_hit():
    origins = jnp.asarray([0.5, 0.5, -2.0])
    directions = jnp.asarray([[0.0, 0.0, 1.0]])  # (rays=1, 3)
    z_near, z_far = bbox.ray_aabb_bounds(
        origins, directions, UNIT_BOX, validity=jnp.asarray(True)
    )
    np.testing.assert_allclose(np.asarray(z_near), [2.0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(z_far), [3.0], atol=1e-4)


def test_ray_aabb_miss_collapses_to_zero():
    origins = jnp.asarray([5.0, 5.0, -2.0])  # off to the side
    directions = jnp.asarray([[0.0, 0.0, 1.0]])
    z_near, z_far = bbox.ray_aabb_bounds(
        origins, directions, UNIT_BOX, validity=jnp.asarray(True)
    )
    np.testing.assert_allclose(np.asarray(z_near), [0.0])
    np.testing.assert_allclose(np.asarray(z_far), [0.0])


def test_ray_aabb_invalid_object_collapses_to_zero():
    origins = jnp.asarray([0.5, 0.5, -2.0])
    directions = jnp.asarray([[0.0, 0.0, 1.0]])
    z_near, z_far = bbox.ray_aabb_bounds(
        origins, directions, UNIT_BOX, validity=jnp.asarray(False)
    )
    np.testing.assert_allclose(np.asarray(z_far), [0.0])


def test_ray_aabb_batched_matches_brute_force(rng):
    """Randomized rays vs a dense sampling oracle."""
    box = jnp.asarray([[-1.0, 2.0], [0.5, 1.5], [-3.0, -1.0]])
    origins = jnp.asarray(rng.normal(size=(4, 3)) * 3, dtype=jnp.float32)
    directions = jnp.asarray(rng.normal(size=(4, 6, 3)), dtype=jnp.float32)
    z_near, z_far = bbox.ray_aabb_bounds(
        origins, directions, box, validity=jnp.ones((4,), dtype=bool)
    )
    z_near, z_far = np.asarray(z_near), np.asarray(z_far)

    ts = np.linspace(-10, 10, 20001)
    for i in range(4):
        for j in range(6):
            pts = np.asarray(origins)[i, None, :] + ts[:, None] * np.asarray(directions)[i, j]
            inside = np.all(
                (pts >= np.asarray(box)[:, 0]) & (pts <= np.asarray(box)[:, 1]), axis=-1
            )
            if inside.any():
                lo, hi = ts[inside][0], ts[inside][-1]
                assert z_far[i, j] > z_near[i, j]
                assert abs(z_near[i, j] - lo) < 2e-3
                assert abs(z_far[i, j] - hi) < 2e-3
            else:
                # Oracle says miss (modulo grid resolution) -> interval empty or tiny
                assert z_far[i, j] - z_near[i, j] < 2e-2


def test_axis_z_bounds():
    corners = bbox.aabb_corners(UNIT_BOX)
    origins = jnp.asarray([0.5, 0.5, 3.0])
    normals = jnp.asarray([0.0, 0.0, -1.0])  # looking in -z
    z_near, z_far = bbox.axis_z_bounds(origins, normals, corners)
    np.testing.assert_allclose(float(z_near), 2.0, atol=1e-5)
    np.testing.assert_allclose(float(z_far), 3.0, atol=1e-5)
