"""Golden tests for Euler/rigid transforms against tiny NumPy oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from playableenvironments_tpu.core import transforms3d as t3d


def numpy_rotation_x(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], dtype=np.float32)


def numpy_rotation_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=np.float32)


def numpy_rotation_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=np.float32)


@pytest.mark.parametrize("angle", [0.0, 0.3, -1.2, np.pi / 2])
def test_single_axis_rotations(angle):
    a = jnp.asarray(angle)
    np.testing.assert_allclose(t3d.rotation_x(a), numpy_rotation_x(angle), atol=1e-6)
    np.testing.assert_allclose(t3d.rotation_y(a), numpy_rotation_y(angle), atol=1e-6)
    np.testing.assert_allclose(t3d.rotation_z(a), numpy_rotation_z(angle), atol=1e-6)


def test_homogeneous_composition_order():
    """R must equal Ry @ Rx @ Rz (z->x->y application, transformations_3d.py:88-90)."""
    rot = np.array([0.2, -0.7, 1.1], dtype=np.float32)
    trans = np.array([1.0, 2.0, 3.0], dtype=np.float32)
    m = np.asarray(t3d.euler_translation_to_matrix(jnp.asarray(rot), jnp.asarray(trans)))

    expected_r = numpy_rotation_y(rot[1]) @ numpy_rotation_x(rot[0]) @ numpy_rotation_z(rot[2])
    np.testing.assert_allclose(m[:3, :3], expected_r, atol=1e-6)
    np.testing.assert_allclose(m[:3, 3], trans, atol=1e-6)
    np.testing.assert_allclose(m[3], [0, 0, 0, 1], atol=1e-6)


def test_matrix_roundtrip():
    rot = jnp.asarray([[0.2, -0.7, 1.1], [0.0, 0.0, 0.0], [-0.4, 2.0, -2.5]])
    trans = jnp.asarray([[1.0, 2.0, 3.0], [0.0, 0.0, 0.0], [-5.0, 0.1, 9.0]])
    m = t3d.euler_translation_to_matrix(rot, trans)
    rot2, trans2 = t3d.matrix_to_euler_translation(m)
    m2 = t3d.euler_translation_to_matrix(rot2, trans2)
    # Angles may alias, but the recovered matrix must match.
    np.testing.assert_allclose(m2, m, atol=1e-4)


def test_invert_rigid():
    rot = jnp.asarray([0.3, 0.5, -0.2])
    trans = jnp.asarray([1.0, -2.0, 0.5])
    m = t3d.euler_translation_to_matrix(rot, trans)
    inv = t3d.invert_rigid(m)
    np.testing.assert_allclose(np.asarray(inv @ m), np.eye(4), atol=1e-5)
    np.testing.assert_allclose(np.asarray(m @ inv), np.eye(4), atol=1e-5)


def test_invert_rigid_batched():
    rot = jnp.asarray([[0.3, 0.5, -0.2], [1.0, 0.0, 2.0]])
    trans = jnp.asarray([[1.0, -2.0, 0.5], [0.0, 3.0, -1.0]])
    m = t3d.euler_translation_to_matrix(rot, trans)
    inv = t3d.invert_rigid(m)
    prod = np.asarray(inv @ m)
    for i in range(2):
        np.testing.assert_allclose(prod[i], np.eye(4), atol=1e-5)


def test_sphere_camera_poses_look_at_origin():
    rots, trans = t3d.sphere_camera_poses(elevation=0.4, distance=5.0, num_cameras=6)
    assert rots.shape == (6, 3) and trans.shape == (6, 3)
    # Cameras sit at the given distance from the origin.
    np.testing.assert_allclose(np.linalg.norm(np.asarray(trans), axis=-1), 5.0, atol=1e-5)
    # The camera -z axis (view direction), rotated to world, points at the origin.
    m = t3d.euler_translation_to_matrix(rots, trans)
    view_dir_world = np.asarray(m[..., :3, :3]) @ np.array([0.0, 0.0, -1.0], dtype=np.float32)
    to_origin = -np.asarray(trans) / 5.0
    np.testing.assert_allclose(view_dir_world, to_origin, atol=1e-5)
