"""Euler-angle rotations and rigid-body transforms as pure JAX functions.

Behavioral parity with the reference's `utils/lib_3d/transformations_3d.py`
(rotation conventions, z->x->y composition order) and
`utils/lib_3d/pose_parameters.py` (pose <-> homogeneous 4x4).
All functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp


def rotation_x(radians: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation about x. Reference: transformations_3d.py:10-27.

    :param radians: (...) angles.
    :return: (..., 3, 3) rotation matrices.
    """
    c, s = jnp.cos(radians), jnp.sin(radians)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    rows = [
        jnp.stack([o, z, z], axis=-1),
        jnp.stack([z, c, -s], axis=-1),
        jnp.stack([z, s, c], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def rotation_y(radians: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation about y. Reference: transformations_3d.py:29-47."""
    c, s = jnp.cos(radians), jnp.sin(radians)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    rows = [
        jnp.stack([c, z, s], axis=-1),
        jnp.stack([z, o, z], axis=-1),
        jnp.stack([-s, z, c], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def rotation_z(radians: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation about z. Reference: transformations_3d.py:49-67."""
    c, s = jnp.cos(radians), jnp.sin(radians)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    rows = [
        jnp.stack([c, -s, z], axis=-1),
        jnp.stack([s, c, z], axis=-1),
        jnp.stack([z, z, o], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def euler_translation_to_matrix(
    rotations: jnp.ndarray, translations: jnp.ndarray
) -> jnp.ndarray:
    """Euler (x, y, z) angles + translation -> homogeneous 4x4.

    Rotations compose in z -> x -> y application order: R = Ry @ Rx @ Rz,
    matching transformations_3d.py:70-96.

    :param rotations: (..., 3) angles in radians.
    :param translations: (..., 3) translation vectors.
    :return: (..., 4, 4) homogeneous matrices.
    """
    rx = rotation_x(rotations[..., 0])
    ry = rotation_y(rotations[..., 1])
    rz = rotation_z(rotations[..., 2])
    rotation = ry @ (rx @ rz)

    top = jnp.concatenate([rotation, translations[..., :, None]], axis=-1)
    bottom_row = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom_row], axis=-2)


def matrix_to_euler_translation(matrix: jnp.ndarray, eps: float = 1e-6):
    """Recover (x, y, z) Euler angles and translation from a 4x4 built by
    `euler_translation_to_matrix`. Reference: transformations_3d.py:98-131.

    Assumes |x angle| < pi/2 (cameras are never vertical in this domain).

    :param matrix: (..., 4, 4) homogeneous matrices.
    :return: ((..., 3) rotations, (..., 3) translations).
    """
    x_angle = -jnp.arcsin(matrix[..., 1, 2])
    x_cos = jnp.cos(x_angle)
    y_angle = jnp.arctan2(
        matrix[..., 0, 2] / (x_cos + eps), matrix[..., 2, 2] / (x_cos + eps)
    )
    z_angle = jnp.arctan2(
        matrix[..., 1, 0] / (x_cos + eps), matrix[..., 1, 1] / (x_cos + eps)
    )
    rotations = jnp.stack([x_angle, y_angle, z_angle], axis=-1)
    translations = matrix[..., :3, 3]
    return rotations, translations


def invert_rigid(matrix: jnp.ndarray) -> jnp.ndarray:
    """Invert a rigid homogeneous transform: [R t]^-1 = [R^T, -R^T t].

    Cheaper and better conditioned than a general 4x4 inverse; the reference
    uses `.inverse()` (pose_parameters.py:76) on matrices that are always rigid.

    :param matrix: (..., 4, 4) rigid homogeneous matrices.
    :return: (..., 4, 4) inverse matrices.
    """
    rot_t = jnp.swapaxes(matrix[..., :3, :3], -1, -2)
    trans = -(rot_t @ matrix[..., :3, 3:4])
    top = jnp.concatenate([rot_t, trans], axis=-1)
    bottom_row = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom_row], axis=-2)


def sphere_camera_poses(
    elevation: float, distance: float, num_cameras: int, offset: float = 0.0
):
    """Camera poses on a sphere looking at the origin.
    Reference: pose_parameters.py:79-106.

    :return: ((num_cameras, 3) rotations, (num_cameras, 3) translations).
    """
    angles = (
        jnp.linspace(0.0, 2.0 * jnp.pi, num=num_cameras, endpoint=False) + offset
    )
    rotations = jnp.stack(
        [
            jnp.full_like(angles, -elevation),
            angles + jnp.pi,
            jnp.zeros_like(angles),
        ],
        axis=-1,
    )
    cos_elevation = jnp.cos(elevation)
    translations = jnp.stack(
        [
            distance * cos_elevation * jnp.cos(angles + jnp.pi / 2),
            jnp.full_like(angles, distance * jnp.sin(elevation)),
            distance * cos_elevation * -jnp.sin(angles + jnp.pi / 2),
        ],
        axis=-1,
    )
    return rotations, translations
