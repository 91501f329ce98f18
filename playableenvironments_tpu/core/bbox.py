"""Axis-aligned bounding boxes as plain (3, 2) arrays of (low, high) per axis.

Replaces the reference's `utils/lib_3d/bounding_box.py` (an nn.Module holding a
buffer) with pure functions over a `box` array, plus the ray/AABB slab test
from `model/object_composer.py:104-151`.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Host numpy on purpose: module-level jnp constants would initialize the JAX
# backend at import time, breaking jax.distributed.initialize() for any
# entry point importing core/render at module top. Consumed only inside jnp
# ops, where they upload once per compilation.
# Corner ordering matching bounding_box.py:58-98: index 0 is the all-low
# corner, index 6 the all-high corner; selection per axis (x, y, z) is
# encoded as low=0 / high=1.
_CORNER_SELECTS = np.asarray(
    [
        [0, 0, 0],
        [1, 0, 0],
        [1, 0, 1],
        [0, 0, 1],
        [0, 1, 0],
        [1, 1, 0],
        [1, 1, 1],
        [0, 1, 1],
    ]
)

# Pairs of corner indices forming the 12 box edges (bounding_box.py:107).
EDGE_CORNER_INDEXES = np.asarray(
    [[0, 1], [1, 2], [2, 3], [3, 0], [4, 5], [5, 6], [6, 7], [7, 4],
     [0, 4], [1, 5], [2, 6], [3, 7]]
)


def aabb_size(box: jnp.ndarray) -> jnp.ndarray:
    """:param box: (..., 3, 2) low/high per axis. :return: (..., 3) side sizes."""
    return box[..., 1] - box[..., 0]


def aabb_center(box: jnp.ndarray) -> jnp.ndarray:
    """Center of the box (offset of the real center from the canonical origin).
    Reference: bounding_box.py:23-33."""
    return box[..., 0] + aabb_size(box) / 2.0


def aabb_corners(box: jnp.ndarray) -> jnp.ndarray:
    """The 8 corner points, ordered as bounding_box.py:58-98.

    :param box: (3, 2) array.
    :return: (8, 3) corners, [0] = all-low, [6] = all-high.
    """
    lohi = jnp.swapaxes(box, -1, -2)  # (2, 3)
    return jnp.where(_CORNER_SELECTS == 0, lohi[0], lohi[1])


def aabb_edge_points(box: jnp.ndarray, points_per_edge: int = 5) -> jnp.ndarray:
    """Corners plus interior points along each of the 12 edges.
    Reference: bounding_box.py:100-131.

    :return: (8 + 12 * points_per_edge, 3) points.
    """
    corners = aabb_corners(box)
    edges = corners[EDGE_CORNER_INDEXES]  # (12, 2, 3)
    fractions = jnp.linspace(0.0, 1.0, points_per_edge + 2)[1:-1]
    deltas = edges[:, 1] - edges[:, 0]  # (12, 3)
    interior = edges[:, 0][:, None, :] + deltas[:, None, :] * fractions[None, :, None]
    return jnp.concatenate([corners, interior.reshape(-1, 3)], axis=0)


def aabb_contains(box: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """True for points inside the box (inclusive bounds).
    Reference: bounding_box.py:35-48.

    :param box: (3, 2) array.
    :param points: (..., 3) points.
    :return: (...) boolean mask.
    """
    above_low = jnp.all(points >= box[..., 0], axis=-1)
    below_high = jnp.all(points <= box[..., 1], axis=-1)
    return jnp.logical_and(above_low, below_high)


def ray_aabb_bounds(
    ray_origins: jnp.ndarray,
    ray_directions: jnp.ndarray,
    box: jnp.ndarray,
    validity: jnp.ndarray,
    eps: float = 1e-6,
):
    """Slab test: per-ray [z_near, z_far] of the box intersection.

    Matches object_composer.py:104-151 exactly, including the epsilon in the
    direction denominator and the collapse of non-intersecting or invalid rays
    to z_near = z_far = 0 (so they contribute nothing when rendered).

    :param ray_origins: (..., 3) origins (object frame).
    :param ray_directions: (..., rays, 3) directions (object frame).
    :param box: (3, 2) AABB.
    :param validity: (...) boolean, False if the object is absent.
    :return: ((..., rays) z_near, (..., rays) z_far).
    """
    # (2, 3): all-low and all-high corners
    corners = jnp.stack([box[:, 0], box[:, 1]], axis=0)
    # (..., 1, 2, 3) relative to origins, then divide by (..., rays, 1, 3)
    rel = (corners - ray_origins[..., None, :])[..., None, :, :]
    t = rel / (ray_directions[..., None, :] + eps)

    t_low = jnp.min(t, axis=-2)  # (..., rays, 3)
    t_high = jnp.max(t, axis=-2)
    z_near = jnp.max(t_low, axis=-1)  # (..., rays)
    z_far = jnp.min(t_high, axis=-1)

    invalid = jnp.logical_or(z_far <= z_near, ~validity[..., None])
    zero = jnp.zeros_like(z_near)
    return jnp.where(invalid, zero, z_near), jnp.where(invalid, zero, z_far)


def axis_z_bounds(
    ray_origins: jnp.ndarray, focal_normals: jnp.ndarray, corners: jnp.ndarray
):
    """Smallest [z_near, z_far] interval along the focal normal covering all
    box corner projections. Reference: object_composer.py:73-102.

    :param ray_origins: (..., 3).
    :param focal_normals: (..., 3).
    :param corners: (8, 3) box corners (world/object frame of the origins).
    :return: ((...) z_near, (...) z_far).
    """
    rel = corners - ray_origins[..., None, :]  # (..., 8, 3)
    projections = jnp.sum(rel * focal_normals[..., None, :], axis=-1)
    return jnp.min(projections, axis=-1), jnp.max(projections, axis=-1)
