"""Object pose (rotation/translation o2w) estimation.

Three strategies matching the reference:
- static: constant pose at the configured range midpoints
  (model/static_object_parameters_encoder.py:30-57) — a pure function.
- classic: geometric; casts the bbox bottom-center ray onto the ground plane
  (model/classic_object_parameters_encoder.py:129-238) — a pure function.
- learned_v4: CNN over the object crop regresses a (sin, cos) yaw offset from
  the camera; translation is the geometric ground intersection plus a
  box-tightness correction (model/object_parameters_encoder_v4.py).

All return per-object (rotations (..., objects, 3), translations
(..., objects, 3)) — object axis BEFORE the coordinate axis, unlike the
reference's trailing-object layout.
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from playableenvironments_tpu.config import ParameterEncoderConfig
from playableenvironments_tpu.core.rays import transform_points
from playableenvironments_tpu.core.transforms3d import invert_rigid
from playableenvironments_tpu.models.layers import ResidualBlock, avg_pool
from playableenvironments_tpu.ops.roi_crop import (
    crop_and_resize,
    expand_boxes,
    roi_pool,
)


def static_object_poses(
    cfg: ParameterEncoderConfig, batch_shape: Tuple[int, ...], dtype=jnp.float32
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Constant poses at the midpoints of the configured ranges.

    :return: ((*batch, objects, 3) rotations, (*batch, objects, 3) translations).
    """
    rot_range = jnp.asarray(cfg.rotation_range, dtype)  # (objects, 3, 2)
    trans_range = jnp.asarray(cfg.translation_range, dtype)
    rotations = (rot_range[..., 0] + rot_range[..., 1]) / 2.0
    translations = (trans_range[..., 0] + trans_range[..., 1]) / 2.0
    rotations = jnp.broadcast_to(rotations, batch_shape + rotations.shape)
    translations = jnp.broadcast_to(translations, batch_shape + translations.shape)
    return rotations, translations


def _ground_intersection(
    w2c_matrix: jnp.ndarray,
    focals: jnp.ndarray,
    boxes: jnp.ndarray,
    image_size: Tuple[int, int],
    zero_axis: int,
    eps: float = 1e-6,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cast the ray through each box's bottom-center pixel and intersect the
    ground plane (axis `zero_axis` == 0).

    :param w2c_matrix: (..., 4, 4) world->camera transform.
    :param focals: (...) focal lengths in pixels.
    :param boxes: (..., objects, 4) normalized (l, t, r, b).
    :param image_size: (height, width) used to denormalize.
    :return: ((..., objects, 3) ground positions, (..., objects, 3) world-frame
             ray directions through the feet pixel).
    """
    height, width = image_size
    c2w = invert_rigid(w2c_matrix)

    feet_x = (boxes[..., 0] + boxes[..., 2]) / 2.0 * width - width / 2.0
    feet_y = -(boxes[..., 3] * height - height / 2.0)  # y up in camera frame
    feet_z = -jnp.broadcast_to(focals[..., None], feet_x.shape)  # camera looks -z
    directions_cam = jnp.stack([feet_x, feet_y, feet_z], axis=-1)

    origins = jnp.broadcast_to(
        c2w[..., :3, 3][..., None, :], directions_cam.shape
    )
    directions = transform_points(
        directions_cam, c2w[..., None, :, :], translate=False
    )

    n = -origins[..., zero_axis] / (directions[..., zero_axis] + eps)
    positions = origins + n[..., None] * directions
    positions = positions.at[..., zero_axis].set(0.0)
    return positions, directions


def classic_object_poses(
    cfg: ParameterEncoderConfig,
    w2c_matrix: jnp.ndarray,
    focals: jnp.ndarray,
    bounding_boxes: jnp.ndarray,
    boxes_validity: jnp.ndarray,
    image_size: Tuple[int, int],
    apply_ranges: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Geometric pose: ground intersection of the feet ray; rotation fixed at
    the range midpoint. Reference: classic_object_parameters_encoder.py:129-238
    (first camera only, 148-152).

    :param w2c_matrix: (..., 4, 4) first camera world->camera.
    :param focals: (...).
    :param bounding_boxes: (..., objects, 4) normalized (l, t, r, b).
    :param boxes_validity: (..., objects) booleans.
    :return: ((..., objects, 3) rotations, (..., objects, 3) translations).
    """
    translations, _ = _ground_intersection(
        w2c_matrix, focals, bounding_boxes, image_size, cfg.zero_axis
    )
    if apply_ranges:
        trans_range = jnp.asarray(cfg.translation_range, translations.dtype)
        offset = (
            trans_range[:, cfg.zero_axis, 0] + trans_range[:, cfg.zero_axis, 1]
        ) / 2.0
        translations = translations.at[..., cfg.zero_axis].add(offset)
        rot_range = jnp.asarray(cfg.rotation_range, translations.dtype)
        rotations_value = (rot_range[..., 0] + rot_range[..., 1]) / 2.0
    else:
        rotations_value = jnp.zeros(
            (len(cfg.translation_range), 3), translations.dtype
        )

    translations = jnp.where(boxes_validity[..., None], translations, 0.0)
    rotations = jnp.broadcast_to(rotations_value, translations.shape)
    return rotations, translations


def normalize_angle_range(angle: jnp.ndarray, low: float, high: float) -> jnp.ndarray:
    """Wrap angles into [low, high] in steps of (high - low).
    Vectorized form of object_parameters_encoder_v4.py:194-219's while loops."""
    delta = high - low
    return jnp.mod(angle - low, delta) + low


class ObjectParametersEncoderV4(nn.Module):
    """Learned yaw + geometric translation (Minecraft players).

    A CNN over the object crop regresses tanh-bounded (cos, sin) components of
    the camera-to-object yaw offset, decoded with atan2
    (object_parameters_encoder_v4.py:170-178); rotation o2w = camera yaw +
    offset. Translation = ground intersection plus a correction of
    `edge_to_center_distance / cos(offset)` along the camera's ground-plane
    direction (292-313) to compensate non-tight boxes.
    """

    cfg: ParameterEncoderConfig

    @nn.compact
    def __call__(
        self,
        observations: jnp.ndarray,
        w2c_matrix: jnp.ndarray,
        camera_rotations: jnp.ndarray,
        focals: jnp.ndarray,
        bounding_boxes: jnp.ndarray,
        boxes_validity: jnp.ndarray,
        train: bool = True,
        apply_ranges: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """:param observations: (N, H, W, 3) first-camera frames.
        :param w2c_matrix: (N, 4, 4).
        :param camera_rotations: (N, 3).
        :param focals: (N,).
        :param bounding_boxes: (N, objects, 4) normalized (l, t, r, b).
        :param boxes_validity: (N, objects).
        :return: ((N, objects, 3) rotations o2w, (N, objects, 3) translations).
        """
        n, height, width, _ = observations.shape
        objects_count = bounding_boxes.shape[-2]
        in_h, in_w = self.cfg.input_size

        # --- rotation: CNN on each object's crop (shared weights) ---
        boxes = expand_boxes(
            bounding_boxes, self.cfg.expansion_rows, self.cfg.expansion_cols
        )
        pixel_boxes = boxes * jnp.asarray([width, height, width, height], boxes.dtype)
        flat_boxes = pixel_boxes.reshape(-1, 4)
        flat_images = jnp.repeat(observations, objects_count, axis=0)
        crop = roi_pool if self.cfg.crop_mode == "roi_pool" else crop_and_resize
        crops = crop(flat_images, flat_boxes, (in_h, in_w))

        # Reference CNN widths (object_parameters_encoder_v4.py:47-66) so
        # reference checkpoints convert 1:1 (compat.torch_import).
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=3, use_bias=False, name="conv1"
        )(crops)
        x = nn.BatchNorm(use_running_average=not train, name="bn1")(x)
        x = nn.leaky_relu(x, 0.2)
        x = ResidualBlock(64, downsample_factor=2, name="initial_0")(x, train)
        x = ResidualBlock(64, downsample_factor=1, name="initial_1")(x, train)
        x = ResidualBlock(128, downsample_factor=2, name="final_0")(x, train)
        x = ResidualBlock(128, downsample_factor=1, name="final_1")(x, train)
        x = ResidualBlock(256, downsample_factor=2, name="final_2")(x, train)
        x = ResidualBlock(256, downsample_factor=1, name="final_3")(x, train)
        x = ResidualBlock(512, downsample_factor=2, name="final_4")(x, train)
        x = ResidualBlock(512, downsample_factor=1, name="final_5")(x, train)
        pooled = jnp.mean(x, axis=(1, 2))

        # tanh * 1.4 keeps the cardinal rotations out of saturation
        # (object_parameters_encoder_v4.py:171-173).
        vec = jnp.tanh(nn.Dense(2, name="rotation_head")(pooled)) * 1.4
        yaw_offset = jnp.arctan2(vec[..., 1], vec[..., 0]).reshape(n, objects_count)

        axis = self.cfg.rotation_axis
        camera_yaw = camera_rotations[..., axis][:, None]  # (N, 1)
        rotations = jnp.zeros((n, objects_count, 3), observations.dtype)
        rotations = rotations.at[..., axis].set(camera_yaw + yaw_offset)
        rotations = jnp.where(boxes_validity[..., None], rotations, 0.0)

        # --- translation: ground intersection + tightness correction ---
        translations, directions = _ground_intersection(
            w2c_matrix, focals, bounding_boxes, (height, width),
            zero_axis=self.cfg.zero_axis,
        )
        # Camera direction projected on the ground plane, unit length.
        ground_dirs = directions.at[..., self.cfg.zero_axis].set(0.0)
        ground_dirs = ground_dirs / jnp.linalg.norm(ground_dirs, axis=-1, keepdims=True)
        wrapped = normalize_angle_range(yaw_offset, -math.pi / 4, math.pi / 4)
        sloped = self.cfg.edge_to_center_distance / jnp.cos(wrapped)
        translations = translations + ground_dirs * sloped[..., None]
        translations = jnp.where(boxes_validity[..., None], translations, 0.0)

        return rotations, translations
