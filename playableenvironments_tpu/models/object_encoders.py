"""Object style/deformation encoders: CNNs over fixed-size object crops.

Replaces model/object_encoder_v4.py (dynamic objects: camera-conditioned,
attention-masked) and model/object_encoder_v5.py (backgrounds: deeper, no
camera conditioning). Crops come from `ops.crop_and_resize` (bilinear,
static-shape) by default, or `ops.roi_pool` (the exact torchvision twin) when
`crop_mode: roi_pool` — checkpoint imports need the reference's quantized
max-pool semantics. Layout is NHWC.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from playableenvironments_tpu.config import ObjectEncoderConfig
from playableenvironments_tpu.models.layers import ResidualBlock, avg_pool
from playableenvironments_tpu.ops.roi_crop import (
    crop_and_resize,
    expand_boxes,
    roi_pool,
)


def _crop(cfg: ObjectEncoderConfig, observations, pixel_boxes, out_size):
    """Fixed-size crop under the configured semantics: bilinear (default) or
    the reference-exact torchvision roi_pool twin (crop_mode, config.py)."""
    if cfg.crop_mode == "roi_pool":
        return roi_pool(observations, pixel_boxes, out_size)
    return crop_and_resize(observations, pixel_boxes, out_size)


class ObjectEncoderV4(nn.Module):
    """Dynamic-object encoder: crop ++ broadcast camera pose -> small resnet
    with a learned spatial attention mask -> style/deformation heads.
    Reference: model/object_encoder_v4.py:13-176 (uses camera 0 only, 99-108).
    """

    cfg: ObjectEncoderConfig

    @nn.compact
    def __call__(
        self,
        observations: jnp.ndarray,
        bounding_boxes: jnp.ndarray,
        camera_rotations: jnp.ndarray,
        camera_translations: jnp.ndarray,
        train: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """:param observations: (N, H, W, 3) frames (first camera).
        :param bounding_boxes: (N, 4) normalized (l, t, r, b) in [0, 1].
        :param camera_rotations: (N, 3).
        :param camera_translations: (N, 3).
        :return: ((N, style) style, (N, deformation) deformation,
                  (N, h/2, w/2, 1) attention, (N, h, w, 3) crops).
        """
        n, height, width, _ = observations.shape
        in_h, in_w = self.cfg.input_size

        boxes = expand_boxes(
            bounding_boxes, self.cfg.expansion_rows, self.cfg.expansion_cols
        )
        pixel_boxes = boxes * jnp.asarray(
            [width, height, width, height], boxes.dtype
        )
        crops = _crop(self.cfg, observations, pixel_boxes, (in_h, in_w))

        # Broadcast camera pose over the crop spatial dims as extra channels
        # (object_encoder_v4.py:136-141).
        pose = jnp.concatenate([camera_rotations, camera_translations], axis=-1)
        pose_map = jnp.broadcast_to(pose[:, None, None, :], (n, in_h, in_w, 6))
        x = jnp.concatenate([crops, pose_map], axis=-1)

        x = nn.Conv(16, (3, 3), use_bias=False, name="conv1")(x)
        x = avg_pool(x, 2)
        x = nn.BatchNorm(use_running_average=not train, name="bn1")(x)
        x = nn.leaky_relu(x, 0.2)

        # One residual block emitting features + 1 attention channel
        # (object_encoder_v4.py:46, 150-159).
        initial = ResidualBlock(
            16 + 1, downsample_factor=1, drop_final_activation=True, name="initial"
        )(x, train)
        attention = nn.sigmoid(initial[..., -1:])
        features = nn.leaky_relu(initial[..., :-1], 0.2)
        features = features * attention

        y = ResidualBlock(32, downsample_factor=2, name="final_0")(features, train)
        y = ResidualBlock(32, downsample_factor=1, name="final_1")(y, train)
        y = ResidualBlock(64, downsample_factor=2, name="final_2")(y, train)
        y = ResidualBlock(64, downsample_factor=1, name="final_3")(y, train)
        pooled = jnp.mean(y, axis=(1, 2))

        style = nn.Dense(self.cfg.style_features, name="style_head")(pooled)
        deformation = nn.Dense(self.cfg.deformation_features, name="deformation_head")(
            pooled
        )
        return style, deformation, attention, crops


class ObjectEncoderV5(nn.Module):
    """Background encoder: deeper resnet (to 512 features), no camera
    conditioning, no attention. Reference: model/object_encoder_v5.py:13-178.
    """

    cfg: ObjectEncoderConfig

    @nn.compact
    def __call__(
        self,
        observations: jnp.ndarray,
        bounding_boxes: jnp.ndarray,
        camera_rotations: jnp.ndarray = None,
        camera_translations: jnp.ndarray = None,
        train: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Same surface as ObjectEncoderV4; camera args accepted and ignored."""
        n, height, width, _ = observations.shape
        in_h, in_w = self.cfg.input_size

        boxes = expand_boxes(
            bounding_boxes, self.cfg.expansion_rows, self.cfg.expansion_cols
        )
        pixel_boxes = boxes * jnp.asarray(
            [width, height, width, height], boxes.dtype
        )
        crops = _crop(self.cfg, observations, pixel_boxes, (in_h, in_w))

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

        style = nn.Dense(self.cfg.style_features, name="style_head")(pooled)
        deformation = nn.Dense(self.cfg.deformation_features, name="deformation_head")(
            pooled
        )
        attention = jnp.ones((n, in_h // 2, in_w // 2, 1), observations.dtype)
        return style, deformation, attention, crops
