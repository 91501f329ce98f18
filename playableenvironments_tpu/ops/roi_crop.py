"""Fixed-size bilinear box crops.

TPU-native replacement for `torchvision.ops.roi_pool` as used by the object
encoders (model/object_encoder_v4.py:130, object_parameters_encoder_v4.py:145):
the reference max-pools variable-size ROIs into a fixed grid; here each ROI is
bilinearly resampled onto a fixed grid (roi_align-style) — a dense gather with
static shapes, differentiable, and vmap-friendly. The consumers only need a
fixed-size, content-aligned crop, not max-pool semantics.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _bilinear_sample(image: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Sample image (H, W, C) at fractional pixel centers (h, w) grids."""
    h, w = image.shape[0], image.shape[1]
    y0 = jnp.clip(jnp.floor(ys), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)[..., None]
    wx = jnp.clip(xs - x0, 0.0, 1.0)[..., None]
    y0i, y1i, x0i, x1i = y0.astype(int), y1.astype(int), x0.astype(int), x1.astype(int)

    top = image[y0i, x0i] * (1 - wx) + image[y0i, x1i] * wx
    bottom = image[y1i, x0i] * (1 - wx) + image[y1i, x1i] * wx
    return top * (1 - wy) + bottom * wy


def crop_and_resize(
    images: jnp.ndarray, boxes: jnp.ndarray, out_size: Tuple[int, int]
) -> jnp.ndarray:
    """Crop each image to its box and resize to a fixed grid.

    :param images: (N, H, W, C).
    :param boxes: (N, 4) pixel-space (left, top, right, bottom).
    :param out_size: (out_h, out_w).
    :return: (N, out_h, out_w, C) bilinear crops.
    """
    out_h, out_w = out_size

    def crop_one(image, box):
        left, top, right, bottom = box[0], box[1], box[2], box[3]
        # Sample at bin centers across the box extent.
        ys = top + (jnp.arange(out_h) + 0.5) / out_h * (bottom - top) - 0.5
        xs = left + (jnp.arange(out_w) + 0.5) / out_w * (right - left) - 0.5
        grid_y = jnp.broadcast_to(ys[:, None], (out_h, out_w))
        grid_x = jnp.broadcast_to(xs[None, :], (out_h, out_w))
        return _bilinear_sample(image, grid_y, grid_x)

    return jax.vmap(crop_one)(images, boxes)


def expand_boxes(
    boxes: jnp.ndarray, expansion_rows: float, expansion_cols: float
) -> jnp.ndarray:
    """Expand normalized (l, t, r, b) boxes sideways and upward (never down,
    keeping feet anchored), clamped to [0, 1].
    Reference: object_encoder_v4.py:61-78."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    expanded = jnp.stack(
        [
            boxes[..., 0] - w * expansion_cols,
            boxes[..., 1] - h * expansion_rows,
            boxes[..., 2] + w * expansion_cols,
            boxes[..., 3],
        ],
        axis=-1,
    )
    return jnp.clip(expanded, 0.0, 1.0)
