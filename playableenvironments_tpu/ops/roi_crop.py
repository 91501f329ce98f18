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


def _interp_weights(positions: jnp.ndarray, in_size: int) -> jnp.ndarray:
    """Dense bilinear interpolation matrix: W[..., i, s] = tent(|p_i - s|),
    positions clamped to [0, in_size-1] (same edge semantics as clipped
    corner-gather bilinear sampling; rows sum to 1).

    :param positions: (..., out) fractional source coordinates.
    :return: (..., out, in_size) interpolation matrix.
    """
    p = jnp.clip(positions, 0.0, in_size - 1.0)[..., None]
    s = jnp.arange(in_size, dtype=positions.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(p - s))


def crop_and_resize(
    images: jnp.ndarray, boxes: jnp.ndarray, out_size: Tuple[int, int]
) -> jnp.ndarray:
    """Crop each image to its box and resize to a fixed grid.

    Bilinear sampling is separable, so each crop is two dense interpolation
    matmuls (rows then columns) instead of 4 corner gathers — gathers with 2D
    index arrays are the slowest op class on TPU (~35 ms/step at the published
    training scale vs microseconds on the MXU).

    :param images: (N, H, W, C).
    :param boxes: (N, 4) pixel-space (left, top, right, bottom).
    :param out_size: (out_h, out_w).
    :return: (N, out_h, out_w, C) bilinear crops.
    """
    out_h, out_w = out_size
    h, w = images.shape[1], images.shape[2]
    left, top, right, bottom = (boxes[:, i] for i in range(4))

    # Sample at bin centers across the box extent.
    iy = (jnp.arange(out_h, dtype=boxes.dtype) + 0.5) / out_h
    ix = (jnp.arange(out_w, dtype=boxes.dtype) + 0.5) / out_w
    ys = top[:, None] + iy * (bottom - top)[:, None] - 0.5  # (N, out_h)
    xs = left[:, None] + ix * (right - left)[:, None] - 0.5  # (N, out_w)

    wy = _interp_weights(ys, h)  # (N, out_h, H)
    wx = _interp_weights(xs, w)  # (N, out_w, W)
    rows = jnp.einsum("nhH,nHWc->nhWc", wy, images)
    return jnp.einsum("nwW,nhWc->nhwc", wx, rows)


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
