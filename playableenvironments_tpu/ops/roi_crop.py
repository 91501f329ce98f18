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


def roi_pool(
    images: jnp.ndarray, boxes: jnp.ndarray, out_size: Tuple[int, int]
) -> jnp.ndarray:
    """Exact twin of `torchvision.ops.roi_pool` (spatial_scale=1): quantized
    ROI bins, MAX over the pixels of each bin, 0 for empty bins.

    The reference trains its object encoders on roi_pool crops
    (object_encoder_v4.py:130, object_encoder_v5.py:132), so imported
    checkpoints reproduce reference latents bit-for-bit only under these
    semantics — `ObjectEncoderConfig.crop_mode: roi_pool` selects this path
    (oracle-tested in tests/test_reference_parity.py). For training from
    scratch the default bilinear `crop_and_resize` is smoother and fully
    differentiable.

    TPU formulation: max pooling over a rectangular window is separable, so
    each crop is two dense masked row/column maxes (VPU-friendly, static
    shapes) instead of the reference kernel's per-bin scalar loops.
    Semantics follow torchvision's roi_pool_kernel: integer bin boundaries
    floor/ceil of ph*bin_size offset by round(coord), windows clamped to the
    image, roi sizes floored at 1 (+1 inclusive box convention).

    :param images: (N, H, W, C).
    :param boxes: (N, 4) pixel-space (left, top, right, bottom).
    :param out_size: (out_h, out_w).
    :return: (N, out_h, out_w, C) max-pooled crops.
    """
    out_h, out_w = out_size
    h, w = images.shape[1], images.shape[2]
    dtype = images.dtype

    # std::round for the non-negative coords these boxes carry.
    start_w = jnp.floor(boxes[:, 0] + 0.5)
    start_h = jnp.floor(boxes[:, 1] + 0.5)
    end_w = jnp.floor(boxes[:, 2] + 0.5)
    end_h = jnp.floor(boxes[:, 3] + 0.5)
    roi_w = jnp.maximum(end_w - start_w + 1.0, 1.0)
    roi_h = jnp.maximum(end_h - start_h + 1.0, 1.0)
    bin_h = roi_h / out_h  # (N,)
    bin_w = roi_w / out_w

    ph = jnp.arange(out_h, dtype=boxes.dtype)
    pw = jnp.arange(out_w, dtype=boxes.dtype)
    hstart = jnp.clip(
        jnp.floor(ph[None] * bin_h[:, None]) + start_h[:, None], 0, h
    )  # (N, out_h)
    hend = jnp.clip(
        jnp.ceil((ph[None] + 1.0) * bin_h[:, None]) + start_h[:, None], 0, h
    )
    wstart = jnp.clip(
        jnp.floor(pw[None] * bin_w[:, None]) + start_w[:, None], 0, w
    )  # (N, out_w)
    wend = jnp.clip(
        jnp.ceil((pw[None] + 1.0) * bin_w[:, None]) + start_w[:, None], 0, w
    )

    ys = jnp.arange(h, dtype=boxes.dtype)
    xs = jnp.arange(w, dtype=boxes.dtype)
    mask_h = (ys >= hstart[..., None]) & (ys < hend[..., None])  # (N, out_h, H)
    mask_w = (xs >= wstart[..., None]) & (xs < wend[..., None])  # (N, out_w, W)

    neg_inf = jnp.asarray(-jnp.inf, dtype)
    # (N, out_h, H, W, C) -> max over H
    rows = jnp.max(
        jnp.where(mask_h[..., None, None], images[:, None], neg_inf), axis=2
    )  # (N, out_h, W, C)
    out = jnp.max(
        jnp.where(mask_w[:, None, :, :, None], rows[:, :, None], neg_inf),
        axis=3,
    )  # (N, out_h, out_w, C)

    empty = (hend <= hstart)[:, :, None] | (wend <= wstart)[:, None, :]
    return jnp.where(empty[..., None], jnp.zeros((), dtype), out)


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
