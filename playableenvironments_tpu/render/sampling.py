"""Ray sampling strategies over the pixel grid.

Vectorized redesign of the reference's samplers, which loop over scenes in
Python and build index lists on the host (ray_helper.py:611-728 weighted,
236-431 strided patch, 433-582 strided grid). Here everything is batched
index arithmetic + take_along_axis, jit-able end to end.

All samplers share the convention:
  pixel grids are (..., H, W, feat); samples are (..., n, feat);
  returned positions are (..., n, 2) normalized (row, col) in [0, 1).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from playableenvironments_tpu.core.rays import _batched_searchsorted


def build_weight_image(
    bounding_boxes: jnp.ndarray,
    weights: Sequence[float],
    height: int,
    width: int,
) -> jnp.ndarray:
    """Per-pixel sampling weights: each object adds weight/area uniformly over
    its (pixel-aligned) box. Reference: ray_helper.py:663-686.

    :param bounding_boxes: (..., objects, 4) normalized (l, t, r, b).
    :param weights: per-object scalar weights.
    :return: (..., height, width) weight image.
    """
    w = jnp.asarray(weights, bounding_boxes.dtype)
    left = jnp.floor(bounding_boxes[..., 0] * width)
    right = jnp.ceil(bounding_boxes[..., 2] * width)
    top = jnp.floor(bounding_boxes[..., 1] * height)
    bottom = jnp.ceil(bounding_boxes[..., 3] * height)
    area = jnp.clip((right - left) * (bottom - top), 1.0, None)

    rows = jnp.arange(height, dtype=bounding_boxes.dtype)[:, None]
    cols = jnp.arange(width, dtype=bounding_boxes.dtype)[None, :]
    # (..., objects, H, W)
    inside = (
        (rows >= top[..., None, None])
        & (rows < bottom[..., None, None])
        & (cols >= left[..., None, None])
        & (cols < right[..., None, None])
    )
    contributions = inside * (w / area)[..., None, None]
    return jnp.sum(contributions, axis=-3)


def sample_indices_from_weights(
    key: jax.Array, weight_image: jnp.ndarray, samples: int
) -> jnp.ndarray:
    """Inverse-CDF sampling of flat pixel indices from a weight image.

    :param weight_image: (..., H, W).
    :return: (..., samples) int32 flat indices into H*W.
    """
    flat = weight_image.reshape(weight_image.shape[:-2] + (-1,))
    # All-zero weight images (every box degenerate/off-screen for a frame)
    # fall back to uniform sampling instead of a NaN CDF that would silently
    # collapse every sample onto one corner pixel.
    total = jnp.sum(flat, axis=-1, keepdims=True)
    flat = jnp.where(total > 0, flat, 1.0)
    cdf = jnp.cumsum(flat / jnp.sum(flat, axis=-1, keepdims=True), axis=-1)
    u = jax.random.uniform(key, cdf.shape[:-1] + (samples,), dtype=cdf.dtype)
    idx = _batched_searchsorted(cdf, u, side="left")
    return jnp.clip(idx, 0, flat.shape[-1] - 1)


def gather_pixels(grid: jnp.ndarray, flat_indices: jnp.ndarray) -> jnp.ndarray:
    """Gather (..., H, W, F) at (..., n) flat pixel indices -> (..., n, F)."""
    h, w, f = grid.shape[-3], grid.shape[-2], grid.shape[-1]
    flat = grid.reshape(grid.shape[:-3] + (h * w, f))
    return jnp.take_along_axis(flat, flat_indices[..., None], axis=-2)


def indices_to_positions(
    flat_indices: jnp.ndarray, height: int, width: int
) -> jnp.ndarray:
    """Flat indices -> (..., 2) normalized (row, col).
    Reference: ray_helper.py:1156-1177."""
    rows = (flat_indices // width).astype(jnp.float32) / height
    cols = (flat_indices % width).astype(jnp.float32) / width
    return jnp.stack([rows, cols], axis=-1)


def sample_rays_uniform(
    key: jax.Array,
    ray_directions: jnp.ndarray,
    observations: jnp.ndarray,
    samples: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Uniformly sample pixel rays (without the reference's
    without-replacement permutation — with typical sample counts << H*W the
    distinction is immaterial). Reference: ray_helper.py:730-795.

    :param ray_directions: (..., H, W, 3); observations (..., H, W, 3).
    :return: ((..., n, 3) directions, (..., n, 3) observations, (..., n, 2) positions).
    """
    h, w = ray_directions.shape[-3], ray_directions.shape[-2]
    batch_shape = ray_directions.shape[:-3]
    idx = jax.random.randint(key, batch_shape + (samples,), 0, h * w)
    return (
        gather_pixels(ray_directions, idx),
        gather_pixels(observations, idx),
        indices_to_positions(idx, h, w),
    )


def sample_rays_weighted(
    key: jax.Array,
    ray_directions: jnp.ndarray,
    observations: jnp.ndarray,
    samples: int,
    bounding_boxes: jnp.ndarray,
    weights: Sequence[float],
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Object-box-weighted ray sampling. Reference: ray_helper.py:611-728.

    :param bounding_boxes: (..., objects, 4) normalized (l, t, r, b).
    """
    h, w = ray_directions.shape[-3], ray_directions.shape[-2]
    weight_image = build_weight_image(bounding_boxes, weights, h, w)
    idx = sample_indices_from_weights(key, weight_image, samples)
    return (
        gather_pixels(ray_directions, idx),
        gather_pixels(observations, idx),
        indices_to_positions(idx, h, w),
    )


def _align_start(start: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Move `start` to the nearest value congruent to stride//2 (mod stride),
    going down when possible. Closed form of ray_helper.py:345-363's
    backward/forward maps."""
    half = stride // 2
    delta_down = jnp.mod(start - half, stride)
    delta_up = jnp.mod(half - start, stride)
    return jnp.where(start >= half, start - delta_down, start + delta_up)


def strided_patch_sizes(patch_size: int, strides: Sequence[int]) -> List[int]:
    """Per-stride patch side lengths: the patch covers the same image region at
    every stride, so sizes scale inversely. Reference: ray_helper.py:282-286."""
    smallest = strides[0]
    sizes = []
    for s in strides:
        if (patch_size * smallest) % s != 0:
            raise ValueError(f"patch_size {patch_size} incompatible with stride {s}")
        sizes.append((patch_size * smallest) // s)
    return sizes


def sample_rays_strided_patch(
    key: jax.Array,
    ray_directions: jnp.ndarray,
    observations: jnp.ndarray,
    patch_size: int,
    strides: Union[int, Sequence[int]],
    bounding_boxes: jnp.ndarray,
    weights: Sequence[float],
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sample one grid-aligned multi-resolution patch per image.

    A patch center is drawn from the object-weighted distribution; for each
    stride s, a (patch_size_s x patch_size_s) grid of rays is taken with its
    points at the centers of (s x s) pixel cells ("align_grid" semantics —
    the only mode the reference trainers use, ray_helper.py:270-272). Samples
    for all strides are concatenated along the sample axis, smallest stride
    first. Reference: ray_helper.py:236-431.

    :return: ((..., sum(ps_i^2), 3) directions, observations, (..., sum, 2)
             positions).
    """
    if isinstance(strides, int):
        strides = [strides]
    if patch_size % 2 != 0:
        raise ValueError("patch_size must be even")
    patch_sizes = strided_patch_sizes(patch_size, strides)
    biggest_stride = strides[-1]
    biggest_patch = patch_sizes[-1]

    h, w = ray_directions.shape[-3], ray_directions.shape[-2]
    weight_image = build_weight_image(bounding_boxes, weights, h, w)
    center_idx = sample_indices_from_weights(key, weight_image, 1)[..., 0]
    center_row = center_idx // w
    center_col = center_idx % w

    # Keep the whole biggest-stride patch inside the image
    # (ray_helper.py:377-381).
    half = biggest_patch // 2
    center_row = jnp.clip(
        center_row, half * biggest_stride, h - biggest_stride * (half - 1) - 1
    )
    center_col = jnp.clip(
        center_col, half * biggest_stride, w - biggest_stride * (half - 1) - 1
    )
    start_row = _align_start(center_row - half * biggest_stride, biggest_stride)
    start_col = _align_start(center_col - half * biggest_stride, biggest_stride)

    all_indices = []
    for stride, p in zip(strides, patch_sizes):
        offset = biggest_stride // 2 - stride // 2
        r0 = start_row - offset
        c0 = start_col - offset
        steps = jnp.arange(p) * stride
        rows = r0[..., None, None] + steps[:, None]  # (..., p, 1)
        cols = c0[..., None, None] + steps[None, :]  # (..., 1, p)
        flat = (rows * w + cols).reshape(r0.shape + (p * p,))
        all_indices.append(flat)
    idx = jnp.concatenate(all_indices, axis=-1)

    return (
        gather_pixels(ray_directions, idx),
        gather_pixels(observations, idx),
        indices_to_positions(idx, h, w),
    )


def sample_all_rays_strided_grid(
    ray_directions: jnp.ndarray,
    observations: jnp.ndarray,
    strides: Union[int, Sequence[int]],
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Whole-image strided grids (full-frame rendering): for each stride s,
    the center pixel of every (s x s) cell, flattened and concatenated.
    Reference: ray_helper.py:433-482, 533-582.
    """
    if isinstance(strides, int):
        strides = [strides]
    h, w = ray_directions.shape[-3], ray_directions.shape[-2]

    all_dirs, all_obs, all_pos = [], [], []
    for stride in strides:
        if h % stride or w % stride:
            raise ValueError(f"image size ({h}, {w}) not divisible by stride {stride}")
        off = stride // 2
        dirs = ray_directions[..., off::stride, off::stride, :]
        obs = observations[..., off::stride, off::stride, :]
        gh, gw = h // stride, w // stride
        rows = (jnp.arange(gh) * stride + off) / h
        cols = (jnp.arange(gw) * stride + off) / w
        pos = jnp.stack(
            jnp.broadcast_arrays(rows[:, None], cols[None, :]), axis=-1
        )
        pos = jnp.broadcast_to(pos, dirs.shape[:-1] + (2,))
        all_dirs.append(dirs.reshape(dirs.shape[:-3] + (gh * gw, 3)))
        all_obs.append(obs.reshape(obs.shape[:-3] + (gh * gw, 3)))
        all_pos.append(pos.reshape(pos.shape[:-3] + (gh * gw, 2)))

    return (
        jnp.concatenate(all_dirs, axis=-2),
        jnp.concatenate(all_obs, axis=-2),
        jnp.concatenate(all_pos, axis=-2),
    )


def split_strided_samples(
    samples: jnp.ndarray, patch_size: int, strides: Sequence[int]
) -> List[jnp.ndarray]:
    """Split concatenated strided-patch samples back into per-stride chunks.
    Reference: ray_helper.py:207-234."""
    sizes = strided_patch_sizes(patch_size, strides)
    out, begin = [], 0
    for p in sizes:
        out.append(samples[..., begin : begin + p * p, :])
        begin += p * p
    return out


def samples_to_patch(samples: jnp.ndarray) -> jnp.ndarray:
    """(..., p^2, F) -> (..., p, p, F) square patch (row-major). NHWC variant
    of ray_helper.py:185-204 (which emits CHW)."""
    p2, f = samples.shape[-2], samples.shape[-1]
    p = int(round(p2 ** 0.5))
    if p * p != p2:
        raise ValueError(f"sample count {p2} is not a square")
    return samples.reshape(samples.shape[:-2] + (p, p, f))


def crop_region_from_patch_positions(
    images: jnp.ndarray,
    patch_positions: jnp.ndarray,
    patch_size: int,
    stride: int,
) -> jnp.ndarray:
    """Crop the pixel region covered by a strided patch from full images.

    The patch's finest-stride samples sit at the centers of (stride x stride)
    cells; the covered region starts stride//2 pixels before the first sample
    and spans patch_size * stride pixels. Reference: ray_helper.py:1092-1155
    (sample_original_region_from_patch_samples).

    :param images: (..., H, W, C).
    :param patch_positions: (..., n, 2) normalized (row, col) sample positions
        for the finest stride (first patch_size^2 samples are used).
    :param patch_size: finest-stride patch side length.
    :param stride: finest stride.
    :return: (..., patch_size * stride, patch_size * stride, C) crops.
    """
    h, w = images.shape[-3], images.shape[-2]
    first = patch_positions[..., 0, :]  # (..., 2) first sample position
    start_row = (first[..., 0] * h).astype(jnp.int32) - stride // 2
    start_col = (first[..., 1] * w).astype(jnp.int32) - stride // 2
    size = patch_size * stride
    start_row = jnp.clip(start_row, 0, h - size)
    start_col = jnp.clip(start_col, 0, w - size)

    flat_images = images.reshape((-1,) + images.shape[-3:])
    flat_rows = start_row.reshape(-1)
    flat_cols = start_col.reshape(-1)

    def crop_one(img, r, c):
        return jax.lax.dynamic_slice(
            img, (r, c, 0), (size, size, img.shape[-1])
        )

    crops = jax.vmap(crop_one)(flat_images, flat_rows, flat_cols)
    return crops.reshape(images.shape[:-3] + crops.shape[1:])


def split_strided_grid_samples(
    samples: jnp.ndarray,
    strides: Sequence[int],
    image_size: Tuple[int, int],
    axis: int = -2,
) -> List[jnp.ndarray]:
    """Fold the concatenated output of `sample_all_rays_strided_grid` back into
    rectangular (..., H/s, W/s, F) grids. Reference: ray_helper.py:484-531."""
    h, w = image_size
    axis = axis % samples.ndim
    out, begin = [], 0
    for stride in strides:
        gh, gw = h // stride, w // stride
        count = gh * gw
        sl = [slice(None)] * samples.ndim
        sl[axis] = slice(begin, begin + count)
        chunk = samples[tuple(sl)]
        new_shape = chunk.shape[:axis] + (gh, gw) + chunk.shape[axis + 1 :]
        out.append(chunk.reshape(new_shape))
        begin += count
    return out


# ---------------------------------------------------------------------------
# Continuous-position sampling (grid_sample equivalents) and the consistency
# samplers built on it.
# ---------------------------------------------------------------------------

# COCO skeleton edges used to draw keypoint-anchored samples
# (ray_helper.py:815-832).
COCO_SEGMENTS = (
    (0, 11), (0, 12), (5, 6), (5, 7), (5, 11), (5, 12), (6, 8), (6, 11),
    (6, 12), (7, 9), (8, 10), (11, 12), (11, 13), (12, 14), (13, 15),
    (14, 16),
)


def sample_at_positions(
    grid: jnp.ndarray, positions: jnp.ndarray, align_corners: bool = True
) -> jnp.ndarray:
    """Bilinear sampling of a pixel grid at continuous normalized positions
    (the reference's F.grid_sample path, ray_helper.py:1014-1090).

    :param grid: (..., H, W, F).
    :param positions: (..., n, 2) normalized (row, col) in [0, 1].
    :param align_corners: True maps 0 -> first and 1 -> last pixel center
        (the convention used for ray-direction grids).
    :return: (..., n, F) bilinear samples.
    """
    h, w = grid.shape[-3], grid.shape[-2]
    if align_corners:
        r = positions[..., 0] * (h - 1)
        c = positions[..., 1] * (w - 1)
    else:
        r = positions[..., 0] * h - 0.5
        c = positions[..., 1] * w - 0.5
    r = jnp.clip(r, 0.0, h - 1)
    c = jnp.clip(c, 0.0, w - 1)
    r0 = jnp.clip(jnp.floor(r).astype(jnp.int32), 0, h - 1)
    c0 = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, w - 1)
    r1 = jnp.minimum(r0 + 1, h - 1)
    c1 = jnp.minimum(c0 + 1, w - 1)
    wr = (r - r0)[..., None]
    wc = (c - c0)[..., None]

    flat = grid.reshape(grid.shape[:-3] + (h * w, grid.shape[-1]))

    def take(rr, cc):
        idx = rr * w + cc
        return jnp.take_along_axis(flat, idx[..., None], axis=-2)

    top = take(r0, c0) * (1 - wc) + take(r0, c1) * wc
    bottom = take(r1, c0) * (1 - wc) + take(r1, c1) * wc
    return top * (1 - wr) + bottom * wr


def sample_rays_at_object(
    key: jax.Array,
    ray_directions: jnp.ndarray,
    feature_images: jnp.ndarray,
    samples_per_image: int,
    bounding_box: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sample rays uniformly inside an object's 2D box, paired with the
    feature image values at the sampled pixels (ray_helper.py:910-1012 —
    there a per-scene Python CDF loop; here one batched inverse-CDF draw).

    :param ray_directions: (..., H, W, 3).
    :param feature_images: (..., H, W, F) (e.g. optical flow).
    :param bounding_box: (..., 4) normalized ltrb.
    :return: (directions (..., n, 3), features (..., n, F),
        positions (..., n, 2) normalized (row, col)).
    """
    h, w = ray_directions.shape[-3], ray_directions.shape[-2]
    weight_image = build_weight_image(
        bounding_box[..., None, :], [1.0], h, w
    )
    # Degenerate (zero-area) boxes fall back to uniform sampling — handled
    # inside sample_indices_from_weights.
    idx = sample_indices_from_weights(key, weight_image, samples_per_image)
    positions = indices_to_positions(idx, h, w)

    flat_dirs = ray_directions.reshape(
        ray_directions.shape[:-3] + (h * w, 3)
    )
    directions = jnp.take_along_axis(flat_dirs, idx[..., None], axis=-2)
    flat_feats = feature_images.reshape(
        feature_images.shape[:-3] + (h * w, feature_images.shape[-1])
    )
    features = jnp.take_along_axis(flat_feats, idx[..., None], axis=-2)
    return directions, features, positions


def sample_rays_at_keypoints(
    key: jax.Array,
    ray_directions: jnp.ndarray,
    keypoints: jnp.ndarray,
    max_samples_per_image: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sample rays along the COCO skeleton drawn by 2D keypoints
    (ray_helper.py:797-908): each sample sits at a random fraction along a
    skeleton segment, with the SAME fraction reused across the observation
    and camera axes of a sequence so the sampled body point corresponds.

    :param ray_directions: (..., T, C, H, W, 3).
    :param keypoints: (..., T, C, K, 3) normalized (row, col, confidence).
    :return: (directions (..., T, C, n, 3), positions (..., T, C, n, 2),
        confidences (..., T, C, n)).
    """
    segments = jnp.asarray(COCO_SEGMENTS)
    begins = keypoints[..., segments[:, 0], :]  # (..., T, C, S, 3)
    ends = keypoints[..., segments[:, 1], :]

    n_segments = len(COCO_SEGMENTS)
    reps = -(-max_samples_per_image // n_segments)
    begins = jnp.tile(begins, (1,) * (begins.ndim - 2) + (reps, 1))[
        ..., :max_samples_per_image, :
    ]
    ends = jnp.tile(ends, (1,) * (ends.ndim - 2) + (reps, 1))[
        ..., :max_samples_per_image, :
    ]

    # One fraction per (sequence, sample): shared over T and C axes.
    lead = keypoints.shape[:-4]
    fractions = jax.random.uniform(
        key, lead + (1, 1, max_samples_per_image, 1), dtype=keypoints.dtype
    )
    points = begins + (ends - begins) * fractions  # (..., T, C, n, 3)
    positions = points[..., :2]
    confidences = points[..., 2]

    directions = sample_at_positions(ray_directions, positions)
    return directions, positions, confidences


def insert_samples_into_features(
    features: jnp.ndarray,
    samples: jnp.ndarray,
    sample_positions: jnp.ndarray,
    original_image_size: Tuple[int, int],
) -> jnp.ndarray:
    """Scatter rendered NeRF samples into an encoder feature grid at their
    pixel positions (environment_model_backpropagated_autoencoder.py:247-302
    — NHWC here, and unlike the reference's in-place scatter the functional
    `.at[].set` has exact gradients also under index collisions).

    :param features: (..., h, w, F) feature grid (resolution = image / k).
    :param samples: (..., n, F) rendered feature samples.
    :param sample_positions: (..., n, 2) normalized (row, col) positions in
        the ORIGINAL image.
    :param original_image_size: (H, W) original image size; must be an
        integer multiple of the feature grid size.
    :return: (..., h, w, F) grid with samples written at their cells.
    """
    h, w, f = features.shape[-3], features.shape[-2], features.shape[-1]
    height, width = original_image_size
    if height % h or width // (height // h) != w:
        raise ValueError(
            f"feature grid {(h, w)} does not evenly divide image "
            f"{original_image_size}"
        )
    factor = height // h

    flat_features = features.reshape((-1, h * w, f))
    flat_samples = samples.reshape((-1,) + samples.shape[-2:])
    flat_positions = sample_positions.reshape((-1,) + sample_positions.shape[-2:])

    rows = jnp.floor(
        jnp.round(flat_positions[..., 0] * height) / factor
    ).astype(jnp.int32)
    cols = jnp.floor(
        jnp.round(flat_positions[..., 1] * width) / factor
    ).astype(jnp.int32)
    rows = jnp.clip(rows, 0, h - 1)
    cols = jnp.clip(cols, 0, w - 1)
    idx = rows * w + cols  # (L, n)

    batch_idx = jnp.arange(flat_features.shape[0])[:, None]
    mixed = flat_features.at[batch_idx, idx].set(flat_samples)
    return mixed.reshape(features.shape)
