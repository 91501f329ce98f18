"""Loss functions for all three training phases.

JAX re-design of training/losses.py. Differences from the reference:
- Boolean-mask filtering (dynamic shapes) becomes masked means.
- EMA state (FixedMatrixEstimator) is explicit: functions take and return the
  estimator matrix instead of mutating an nn.Parameter.
- Images here live in [0, 1]; the reference feeds (-1, 1)-normalized tensors
  and rescales inside each loss (losses.py:28-29) — same quantity, one fewer
  convention.
"""

from __future__ import annotations

import math
import sys
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

EPS = sys.float_info.epsilon


def masked_mean(
    values: jnp.ndarray, mask: Optional[jnp.ndarray], eps: float = 1e-8
) -> jnp.ndarray:
    """Mean over elements where mask is True (mask broadcast against values)."""
    if mask is None:
        return jnp.mean(values)
    mask = jnp.broadcast_to(mask, values.shape).astype(values.dtype)
    return jnp.sum(values * mask) / (jnp.sum(mask) + eps)


def reconstruction_loss(
    observations: jnp.ndarray, reconstructed: jnp.ndarray
) -> jnp.ndarray:
    """MSE between observations and reconstructions, both in [0, 1].
    Reference: losses.py:13-33."""
    return jnp.mean(jnp.square(observations - reconstructed))


def autoencoder_reconstruction_loss(
    features: jnp.ndarray,
    reconstructed: jnp.ndarray,
    loss_type: str = "l2",
    normalize: bool = True,
) -> jnp.ndarray:
    """Feature-space reconstruction, optionally normalized by the feature
    norm. Reference: losses.py:36-71."""
    if loss_type == "l2":
        norm = jnp.sum(jnp.square(features), axis=-1)
        loss = jnp.sum(jnp.square(features - reconstructed), axis=-1)
    elif loss_type == "l1":
        norm = jnp.sum(jnp.abs(features), axis=-1)
        loss = jnp.sum(jnp.abs(features - reconstructed), axis=-1)
    else:
        raise ValueError(f"unknown loss type {loss_type}")
    if normalize:
        loss = loss / (norm + 1e-8)
    return jnp.mean(loss)


def radial_weight_mask(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """(H, W) weights: 1 at the center fading to 0 at the border (Chebyshev
    distance). Reference: losses.py:572-604."""
    center_h = (height - 1) / 2.0
    center_w = (width - 1) / 2.0
    rows = jnp.abs(jnp.arange(height, dtype=dtype) - center_h)[:, None]
    cols = jnp.abs(jnp.arange(width, dtype=dtype) - center_w)[None, :]
    distances = jnp.maximum(rows, cols)
    lo, hi = jnp.min(distances), jnp.max(distances)
    return 1.0 - (distances - lo) / (hi - lo)


def image_reconstruction_loss(
    observations: jnp.ndarray,
    reconstructed: jnp.ndarray,
    use_radial_weights: bool = False,
) -> jnp.ndarray:
    """Pixel MSE over (..., H, W, C) images, optionally center-weighted.
    Reference: losses.py:74-118 (CHW there, NHWC here)."""
    loss = jnp.square(observations - reconstructed)
    if use_radial_weights:
        h, w = observations.shape[-3], observations.shape[-2]
        mask = radial_weight_mask(h, w, loss.dtype)[..., None]
        loss = jnp.sum(loss * mask, axis=(-3, -2)) / jnp.sum(mask, axis=(-3, -2))
    return jnp.mean(loss)


def ray_object_distance_loss(
    observations: jnp.ndarray,
    reconstructed: jnp.ndarray,
    ray_object_distances: jnp.ndarray,
) -> jnp.ndarray:
    """Reconstruction-error-weighted distance between rays and object centers:
    pulls objects toward rays that render badly. Reference: losses.py:121-146.

    :param observations: (..., 3) per-ray ground truth in [0, 1].
    :param ray_object_distances: (..., objects) squared point-line distances.
    """
    error = jnp.sum(jnp.square(observations - reconstructed), axis=-1)
    return jnp.mean(error[..., None] * ray_object_distances)


def bounding_box_distance_loss(
    bounding_boxes: jnp.ndarray,
    reconstructed_boxes: jnp.ndarray,
    validity: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Squared distance between ground-truth and reconstructed boxes over valid
    detections. Reference: losses.py:149-195.

    :param bounding_boxes: (..., objects, 4); validity (..., objects).
    :return: (scalar mean, (objects,) per-object means).
    """
    sq = jnp.sum(jnp.square(bounding_boxes - reconstructed_boxes), axis=-1)
    mask = validity.astype(sq.dtype)
    axes = tuple(range(sq.ndim - 1))
    per_object = jnp.sum(sq * mask, axis=axes) / (jnp.sum(mask, axis=axes) + 1e-8)
    return jnp.mean(per_object), per_object


def opacity_loss(opacity: jnp.ndarray, validity: jnp.ndarray) -> jnp.ndarray:
    """Mean |opacity| over rays of present objects (encourages transparency).
    Reference: losses.py:198-218.

    :param opacity: (..., rays); validity (...) broadcastable.
    """
    return masked_mean(jnp.abs(opacity), validity[..., None])


def attention_loss(attention: jnp.ndarray, validity: jnp.ndarray) -> jnp.ndarray:
    """Mean attention magnitude over present objects. Reference: losses.py:221-240.

    :param attention: (..., h, w, 1); validity (...).
    """
    return masked_mean(attention, validity[..., None, None, None])


def sharpness_loss(
    opacity: jnp.ndarray,
    validity: jnp.ndarray,
    mean: float = 0.5,
    std: float = 0.15,
) -> jnp.ndarray:
    """Negative-Gaussian-density pressure pushing opacities away from `mean`
    (toward 0 or 1). Reference: losses.py:243-273."""
    var = std ** 2
    density = jnp.exp(-jnp.square(opacity - mean) / (2 * var)) / math.sqrt(
        2 * math.pi * var
    )
    return masked_mean(density, validity[..., None])


# ---------------------------------------------------------------------------
# Distribution losses
# ---------------------------------------------------------------------------


def kl_gaussian(distribution_parameters: jnp.ndarray) -> jnp.ndarray:
    """KL(q || N(0, I)) for (..., 2, dim) (mean, log variance) stacks.
    Reference: losses.py:369-392."""
    mean = distribution_parameters[..., 0, :]
    log_variance = distribution_parameters[..., 1, :]
    kl = 1.0 + log_variance - jnp.square(mean) - jnp.exp(log_variance)
    return -0.5 * jnp.mean(jnp.sum(kl, axis=-1))


def kl_general_gaussian(
    distribution_parameters: jnp.ndarray,
    reference_parameters: jnp.ndarray,
    eps: float = 0.05,
) -> jnp.ndarray:
    """KL(q || p) between diagonal Gaussians, variances stop-gradiented.
    NOTE: q carries (mean, LOG variance) but p carries (mean, VARIANCE) —
    preserved asymmetry of losses.py:395-432.
    """
    mean = distribution_parameters[..., 0, :]
    log_variance = jax.lax.stop_gradient(distribution_parameters[..., 1, :])
    variance = jnp.clip(jnp.exp(log_variance), eps, None)

    ref_mean = reference_parameters[..., 0, :]
    ref_variance = jnp.clip(
        jax.lax.stop_gradient(reference_parameters[..., 1, :]), eps, None
    )
    kl = (
        jnp.log(ref_variance)
        - jnp.log(variance)
        - 1.0
        + variance / ref_variance
        + jnp.square(ref_mean - mean) / ref_variance
    )
    return 0.5 * jnp.mean(jnp.sum(kl, axis=-1))


def spatial_kl_gaussian(distribution_parameters: jnp.ndarray) -> jnp.ndarray:
    """KL to N(0, I) for spatial latents (..., H, W, 2*features): first half of
    the channel axis is mean, second half log variance. Reference:
    losses.py:435-462 (channel-first there)."""
    features = distribution_parameters.shape[-1] // 2
    # The latents may arrive in bfloat16 (compute_dtype); the exp/square and
    # the large spatial reduction want float32.
    distribution_parameters = distribution_parameters.astype(jnp.float32)
    mean = distribution_parameters[..., :features]
    log_variance = distribution_parameters[..., features:]
    kl = 1.0 + log_variance - jnp.square(mean) - jnp.exp(log_variance)
    return -0.5 * jnp.mean(jnp.sum(kl, axis=-1))


def entropy_logits(logits: jnp.ndarray) -> jnp.ndarray:
    """Mean per-sample entropy of softmax(logits). Reference: losses.py:499-516."""
    log_p = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(log_p)
    return jnp.mean(-jnp.sum(p * log_p, axis=-1))


def entropy_probabilities(probabilities: jnp.ndarray) -> jnp.ndarray:
    """Mean per-sample entropy of given probabilities. Reference: losses.py:519-536."""
    return jnp.mean(
        -jnp.sum(probabilities * jnp.log(probabilities + EPS), axis=-1)
    )


# ---------------------------------------------------------------------------
# Mutual information
# ---------------------------------------------------------------------------


def joint_probability_matrix(
    distribution_1: jnp.ndarray, distribution_2: jnp.ndarray
) -> jnp.ndarray:
    """Symmetrized, normalized (dim, dim) joint probability from paired
    categorical samples. Reference: losses.py:305-330."""
    dim = distribution_1.shape[-1]
    d1 = distribution_1.reshape(-1, dim)
    d2 = distribution_2.reshape(-1, dim)
    p = jnp.einsum("bi,bj->ij", d1, d2)
    p = (p + p.T) / 2.0
    return p / jnp.sum(p)


def mutual_information_loss(
    distribution_1: jnp.ndarray,
    distribution_2: jnp.ndarray,
    lamb: float = 1.0,
    smoothing_matrix: Optional[jnp.ndarray] = None,
    smoothing_alpha: float = 0.2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Negative mutual information of the (optionally EMA-smoothed) joint
    probability matrix. Reference: losses.py:300-366 + the
    SmoothMutualInformationLoss subclass (465-496).

    :param smoothing_matrix: previous EMA estimate (dim, dim) or None.
    :return: (loss, updated smoothing matrix to carry in the train state).
    """
    p = joint_probability_matrix(distribution_1, distribution_2)
    if smoothing_matrix is not None:
        p = smoothing_matrix * (1.0 - smoothing_alpha) + p * smoothing_alpha
    new_matrix = jax.lax.stop_gradient(p)

    p = jnp.clip(p, EPS, None)
    marginal_rows = jnp.clip(jnp.sum(p, axis=1, keepdims=True), EPS, None)
    marginal_cols = jnp.clip(jnp.sum(p, axis=0, keepdims=True), EPS, None)
    mi = p * (jnp.log(p) - lamb * jnp.log(marginal_rows) - lamb * jnp.log(marginal_cols))
    return -jnp.sum(mi), new_matrix


# ---------------------------------------------------------------------------
# Consistency losses
# ---------------------------------------------------------------------------


def pose_consistency_loss(
    previous_expected_positions: jnp.ndarray,
    next_expected_positions: jnp.ndarray,
    both_valid: jnp.ndarray,
) -> jnp.ndarray:
    """MSE between optical-flow-matched expected surface positions of
    consecutive frames. Reference: losses.py:773-801.

    :param both_valid: (...) validity of the pair (object present in both).
    """
    sq = jnp.square(previous_expected_positions - next_expected_positions)
    # both_valid is (..., observations-1, cameras); expand over (rays, 3).
    return masked_mean(sq, both_valid[..., None, None])


def keypoint_consistency_loss(
    expected_positions: jnp.ndarray,
    confidence: jnp.ndarray,
    confidence_threshold: float,
) -> jnp.ndarray:
    """Pairwise (over observations) MSE of keypoint-anchored expected 3D
    positions, pairs gated by detection confidence. Reference: losses.py:804-843.

    :param expected_positions: (B, T, C, n, 3); confidence (B, T, C, n).
    """
    a = expected_positions[:, :, None]  # (B, T, 1, C, n, 3)
    b = expected_positions[:, None, :]  # (B, 1, T, C, n, 3)
    sq = jnp.square(a - b)
    conf_a = confidence[:, :, None] >= confidence_threshold
    conf_b = confidence[:, None, :] >= confidence_threshold
    valid = jnp.logical_and(conf_a, conf_b)[..., None]
    return masked_mean(sq, valid)


def keypoint_opacity_loss(
    opacity: jnp.ndarray, confidence: jnp.ndarray, confidence_threshold: float
) -> jnp.ndarray:
    """(1 - opacity)^2 at confident keypoints: rays through keypoints should
    hit the object. Reference: losses.py:846-870."""
    return masked_mean(
        jnp.square(1.0 - opacity), confidence > confidence_threshold
    )


def head_selection_loss(
    head_selection_logits: jnp.ndarray, ground_truth_indexes: jnp.ndarray
) -> jnp.ndarray:
    """Masked cross entropy for multi-head selection (losses.py:539-570):
    rows whose first logit is exactly 0 were outside the bounding box and
    are excluded.

    :param head_selection_logits: (B, ..., heads).
    :param ground_truth_indexes: (B,) int per-sample head index.
    """
    heads = head_selection_logits.shape[-1]
    flat = head_selection_logits.reshape(-1, heads)
    gt = jnp.broadcast_to(
        ground_truth_indexes.reshape(
            (-1,) + (1,) * (head_selection_logits.ndim - 2)
        ),
        head_selection_logits.shape[:-1],
    ).reshape(-1)
    log_probs = jax.nn.log_softmax(flat, axis=-1)
    nll = -jnp.take_along_axis(log_probs, gt[:, None], axis=-1)[:, 0]
    mask = flat[:, 0] != 0.0
    return masked_mean(nll, mask)


def squared_l2_norm_loss(features: jnp.ndarray) -> jnp.ndarray:
    """Mean squared feature norm (..., H, W, F). Reference: losses.py:873-891."""
    return jnp.mean(jnp.sum(jnp.square(features), axis=-1))


# ---------------------------------------------------------------------------
# GAN / action-space losses
# ---------------------------------------------------------------------------


def gan_loss(
    prediction: jnp.ndarray, target_is_real: bool, mode: str = "lsgan"
) -> jnp.ndarray:
    """LSGAN / vanilla GAN objective. Reference: losses.py:894-949."""
    target = 1.0 if target_is_real else 0.0
    if mode == "lsgan":
        return jnp.mean(jnp.square(prediction - target))
    if mode == "vanilla":
        # BCE with logits.
        return jnp.mean(
            jnp.maximum(prediction, 0.0)
            - prediction * target
            + jnp.log1p(jnp.exp(-jnp.abs(prediction)))
        )
    raise ValueError(f"unknown gan mode {mode}")


def camera_relative_movements(
    movements: jnp.ndarray, camera_rotations: jnp.ndarray, rotation_axis: int
) -> jnp.ndarray:
    """Express world-frame object movements relative to the camera by undoing
    the camera's rotation around the ground-normal axis (only that axis — the
    camera tilt is not applied). Reference: playable_model_trainer.py:234-263
    (get_camera_relative_movements; negated rotation = world-to-camera).

    :param movements: (bs, T-1, 3) world-frame movement vectors.
    :param camera_rotations: (bs, T, cameras, 3) euler rotations; exactly one
        camera must be present.
    :param rotation_axis: the axis normal to the ground (2 for tennis).
    """
    from playableenvironments_tpu.core.transforms3d import (
        rotation_x,
        rotation_y,
        rotation_z,
    )

    if camera_rotations.shape[-2] != 1:
        raise ValueError(
            "camera-relative ACMV needs a single camera, got "
            f"{camera_rotations.shape[-2]}"
        )
    if rotation_axis is None:
        raise ValueError("camera-relative ACMV requires acmv_rotation_axis")
    angles = -camera_rotations[:, :-1, 0, rotation_axis]
    matrices = [rotation_x, rotation_y, rotation_z][rotation_axis](angles)
    return jnp.einsum("btij,btj->bti", matrices, movements)


def acmv_loss(
    movements: jnp.ndarray, actions: jnp.ndarray, eps: float = 1e-4
) -> jnp.ndarray:
    """Action-Conditioned Movement Variance: within-action movement variance
    over total movement variance — low when actions explain movement.
    Reference: losses.py:952-1003.

    :param movements: (..., dim); actions (..., actions_count) probabilities.
    """
    m = movements.reshape(-1, movements.shape[-1])
    a = actions.reshape(-1, actions.shape[-1])
    n = m.shape[0]

    action_mass = jnp.sum(a, axis=0)[:, None]  # (actions, 1)
    expected = jnp.einsum("bi,bj->ij", a, m)  # (actions, dim)
    action_means = expected / (action_mass + eps)

    sq = jnp.square(m[:, None, :] - action_means[None])  # (n, actions, dim)
    numerator = jnp.mean(jnp.sum(sq * a[..., None], axis=(0, 1))) / n
    denominator = jnp.mean(jnp.var(m, axis=0))
    return numerator / (denominator + eps)
