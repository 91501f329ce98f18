"""Quality metrics in JAX: MSE, motion-masked MSE, PSNR, SSIM, Fréchet
distances, detection matching, and action-space diagnostics.

Replaces evaluation/metrics/: mse.py, motion_masked_mse.py, psnr.py, ssim.py
(skimage there), fid.py's statistics core, action_variance.py,
action_classification_score.py (sklearn probe), detection_metric_2d.py.
Images are NHWC float in [0, 1].
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Per-pair MSE over (..., H, W, C) -> (...)."""
    return jnp.mean(jnp.square(a - b), axis=(-3, -2, -1))


def motion_mask(frames: jnp.ndarray, threshold: float = 0.05) -> jnp.ndarray:
    """Boolean mask of pixels that move across a (T, H, W, C) sequence:
    deviation from the temporal median above threshold in any channel.
    Reference: evaluation/metrics/motion_masked_mse.py's MotionMaskCalculator."""
    median = jnp.median(frames, axis=0, keepdims=True)
    deviation = jnp.max(jnp.abs(frames - median), axis=-1)  # (T, H, W)
    return jnp.max(deviation, axis=0) > threshold  # (H, W)


def motion_masked_mse(
    reference: jnp.ndarray, generated: jnp.ndarray, threshold: float = 0.05
) -> jnp.ndarray:
    """MSE restricted to moving pixels of the reference sequence.

    :param reference, generated: (T, H, W, C) aligned sequences.
    """
    mask = motion_mask(reference, threshold)[None, ..., None]
    sq = jnp.square(reference - generated) * mask
    return jnp.sum(sq) / jnp.clip(jnp.sum(mask) * reference.shape[0] * reference.shape[-1], 1, None)


def psnr(a: jnp.ndarray, b: jnp.ndarray, max_value: float = 1.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio over (..., H, W, C) -> (...) dB."""
    err = jnp.clip(mse(a, b), 1e-10, None)
    return 10.0 * jnp.log10(max_value ** 2 / err)


def _gaussian_kernel(size: int, sigma: float) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * jnp.square(x / sigma))
    return g / jnp.sum(g)


def ssim(
    a: jnp.ndarray,
    b: jnp.ndarray,
    max_value: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Structural similarity (Wang et al. 2004, Gaussian-windowed, the
    skimage/reference-compatible formulation) over (..., H, W, C) -> (...).
    """
    c1 = (k1 * max_value) ** 2
    c2 = (k2 * max_value) ** 2
    kernel = _gaussian_kernel(kernel_size, sigma)

    def blur(x):
        # Separable Gaussian over H then W; channels/batch via vectorized conv.
        x = jnp.apply_along_axis(
            lambda v: jnp.convolve(v, kernel, mode="valid"), -3, x
        )
        x = jnp.apply_along_axis(
            lambda v: jnp.convolve(v, kernel, mode="valid"), -2, x
        )
        return x

    mu_a, mu_b = blur(a), blur(b)
    mu_a2, mu_b2, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    sigma_a2 = blur(a * a) - mu_a2
    sigma_b2 = blur(b * b) - mu_b2
    sigma_ab = blur(a * b) - mu_ab

    numerator = (2 * mu_ab + c1) * (2 * sigma_ab + c2)
    denominator = (mu_a2 + mu_b2 + c1) * (sigma_a2 + sigma_b2 + c2)
    return jnp.mean(numerator / denominator, axis=(-3, -2, -1))


# ---------------------------------------------------------------------------
# Fréchet distances (FID / FVD core)
# ---------------------------------------------------------------------------


class FeatureStatistics:
    """Streaming mean/covariance accumulator for Fréchet metrics
    (evaluation/metrics/fid.py's IncrementalFID bookkeeping)."""

    def __init__(self, features_count: int):
        self.n = 0
        self.sum = np.zeros(features_count, np.float64)
        self.outer = np.zeros((features_count, features_count), np.float64)

    def update(self, features: np.ndarray):
        """:param features: (N, F) batch of embeddings."""
        features = np.asarray(features, np.float64)
        self.n += features.shape[0]
        self.sum += features.sum(axis=0)
        self.outer += features.T @ features

    def finalize(self) -> Tuple[np.ndarray, np.ndarray]:
        if self.n < 2:
            raise ValueError(
                f"need at least 2 samples for a covariance estimate, got {self.n}"
            )
        mean = self.sum / self.n
        cov = self.outer / (self.n - 1) - np.outer(mean, mean) * self.n / (self.n - 1)
        return mean, cov


def frechet_distance(
    mean_a: np.ndarray, cov_a: np.ndarray, mean_b: np.ndarray, cov_b: np.ndarray,
    eps: float = 1e-6,
) -> float:
    """Fréchet distance between two Gaussians (the FID/FVD formula)."""
    import scipy.linalg

    if not (np.isfinite(cov_a).all() and np.isfinite(cov_b).all()
            and np.isfinite(mean_a).all() and np.isfinite(mean_b).all()):
        # sqrtm on non-finite matrices can take near-unbounded time.
        return float("nan")
    diff = mean_a - mean_b
    # eps*I jitter up front: sample covariances from few frames are often
    # singular and sqrtm on them emits LinAlgWarning / returns non-finite.
    offset = np.eye(cov_a.shape[0]) * eps
    covmean = scipy.linalg.sqrtm((cov_a + offset) @ (cov_b + offset))
    if not np.isfinite(covmean).all():
        covmean = scipy.linalg.sqrtm(
            (cov_a + offset * 1e3) @ (cov_b + offset * 1e3)
        )
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    value = float(
        diff @ diff + np.trace(cov_a) + np.trace(cov_b) - 2 * np.trace(covmean)
    )
    # The distance is nonnegative by definition; the eps jitter can push
    # near-identical distributions a hair below zero (-2*eps*dim).
    return max(value, 0.0)


def frechet_from_features(features_a: np.ndarray, features_b: np.ndarray) -> float:
    sa = FeatureStatistics(features_a.shape[1])
    sa.update(features_a)
    sb = FeatureStatistics(features_b.shape[1])
    sb.update(features_b)
    return frechet_distance(*sa.finalize(), *sb.finalize())


# ---------------------------------------------------------------------------
# Detection metrics (MDR / ADD)
# ---------------------------------------------------------------------------


def greedy_box_matching(
    reference_centers: np.ndarray, detected_centers: np.ndarray
) -> List[Tuple[int, int, float]]:
    """Greedy nearest-center matching between reference and detected boxes.
    Reference: evaluation/reconstructed_dataset_evaluator.py:160-228.

    :param reference_centers: (R, 2); detected_centers (D, 2), both normalized.
    :return: list of (ref_idx, det_idx, distance) matches (each used once).
    """
    matches = []
    used_ref, used_det = set(), set()
    if len(reference_centers) == 0 or len(detected_centers) == 0:
        return matches
    distances = np.linalg.norm(
        reference_centers[:, None, :] - detected_centers[None, :, :], axis=-1
    )
    order = np.dstack(np.unravel_index(np.argsort(distances, axis=None), distances.shape))[0]
    for r, d in order:
        if r in used_ref or d in used_det:
            continue
        used_ref.add(int(r))
        used_det.add(int(d))
        matches.append((int(r), int(d), float(distances[r, d])))
    return matches


class DetectionScore:
    """Missed detection rate + average detection distance accumulator.
    Reference: evaluation/metrics/detection_metric_2d.py:55."""

    def __init__(self, match_threshold: float = 0.1):
        self.match_threshold = match_threshold
        self.total_reference = 0
        self.matched = 0
        self.distance_sum = 0.0

    def update(self, reference_centers: np.ndarray, detected_centers: np.ndarray):
        self.total_reference += len(reference_centers)
        for _, _, dist in greedy_box_matching(reference_centers, detected_centers):
            if dist <= self.match_threshold:
                self.matched += 1
                self.distance_sum += dist

    def results(self) -> Dict[str, float]:
        mdr = 1.0 - self.matched / max(self.total_reference, 1)
        add = self.distance_sum / max(self.matched, 1)
        return {"missed_detection_rate": mdr, "average_detection_distance": add}


# ---------------------------------------------------------------------------
# Action-space diagnostics
# ---------------------------------------------------------------------------


def action_variance(
    movements: np.ndarray, actions: np.ndarray, actions_count: int
) -> Dict[str, float]:
    """Per-action movement variance vs global variance (the Δ-MSE family's
    companion statistic). Reference: evaluation/metrics/action_variance.py:88.

    :param movements: (N, D); actions (N,) integer labels.
    """
    movements = np.asarray(movements)
    actions = np.asarray(actions)
    global_variance = float(movements.var(axis=0).mean())
    per_action = []
    for a in range(actions_count):
        mask = actions == a
        if mask.sum() >= 2:
            per_action.append(float(movements[mask].var(axis=0).mean()))
    within = float(np.mean(per_action)) if per_action else float("nan")
    return {
        "global_movement_variance": global_variance,
        "mean_within_action_variance": within,
        "variance_ratio": within / global_variance if global_variance > 0 else float("nan"),
    }


def action_classification_score(
    movements: np.ndarray, actions: np.ndarray
) -> float:
    """Linear-probe accuracy predicting the inferred action from the observed
    movement (how well actions partition movement space).
    Reference: evaluation/metrics/action_classification_score.py:217."""
    from sklearn.linear_model import LogisticRegression

    movements = np.asarray(movements)
    actions = np.asarray(actions)
    if len(np.unique(actions)) < 2:
        return float("nan")
    probe = LogisticRegression(max_iter=1000)
    probe.fit(movements, actions)
    return float(probe.score(movements, actions))


def delta_mse_action_accuracy(
    movements: np.ndarray, actions: np.ndarray, actions_count: int
) -> float:
    """Δ-MSE accuracy: classify each movement by the nearest per-action mean
    movement; fraction where the inferred action wins.
    Reference: reconstructed_playability_dataset_evaluator.py:531-567."""
    movements = np.asarray(movements)
    actions = np.asarray(actions)
    means = np.stack(
        [
            movements[actions == a].mean(axis=0)
            if (actions == a).any()
            else np.full(movements.shape[1], np.inf)
            for a in range(actions_count)
        ]
    )
    distances = np.linalg.norm(movements[:, None, :] - means[None], axis=-1)
    predicted = distances.argmin(axis=1)
    return float((predicted == actions).mean())


def inception_score(
    class_probabilities: np.ndarray, splits: int = 1, eps: float = 1e-12
) -> float:
    """Inception Score from per-image class probabilities:
    exp(E_x[KL(p(y|x) || p(y))]) averaged over splits
    (evaluation/metrics/inception_score.py:58; the class probabilities come
    from any classifier head, e.g. softmax of eval.inception_v3 logits).

    :param class_probabilities: (N, classes), rows summing to 1.
    """
    p = np.asarray(class_probabilities, np.float64)
    n = p.shape[0]
    scores = []
    for split in np.array_split(np.arange(n), splits):
        part = p[split]
        marginal = part.mean(axis=0, keepdims=True)
        kl = np.sum(part * (np.log(part + eps) - np.log(marginal + eps)), axis=1)
        scores.append(np.exp(kl.mean()))
    return float(np.mean(scores))
