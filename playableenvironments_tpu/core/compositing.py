"""Volume-rendering integration and multi-object sort-merge composition.

Replaces the math half of the reference's `model/object_composer.py`:
alpha computation (180-197), transmittance weights (199-214), per-ray
integration (724-784), cross-object composition (399-447), and the
static/dynamic overlap fix (220-397) — the latter re-designed from a host-side
CPU loop into a pure vectorized interval mask.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def position_distances(
    ray_positions_t: jnp.ndarray, ray_directions: jnp.ndarray
) -> jnp.ndarray:
    """Distance from each sample to the next along the ray, scaled by the
    direction norm; the last distance is 1e10. Reference: object_composer.py:153-178.

    :param ray_positions_t: (..., rays, positions) t values.
    :param ray_directions: (..., rays, 3) directions (not necessarily unit).
    :return: (..., rays, positions) distances.
    """
    deltas = ray_positions_t[..., 1:] - ray_positions_t[..., :-1]
    last = jnp.full_like(ray_positions_t[..., :1], 1e10)
    distances = jnp.concatenate([deltas, last], axis=-1)
    return distances * jnp.linalg.norm(ray_directions, axis=-1)[..., None]


def alphas_from_raw(
    raw_alphas: jnp.ndarray,
    position_distances_: jnp.ndarray,
    perturb: bool,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """alpha = 1 - exp(-relu(raw + noise) * dist). Reference: object_composer.py:180-197.

    Train-time unit Gaussian noise on the raw densities regularizes against
    floater artifacts.
    """
    if perturb:
        if key is None:
            raise ValueError("perturb=True requires an RNG key")
        raw_alphas = raw_alphas + jax.random.normal(
            key, raw_alphas.shape, dtype=raw_alphas.dtype
        )
    return 1.0 - jnp.exp(-jax.nn.relu(raw_alphas) * position_distances_)


def compositing_weights(alphas: jnp.ndarray) -> jnp.ndarray:
    """w_i = alpha_i * prod_{j<i} (1 - alpha_j): probability light reaches and
    is absorbed at sample i. Exclusive cumprod as in object_composer.py:199-214.
    """
    shifted = jnp.concatenate(
        [jnp.ones_like(alphas[..., :1]), 1.0 - alphas[..., :-1] + 1e-10], axis=-1
    )
    return alphas * jnp.cumprod(shifted, axis=-1)


def integrate(
    raw_features: jnp.ndarray,
    raw_alphas: jnp.ndarray,
    ray_directions: jnp.ndarray,
    ray_positions_t: jnp.ndarray,
    ray_displacements: jnp.ndarray,
    ray_divergences: jnp.ndarray,
    perturb: bool,
    key: Optional[jax.Array] = None,
) -> Dict[str, jnp.ndarray]:
    """Integrate features/depth/opacity along each ray. Reference:
    object_composer.py:724-784.

    :param raw_features: (..., rays, positions, features).
    :param raw_alphas: (..., rays, positions).
    :param ray_directions: (..., rays, 3).
    :param ray_positions_t: (..., rays, positions).
    :param ray_displacements: (..., rays, positions, 3).
    :param ray_divergences: (..., rays, positions).
    :return: dict of integrated_features (..., rays, features), opacity, weights,
             depth, disparity, integrated_displacements_magnitude,
             integrated_divergence.
    """
    distances = position_distances(ray_positions_t, ray_directions)
    alphas = alphas_from_raw(raw_alphas, distances, perturb, key)
    weights = compositing_weights(alphas)

    integrated_features = jnp.sum(weights[..., None] * raw_features, axis=-2)
    depth = jnp.sum(weights * ray_positions_t, axis=-1)
    opacity = jnp.sum(weights, axis=-1)
    # max(opacity, eps) guards fully-transparent rays (0/0 -> NaN).
    disparity = 1.0 / jnp.clip(depth / jnp.clip(opacity, 1e-10, None), min=1e-10)

    integrated_divergence = jnp.mean(
        jax.lax.stop_gradient(alphas) * jnp.abs(ray_divergences), axis=-1
    )
    integrated_displacements_magnitude = jnp.mean(
        jax.lax.stop_gradient(weights)
        * jnp.linalg.norm(ray_displacements, axis=-1),
        axis=-1,
    )

    return {
        "integrated_features": integrated_features,
        "opacity": opacity,
        "weights": weights,
        "depth": depth,
        "disparity": disparity,
        "integrated_displacements_magnitude": integrated_displacements_magnitude,
        "integrated_divergence": integrated_divergence,
    }


def expected_positions(
    ray_positions: jnp.ndarray,
    ray_displacements: jnp.ndarray,
    weights: jnp.ndarray,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Expected position of the first surface hit by each ray, computed on the
    bent positions with stop-gradient weights. Reference: object_composer.py:603-622.

    :param ray_positions: (..., positions, 3).
    :param ray_displacements: (..., positions, 3).
    :param weights: (..., positions).
    :return: (..., 3).
    """
    weights = jax.lax.stop_gradient(weights)[..., None]
    bent = ray_positions + ray_displacements
    return jnp.sum(bent * weights, axis=-2) / (jnp.sum(weights, axis=-2) + eps)


def overlap_fix_mask(
    static_t: jnp.ndarray, dynamic_t: jnp.ndarray
) -> jnp.ndarray:
    """True where a static object's samples fall inside a dynamic object's
    sampled t interval.

    TPU-native redesign of object_composer.py:295-397 (`fix_object_overlap`):
    the reference round-trips through a host CPU loop building the interval
    mask via searchsorted indices; here the same semantics is a dense
    elementwise comparison, which is exactly what the host loop's
    searchsorted(begin)/searchsorted(end) interval expands to for sorted
    static_t.

    Reference-compatibility quirk, replicated deliberately: the reference
    indexes the DYNAMIC object's t array with the STATIC object's
    positions_count - 1 (object_composer.py:318-322 — `positions_count =
    raw_alphas.size(1)` is the static tensor's), so when the counts differ
    (every published minecraft config: background 4 vs players 32) the
    suppressed interval ends at dynamic_t[static_positions - 1], NOT at the
    dynamic object's true last sample. Checkpoints trained under that
    behavior must render identically here (bit-parity north star;
    oracle-tested in tests/test_reference_parity.py).

    :param static_t: (..., positions) static object's sorted t values.
    :param dynamic_t: (..., dyn_positions) dynamic object's t values.
    :return: (..., positions) boolean, True = suppress this sample.
    """
    hi_idx = min(static_t.shape[-1], dynamic_t.shape[-1]) - 1
    lo = dynamic_t[..., :1]
    hi = dynamic_t[..., hi_idx : hi_idx + 1]
    # searchsorted with side='left' on sorted static_t marks indices in
    # [ss(lo), ss(hi)) — equivalently samples with lo <= t < hi.
    return jnp.logical_and(static_t >= lo, static_t < hi)


def apply_overlap_fix(
    raw_alphas: jnp.ndarray,
    ray_positions_t: jnp.ndarray,
    ray_positions: jnp.ndarray,
    ray_displacements: jnp.ndarray,
    ray_divergences: jnp.ndarray,
    ray_origins: jnp.ndarray,
    mask: jnp.ndarray,
) -> Tuple[jnp.ndarray, ...]:
    """Suppress masked samples: alpha -> -10 (empty space), t -> 0, position ->
    ray origin, displacement/divergence -> 0. Reference: object_composer.py:385-397.

    :param ray_origins: (..., 3) broadcast against the positions dim.
    :param mask: (..., positions) True = suppress.
    """
    m = mask
    m3 = mask[..., None]
    raw_alphas = jnp.where(m, -10.0, raw_alphas)
    ray_positions_t = jnp.where(m, 0.0, ray_positions_t)
    ray_positions = jnp.where(m3, ray_origins[..., None, :], ray_positions)
    ray_displacements = jnp.where(m3, 0.0, ray_displacements)
    ray_divergences = jnp.where(m, 0.0, ray_divergences)
    return raw_alphas, ray_positions_t, ray_positions, ray_displacements, ray_divergences


def compose_integrate_sortfree(
    all_raw_features: Sequence[jnp.ndarray],
    all_raw_alphas: Sequence[jnp.ndarray],
    all_ray_positions_t: Sequence[jnp.ndarray],
    ray_directions: jnp.ndarray,
    all_ray_displacements: Optional[Sequence[jnp.ndarray]] = None,
    all_ray_divergences: Optional[Sequence[jnp.ndarray]] = None,
    perturb: bool = False,
    key: Optional[jax.Array] = None,
) -> Dict[str, jnp.ndarray]:
    """Cross-object volume integration WITHOUT the global sort.

    Mathematically identical to compose_objects + integrate (the reference's
    sort-merge, object_composer.py:399-447 + 724-784), but exploits that each
    object's samples are already t-sorted:

    - the inter-sample distance of sample i is (min over objects of the first
      t greater than t_i) - t_i — a masked min instead of a sorted diff;
    - the transmittance at sample i factorizes per object:
      T_i = exp(own exclusive cumsum of log(1-alpha) + sum over other objects
      of their log(1-alpha) mass before t_i) — masked sums instead of a
      cumprod over the sorted merge.

    This removes the argsort and all six take_along_axis payload gathers
    (the measured bottleneck of the render: gathers/sorts, not the MLP). Cost
    is O(S_total^2) fused compares per ray — trivial at S_total <= ~128.

    Tie-breaking matches the stable concat sort exactly: the total order is
    lexicographic (t, concat index), which is what a stable sort of the
    concatenation implements. Exact t ties are COMMON in eval renders
    (perturb=False stratified midpoints of objects sharing a z-range), and
    the first sample of a tied pair must get a zero inter-sample distance.

    :param all_raw_features: per object (..., rays, S_o, F).
    :param all_raw_alphas: per object (..., rays, S_o).
    :param all_ray_positions_t: per object (..., rays, S_o), each sorted.
    :param ray_directions: (..., rays, 3).
    :return: integrate()-style dict; "weights" is per-object list ordering
        (concatenated in object order, NOT t-sorted).
    """
    dir_norm = jnp.linalg.norm(ray_directions, axis=-1)[..., None]

    t_cat = jnp.concatenate(all_ray_positions_t, axis=-1)  # (..., rays, S)
    raw_alpha_cat = jnp.concatenate(all_raw_alphas, axis=-1)

    # Next-sample distance: min over ALL samples j ordered after i in the
    # (t, concat index) total order of t_j. A tied successor (t_j == t_i,
    # idx_j > idx_i) yields distance 0 — the stable-sort semantics.
    # The no-successor sentinel is a LARGE FINITE value, not inf: XLA's
    # select->arithmetic rewrites turn masked infs into 0*inf = NaN under jit.
    big = jnp.asarray(3.0e38, t_cat.dtype)
    total = t_cat.shape[-1]
    idx = jnp.arange(total)
    idx_after = idx[:, None] < idx[None, :]  # (S, S): j after i in concat order
    t_i = t_cat[..., :, None]  # (..., S, 1)
    t_j = t_cat[..., None, :]  # (..., 1, S)
    after = (t_j > t_i) | ((t_j == t_i) & idx_after)
    bigger = jnp.where(after, t_j, big)
    next_t = jnp.min(bigger, axis=-1)  # (..., S)
    deltas = jnp.where(next_t >= big, 1e10, next_t - t_cat)
    distances = deltas * dir_norm

    if perturb:
        if key is None:
            raise ValueError("perturb=True requires an RNG key")
        raw_alpha_cat = raw_alpha_cat + jax.random.normal(
            key, raw_alpha_cat.shape, raw_alpha_cat.dtype
        )
    x = jax.nn.relu(raw_alpha_cat) * distances
    alphas = 1.0 - jnp.exp(-x)
    # log(1 - alpha + 1e-10) = log(exp(-x) + 1e-10), computed in log space:
    # the naive form re-derives exp(-x) from alphas and XLA's fusion can
    # cancel it to an exact 0 -> log(0) = -inf -> NaN downstream.
    log1m = jnp.logaddexp(-x, jnp.log(1e-10))

    # Transmittance: per-object exclusive prefix (index order == t order
    # within an object) + cross-object mass strictly before t_i. Ties within
    # an object resolve by index (the stable-sort behavior); cross-object
    # ties use strict '<'.
    sizes = [t.shape[-1] for t in all_ray_positions_t]
    offsets = []
    begin = 0
    for s in sizes:
        offsets.append((begin, begin + s))
        begin += s

    def exclusive_cumsum(x):
        cs = jnp.cumsum(x, axis=-1)
        return jnp.concatenate(
            [jnp.zeros_like(cs[..., :1]), cs[..., :-1]], axis=-1
        )

    own_exclusive = jnp.concatenate(
        [exclusive_cumsum(log1m[..., b:e]) for (b, e) in offsets], axis=-1
    )
    # Cross-object: sum_j log1m_j over j strictly before i in the (t, concat
    # index) order, restricted to other objects (own-object mass is the
    # cumsum above; within-object index order already equals the tie order).
    same_object = jnp.zeros((begin, begin), dtype=bool)
    for (b, e) in offsets:
        same_object = same_object.at[b:e, b:e].set(True)
    before = jnp.logical_and(
        (t_j < t_i) | ((t_j == t_i) & idx_after.T), ~same_object
    )
    cross = jnp.sum(jnp.where(before, log1m[..., None, :], 0.0), axis=-1)

    weights = alphas * jnp.exp(own_exclusive + cross)

    features_cat = jnp.concatenate(all_raw_features, axis=-2)
    integrated_features = jnp.sum(weights[..., None] * features_cat, axis=-2)
    depth = jnp.sum(weights * t_cat, axis=-1)
    opacity = jnp.sum(weights, axis=-1)
    disparity = 1.0 / jnp.clip(depth / jnp.clip(opacity, 1e-10, None), min=1e-10)

    results = {
        "integrated_features": integrated_features,
        "opacity": opacity,
        "weights": weights,
        "depth": depth,
        "disparity": disparity,
    }
    if all_ray_divergences is not None:
        div_cat = jnp.concatenate(all_ray_divergences, axis=-1)
        results["integrated_divergence"] = jnp.mean(
            jax.lax.stop_gradient(alphas) * jnp.abs(div_cat), axis=-1
        )
    if all_ray_displacements is not None:
        disp_cat = jnp.concatenate(all_ray_displacements, axis=-2)
        results["integrated_displacements_magnitude"] = jnp.mean(
            jax.lax.stop_gradient(weights) * jnp.linalg.norm(disp_cat, axis=-1),
            axis=-1,
        )
    return results


def compose_objects(
    all_raw_features: Sequence[jnp.ndarray],
    all_raw_alphas: Sequence[jnp.ndarray],
    all_ray_positions_t: Sequence[jnp.ndarray],
    all_ray_positions: Sequence[jnp.ndarray],
    all_ray_displacements: Sequence[jnp.ndarray],
    all_ray_divergences: Sequence[jnp.ndarray],
) -> Tuple[jnp.ndarray, ...]:
    """Merge per-object samples into one globally t-sorted sample set per ray.

    Reference: object_composer.py:399-447 (concatenate + sort on t + gather).
    Per-object sample counts may differ (e.g. 4 background vs 32 player
    samples); the concatenated axis is their sum. A single argsort drives
    take_along_axis gathers for every payload — XLA lowers this to one sort
    plus vectorized gathers, no host loop.

    :return: (features, raw_alphas, t, positions, displacements, divergences)
             each with positions axis = sum of per-object counts, sorted by t.
    """
    features = jnp.concatenate(all_raw_features, axis=-2)
    alphas = jnp.concatenate(all_raw_alphas, axis=-1)
    t = jnp.concatenate(all_ray_positions_t, axis=-1)
    positions = jnp.concatenate(all_ray_positions, axis=-2)
    displacements = jnp.concatenate(all_ray_displacements, axis=-2)
    divergences = jnp.concatenate(all_ray_divergences, axis=-1)

    order = jnp.argsort(t, axis=-1)
    t = jnp.take_along_axis(t, order, axis=-1)
    alphas = jnp.take_along_axis(alphas, order, axis=-1)
    divergences = jnp.take_along_axis(divergences, order, axis=-1)
    features = jnp.take_along_axis(features, order[..., None], axis=-2)
    positions = jnp.take_along_axis(positions, order[..., None], axis=-2)
    displacements = jnp.take_along_axis(displacements, order[..., None], axis=-2)
    return features, alphas, t, positions, displacements, divergences
