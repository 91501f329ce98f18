"""Camera rays, rigid ray transforms, and along-ray sampling.

Replaces the reference's `utils/lib_3d/ray_helper.py` math with vectorized,
RNG-explicit JAX functions. The per-scene Python loops of the reference
(ray_helper.py:131, 350, 689) do not exist here: everything broadcasts over
leading batch dimensions so XLA can fuse and shard it.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp


def camera_rays(
    height: int, width: int, focal: Union[float, jnp.ndarray],
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pinhole rays for each pixel, camera frame (looks along -z, y up).

    Reference: ray_helper.py:15-52.

    :param focal: scalar or (...) per-image focal lengths in pixels.
    :return: ((..., height, width, 3) directions, (..., 3) origins,
              (..., 3) focal normals).
    """
    focal = jnp.asarray(focal, dtype=dtype)
    batch_shape = focal.shape
    f = focal[..., None, None]

    rows = jnp.arange(height, dtype=dtype)[:, None]
    cols = jnp.arange(width, dtype=dtype)[None, :]
    x = (cols - width / 2.0) / f
    y = -(rows - height / 2.0) / f  # image rows grow down; y grows up
    z = -jnp.ones_like(x)  # cameras look along -z
    directions = jnp.stack(jnp.broadcast_arrays(x, y, z), axis=-1)

    normals = jnp.zeros(batch_shape + (3,), dtype=dtype).at[..., 2].set(-1.0)
    origins = jnp.zeros(batch_shape + (3,), dtype=dtype)
    return directions, origins, normals


def transform_points(
    points: jnp.ndarray,
    matrix: jnp.ndarray,
    rotate: bool = True,
    translate: bool = True,
) -> jnp.ndarray:
    """Apply a homogeneous transform to 3D points. Reference: ray_helper.py:1179-1200.

    :param points: (..., 3).
    :param matrix: (..., 4, 4), broadcastable against points' batch dims.
    """
    out = points
    if rotate:
        out = jnp.sum(out[..., None, :] * matrix[..., :3, :3], axis=-1)
    if translate:
        out = out + matrix[..., :3, 3]
    return out


def transform_rays(
    ray_origins: jnp.ndarray,
    ray_directions: jnp.ndarray,
    focal_normals: jnp.ndarray,
    matrix: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Transform origins (rigid), directions and normals (rotation only).

    Reference: ray_helper.py:1202-1228. `ray_directions` carries an extra
    rays dimension relative to the origins.

    :param ray_origins: (..., 3).
    :param ray_directions: (..., rays, 3).
    :param focal_normals: (..., 3).
    :param matrix: (..., 4, 4).
    """
    origins = transform_points(ray_origins, matrix)
    normals = transform_points(focal_normals, matrix, translate=False)
    directions = transform_points(
        ray_directions, matrix[..., None, :, :], translate=False
    )
    return origins, directions, normals


def transform_ray_positions(
    ray_origins: jnp.ndarray,
    ray_directions: jnp.ndarray,
    focal_normals: jnp.ndarray,
    ray_positions: jnp.ndarray,
    matrix: jnp.ndarray,
):
    """Transform rays plus their sampled positions. Reference: ray_helper.py:1284-1318.

    :param ray_positions: (..., rays, positions, 3).
    """
    origins, directions, normals = transform_rays(
        ray_origins, ray_directions, focal_normals, matrix
    )
    positions = transform_points(ray_positions, matrix[..., None, None, :, :])
    return origins, directions, normals, positions


def stratified_ray_positions(
    ray_origins: jnp.ndarray,
    ray_directions: jnp.ndarray,
    z_near: jnp.ndarray,
    z_far: jnp.ndarray,
    positions_count: int,
    perturb: bool,
    key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """positions_count points per ray, linspace in [z_near, z_far], optionally
    jittered within each interval (stratified). Reference: ray_helper.py:1229-1282.

    :param ray_origins: (..., 3).
    :param ray_directions: (..., rays, 3).
    :param z_near, z_far: (..., rays) per-ray bounds (or scalars).
    :return: ((..., rays, positions, 3) points, (..., rays, positions) t values).
    """
    z_near = jnp.broadcast_to(jnp.asarray(z_near, ray_origins.dtype), ray_directions.shape[:-1])
    z_far = jnp.broadcast_to(jnp.asarray(z_far, ray_origins.dtype), ray_directions.shape[:-1])

    fractions = jnp.linspace(0.0, 1.0, positions_count, dtype=ray_origins.dtype)
    t = z_near[..., None] * (1.0 - fractions) + z_far[..., None] * fractions

    if perturb:
        if key is None:
            raise ValueError("perturb=True requires an RNG key")
        mids = (t[..., 1:] + t[..., :-1]) / 2.0
        upper = jnp.concatenate([mids, t[..., -1:]], axis=-1)
        lower = jnp.concatenate([t[..., :1], mids], axis=-1)
        u = jax.random.uniform(key, t.shape, dtype=t.dtype)
        t = lower + (upper - lower) * u

    points = (
        ray_origins[..., None, None, :]
        + ray_directions[..., None, :] * t[..., None]
    )
    return points, t


def sample_pdf(
    bin_delimiters: jnp.ndarray,
    weights: jnp.ndarray,
    positions_count: int,
    perturb: bool,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Inverse-CDF sampling of t values from a piecewise-constant pdf.

    Reference: ray_helper.py:1320-1403 (the NeRF hierarchical sampler), fully
    vectorized via `jax.numpy.searchsorted` over the batch.

    :param bin_delimiters: (..., bins + 1) bin edges.
    :param weights: (..., bins) unnormalized weights.
    :return: (..., positions_count) sampled t values.
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)

    if perturb:
        if key is None:
            raise ValueError("perturb=True requires an RNG key")
        u = jax.random.uniform(
            key, cdf.shape[:-1] + (positions_count,), dtype=cdf.dtype
        )
    else:
        u = jnp.broadcast_to(
            jnp.linspace(0.0, 1.0, positions_count, dtype=cdf.dtype),
            cdf.shape[:-1] + (positions_count,),
        )

    idx = _batched_searchsorted(cdf, u, side="right")

    below = jnp.clip(idx - 1, 0, None)
    above = jnp.clip(idx, None, cdf.shape[-1] - 1)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bin_delimiters, jnp.clip(below, 0, bin_delimiters.shape[-1] - 1), axis=-1)
    bins_above = jnp.take_along_axis(bin_delimiters, jnp.clip(above, 0, bin_delimiters.shape[-1] - 1), axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def _batched_searchsorted(
    sorted_values: jnp.ndarray, queries: jnp.ndarray, side: str = "right"
) -> jnp.ndarray:
    """searchsorted broadcast over leading dims (last axis is the sorted one)."""
    flat_sorted = sorted_values.reshape(-1, sorted_values.shape[-1])
    flat_queries = jnp.broadcast_to(
        queries, sorted_values.shape[:-1] + (queries.shape[-1],)
    ).reshape(-1, queries.shape[-1])
    out = jax.vmap(lambda s, q: jnp.searchsorted(s, q, side=side))(
        flat_sorted, flat_queries
    )
    return out.reshape(sorted_values.shape[:-1] + (queries.shape[-1],))


def weighted_ray_positions(
    ray_origins: jnp.ndarray,
    ray_directions: jnp.ndarray,
    positions_count: int,
    reference_t: jnp.ndarray,
    weights: jnp.ndarray,
    perturb: bool,
    key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hierarchical (fine) sampling: draw positions_count new t values from the
    coarse weight distribution, merge with the reference t values, sort.

    Reference: ray_helper.py:1320-1352 (create_ray_positions_weighted).

    :param reference_t: (..., rays, ref_positions) coarse t values.
    :param weights: (..., rays, ref_positions) coarse weights.
    :return: ((..., rays, positions + ref_positions, 3) points, matching t).
    """
    mids = (reference_t[..., 1:] + reference_t[..., :-1]) / 2.0
    new_t = sample_pdf(mids, weights[..., 1:-1], positions_count, perturb, key)
    new_t = jax.lax.stop_gradient(new_t)

    merged_t = jnp.sort(jnp.concatenate([reference_t, new_t], axis=-1), axis=-1)
    points = (
        ray_origins[..., None, None, :]
        + ray_directions[..., None, :] * merged_t[..., None]
    )
    return points, merged_t


def pixel_grid_positions(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """(height, width, 2) positions (row, col) normalized to [0, 1)."""
    rows = jnp.arange(height, dtype=dtype)[:, None] / height
    cols = jnp.arange(width, dtype=dtype)[None, :] / width
    return jnp.stack(jnp.broadcast_arrays(rows, cols), axis=-1)
