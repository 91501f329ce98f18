"""2x2/2 pooling via reshape-reduce.

XLA lowers `reduce_window` pools (and especially their transposes) through
padded window scatter paths that cost several ms at phase-1 scale; for the
even-sized stride-2 case a pool is just a reshape + small-axis reduce, whose
transpose is a broadcast. Shapes at published scales are always even
(288/512 inputs through power-of-two pyramids); odd H/W falls back to the
native pool, matching nn.*_pool's VALID windowing (last row/column dropped).

Inputs are (..., H, W, C): any number of leading batch dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _even(x: jnp.ndarray) -> bool:
    return x.shape[-3] % 2 == 0 and x.shape[-2] % 2 == 0


def _windowed(x: jnp.ndarray) -> jnp.ndarray:
    *lead, h, w, c = x.shape
    return x.reshape(tuple(lead) + (h // 2, 2, w // 2, 2, c))


def avg_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """Mean 2x2/2 pool; matches nn.avg_pool(x, (2, 2), strides=(2, 2))."""
    if not _even(x):
        from flax import linen as nn

        return nn.avg_pool(x, (2, 2), strides=(2, 2))
    return _windowed(x).mean(axis=(-4, -2))


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """Max 2x2/2 pool; reshape-reduce with an equality-mask backward on
    even H/W, native nn.max_pool otherwise."""
    if not _even(x):
        from flax import linen as nn

        return nn.max_pool(x, (2, 2), strides=(2, 2))
    return _max_pool_2x2_even(x)


@jax.custom_vjp
def _max_pool_2x2_even(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 max pool with an equality-mask backward.

    The backward routes the cotangent to the FIRST input equal to its
    window's max (row-major within the window) — pure broadcast/elementwise
    work instead of XLA's select-and-scatter, with the same one-winner
    semantics on ties. Ties are common here: the pools sit after ReLUs
    (VGG perceptual), where flat image regions produce exactly equal
    activations, so an every-winner backward would over-count gradient
    2-4x in those windows."""
    return _windowed(x).max(axis=(-4, -2))


def _max_pool_2x2_fwd(x):
    y = _windowed(x).max(axis=(-4, -2))
    return y, (x, y)


def _max_pool_2x2_bwd(residual, g):
    x, y = residual
    xw = _windowed(x)  # (..., h2, 2, w2, 2, c); window axes -4 and -2
    yb = y[..., :, None, :, None, :]
    gb = g[..., :, None, :, None, :]
    mask = xw == yb
    # Count of tied maxima lexicographically before each window position
    # (row-major over the 2x2 window), without reshuffling the layout:
    # exclusive cumsum within the row + full rows before this row.
    within = jnp.cumsum(mask, axis=-2) - mask
    rows_total = jnp.sum(mask, axis=-2, keepdims=True)
    rows_before = jnp.cumsum(rows_total, axis=-4) - rows_total
    first = mask & ((within + rows_before) == 0)
    grad = jnp.where(first, gb, jnp.zeros_like(gb))
    return (grad.reshape(x.shape),)


_max_pool_2x2_even.defvjp(_max_pool_2x2_fwd, _max_pool_2x2_bwd)
