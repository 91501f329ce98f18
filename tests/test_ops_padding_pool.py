"""Parity tests for the reshape/strip-form padding and pooling ops.

These ops replace XLA's scatter-heavy lowerings (pad transpose `add_any`,
pool `select-and-scatter`) on the phase-1 hot path; the tests pin their
forward AND backward semantics to the canonical jnp/nn forms, including the
tiny-axis sizes where the strip decomposition must fall back (regression:
2x2 feature maps in the encoder pyramid produced wrong-shaped cotangents).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from playableenvironments_tpu.ops.padding import reflect_pad_hw
from playableenvironments_tpu.ops.pool import avg_pool_2x2, max_pool_2x2


def _ref_pad(x, p):
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


@pytest.mark.parametrize(
    "h,w,p",
    [(2, 2, 1), (3, 5, 1), (4, 4, 1), (5, 2, 1), (8, 8, 3), (4, 9, 3), (16, 12, 3)],
)
def test_reflect_pad_matches_jnp_pad(h, w, p, rng):
    x = jnp.asarray(rng.normal(size=(2, h, w, 3)).astype(np.float32))
    np.testing.assert_allclose(reflect_pad_hw(x, p), _ref_pad(x, p))
    g = jnp.asarray(rng.normal(size=(2, h + 2 * p, w + 2 * p, 3)).astype(np.float32))
    got = jax.grad(lambda x: (reflect_pad_hw(x, p) * g).sum())(x)
    want = jax.grad(lambda x: (_ref_pad(x, p) * g).sum())(x)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_avg_pool_matches_nn(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 5)).astype(np.float32))
    np.testing.assert_allclose(
        avg_pool_2x2(x), nn.avg_pool(x, (2, 2), strides=(2, 2)), atol=1e-6
    )
    # Extra leading batch dims and odd-size fallback.
    x5 = jnp.asarray(rng.normal(size=(2, 3, 8, 12, 5)).astype(np.float32))
    np.testing.assert_allclose(
        avg_pool_2x2(x5), nn.avg_pool(x5, (2, 2), strides=(2, 2)), atol=1e-6
    )
    x_odd = jnp.asarray(rng.normal(size=(2, 7, 9, 5)).astype(np.float32))
    np.testing.assert_allclose(
        avg_pool_2x2(x_odd), nn.avg_pool(x_odd, (2, 2), strides=(2, 2)), atol=1e-6
    )
    g = jnp.asarray(rng.normal(size=(2, 4, 6, 5)).astype(np.float32))
    got = jax.grad(lambda x: (avg_pool_2x2(x) * g).sum())(x)
    want = jax.grad(
        lambda x: (nn.avg_pool(x, (2, 2), strides=(2, 2)) * g).sum()
    )(x)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_max_pool_matches_nn(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 5)).astype(np.float32))
    np.testing.assert_allclose(
        max_pool_2x2(x), nn.max_pool(x, (2, 2), strides=(2, 2))
    )
    g = jnp.asarray(rng.normal(size=(2, 4, 6, 5)).astype(np.float32))
    got = jax.grad(lambda x: (max_pool_2x2(x) * g).sum())(x)
    want = jax.grad(
        lambda x: (nn.max_pool(x, (2, 2), strides=(2, 2)) * g).sum()
    )(x)
    # Distinct float activations -> unique window maxima -> grads identical.
    np.testing.assert_allclose(got, want)


def test_max_pool_tied_maxima_single_winner():
    """Tied maxima (flat post-ReLU regions) route the cotangent to exactly
    one window element — gradient mass is preserved, not multiplied."""
    x = jnp.ones((1, 4, 4, 2))  # every window fully tied
    g = jnp.asarray(np.arange(1, 9, dtype=np.float32).reshape(1, 2, 2, 2))
    grad = jax.grad(lambda x: (max_pool_2x2(x) * g).sum())(x)
    # Total routed gradient equals the total cotangent...
    np.testing.assert_allclose(grad.sum(), g.sum())
    # ...and each window has exactly one nonzero recipient.
    nonzero = (np.asarray(grad) != 0).reshape(1, 2, 2, 2, 2, 2).sum(axis=(2, 4))
    assert (nonzero == 1).all()
