"""Parity of the space-to-depth conv against lax.conv_general_dilated."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from playableenvironments_tpu.ops.s2d_conv import conv_s2d, fold_kernel


def _reference(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.mark.parametrize(
    "shape,kernel_shape,block",
    [
        ((2, 14, 26, 5), (7, 7, 5, 3), 32),   # final-conv shape family
        ((1, 10, 37, 4), (3, 3, 4, 6), 8),    # up-conv family, ragged width
        ((1, 9, 16, 2), (3, 3, 2, 4), 2),     # minimum block = kw - 1
        ((3, 8, 24, 3), (1, 1, 3, 8), 4),     # pointwise
        ((1, 12, 40, 3), (5, 5, 3, 2), 16),
    ],
)
def test_conv_s2d_matches_lax(shape, kernel_shape, block):
    kx, ky = jax.random.split(jax.random.PRNGKey(hash(shape) % 2**31))
    x = jax.random.normal(kx, shape, jnp.float32)
    kernel = jax.random.normal(ky, kernel_shape, jnp.float32)
    np.testing.assert_allclose(
        conv_s2d(x, kernel, block), _reference(x, kernel),
        atol=1e-4, rtol=1e-4,
    )


def test_block_too_small_raises():
    with pytest.raises(ValueError, match="block"):
        fold_kernel(jnp.zeros((3, 7, 2, 2)), 4)


def test_gradients_match():
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (1, 12, 20, 3), jnp.float32)
    kernel = jax.random.normal(ky, (3, 3, 3, 4), jnp.float32)

    g_fast = jax.grad(lambda k: jnp.sum(jnp.sin(conv_s2d(x, k, 8))))(kernel)
    g_ref = jax.grad(lambda k: jnp.sum(jnp.sin(_reference(x, k))))(kernel)
    np.testing.assert_allclose(g_fast, g_ref, atol=1e-4, rtol=1e-4)
