"""Reusable flax layers: style-modulated AdaIN, masked batch norm, rotation
encoding, and gumbel-softmax sampling.

Replaces the reference's `model/layers/` package. The key redesign: the
reference filters points to a dynamic-size batch before its BatchNorm1d-based
AdaIN (adain.py:41-60); TPUs want static shapes, so normalization here is
computed over a *masked* dense batch — identical statistics, no gather.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def masked_moments(
    x: jnp.ndarray, mask: Optional[jnp.ndarray], axes
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean/variance over `axes`, counting only elements where mask is True.

    :param x: (..., features).
    :param mask: broadcastable to x's batch dims (without features), or None.
    """
    if mask is None:
        mean = jnp.mean(x, axis=axes)
        var = jnp.var(x, axis=axes)
        return mean, var
    m = jnp.broadcast_to(mask[..., None], x.shape).astype(x.dtype)
    count = jnp.clip(jnp.sum(m, axis=axes), 1e-6, None)
    mean = jnp.sum(x * m, axis=axes) / count
    var = jnp.sum(jnp.square(x - mean) * m, axis=axes) / count
    return mean, var


class MaskedBatchNorm(nn.Module):
    """Batch normalization whose statistics ignore masked-out elements.

    Equivalent to the reference's BatchNorm1d over the filtered point batch
    (model/layers/adain.py:41-60, masked_batch_norm.py:26) without the
    dynamic-shape gather. Running statistics live in the `batch_stats`
    collection; `use_running_average=True` reproduces eval mode.
    """

    features: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    use_scale_bias: bool = False  # reference AdaIn uses affine=False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        use_running_average: bool = False,
    ) -> jnp.ndarray:
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,))
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,))
        )

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            mean, var = masked_moments(x, mask, axes)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1.0 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1.0 - self.momentum) * var

        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.use_scale_bias:
            scale = self.param("scale", nn.initializers.ones, (self.features,))
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y * scale + bias
        return y


class AffineTransformAdaIn(nn.Module):
    """Style-conditioned affine modulation over batch-normalized activations.

    style -> Linear -> (scale, bias); output = BN(x) * scale + bias.
    Scale head bias-initialized to 1, bias head to 0 (adain.py:17-19).
    Reference: model/layers/adain.py:5-37.
    """

    features: int
    style_features: int

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        style: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        use_running_average: bool = False,
    ) -> jnp.ndarray:
        def bias_init(key, shape, dtype=jnp.float32):
            return jnp.concatenate(
                [jnp.ones((self.features,), dtype), jnp.zeros((self.features,), dtype)]
            )

        encoded = nn.Dense(2 * self.features, bias_init=bias_init, name="affine")(style)
        scale, bias = jnp.split(encoded, 2, axis=-1)
        normalized = MaskedBatchNorm(self.features, name="norm")(
            x, mask, use_running_average
        )
        return normalized * scale + bias


class AffineTransformAdaInUnnormalized(nn.Module):
    """AdaIN without the normalization step. Reference: model/layers/adain_unnormalized.py."""

    features: int
    style_features: int

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        style: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        use_running_average: bool = False,
    ) -> jnp.ndarray:
        def bias_init(key, shape, dtype=jnp.float32):
            return jnp.concatenate(
                [jnp.ones((self.features,), dtype), jnp.zeros((self.features,), dtype)]
            )

        encoded = nn.Dense(2 * self.features, bias_init=bias_init, name="affine")(style)
        scale, bias = jnp.split(encoded, 2, axis=-1)
        return x * scale + bias


def encode_rotation(angles: jnp.ndarray) -> jnp.ndarray:
    """(..., k) angles -> (..., 2k) interleaved (sin, cos) pairs.
    Reference: model/layers/rotation_encoder.py:9-31."""
    sin, cos = jnp.sin(angles), jnp.cos(angles)
    return jnp.stack([sin, cos], axis=-1).reshape(angles.shape[:-1] + (-1,))


def decode_rotation(encoded: jnp.ndarray) -> jnp.ndarray:
    """(..., 2k) interleaved (sin, cos) -> (..., k) angles via atan2.
    Reference: model/layers/rotation_encoder.py:33-54."""
    pairs = encoded.reshape(encoded.shape[:-1] + (-1, 2))
    return jnp.arctan2(pairs[..., 0], pairs[..., 1])


def gumbel_softmax(
    key: jax.Array,
    logits: jnp.ndarray,
    temperature: float = 1.0,
    hard: bool = True,
) -> jnp.ndarray:
    """Differentiable sampling from a categorical with straight-through hard
    one-hot. Reference: model/layers/gumbel_softmax.py:9-112 (its NaN guards
    are unnecessary here: jax.random.gumbel is finite by construction).

    :param logits: (..., classes).
    :return: (..., classes) one-hot (hard) or simplex (soft) sample.
    """
    gumbels = jax.random.gumbel(key, logits.shape, dtype=logits.dtype)
    y_soft = jax.nn.softmax((logits + gumbels) / temperature, axis=-1)
    if not hard:
        return y_soft
    index = jnp.argmax(y_soft, axis=-1)
    y_hard = jax.nn.one_hot(index, logits.shape[-1], dtype=logits.dtype)
    # Straight-through estimator.
    return y_hard + y_soft - jax.lax.stop_gradient(y_soft)


def avg_pool(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Non-overlapping average pooling over the two spatial dims of NHWC.

    The window is clamped to the input extent so inputs smaller than the
    factor collapse to size 1 instead of size 0 (which silently yields NaN
    means downstream)."""
    if factor == 1:
        return x
    wh = min(factor, x.shape[-3])
    ww = min(factor, x.shape[-2])
    if wh == 2 and ww == 2:
        # Reshape-reduce form (ops/pool.py): reduce_window transposes lower
        # as padded-window scatters, the hottest op class in training convs.
        from playableenvironments_tpu.ops.pool import avg_pool_2x2

        return avg_pool_2x2(x)
    return nn.avg_pool(x, (wh, ww), strides=(wh, ww))


class ResidualBlock(nn.Module):
    """Conv residual block, topology matching model/layers/residual_block.py:
    conv3x3 -> avgpool(df) -> BN -> LeakyReLU(0.2) -> conv3x3 -> BN, with a
    conv1x1 + avgpool + BN skip when shape changes; final activation optional.
    NHWC (TPU-native layout; the reference uses NCHW)."""

    features: int
    downsample_factor: int = 1
    drop_final_activation: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        residual = x
        y = nn.Conv(self.features, (3, 3), use_bias=False, name="conv1")(x)
        y = avg_pool(y, self.downsample_factor)
        y = nn.BatchNorm(use_running_average=not train, name="bn1")(y)
        y = nn.leaky_relu(y, 0.2)
        y = nn.Conv(self.features, (3, 3), use_bias=False, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, name="bn2")(y)
        if x.shape[-1] != self.features or self.downsample_factor != 1:
            residual = nn.Conv(self.features, (1, 1), use_bias=False, name="skip_conv")(x)
            residual = avg_pool(residual, self.downsample_factor)
            residual = nn.BatchNorm(use_running_average=not train, name="skip_bn")(residual)
        y = y + residual
        if not self.drop_final_activation:
            y = nn.leaky_relu(y, 0.2)
        return y


class SameBlock(nn.Module):
    """Conv + BN + ReLU at constant resolution (model/layers/same_block.py)."""

    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        y = nn.Conv(
            self.features, (self.kernel_size, self.kernel_size), use_bias=False
        )(x)
        y = nn.BatchNorm(use_running_average=not train)(y)
        return nn.relu(y)


class UpBlock(nn.Module):
    """Bilinear 2x upsample + conv + BN + ReLU (model/layers/up_block.py)."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        b, h, w, c = x.shape
        y = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")
        y = nn.Conv(self.features, (3, 3), use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        return nn.relu(y)
