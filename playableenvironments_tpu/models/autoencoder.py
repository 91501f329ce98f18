"""The feature renderer F: multiresolution variational autoencoder.

NHWC flax re-design of model/autoencoder_models/: CycleGAN-style residual
blocks (reflect padding, BN), per-level downsampling with AvgPool, doubled
channels for (mean, log variance) at each bottleneck, and a decoder with
bilinear upsampling and unactivated skip concatenation.

Variants (autoencoder_v8 = EncoderV4 + DecoderV6; autoencoder_v9 = EncoderV5 +
DecoderV7) differ only in extra residual blocks + activations inside deep
downsampling sets; selected by AutoencoderConfig.variant.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from playableenvironments_tpu.config import AutoencoderConfig


from playableenvironments_tpu.ops.padding import reflect_pad_hw as reflect_pad
from playableenvironments_tpu.ops.pool import avg_pool_2x2


def s2d_cap(train: bool) -> int:
    """The tuned space-to-depth block cap per regime: 8 for training batches,
    32 for bs-1 inference (see _s2d_block). ONE policy for every conv."""
    return 8 if train else 32


def _s2d_block(
    kernel_size: Tuple[int, int], features: int, width: int, cap: int
) -> int:
    """Width block for the space-to-depth conv path, or 0 to use the plain
    conv. Worth it for wide images with <128 output channels (where a direct
    conv underfills the MXU's 128 lanes); measured wins on v5e down to
    width 256 / 64 features for both the forward and the autodiff transpose.
    `cap` bounds the block (8 for training batches, 32 for bs-1 inference)."""
    if cap == 0 or features >= 128 or width < 96:
        return 0
    return max(kernel_size[1] - 1, min(cap, 128 // features))


class SwitchableConv(nn.Module):
    """Stride-1 VALID conv with the same parameter layout/init as nn.Conv,
    switchable to the space-to-depth lowering (ops/s2d_conv.py) for wide
    few-channel outputs — e.g. the decoder's final 7x7 -> RGB conv, the
    single most expensive op of an interactive frame when lowered directly
    (3 of 128 MXU lanes used). The lowering is plain JAX (reshape + conv),
    so it is used in training too; `block_cap` selects the regime
    (0 = plain conv)."""

    features: int
    kernel_size: Tuple[int, int]
    compute_dtype: str = "float32"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, block_cap: int = 0) -> jnp.ndarray:
        from playableenvironments_tpu.ops.s2d_conv import conv_s2d

        dtype = jnp.dtype(self.compute_dtype)
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            self.kernel_size + (x.shape[-1], self.features),
        )
        block = _s2d_block(
            self.kernel_size, self.features, x.shape[-2], block_cap
        )
        if block:
            y = conv_s2d(x.astype(dtype), kernel.astype(dtype), block)
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(dtype),
                kernel.astype(dtype),
                (1, 1),
                "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class CycleGanResnetBlock(nn.Module):
    """Residual block: [reflect-pad conv3x3 BN ReLU] x2 (second without ReLU),
    1x1 projection on the skip when widths differ.
    Reference: model/autoencoder_models/layers/cyclegan_resnet_block.py.

    Convs run in `compute_dtype` (bfloat16 = full-rate MXU); params and
    BatchNorm statistics stay float32."""

    out_features: int
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        dtype = jnp.dtype(self.compute_dtype)
        cap = s2d_cap(train)
        y = reflect_pad(x.astype(dtype), 1)
        y = SwitchableConv(self.out_features, (3, 3), self.compute_dtype,
                           use_bias=False, name="conv1")(y, cap)
        # Activations stay in compute_dtype through BatchNorm: flax computes
        # the batch statistics in float32 regardless (force_float32_reductions)
        # so only the normalized tensor rides the reduced precision — phase-1
        # at 512x288 is HBM-bound, and fp32 BN outputs double the traffic.
        y = nn.BatchNorm(use_running_average=not train, dtype=dtype,
                         name="bn1")(y)
        y = nn.relu(y)
        y = reflect_pad(y.astype(dtype), 1)
        y = SwitchableConv(self.out_features, (3, 3), self.compute_dtype,
                           use_bias=False, name="conv2")(y, cap)
        y = nn.BatchNorm(use_running_average=not train, dtype=dtype,
                         name="bn2")(y)

        residual = x.astype(y.dtype)
        if x.shape[-1] != self.out_features:
            residual = nn.Conv(self.out_features, (1, 1), use_bias=False,
                               dtype=dtype, name="skip_conv")(x.astype(dtype))
            residual = nn.BatchNorm(use_running_average=not train, dtype=dtype,
                                    name="skip_bn")(residual)
        return residual + y


def features_count_by_layer(cfg: AutoencoderConfig) -> List[int]:
    """Per-level bottleneck widths (encoder_v4.py:103's bookkeeping): with
    bottleneck_features F and downsampling counts (d_0, d_1, ...), level i has
    F / 2^(sum(d) - cum_i) features; their sum is what the NeRF must emit."""
    initial = cfg.bottleneck_features // (2 ** sum(cfg.downsampling_layers_count))
    counts, cumulative = [], 0
    for d in cfg.downsampling_layers_count:
        cumulative += d
        counts.append(initial * (2 ** cumulative))
    return counts


def autoencoder_strides(cfg: AutoencoderConfig) -> List[int]:
    """Pixel stride of each latent level: cumulative powers of two of the
    downsampling counts, e.g. (2, 1) -> strides (4, 8). These are the
    patch_strides the NeRF renders on (trainer_multiresolution_backpropagated_
    decoder.py:52-53)."""
    strides, cumulative = [], 0
    for d in cfg.downsampling_layers_count:
        cumulative += d
        strides.append(2 ** cumulative)
    return strides


class MultiresEncoder(nn.Module):
    """Reference EncoderV4/V5: initial 7x7 conv, then per level `d_i` strided
    (conv + BN + ReLU + AvgPool2) downsamples and bottleneck residual blocks,
    the last one emitting 2x channels (mean ++ log variance), UNACTIVATED.
    Returns the per-level unactivated outputs; the next level continues from
    relu(mean)."""

    cfg: AutoencoderConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> List[jnp.ndarray]:
        deep = self.cfg.variant == "v9"
        dtype = jnp.dtype(self.cfg.compute_dtype)
        initial = self.cfg.bottleneck_features // (
            2 ** sum(self.cfg.downsampling_layers_count)
        )

        cap = s2d_cap(train)
        y = reflect_pad(x.astype(dtype), 3)
        y = SwitchableConv(initial, (7, 7), self.cfg.compute_dtype,
                           use_bias=False, name="initial_conv")(y, cap)
        y = nn.BatchNorm(use_running_average=not train, dtype=dtype,
                         name="initial_bn")(y)
        y = nn.relu(y)

        outputs = []
        cumulative = 0
        for set_idx, downs in enumerate(self.cfg.downsampling_layers_count):
            for i in range(downs):
                mult = 2 ** cumulative
                # Reflect padding (encoder_v4.py:60 padding_mode="reflect").
                y = SwitchableConv(
                    initial * mult * 2, (3, 3), self.cfg.compute_dtype,
                    use_bias=False, name=f"down_{set_idx}_{i}",
                )(reflect_pad(y.astype(dtype), 1), cap)
                y = nn.BatchNorm(
                    use_running_average=not train, dtype=dtype,
                    name=f"down_bn_{set_idx}_{i}"
                )(y)
                y = nn.relu(y)
                y = avg_pool_2x2(y)
                cumulative += 1
                # v9: extra residuals mid-set for deep sets (encoder_v5.py:66-81).
                if deep and downs >= 3 and i == 1:
                    for b in range(self.cfg.bottleneck_blocks):
                        y = CycleGanResnetBlock(
                            initial * mult * 2, self.cfg.compute_dtype,
                            name=f"mid_res_{set_idx}_{b}"
                        )(y, train)
                        y = nn.relu(y)

            width = initial * (2 ** cumulative)
            for b in range(self.cfg.bottleneck_blocks):
                out_dim = width
                if b == self.cfg.bottleneck_blocks - 1 and self.cfg.variational:
                    out_dim = 2 * width
                y = CycleGanResnetBlock(
                    out_dim, self.cfg.compute_dtype,
                    name=f"bottleneck_{set_idx}_{b}"
                )(y, train)
                if deep and b != self.cfg.bottleneck_blocks - 1:
                    y = nn.relu(y)

            outputs.append(y)  # unactivated (mean ++ logvar)
            mean = y[..., : y.shape[-1] // 2]
            y = nn.relu(mean)
        return outputs


class MultiresDecoder(nn.Module):
    """Reference DecoderV6/V7: from the lowest-resolution latent upward —
    bottleneck residual blocks, bilinear-upsample convs, skip-concat the next
    level's (unactivated) latent — ending in a 7x7 conv + sigmoid."""

    cfg: AutoencoderConfig

    @nn.compact
    def __call__(
        self, encoded_levels: List[jnp.ndarray], train: bool = True
    ) -> jnp.ndarray:
        """:param encoded_levels: per-level sampled latents, level 0 at the
        highest resolution (encoder output order).
        :return: (N, H, W, input_features) reconstruction in [0, 1]."""
        deep = self.cfg.variant == "v9"
        dtype = jnp.dtype(self.cfg.compute_dtype)
        initial = self.cfg.bottleneck_features // (
            2 ** sum(self.cfg.downsampling_layers_count)
        )
        mult = 2 ** sum(self.cfg.downsampling_layers_count)

        y = encoded_levels[-1]
        reversed_counts = list(reversed(self.cfg.downsampling_layers_count))
        for set_idx, downs in enumerate(reversed_counts):
            for b in range(self.cfg.bottleneck_blocks):
                y = CycleGanResnetBlock(
                    initial * mult, self.cfg.compute_dtype,
                    name=f"bottleneck_{set_idx}_{b}"
                )(y, train)
                if deep:
                    y = nn.relu(y)
            for i in range(downs):
                n, h, w, c = y.shape
                y = jax.image.resize(
                    y.astype(dtype), (n, 2 * h, 2 * w, c), method="bilinear"
                )
                y = reflect_pad(y, 1)
                y = SwitchableConv(
                    initial * mult // 2, (3, 3), self.cfg.compute_dtype,
                    use_bias=False, name=f"up_{set_idx}_{i}",
                )(y, s2d_cap(train))
                y = nn.BatchNorm(
                    use_running_average=not train, dtype=dtype,
                    name=f"up_bn_{set_idx}_{i}"
                )(y)
                y = nn.relu(y)
                mult //= 2
                if deep and downs >= 3 and i == downs - 2:
                    for b in range(self.cfg.bottleneck_blocks):
                        y = CycleGanResnetBlock(
                            initial * mult, self.cfg.compute_dtype,
                            name=f"mid_res_{set_idx}_{b}"
                        )(y, train)
                        y = nn.relu(y)

            if set_idx != len(reversed_counts) - 1:
                skip = encoded_levels[-set_idx - 2]
                y = jnp.concatenate([y, skip], axis=-1)

        y = reflect_pad(y.astype(dtype), 3)
        y = SwitchableConv(
            self.cfg.input_features, (7, 7), self.cfg.compute_dtype,
            name="final_conv",
        )(y, s2d_cap(train))
        return nn.sigmoid(y.astype(jnp.float32))


class MultiresAutoencoder(nn.Module):
    """The VAE (reference AutoencoderV7/8/9 surface): encode / sample / decode.

    Methods for `apply(..., method=...)`:
    - `encode(observations)` -> per-level (mean ++ logvar) latents
    - `decode(latents)` -> reconstruction
    - `__call__(observations, key)` -> dict(reconstructed_observations,
      encoded_observations)  [the full variational path]
    """

    cfg: AutoencoderConfig

    def setup(self):
        self.encoder = MultiresEncoder(self.cfg, name="encoder")
        self.decoder = MultiresDecoder(self.cfg, name="decoder")

    def encode(self, observations: jnp.ndarray, train: bool = True):
        return self.encoder(observations, train)

    def decode(self, encoded_levels: List[jnp.ndarray], train: bool = True):
        return self.decoder(encoded_levels, train)

    @staticmethod
    def sample(
        key: jax.Array, mean: jnp.ndarray, log_variance: jnp.ndarray
    ) -> jnp.ndarray:
        """Reparameterized posterior sample (autoencoder_v7.py:44-56)."""
        noise = jax.random.normal(key, mean.shape, mean.dtype)
        return noise * jnp.sqrt(jnp.exp(log_variance)) + mean

    def __call__(
        self,
        observations: jnp.ndarray,
        sample_key: Optional[jax.Array] = None,
        train: bool = True,
    ):
        encoded = self.encoder(observations, train)
        sampled = []
        for level in encoded:
            mean = level[..., : level.shape[-1] // 2]
            log_variance = level[..., level.shape[-1] // 2 :]
            if sample_key is not None:
                sample_key, sub = jax.random.split(sample_key)
                sampled.append(self.sample(sub, mean, log_variance))
            else:
                sampled.append(mean)
        reconstructed = self.decoder(sampled, train)
        return {
            "reconstructed_observations": reconstructed,
            "encoded_observations": encoded,
        }
