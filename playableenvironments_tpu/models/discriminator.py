"""Sequence discriminator for the phase-3 GAN.

Replaces model/discriminators/discriminator_v7.py (class name DiscriminatorV6
in the reference file, discriminator_v7.py:11): spectral-normalized Conv1d
stack over the time axis, masked average pooling over valid timesteps, and a
spectral-normalized linear logit head.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class SequenceDiscriminator(nn.Module):
    """(bs, T, features) sequences + (bs, T) validity -> (bs,) real/fake logit."""

    layers_count: int = 3
    layers_width: int = 128

    @nn.compact
    def __call__(
        self,
        sequences: jnp.ndarray,
        sequence_validity: jnp.ndarray,
        update_sn_stats: bool = True,
    ) -> jnp.ndarray:
        x = sequences  # NLC layout: flax Conv convolves the middle axis
        for layer_idx in range(self.layers_count):
            conv = nn.SpectralNorm(
                nn.Conv(self.layers_width, (5,), padding=2, name=f"conv_{layer_idx}")
            )
            x = conv(x, update_stats=update_sn_stats)
            x = nn.relu(x)

        mask = sequence_validity[..., None].astype(x.dtype)
        pooled = jnp.sum(x * mask, axis=1) / jnp.clip(
            jnp.sum(mask, axis=1), 1e-6, None
        )
        logit = nn.SpectralNorm(nn.Dense(1, name="final_fc"))(
            pooled, update_stats=update_sn_stats
        )
        return logit[..., 0]
