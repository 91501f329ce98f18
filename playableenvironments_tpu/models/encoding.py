"""Sinusoidal positional encodings, with optional coarse-to-fine annealing.

Pure functions (no parameters, no buffers). The reference keeps the annealing
step in a checkpointed buffer mutated by `set_step`
(model/annealable_positional_encoder.py:26-45); here the step is an explicit
argument so the encoder stays stateless under jit.

Design note (TPU): instead of looping "for octave: for sin,cos: cat", the
encoding is computed as one broadcast multiply of shape (..., dims, octaves)
followed by sin/cos and a reshape — one fused elementwise kernel.
Feature order matches the reference (model/positional_encoder.py:55-64):
[raw?, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...] with each block
spanning all input dims.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def encoding_size(input_dims: int, octaves: int, append_original: bool) -> int:
    """Output feature count. Reference: positional_encoder.py:30-39."""
    size = 2 * octaves * input_dims
    if append_original:
        size += input_dims
    return size


def annealing_weights(
    octaves: int, step: jnp.ndarray, num_steps: int
) -> jnp.ndarray:
    """Cosine coarse-to-fine schedule: octave j fades in as
    step * octaves / num_steps crosses j. Reference:
    annealable_positional_encoder.py:55-60.

    :param step: scalar current training step.
    :return: (octaves,) weights in [0, 1].
    """
    alpha = jnp.asarray(step, jnp.float32) * octaves / num_steps
    indexes = jnp.arange(octaves, dtype=jnp.float32)
    clamped = jnp.pi * jnp.clip(alpha - indexes, 0.0, 1.0)
    return (1.0 - jnp.cos(clamped)) / 2.0


def positional_encoding(
    x: jnp.ndarray,
    octaves: int,
    append_original: bool,
    octave_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Encode (..., d) -> (..., encoding_size(d, octaves, append_original)).

    :param octave_weights: optional (octaves,) annealing weights multiplying
        each octave's sin/cos block (annealable_positional_encoder.py:69-74).
    """
    freqs = 2.0 ** jnp.arange(octaves, dtype=x.dtype)  # (octaves,)
    scaled = x[..., None, :] * freqs[:, None]  # (..., octaves, d)
    sin, cos = jnp.sin(scaled), jnp.cos(scaled)
    # (..., octaves, 2, d): per octave [sin block, cos block]
    enc = jnp.stack([sin, cos], axis=-2)
    if octave_weights is not None:
        enc = enc * octave_weights[:, None, None]
    enc = enc.reshape(x.shape[:-1] + (2 * octaves * x.shape[-1],))
    if append_original:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc
