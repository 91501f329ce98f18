"""Action modifiers applied during evaluation rollouts."""

from __future__ import annotations

import jax.numpy as jnp


def zero_variation_action_modifier(sampled_actions, action_variations):
    """Zero the sampled action variations (deterministic re-enactment).
    Reference: evaluation/action_modifiers/zero_variation_action_modifier.py:21."""
    return sampled_actions, jnp.zeros_like(action_variations)
