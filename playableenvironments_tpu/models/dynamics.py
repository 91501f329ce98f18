"""LSTM dynamics network with explicit recurrent carry.

Replaces model/dynamics_network_v9.py / _v4.py: stacked LSTM cells with
learnable initial states, heads emitting state deltas (rotations decoded from
(sin, cos), translations rotated from the object frame to world). The
reference mutates hidden-state lists on the module (get/set_memory_state,
dynamics_network_v9.py:76-118); here the carry is an explicit pytree argument,
which is also exactly what the interactive play loop threads between steps.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from playableenvironments_tpu.config import AnimationModelConfig
from playableenvironments_tpu.core.transforms3d import (
    rotation_x,
    rotation_y,
    rotation_z,
)
from playableenvironments_tpu.models.layers import decode_rotation, encode_rotation

Carry = Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...]


class DynamicsNetwork(nn.Module):
    """One-step state transition driven by a discrete action + its variation.

    Input = sin/cos(rotations) ++ normalized translations ++ style ++
    deformation ++ one-hot action ++ action variation
    (dynamics_network_v9.py:171-175).
    """

    cfg: AnimationModelConfig
    bounding_box: Tuple[Tuple[float, float], ...]
    # v9 semantics: force_z_translations_zero holds the rotation-axis
    # translation at a fixed value; None disables (v4's
    # force_rotation_axis_translations generalization).
    force_rotation_axis_translation: Optional[float] = None

    def initial_carry(self, batch_size: int, params) -> Carry:
        """Learnable initial (h, c) per cell, broadcast to the batch.
        Reference: dynamics_network_v9.py:56-61, 162-169."""
        carry = []
        for cell_idx in range(self.cfg.dynamics.layers_count):
            h0 = params["params"][f"initial_hidden_{cell_idx}"]
            c0 = params["params"][f"initial_cell_{cell_idx}"]
            carry.append(
                (
                    jnp.broadcast_to(c0, (batch_size,) + c0.shape),
                    jnp.broadcast_to(h0, (batch_size,) + h0.shape),
                )
            )
        return tuple(carry)

    @nn.compact
    def __call__(
        self,
        carry: Optional[Carry],
        rotations: jnp.ndarray,
        translations: jnp.ndarray,
        style: jnp.ndarray,
        deformation: jnp.ndarray,
        action: jnp.ndarray,
        action_variation: jnp.ndarray,
    ):
        """:param carry: tuple per cell of (c, h), or None to start from the
        learnable initial state.
        :param rotations: (bs, 3); translations (bs, 3); style / deformation /
            action (one-hot over actions_count) / variation per-batch vectors.
        :return: (new_carry, (next_rotations, next_translations, next_style,
                 next_deformation)).
        """
        out_features = self.cfg.dynamics.output_features
        batch_size = rotations.shape[0]

        # Learnable initial states (declared regardless of carry so they are
        # part of params).
        initials = []
        for cell_idx in range(self.cfg.dynamics.layers_count):
            h0 = self.param(
                f"initial_hidden_{cell_idx}", nn.initializers.zeros, (out_features,)
            )
            c0 = self.param(
                f"initial_cell_{cell_idx}", nn.initializers.zeros, (out_features,)
            )
            initials.append(
                (
                    jnp.broadcast_to(c0, (batch_size, out_features)),
                    jnp.broadcast_to(h0, (batch_size, out_features)),
                )
            )
        if carry is None:
            carry = tuple(initials)

        box = jnp.asarray(self.bounding_box, rotations.dtype)
        box_size = box[:, 1] - box[:, 0]
        x = jnp.concatenate(
            [
                encode_rotation(rotations),
                translations / box_size,
                style,
                deformation,
                action,
                action_variation,
            ],
            axis=-1,
        )

        new_carry = []
        for cell_idx in range(self.cfg.dynamics.layers_count):
            cell = nn.OptimizedLSTMCell(out_features, name=f"lstm_{cell_idx}")
            cell_carry, x = cell(carry[cell_idx], x)
            new_carry.append(cell_carry)

        y = nn.Dense(out_features, name="backbone")(x)
        y = nn.relu(y)

        delta_encoded_rotations = nn.Dense(6, name="rotation_head")(y)
        delta_translations = nn.Dense(3, name="translation_head")(y)
        next_style = nn.Dense(style.shape[-1], name="style_head")(y)
        next_deformation = nn.Dense(deformation.shape[-1], name="deformation_head")(y)

        delta_rotations = decode_rotation(delta_encoded_rotations)
        axis = self.cfg.dynamics.rotation_axis
        if self.cfg.dynamics.force_rotations_zero:
            delta_rotations = delta_rotations * 0.0
        else:
            mask = jnp.zeros((3,)).at[axis].set(1.0)
            delta_rotations = delta_rotations * mask
        next_rotations = rotations + delta_rotations

        # Object-frame deltas rotated into world by the current yaw
        # (dynamics_network_v9.py:202-215).
        rot_fn = [rotation_x, rotation_y, rotation_z][axis]
        rotation_matrices = rot_fn(rotations[..., axis])
        world_deltas = jnp.einsum("bij,bj->bi", rotation_matrices, delta_translations)
        next_translations = translations + world_deltas

        if self.cfg.dynamics.force_z_translations_zero:
            forced = (
                self.force_rotation_axis_translation
                if self.force_rotation_axis_translation is not None
                else 0.0
            )
            next_translations = next_translations.at[..., axis].set(forced)

        return tuple(new_carry), (
            next_rotations,
            next_translations,
            next_style,
            next_deformation,
        )
