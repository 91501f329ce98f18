"""Action module: action posterior network, EMA action centroids, and the
per-object animation model (action inference + autoregressive dynamics).

Replaces model/action_network_v5.py, model/layers/centroid_estimator.py and
model/object_animation_model.py. All EMA state (centroids) is explicit:
functions take the current centroids and return updated ones for the train
state; gumbel sampling and posterior sampling take explicit keys.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from playableenvironments_tpu.config import AnimationModelConfig
from playableenvironments_tpu.models.dynamics import DynamicsNetwork
from playableenvironments_tpu.models.layers import (
    MaskedBatchNorm,
    encode_rotation,
    gumbel_softmax,
)


class ActionNetwork(nn.Module):
    """Per-transition action posterior.

    States (sin/cos rotations ++ bbox-normalized translations [++ deformation])
    -> masked-BN MLP -> Gaussian state posterior (mean, log variance); action
    *directions* are successor - predecessor state distributions; a single
    Dense maps sampled directions to action logits.
    Reference: model/action_network_v5.py:14-163.
    """

    cfg: AnimationModelConfig
    bounding_box: Tuple[Tuple[float, float], ...]
    use_deformation: bool = False

    @nn.compact
    def __call__(
        self,
        rotations: jnp.ndarray,
        translations: jnp.ndarray,
        deformation: Optional[jnp.ndarray],
        object_in_scene: jnp.ndarray,
        sample_key: jax.Array,
        use_running_average: bool = False,
    ):
        """:param rotations: (bs, T, 3); translations (bs, T, 3);
        deformation (bs, T, D) or None; object_in_scene (bs, T) bool.
        :return: dict with action_logits (bs, T-1, A),
            action_directions_distribution (bs, T-1, 2, S),
            sampled_action_directions (bs, T-1, S),
            action_states_distribution (bs, T, 2, S),
            sampled_action_states (bs, T, S).
        """
        box = jnp.asarray(self.bounding_box, rotations.dtype)
        box_size = box[:, 1] - box[:, 0]
        inputs = [encode_rotation(rotations), translations / box_size]
        if self.use_deformation:
            if deformation is None:
                raise ValueError("use_deformation requires a deformation input")
            inputs.append(deformation)
        x = jnp.concatenate(inputs, axis=-1)

        for layer_idx in range(self.cfg.action_network.layers_count):
            x = nn.Dense(
                self.cfg.action_network.layers_width, name=f"mlp_{layer_idx}"
            )(x)
            # affine=True like the reference's MaskedBatchNorm1d default
            # (masked_batch_norm.py:27, action_network_v5.py:55).
            x = MaskedBatchNorm(
                self.cfg.action_network.layers_width, use_scale_bias=True,
                name=f"bn_{layer_idx}",
            )(x, object_in_scene, use_running_average)
            x = nn.relu(x)

        s = self.cfg.action_space_dimension
        states_mean = nn.Dense(s, name="mean_fc")(x)
        states_log_variance = nn.Dense(s, name="log_variance_fc")(x)
        states_distribution = jnp.stack([states_mean, states_log_variance], axis=-2)

        key_states, key_directions = jax.random.split(sample_key)
        noise = jax.random.normal(key_states, states_mean.shape, states_mean.dtype)
        sampled_states = noise * jnp.exp(states_log_variance * 0.5) + states_mean

        # Difference distribution: mean difference, variance sum
        # (action_network_v5.py:145-155).
        directions_mean = states_mean[:, 1:] - states_mean[:, :-1]
        directions_variance = jnp.exp(states_log_variance[:, 1:]) + jnp.exp(
            states_log_variance[:, :-1]
        )
        directions_distribution = jnp.stack(
            [directions_mean, jnp.log(directions_variance)], axis=-2
        )
        dir_noise = jax.random.normal(
            key_directions, directions_mean.shape, directions_mean.dtype
        )
        sampled_directions = dir_noise * jnp.sqrt(directions_variance) + directions_mean

        action_logits = nn.Dense(self.cfg.actions_count, name="final_fc")(
            sampled_directions
        )
        return {
            "action_logits": action_logits,
            "action_directions_distribution": directions_distribution,
            "sampled_action_directions": sampled_directions,
            "action_states_distribution": states_distribution,
            "sampled_action_states": sampled_states,
        }


# ---------------------------------------------------------------------------
# Centroids (explicit EMA state)
# ---------------------------------------------------------------------------


def init_centroids(
    key: jax.Array, actions_count: int, space_dimension: int
) -> jnp.ndarray:
    """Random-normal initial centroids (centroid_estimator.py init)."""
    return jax.random.normal(key, (actions_count, space_dimension))


def update_centroids(
    centroids: jnp.ndarray,
    directions_distribution: jnp.ndarray,
    action_probabilities: jnp.ndarray,
    validity: jnp.ndarray,
    alpha: float,
) -> jnp.ndarray:
    """EMA update of per-action centroids from assignment-weighted direction
    means over valid transitions. Reference: centroid_estimator.py:38-69 +
    object_animation_model.py:224-243.

    :param centroids: (A, S) previous estimate.
    :param directions_distribution: (..., 2, S) (mean, logvar).
    :param action_probabilities: (..., A).
    :param validity: (...) boolean.
    :return: (A, S) updated centroids (stop-gradiented).
    """
    means = directions_distribution[..., 0, :].reshape(-1, centroids.shape[1])
    probs = action_probabilities.reshape(-1, centroids.shape[0])
    mask = validity.reshape(-1, 1).astype(means.dtype)
    probs = probs * mask

    weighted = jnp.einsum("na,ns->as", probs, means)
    weights = jnp.sum(probs, axis=0)[:, None]
    estimate = weighted / (weights + 1e-8)
    new_centroids = centroids * (1.0 - alpha) + estimate * alpha
    return jax.lax.stop_gradient(new_centroids)


def compute_variations(
    centroids: jnp.ndarray, points: jnp.ndarray, assignments: jnp.ndarray
) -> jnp.ndarray:
    """Variation of each point from its (assignment-weighted) centroid.
    Reference: centroid_estimator.py:71-94.

    :param points: (..., S); assignments (..., A).
    :return: (..., S).
    """
    diffs = points[..., None, :] - centroids  # (..., A, S)
    return jnp.sum(assignments[..., None] * diffs, axis=-2)


def compute_sequence_validity(object_in_scene: jnp.ndarray) -> jnp.ndarray:
    """valid_t = AND of in_scene_0..t (False propagates rightward).
    Reference: object_animation_model.py:182-198."""
    return jnp.cumprod(object_in_scene.astype(jnp.int32), axis=1).astype(bool)


# ---------------------------------------------------------------------------
# Animation model
# ---------------------------------------------------------------------------


class ObjectAnimationModel(nn.Module):
    """Action inference + centroid variations + autoregressive dynamics rollout
    for one dynamic object. Reference: model/object_animation_model.py:12-307.
    """

    cfg: AnimationModelConfig
    bounding_box: Tuple[Tuple[float, float], ...]
    use_deformation: bool = False
    force_rotation_axis_translation: Optional[float] = None

    def setup(self):
        self.action_network = ActionNetwork(
            self.cfg, self.bounding_box, self.use_deformation, name="action_network"
        )
        self.dynamics_network = DynamicsNetwork(
            self.cfg,
            self.bounding_box,
            self.force_rotation_axis_translation,
            name="dynamics_network",
        )

    def compute_actions(
        self,
        rotations,
        translations,
        deformation,
        object_in_scene,
        use_running_average: bool = False,
    ):
        """Action posterior + gumbel-softmax action sampling
        (object_animation_model.py:200-222)."""
        out = self.action_network(
            rotations,
            translations,
            deformation,
            object_in_scene,
            self.make_rng("action_sampling"),
            use_running_average,
        )
        log_probs = jax.nn.log_softmax(out["action_logits"], axis=-1)
        out["sampled_actions"] = gumbel_softmax(
            self.make_rng("gumbel"),
            log_probs,
            self.cfg.gumbel_temperature,
            self.cfg.hard_gumbel,
        )
        return out

    def rollout_dynamics(
        self,
        rotations,
        translations,
        style,
        deformation,
        actions,
        action_variations,
        ground_truth_observations,
    ):
        """Autoregressive reconstruction with scheduled teacher forcing: for
        t < ground_truth_observations the dynamics sees ground truth, else its
        own last output. Reference: object_animation_model.py:245-307.

        :param ground_truth_observations: scalar (traced ok) count of
            teacher-forced steps.
        :return: reconstructed (rotations, translations, style, deformation),
            each (bs, T, ...).
        """
        observations_count = rotations.shape[1]

        if not self.is_initializing():
            # The fused rollout (ops/fused_rollout): the whole T-step chain as
            # one custom-VJP op instead of ~50 tiny serial HLO ops per step —
            # phase-3 training is op-dispatch-bound on TPU. The module path
            # below runs only during init (it declares the parameters).
            from playableenvironments_tpu.ops import fused_rollout as fr

            rollout_cfg = fr.RolloutConfig(
                rotation_axis=self.cfg.dynamics.rotation_axis,
                force_rotations_zero=self.cfg.dynamics.force_rotations_zero,
                force_axis_translation=(
                    (
                        self.force_rotation_axis_translation
                        if self.force_rotation_axis_translation is not None
                        else 0.0
                    )
                    if self.cfg.dynamics.force_z_translations_zero
                    else None
                ),
                box_size=tuple(
                    float(hi - lo) for lo, hi in self.bounding_box
                ),
            )
            packed = fr.pack_dynamics_params(
                self.dynamics_network.variables["params"]
            )
            return fr.fused_rollout(
                rollout_cfg, packed, rotations, translations, style,
                deformation, actions, action_variations,
                jnp.asarray(ground_truth_observations, jnp.int32),
                # Real Pallas kernels on TPU only; every other backend takes
                # the pure-XLA path (the kernels use pltpu memory spaces and
                # would fail to lower on GPU; tests exercise them on CPU via
                # interpret mode explicitly).
                jax.default_backend() == "tpu",
            )

        state_0 = (rotations[:, 0], translations[:, 0], style[:, 0], deformation[:, 0])

        # Step 0 always consumes the ground-truth initial state (rec[0] is the
        # GT frame); it also initializes the learnable LSTM carry (carry=None).
        lstm_carry, state_1 = self.dynamics_network(
            None, *state_0, actions[:, 0], action_variations[:, 0]
        )
        if observations_count == 2:
            return tuple(
                jnp.stack([a, b], axis=1) for a, b in zip(state_0, state_1)
            )

        # Steps 1..T-2 as a lax.scan over the time axis (the reference's
        # Python loop, object_animation_model.py:245-307, unrolls the whole
        # rollout into the graph; scan keeps the program small and
        # compile-fast). Teacher forcing picks GT vs the previous output with
        # a traced step counter, so annealing never recompiles.
        def body(module, carry, xs):
            cell_carry, prev_state, t = carry
            gt_state = xs[:4]
            action, variation = xs[4], xs[5]
            use_gt = t < ground_truth_observations
            current = tuple(
                jnp.where(use_gt, gt, prev)
                for gt, prev in zip(gt_state, prev_state)
            )
            new_cell_carry, next_state = module(
                cell_carry, *current, action, variation
            )
            return (new_cell_carry, next_state, t + 1), next_state

        # Fully unrolled: T <= ~16 everywhere, and on TPU a rolled scan of
        # tiny LSTM steps pays a fixed per-kernel cost serially (profiled at
        # ~0.1 ms per elementwise op); unrolling lets XLA fuse across
        # iterations and across objects while keeping the scan's small
        # program representation at trace time.
        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
            unroll=max(observations_count - 2, 1),
        )
        xs = (
            rotations[:, 1:-1],
            translations[:, 1:-1],
            style[:, 1:-1],
            deformation[:, 1:-1],
            actions[:, 1:],
            action_variations[:, 1:],
        )
        _, states = scan(
            self.dynamics_network,
            (lstm_carry, state_1, jnp.asarray(1, jnp.int32)),
            xs,
        )
        return tuple(
            jnp.concatenate([s0[:, None], s1[:, None], rest], axis=1)
            for s0, s1, rest in zip(state_0, state_1, states)
        )

    def __call__(
        self,
        rotations: jnp.ndarray,
        translations: jnp.ndarray,
        style: jnp.ndarray,
        deformation: jnp.ndarray,
        object_in_scene: jnp.ndarray,
        ground_truth_observations,
        centroids: jnp.ndarray,
        action_modifier=None,
        use_running_average: bool = False,
    ) -> Dict:
        """Full forward (object_animation_model.py:86-180).

        :param centroids: (A, S) current EMA centroids (train-state extra).
        :return: results dict (reconstructed states, action tensors,
            sequence_validity, estimated_action_centroids=UPDATED centroids —
            carry them back into the train state).
        """
        sequence_validity = compute_sequence_validity(object_in_scene)

        actions_out = self.compute_actions(
            rotations, translations, deformation, object_in_scene,
            use_running_average,
        )
        action_probabilities = jax.nn.softmax(actions_out["action_logits"], axis=-1)

        if not use_running_average:
            centroids = update_centroids(
                centroids,
                actions_out["action_directions_distribution"],
                action_probabilities,
                sequence_validity[:, :-1],
                self.cfg.centroid_alpha,
            )

        action_variations = compute_variations(
            centroids,
            actions_out["sampled_action_directions"],
            actions_out["sampled_actions"],
        )
        sampled_actions = actions_out["sampled_actions"]
        if action_modifier is not None:
            sampled_actions, action_variations = action_modifier(
                sampled_actions, action_variations
            )

        rec_rot, rec_trans, rec_style, rec_deform = self.rollout_dynamics(
            rotations, translations, style, deformation,
            sampled_actions, action_variations, ground_truth_observations,
        )

        # Re-infer actions from the reconstructed states (for the MI loss,
        # object_animation_model.py:144-150).
        rec_actions_out = self.compute_actions(
            rec_rot, rec_trans, rec_deform, object_in_scene, use_running_average
        )

        return {
            "reconstructed_object_rotations": rec_rot,
            "reconstructed_object_translations": rec_trans,
            "reconstructed_object_style": rec_style,
            "reconstructed_object_deformation": rec_deform,
            "sampled_actions": sampled_actions,
            "action_logits": actions_out["action_logits"],
            "action_directions_distribution": actions_out["action_directions_distribution"],
            "sampled_action_directions": actions_out["sampled_action_directions"],
            "action_states_distribution": actions_out["action_states_distribution"],
            "sampled_action_states": actions_out["sampled_action_states"],
            "action_variations": action_variations,
            "reconstructed_action_logits": rec_actions_out["action_logits"],
            "reconstructed_action_directions_distribution": rec_actions_out[
                "action_directions_distribution"
            ],
            "reconstructed_sampled_action_directions": rec_actions_out[
                "sampled_action_directions"
            ],
            "reconstructed_action_states_distribution": rec_actions_out[
                "action_states_distribution"
            ],
            "reconstructed_sampled_action_states": rec_actions_out[
                "sampled_action_states"
            ],
            "sequence_validity": sequence_validity,
            "estimated_action_centroids": centroids,
        }
