"""PlayableEnvironmentModel: the frozen synthesis model + per-object action
modules, plus the interactive generation API.

Replaces model/playable_environment_model.py (+_v2, +_discriminator): the
environment model is frozen (phase 3 trains only the animation models and
discriminators — the trainer stop-gradients the scene encoding and optimizes
only the playable parameter subtree); training operates purely in
scene-encoding space and never renders (SURVEY.md §3.2); interactive
generation threads explicit dynamics carries instead of module-held memory.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from playableenvironments_tpu.config import ObjectIds, SceneConfig
from playableenvironments_tpu.models.action import ObjectAnimationModel
from playableenvironments_tpu.models.discriminator import SequenceDiscriminator
from playableenvironments_tpu.scene.encoding import SceneEncoding


class PlayableEnvironmentModel(nn.Module):
    """Animation models (and optional discriminators) over scene encodings.

    One ObjectAnimationModel per dynamic object *model*; dynamic objects
    sharing a model share parameters (object_ids mapping). Methods:
    - `animate(encoding, ground_truth_observations, centroids)` — phase-3
      forward (reference forward_vanilla, playable_environment_model.py:147-199)
    - `discriminate(sequences, validity, model_idx)` — GAN scoring
    - `dynamics_step(...)` / `infer_single_actions(...)` — interactive pieces
    """

    scene: SceneConfig
    with_discriminators: bool = False
    discriminator_codes: Tuple[str, ...] = ("translation", "action", "action_direction")

    def setup(self):
        self.object_ids = ObjectIds(self.scene)
        animation_models = []
        for anim_idx, cfg in enumerate(self.scene.animation_models):
            model_idx = self.object_ids.static_models_count + anim_idx
            box = self.scene.object_models[model_idx].bounding_box
            animation_models.append(
                ObjectAnimationModel(cfg, box, name=f"animation_model_{anim_idx}")
            )
        self.animation_models = animation_models
        if self.with_discriminators:
            self.discriminators = [
                SequenceDiscriminator(name=f"discriminator_{i}")
                for i in range(len(self.scene.animation_models))
            ]

    # ------------------------------------------------------------------

    def animate(
        self,
        encoding: SceneEncoding,
        ground_truth_observations,
        centroids: List[jnp.ndarray],
        action_modifier=None,
        use_running_average: bool = False,
    ) -> List[Dict]:
        """Run each dynamic object's animation model over its state sequence.

        :param encoding: scene encoding (cameras collapsed; object state is
            per observation).
        :param centroids: per-dynamic-object (A, S) EMA centroids.
        :return: list over dynamic objects of animation result dicts
            (each containing its updated "estimated_action_centroids").
        """
        results = []
        for dynamic_idx in range(self.object_ids.dynamic_objects_count):
            object_idx = self.object_ids.object_idx_by_dynamic_object_idx(dynamic_idx)
            anim_idx = self.object_ids.animation_model_idx_by_dynamic_object_idx(
                dynamic_idx
            )
            module = self.animation_models[anim_idx]
            results.append(
                module(
                    encoding.object_rotations[..., object_idx, :],
                    encoding.object_translations[..., object_idx, :],
                    encoding.object_style[..., object_idx, :],
                    encoding.object_deformation[..., object_idx, :],
                    encoding.object_in_scene[..., object_idx],
                    ground_truth_observations,
                    centroids[dynamic_idx],
                    action_modifier,
                    use_running_average,
                )
            )
        return results

    def discriminate(
        self,
        results: List[Dict],
        encoding: SceneEncoding,
        use_reconstructed: bool,
        update_sn_stats: bool = True,
    ) -> List[jnp.ndarray]:
        """Score per-object sequences. Real = ground-truth scene encoding,
        fake = dynamics reconstructions; both detached by the trainer.
        Code assembly follows playable_environment_model_discriminator.py:196-294.

        :return: list over dynamic objects of (bs,) logits.
        """
        logits = []
        for dynamic_idx, res in enumerate(results):
            object_idx = self.object_ids.object_idx_by_dynamic_object_idx(dynamic_idx)
            anim_idx = self.object_ids.animation_model_idx_by_dynamic_object_idx(
                dynamic_idx
            )
            codes = []
            if "translation" in self.discriminator_codes:
                codes.append(
                    res["reconstructed_object_translations"]
                    if use_reconstructed
                    else encoding.object_translations[..., object_idx, :]
                )
            if "deformation" in self.discriminator_codes:
                codes.append(
                    res["reconstructed_object_deformation"]
                    if use_reconstructed
                    else encoding.object_deformation[..., object_idx, :]
                )
            if "action" in self.discriminator_codes:
                actions = (
                    jax.nn.softmax(res["reconstructed_action_logits"], axis=-1)
                    if use_reconstructed
                    else jax.nn.softmax(res["action_logits"], axis=-1)
                )
                codes.append(_pad_time(actions, res["sequence_validity"].shape[1]))
            if "action_direction" in self.discriminator_codes:
                directions = (
                    res["reconstructed_sampled_action_directions"]
                    if use_reconstructed
                    else res["sampled_action_directions"]
                )
                codes.append(_pad_time(directions, res["sequence_validity"].shape[1]))
            sequence = jnp.concatenate(codes, axis=-1)
            logits.append(
                self.discriminators[anim_idx](
                    sequence, res["sequence_validity"], update_sn_stats
                )
            )
        return logits

    # ------------------------------------------------------------------
    # Interactive generation primitives
    # ------------------------------------------------------------------

    def infer_single_actions(
        self,
        encoding: SceneEncoding,
        centroids: List[jnp.ndarray],
    ) -> List[Dict]:
        """Action inference only (no rollout) over a short state sequence —
        used by evaluators re-enacting ground-truth sequences."""
        results = []
        for dynamic_idx in range(self.object_ids.dynamic_objects_count):
            object_idx = self.object_ids.object_idx_by_dynamic_object_idx(dynamic_idx)
            anim_idx = self.object_ids.animation_model_idx_by_dynamic_object_idx(
                dynamic_idx
            )
            module = self.animation_models[anim_idx]
            out = module.compute_actions(
                encoding.object_rotations[..., object_idx, :],
                encoding.object_translations[..., object_idx, :],
                encoding.object_deformation[..., object_idx, :],
                encoding.object_in_scene[..., object_idx],
                use_running_average=True,
            )
            out["action_variations"] = None
            results.append(out)
        return results

    def rollout_single(
        self,
        dynamic_idx: int,
        rotations: jnp.ndarray,
        translations: jnp.ndarray,
        style: jnp.ndarray,
        deformation: jnp.ndarray,
        actions: jnp.ndarray,
        action_variations: jnp.ndarray,
        ground_truth_observations=1,
    ):
        """Whole-trajectory dynamics rollout for ONE dynamic object — the
        single-dispatch path evaluators use for per-action videos
        (playable_model_evaluator.py:123-206 drives the same chain one torch
        step at a time; here the full T-step chain is one fused rollout op).

        :param rotations/translations/style/deformation: (bs, T, F) state
            sequences; with ground_truth_observations=1 only frame 0 seeds
            the rollout and the rest is autoregressive.
        :param actions: (bs, T-1, A) one-hots; action_variations (bs, T-1, S).
        :return: reconstructed (rotations, translations, style, deformation),
            each (bs, T, F); index 0 is the ground-truth frame.
        """
        anim_idx = self.object_ids.animation_model_idx_by_dynamic_object_idx(
            dynamic_idx
        )
        return self.animation_models[anim_idx].rollout_dynamics(
            rotations, translations, style, deformation,
            actions, action_variations, ground_truth_observations,
        )

    def dynamics_step(
        self,
        dynamic_idx: int,
        carry,
        rotations: jnp.ndarray,
        translations: jnp.ndarray,
        style: jnp.ndarray,
        deformation: jnp.ndarray,
        action_one_hot: jnp.ndarray,
        action_variation: jnp.ndarray,
    ):
        """One interactive dynamics step for one object
        (playable_environment_model.py:295-396's per-object core). Carry is
        explicit; None initializes from the learned initial state.

        :return: (new_carry, (rotations, translations, style, deformation)).
        """
        anim_idx = self.object_ids.animation_model_idx_by_dynamic_object_idx(
            dynamic_idx
        )
        module = self.animation_models[anim_idx]
        return module.dynamics_network(
            carry, rotations, translations, style, deformation,
            action_one_hot, action_variation,
        )


def _pad_time(tensor: jnp.ndarray, target_t: int) -> jnp.ndarray:
    """Right-pad a (bs, T-1, F) tensor with zeros to (bs, target_t, F)."""
    pad = target_t - tensor.shape[1]
    if pad <= 0:
        return tensor
    return jnp.pad(tensor, ((0, 0), (0, pad), (0, 0)))
