"""Phase-3 training-time evaluator.

Replaces evaluation/playable_model_evaluator.py: (1) validation losses on a
held-out split (:88-121), (2) per-action generated videos driven through the
interactive dynamics API (:123-206), (3) ground-truth sequence
reconstructions re-enacted from one GT frame with inferred actions under the
zero-variation action modifier (:208-375). Artifacts land under
`<results>/playable_eval/step_<N>/` as mp4/gif + PNG strips; validation
losses go through the Logger with a `val_` prefix.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from playableenvironments_tpu.config import ObjectIds
from playableenvironments_tpu.eval.action_modifiers import (
    zero_variation_action_modifier,
)
from playableenvironments_tpu.render.playable_model import PlayableEnvironmentModel
from playableenvironments_tpu.scene.encoding import SceneEncoding


def _broadcast_frame0(encoding: SceneEncoding, frames: int) -> SceneEncoding:
    """Repeat the frame-0 state across a length-`frames` time axis."""

    def tile(x):
        return jnp.broadcast_to(x[:, :1], (x.shape[0], frames) + x.shape[2:])

    return jax.tree.map(tile, encoding)


class PlayableModelEvaluator:
    """Periodic qualitative + quantitative phase-3 evaluation."""

    def __init__(
        self,
        trainer,
        dataset,
        results_dir: str,
        batch_size: int = 2,
        val_batches: int = 2,
        action_video_frames: int = 8,
        framerate: int = 5,
        patch_strides: Optional[Sequence[int]] = None,
        seed: int = 0,
    ):
        """:param trainer: PlayableTrainer (provides the frozen env model,
            loss computation, and object-id mapping).
        :param dataset: validation MulticameraVideoDataset (phase-3 windows).
        """
        self.trainer = trainer
        self.dataset = dataset
        self.results_dir = results_dir
        self.batch_size = batch_size
        self.val_batches = val_batches
        self.action_video_frames = action_video_frames
        self.framerate = framerate
        self.patch_strides = list(patch_strides) if patch_strides else None
        self.seed = seed
        self.object_ids = ObjectIds(trainer.environment_model.scene)
        self._val_loss_fn = jax.jit(self._val_losses_impl)
        # One jitted whole-trajectory rollout per dynamic object (the cache
        # holds at most dynamic_objects_count entries); dynamic_idx is static
        # because it selects the animation-model submodule.
        self._rollout_fn = jax.jit(self._rollout_impl, static_argnums=0)

    # ------------------------------------------------------------------

    def _env_variables(self, state) -> Dict:
        env = state.extra["environment"]
        return {"params": env["params"], "batch_stats": env["batch_stats"]}

    def _playable_variables(self, state) -> Dict:
        return {"params": state.params, "batch_stats": state.batch_stats}

    def _centroids(self, state) -> List[jnp.ndarray]:
        return self.trainer._per_object_centroids(
            [
                state.extra["centroids"][str(i)]
                for i in range(len(self.trainer.scene_animation_configs()))
            ]
        )

    def _renderer(self, state, image_size):
        from playableenvironments_tpu.eval.creators import FrameRenderer

        return FrameRenderer(
            self.trainer.environment_model,
            self._env_variables(state),
            image_size,
            patch_strides=self.patch_strides,
        )

    # ------------------------------------------------------------------
    # 1. Validation losses (playable_model_evaluator.py:88-121)
    # ------------------------------------------------------------------

    def _val_losses_impl(self, params, batch_stats, extra, encoding, key, step):
        _, (metrics, _, _, _, _) = self.trainer.compute_losses(
            params, batch_stats, extra, encoding, key, step
        )
        return metrics

    def _rollout_impl(
        self, dynamic_idx, variables, rotations, translations, style,
        deformation, actions, variations,
    ):
        """Whole-trajectory rollout for one dynamic object as ONE fused op
        (replaces the reference's per-timestep torch loop,
        playable_model_evaluator.py:123-206)."""
        return self.trainer.playable_model.apply(
            variables, dynamic_idx, rotations, translations, style,
            deformation, actions, variations, 1,
            method=PlayableEnvironmentModel.rollout_single,
        )

    def validation_losses(self, state) -> Dict[str, float]:
        sums: Dict[str, float] = {}
        count = 0
        iterator = self.dataset.iterate_batches(
            self.batch_size, shuffle=False, drop_last=False
        )
        for batch_idx, batch in enumerate(iterator):
            if batch_idx >= self.val_batches:
                break
            key = jax.random.fold_in(jax.random.PRNGKey(self.seed + 7), batch_idx)
            encoding = self.trainer.encode_batch(state.extra, batch, key)
            metrics = self._val_loss_fn(
                state.params, state.batch_stats, state.extra, encoding, key,
                state.step,
            )
            for name, value in metrics.items():
                sums[name] = sums.get(name, 0.0) + float(value)
            count += 1
        return {f"val_{k}": v / max(count, 1) for k, v in sums.items()}

    # ------------------------------------------------------------------
    # 2. Per-action generated videos (playable_model_evaluator.py:123-206)
    # ------------------------------------------------------------------

    def generate_action_video(
        self, state, encoding: SceneEncoding, action_idx: int, renderer
    ) -> np.ndarray:
        """Roll the dynamics forward from the frame-0 state with a fixed
        action for every dynamic object, rendering each step. One jitted
        fused-rollout dispatch per object (not T x O Python steps).

        :param encoding: (1, T>=1, ...) scene encoding; frame 0 is the seed.
        :param renderer: FrameRenderer built for this batch's image size.
        :return: (frames, H, W, 3) rendered rollout.
        """
        variables = self._playable_variables(state)
        static = self.object_ids.static_objects_count
        frames = self.action_video_frames

        rollout = _broadcast_frame0(encoding, frames)
        rot = rollout.object_rotations
        trans = rollout.object_translations
        style = rollout.object_style
        deform = rollout.object_deformation

        for dynamic_idx in range(self.object_ids.dynamic_objects_count):
            obj = static + dynamic_idx
            anim_cfg = self.trainer.scene_animation_configs()[
                self.object_ids.animation_model_idx_by_dynamic_object_idx(dynamic_idx)
            ]
            # evaluate() iterates to the scene-wide max action count; objects
            # with fewer actions clamp to their last action instead of being
            # driven with an undefined all-zero one-hot.
            one_hot = jax.nn.one_hot(
                jnp.full(
                    (1, frames - 1),
                    min(action_idx, anim_cfg.actions_count - 1),
                    dtype=jnp.int32,
                ),
                anim_cfg.actions_count,
            )
            variation = jnp.zeros((1, frames - 1, anim_cfg.action_space_dimension))
            rec = self._rollout_fn(
                dynamic_idx, variables,
                rot[:, :, obj], trans[:, :, obj],
                style[:, :, obj], deform[:, :, obj],
                one_hot, variation,
            )
            rot = rot.at[:, :, obj].set(rec[0])
            trans = trans.at[:, :, obj].set(rec[1])
            style = style.at[:, :, obj].set(rec[2])
            deform = deform.at[:, :, obj].set(rec[3])

        rollout = rollout.replace(
            object_rotations=rot, object_translations=trans,
            object_style=style, object_deformation=deform,
        )
        return np.asarray(renderer.render(rollout))[0, :, 0]  # (T, H, W, 3)

    # ------------------------------------------------------------------
    # 3. Sequence reconstructions with the zero-variation action modifier
    #    (playable_model_evaluator.py:208-375)
    # ------------------------------------------------------------------

    def reenact_sequence(self, state, encoding: SceneEncoding, renderer) -> np.ndarray:
        """1 GT frame + inferred actions (zero variation) -> rendered rollout.

        :return: (T, H, W, 3) reconstruction frames for batch element 0.
        """
        playable = self.trainer.playable_model
        results, _ = playable.apply(
            self._playable_variables(state),
            encoding,
            1,
            self._centroids(state),
            zero_variation_action_modifier,
            True,
            method=PlayableEnvironmentModel.animate,
            rngs={
                "action_sampling": jax.random.PRNGKey(self.seed),
                "gumbel": jax.random.PRNGKey(self.seed + 1),
            },
            mutable=["batch_stats"],
        )
        static = self.object_ids.static_objects_count
        rot = encoding.object_rotations
        trans = encoding.object_translations
        style = encoding.object_style
        deform = encoding.object_deformation
        for dyn_idx, res in enumerate(results):
            obj = static + dyn_idx
            rot = rot.at[..., obj, :].set(res["reconstructed_object_rotations"])
            trans = trans.at[..., obj, :].set(
                res["reconstructed_object_translations"]
            )
            style = style.at[..., obj, :].set(res["reconstructed_object_style"])
            deform = deform.at[..., obj, :].set(
                res["reconstructed_object_deformation"]
            )
        reenacted = encoding.replace(
            object_rotations=rot, object_translations=trans,
            object_style=style, object_deformation=deform,
        )
        return np.asarray(renderer.render(reenacted))[0, :, 0]

    # ------------------------------------------------------------------

    def evaluate(self, state, logger, step: int) -> Dict[str, float]:
        """Run all three evaluation products; returns the validation losses."""
        from playableenvironments_tpu.utils.video_io import save_gif, save_video

        losses = self.validation_losses(state)
        logger.log(losses, step)

        out_dir = os.path.join(self.results_dir, "playable_eval", f"step_{step}")
        os.makedirs(out_dir, exist_ok=True)

        batch = next(
            self.dataset.iterate_batches(1, shuffle=False, drop_last=False)
        )
        image_size = batch.observations.shape[-3:-1]
        renderer = self._renderer(state, image_size)
        key = jax.random.PRNGKey(self.seed + 13)
        encoding = self.trainer.encode_batch(state.extra, batch, key)

        actions_count = max(
            cfg.actions_count for cfg in self.trainer.scene_animation_configs()
        )
        for action_idx in range(actions_count):
            frames = self.generate_action_video(
                state, encoding, action_idx, renderer
            )
            base = os.path.join(out_dir, f"action_{action_idx}")
            try:
                save_video(list(frames), base + ".mp4", framerate=self.framerate)
            except (OSError, RuntimeError):
                pass  # no ffmpeg on this host; the gif still lands
            save_gif(list(frames), base + ".gif", framerate=self.framerate)

        reconstruction = self.reenact_sequence(state, encoding, renderer)
        ground_truth = np.asarray(batch.observations[0, :, 0])
        strip = np.concatenate(
            [
                np.concatenate(list(ground_truth), axis=1),
                np.concatenate(list(reconstruction), axis=1),
            ],
            axis=0,
        )
        logger.log_image("playable_reenactment", strip, step)
        save_gif(
            list(reconstruction),
            os.path.join(out_dir, "reenactment.gif"),
            framerate=self.framerate,
        )
        return losses


def build_playable_evaluator(
    cfg: Dict, trainer, train_dataset, results_dir: str, seed: int = 0
) -> PlayableModelEvaluator:
    """Assemble the evaluator from the experiment YAML: a `val` split when
    present (falling back to the training dataset), the AE patch strides when
    the synthesis model renders through the decoder."""
    from playableenvironments_tpu.cli.common import (
        build_dataset,
        with_batching_overrides,
    )

    t = cfg.get("playable_model_training", {})
    # Spread the phase-3 batching section as OVERRIDES over training.batching
    # so keys it omits (allowed_cameras, observation_stacking) keep the
    # training values the model's camera memory was sized from.
    try:
        dataset = build_dataset(
            with_batching_overrides(cfg, **t.get("batching", {})), "val"
        )
    except FileNotFoundError:
        dataset = train_dataset

    patch_strides = None
    if trainer.environment_model.scene.autoencoder is not None:
        from playableenvironments_tpu.models.autoencoder import autoencoder_strides

        patch_strides = autoencoder_strides(
            trainer.environment_model.scene.autoencoder
        )
    return PlayableModelEvaluator(
        trainer,
        dataset,
        results_dir,
        batch_size=int(t.get("eval_batch_size", 2)),
        val_batches=int(t.get("eval_batches", 2)),
        action_video_frames=int(t.get("eval_action_video_frames", 8)),
        patch_strides=patch_strides,
        seed=seed,
    )
