"""Phase-2 synthesis trainer: the jitted train step for the environment model.

Replaces training/trainer.py (723 LoC of epoch loops, profiler plumbing, and
host-side loss assembly) with one pure loss function + one pjit-able train
step. Loss set and annealing schedules mirror trainer.py:367-536:
reconstruction, ray-object-distance, displacement magnitude, annealed
divergence, per-dynamic-object opacity/sharpness/attention, bounding-box
distance.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from playableenvironments_tpu.config import ObjectIds, SceneConfig
from playableenvironments_tpu.data.batching import Batch
from playableenvironments_tpu.render.environment_model import EnvironmentModel
from playableenvironments_tpu.train import losses
from playableenvironments_tpu.train.state import TrainState, create_train_state, make_optimizer


@dataclass(frozen=True)
class LossWeights:
    """Phase-2 loss weights (configs/*/193...yaml `training.loss_weights`)."""

    reconstruction: float = 1.0
    perceptual: float = 0.0
    ray_object_distance: float = 0.0
    bounding_box: float = 0.0
    displacements_magnitude: float = 0.0
    divergence: float = 0.0
    opacity: float = 0.0
    attention: float = 0.0
    sharpness: float = 0.0
    sharpness_mean: float = 0.5
    sharpness_std: float = 0.15
    # Auxiliary consistency supervision (trainer.py:646-659; used when the
    # dataset carries optical flow / keypoints).
    pose_consistency: float = 0.0
    keypoint_consistency: float = 0.0
    keypoint_opacity: float = 0.0
    keypoint_confidence_threshold: float = 0.3
    consistency_samples: int = 16


@dataclass(frozen=True)
class SynthesisTrainingConfig:
    learning_rate: float = 5e-4
    lr_gamma: float = 0.926118
    lr_decay_iterations: int = 10000
    weight_decay: float = 0.0
    max_steps: int = 300000
    samples_per_image: int = 144
    perturb: bool = True
    shuffle_style: bool = True
    patch_size: int = 0
    patch_strides: Tuple[int, ...] = ()
    loss_weights: LossWeights = field(default_factory=LossWeights)
    # Decoder path (the published phase-2 pipeline,
    # trainer_multiresolution_backpropagated_decoder.py): decode NeRF feature
    # patches through the VAE decoder and reconstruct the cropped GT patch.
    decode_patches: bool = False
    crop_to_patch: bool = True
    autoencoder_learning_rate: float = 1e-4
    frozen_autoencoder_steps: int = 0
    # Per-frame camera offsets train under their OWN rate (the reference's
    # separate camera-parameters Adam, trainer.py:34-39) — default 0.0 like
    # configuration.py:98, i.e. frozen unless the config opts in.
    camera_parameters_learning_rate: float = 0.0
    # Rematerialize the forward (jax.checkpoint): recompute activations in
    # the backward instead of keeping them alive — headroom for more rays
    # per image / larger batches on one chip.
    remat: bool = False


RNG_STREAMS = ("ray_sampling", "sampling", "alpha_noise", "style_shuffle", "divergence")


def split_rngs(key: jax.Array) -> Dict[str, jax.Array]:
    keys = jax.random.split(key, len(RNG_STREAMS))
    return dict(zip(RNG_STREAMS, keys))


class SynthesisTrainer:
    """Builds the jitted phase-2 train/eval steps for an EnvironmentModel."""

    def __init__(self, model: EnvironmentModel, cfg: SynthesisTrainingConfig):
        self.model = model
        self.cfg = cfg
        self.object_ids = ObjectIds(model.scene)
        if cfg.decode_patches and cfg.patch_size and not cfg.crop_to_patch:
            # The decoded output is a patch; comparing it against the FULL
            # image is a shape mismatch deep inside the loss. (The reference
            # only disables the crop on whole-image-grid variants.)
            raise ValueError(
                "decode_patches with patch_size > 0 requires "
                "crop_to_patch=True (the decoded patch must be compared "
                "against the matching GT crop); set training.crop_to_patch "
                "or drop patch rendering"
            )

    # ------------------------------------------------------------------

    def init_state(self, key: jax.Array, example_batch: Batch) -> TrainState:
        # jit the init: eager flax init dispatches per-op, which is seconds
        # per dispatch over a tunneled TPU (see __graft_entry__.entry).
        init_fn = jax.jit(
            functools.partial(
                self.model.init,
                samples_per_image=self.cfg.samples_per_image,
                patch_size=self.cfg.patch_size,
                patch_strides=self.cfg.patch_strides or None,
                decode_patches=self.cfg.decode_patches,
            )
        )
        variables = init_fn(
            {**split_rngs(key), "params": key},
            *example_batch.environment_model_args(),
        )
        # Camera offsets form their own lr group (reference's separate
        # camera-parameters Adam; rate 0.0 by default = frozen) — but ONLY
        # when the model has them: an unconditional extra group would change
        # the opt_state pytree structure and break restoring checkpoints
        # saved without it.
        group_lrs = {}
        if self.model.enable_camera_offsets:
            group_lrs["camera_offsets"] = self.cfg.camera_parameters_learning_rate
        freeze = None
        if self.cfg.decode_patches:
            # The autoencoder gets its own (freezable) learning rate
            # (trainer_backpropagated_autoencoder.py:63-90, 118-121).
            group_lrs["autoencoder"] = self.cfg.autoencoder_learning_rate
            freeze = {"autoencoder": self.cfg.frozen_autoencoder_steps}
        tx = make_optimizer(
            self.cfg.learning_rate,
            self.cfg.lr_gamma,
            self.cfg.lr_decay_iterations,
            self.cfg.weight_decay,
            group_learning_rates=group_lrs,
            group_freeze_steps=freeze,
        )
        return create_train_state(
            variables["params"], variables.get("batch_stats", {}), tx
        )

    # ------------------------------------------------------------------

    def compute_losses(
        self,
        params,
        batch_stats,
        batch: Batch,
        key: jax.Array,
        step: jnp.ndarray,
    ):
        """(loss, (metrics, new_batch_stats, results)). Pure; differentiable in
        params. Mirrors trainer.py:367-536."""
        w = self.cfg.loss_weights
        compute_divergence = w.divergence > 0.0

        def forward(params, batch_stats, batch, key, step):
            return self.model.apply(
                {"params": params, "batch_stats": batch_stats},
                *batch.environment_model_args(),
                samples_per_image=self.cfg.samples_per_image,
                perturb=self.cfg.perturb,
                patch_size=self.cfg.patch_size,
                patch_strides=self.cfg.patch_strides or None,
                shuffle_style=self.cfg.shuffle_style,
                step=step,
                train=True,
                compute_divergence=compute_divergence,
                decode_patches=self.cfg.decode_patches,
                rngs=split_rngs(key),
                mutable=["batch_stats"],
            )

        if self.cfg.remat:
            # Policy-based remat (training.remat): save ONLY matmul outputs
            # inside the forward; elementwise chains (positional encodings,
            # activations, pads, masks) recompute in the backward. A
            # monolithic no-policy checkpoint would NOT cut peak memory —
            # the backward re-materializes every residual at once. The
            # fused NeRF kernel keeps its hand-derived VJP under remat.
            forward = jax.checkpoint(
                forward, policy=jax.checkpoint_policies.dots_saveable
            )
        results, mutated = forward(params, batch_stats, batch, key, step)

        static_objects = self.object_ids.static_objects_count
        object_in_scene = jnp.any(batch.bounding_boxes_validity, axis=2)

        sampled_observations = results["observations"]
        metrics: Dict[str, jnp.ndarray] = {}
        total = jnp.zeros(())

        divergence_annealing = (1.0 / 100.0) ** (1.0 - step / self.cfg.max_steps)
        sharpness_annealing = jnp.minimum(1.0, step / self.cfg.max_steps)

        # GT patch crop for the decoder path (trainer_multiresolution_
        # backpropagated_decoder.py:86-92).
        cropped_observations = None
        if self.cfg.decode_patches and self.cfg.crop_to_patch:
            from playableenvironments_tpu.render import sampling as sampling_lib

            finest_positions = sampling_lib.split_strided_samples(
                results["positions"], self.cfg.patch_size, self.cfg.patch_strides
            )[0]
            cropped_observations = sampling_lib.crop_region_from_patch_positions(
                batch.observations,
                finest_positions,
                self.cfg.patch_size,
                self.cfg.patch_strides[0],
            )

        for pass_name in ("coarse", "fine"):
            if pass_name not in results:
                continue
            global_results = results[pass_name]["global"]
            reconstructed = global_results["integrated_features"]

            if self.cfg.decode_patches:
                decoded = global_results["reconstructed_observations"]
                target = (
                    cropped_observations
                    if cropped_observations is not None
                    else batch.observations
                )
                rec = losses.image_reconstruction_loss(target, decoded)
            else:
                rec = losses.reconstruction_loss(sampled_observations, reconstructed)
            disp = jnp.mean(global_results["integrated_displacements_magnitude"])
            div = jnp.mean(global_results["integrated_divergence"])

            metrics[f"{pass_name}_reconstruction_loss"] = rec
            metrics[f"{pass_name}_displacements_magnitude_loss"] = disp
            metrics[f"{pass_name}_divergence_loss"] = div

            total = total + w.reconstruction * rec
            if not self.cfg.decode_patches:
                # Rays carry RGB only on the direct path; the decoder trainer
                # does not use this loss (it renders feature patches).
                rod = losses.ray_object_distance_loss(
                    sampled_observations,
                    reconstructed,
                    results["ray_object_distances"][..., static_objects:],
                )
                metrics[f"{pass_name}_ray_object_distance_loss"] = rod
                total = total + w.ray_object_distance * rod
            total = total + w.displacements_magnitude * disp
            total = total + w.divergence * divergence_annealing * div

            # Per-dynamic-object opacity/sharpness (trainer.py:466-482).
            for object_idx in range(static_objects, self.object_ids.objects_count):
                dyn_idx = self.object_ids.dynamic_object_idx_by_object_idx(object_idx)
                validity = batch.bounding_boxes_validity[..., dyn_idx]
                opacity = results[pass_name][f"object_{object_idx}"]["opacity"]
                op = losses.opacity_loss(opacity, validity)
                sh = losses.sharpness_loss(
                    opacity, validity, w.sharpness_mean, w.sharpness_std
                )
                metrics[f"{pass_name}_object_{object_idx}_opacity_loss"] = op
                metrics[f"{pass_name}_object_{object_idx}_sharpness_loss"] = sh
                total = total + w.opacity * op
                total = total + w.sharpness * sharpness_annealing * sh

        # Attention losses on dynamic objects (trainer.py:488-497).
        for object_idx in range(static_objects, self.object_ids.objects_count):
            dyn_idx = self.object_ids.dynamic_object_idx_by_object_idx(object_idx)
            validity = batch.bounding_boxes_validity[:, :, 0, dyn_idx]
            att = losses.attention_loss(
                results["object_attention"][object_idx], validity
            )
            metrics[f"object_{object_idx}_attention_loss"] = att
            total = total + w.attention * att

        # Bounding-box distance on dynamic objects (trainer.py:499-507);
        # a scene with no dynamic objects has nothing to constrain.
        if batch.bounding_boxes.shape[-2] > 0:
            bbox_loss, per_object_bbox = losses.bounding_box_distance_loss(
                jax.lax.stop_gradient(batch.bounding_boxes),
                results["reconstructed_bounding_boxes"][..., static_objects:, :],
                batch.bounding_boxes_validity,
            )
            metrics["bounding_box_loss"] = bbox_loss
            total = total + w.bounding_box * bbox_loss

        # Consistency passes (trainer.py:646-659 runs these as extra
        # backward passes; one fused graph here).
        encoding = results["scene_encoding"]
        if w.pose_consistency > 0.0 and batch.optical_flow is not None:
            pose_out, _ = self.model.apply(
                {"params": params, "batch_stats": batch_stats},
                encoding,
                batch.optical_flow,
                batch.bounding_boxes,
                batch.bounding_boxes_validity,
                w.consistency_samples,
                perturb=self.cfg.perturb,
                step=step,
                train=True,
                method=EnvironmentModel.forward_pose_consistency,
                rngs=split_rngs(jax.random.fold_in(key, 1)),
                mutable=["batch_stats"],
            )
            for name, (prev, nxt, pair_valid) in pose_out["coarse"].items():
                pc = losses.pose_consistency_loss(prev, nxt, pair_valid)
                metrics[f"{name}_pose_consistency_loss"] = pc
                total = total + w.pose_consistency * pc

        if (
            (w.keypoint_consistency > 0.0 or w.keypoint_opacity > 0.0)
            and batch.keypoints is not None
        ):
            height, width = batch.observations.shape[-3:-1]
            kp_out, _ = self.model.apply(
                {"params": params, "batch_stats": batch_stats},
                encoding,
                batch.keypoints,
                batch.keypoints_validity,
                (height, width),
                w.consistency_samples,
                perturb=self.cfg.perturb,
                step=step,
                train=True,
                method=EnvironmentModel.forward_keypoint_consistency,
                rngs=split_rngs(jax.random.fold_in(key, 2)),
                mutable=["batch_stats"],
            )
            for name, (expected, confidence, opacity, _) in kp_out[
                "coarse"
            ].items():
                kc = losses.keypoint_consistency_loss(
                    expected, confidence, w.keypoint_confidence_threshold
                )
                ko = losses.keypoint_opacity_loss(
                    opacity, confidence, w.keypoint_confidence_threshold
                )
                metrics[f"{name}_keypoint_consistency_loss"] = kc
                metrics[f"{name}_keypoint_opacity_loss"] = ko
                total = total + w.keypoint_consistency * kc
                total = total + w.keypoint_opacity * ko

        # Pose statistics (logged, not optimized; trainer.py:509-530).
        for object_idx in range(static_objects, self.object_ids.objects_count):
            dyn_idx = self.object_ids.dynamic_object_idx_by_object_idx(object_idx)
            in_scene = object_in_scene[..., dyn_idx]
            translations = results["scene_encoding"].object_translations[
                ..., object_idx, :
            ]
            mean_mag = losses.masked_mean(
                jax.lax.stop_gradient(jnp.abs(translations)), in_scene[..., None]
            )
            metrics[f"object_{object_idx}_translation_magnitude"] = mean_mag

        metrics["loss"] = total
        return total, (metrics, mutated["batch_stats"], results)

    # ------------------------------------------------------------------

    def train_step(
        self, state: TrainState, batch: Batch, key: jax.Array
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """One optimization step. jit/pjit-able; donate `state` for in-place
        buffers."""

        def loss_fn(params):
            return self.compute_losses(
                params, state.batch_stats, batch, key, state.step
            )

        (loss, (metrics, new_batch_stats, _)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads).replace(
            batch_stats=new_batch_stats
        )
        return new_state, metrics
