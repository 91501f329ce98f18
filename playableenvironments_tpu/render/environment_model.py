"""EnvironmentModel: observations -> scene encoding -> rendered rays/frames.

The orchestrator tying together parameter encoders, object style encoders,
and the SceneComposer. Replaces model/environment_model.py. Key differences
from the reference:
- The scene-encoding computation and the renderer are separate methods with a
  SceneEncoding pytree between them (the reference threads a dict).
- Ray micro-batching (`TensorBatchifier` host loop, environment_model.py:474-521)
  is replaced by `jax.lax.map` over static ray tiles inside jit for full-frame
  renders; training renders take the whole (small) sampled ray set at once.
- Per-frame camera offsets are a dense parameter table gather, not a
  ParameterList indexed on the host.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from playableenvironments_tpu.config import ObjectIds, SceneConfig
from playableenvironments_tpu.core import bbox as bbox_lib
from playableenvironments_tpu.core import rays as rays_lib
from playableenvironments_tpu.core.transforms3d import (
    euler_translation_to_matrix,
    invert_rigid,
)
from playableenvironments_tpu.models.object_encoders import (
    ObjectEncoderV4,
    ObjectEncoderV5,
)
from playableenvironments_tpu.models.parameter_encoders import (
    ObjectParametersEncoderV4,
    classic_object_poses,
    static_object_poses,
)
from playableenvironments_tpu.render import sampling
from playableenvironments_tpu.render.composer import SceneComposer
from playableenvironments_tpu.scene.encoding import SceneEncoding


class CameraParametersStorage(nn.Module):
    """Per-(frame, camera) learnable camera corrections: 3 rotation + 3
    translation + 1 focal offsets, zero-initialized, scaled (translations x10,
    focals x1000) for optimizer conditioning, active in training only.
    Reference: model/layers/camera_parameters_storage.py:9-71 over
    IndexedStorage — here one dense (memory, cameras, 7) table gathered by
    frame index.
    """

    memory_size: int
    cameras_count: int

    @nn.compact
    def __call__(
        self, frame_indexes: jnp.ndarray, train: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """:param frame_indexes: (...) integer frame indexes.
        :return: ((..., cameras, 3) rotation offsets, (..., cameras, 3)
                 translation offsets, (..., cameras) focal offsets).
        """
        table = self.param(
            "storage",
            nn.initializers.zeros,
            (self.memory_size, self.cameras_count, 7),
        )
        idx = jnp.clip(frame_indexes, 0, self.memory_size - 1)
        entries = table[idx]  # (..., cameras, 7)
        if not train:
            entries = jnp.zeros_like(entries)
        rotations = entries[..., :3]
        translations = entries[..., 3:6] * 10.0
        focals = entries[..., 6] * 1000.0
        return rotations, translations, focals


class EnvironmentModel(nn.Module):
    """The synthesis model (phases 1-2 inference surface).

    Methods are designed for use with `module.apply(..., method=...)`:
    - `compute_scene_encoding`: observations -> SceneEncoding (+ aux outputs)
    - `render_sampled_rays`: SceneEncoding + world rays -> composition results
    - `forward_from_observations`: the full training path (sampling included)
    - `render_frame_from_scene_encoding`: full/strided-grid frame rendering
    """

    scene: SceneConfig
    focal_length_multiplier: float = 1.0
    enable_camera_offsets: bool = False
    camera_memory_size: int = 1
    training_cameras_count: int = 1

    def setup(self):
        self.object_ids = ObjectIds(self.scene)
        self.composer = SceneComposer(self.scene, name="composer")
        self.camera_offsets = CameraParametersStorage(
            self.camera_memory_size, self.training_cameras_count,
            name="camera_offsets",
        )

        parameter_encoders = []
        for i, cfg in enumerate(self.scene.parameter_encoders):
            if cfg.kind == "learned_v4":
                parameter_encoders.append(
                    ObjectParametersEncoderV4(cfg, name=f"parameters_encoder_{i}")
                )
            else:
                parameter_encoders.append(None)  # pure-function strategies
        self.parameter_encoder_modules = parameter_encoders

        object_encoders = []
        for i, cfg in enumerate(self.scene.object_encoders):
            cls = ObjectEncoderV4 if cfg.kind == "v4" else ObjectEncoderV5
            object_encoders.append(cls(cfg, name=f"object_encoder_{i}"))
        self.object_encoder_modules = object_encoders

        if self.scene.autoencoder is not None:
            from playableenvironments_tpu.models.autoencoder import (
                MultiresAutoencoder,
            )

            self.autoencoder_model = MultiresAutoencoder(
                self.scene.autoencoder, name="autoencoder"
            )

    # ------------------------------------------------------------------
    # Scene encoding
    # ------------------------------------------------------------------

    def _apply_camera_offsets(
        self, camera_rotations, camera_translations, focals, global_frame_indexes,
        train: bool,
    ):
        if not self.enable_camera_offsets:
            return camera_rotations, camera_translations, focals
        rot_off, trans_off, focal_off = self.camera_offsets(
            global_frame_indexes, train
        )
        return (
            camera_rotations + rot_off,
            camera_translations + trans_off,
            focals + focal_off,
        )

    def _compute_object_poses(
        self,
        observations: jnp.ndarray,
        w2c_first: jnp.ndarray,
        camera_rotations_first: jnp.ndarray,
        focals_first: jnp.ndarray,
        bounding_boxes: jnp.ndarray,
        boxes_validity: jnp.ndarray,
        train: bool,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Per-object o2w poses from each model's parameter encoder.

        Reference: environment_model.py:164-204. Camera parameters are
        stop-gradiented so pose losses don't move the cameras (:935).

        :param observations: (B, T, C, H, W, 3).
        :param w2c_first: (B, T, 4, 4) first camera world->camera.
        :param bounding_boxes: (B, T, dynamic_objects, 4) first-camera boxes.
        :return: ((B, T, O, 3) rotations, (B, T, O, 3) translations).
        """
        image_size = observations.shape[-3:-1]
        w2c_first = jax.lax.stop_gradient(w2c_first)
        focals_first = jax.lax.stop_gradient(focals_first)
        batch_shape = observations.shape[:2]

        rotations, translations = [], []
        dynamic_begin = 0
        for model_idx, cfg in enumerate(self.scene.parameter_encoders):
            if cfg.kind == "static":
                rot, trans = static_object_poses(cfg, batch_shape)
            else:
                count = cfg.objects_count
                boxes = bounding_boxes[..., dynamic_begin : dynamic_begin + count, :]
                validity = boxes_validity[..., dynamic_begin : dynamic_begin + count]
                dynamic_begin += count
                if cfg.kind == "classic":
                    rot, trans = classic_object_poses(
                        cfg, w2c_first, focals_first, boxes, validity, image_size
                    )
                else:  # learned_v4
                    module = self.parameter_encoder_modules[model_idx]
                    flat_obs = observations[:, :, 0].reshape(
                        (-1,) + observations.shape[-3:]
                    )
                    flat_rot, flat_trans = module(
                        flat_obs,
                        w2c_first.reshape((-1, 4, 4)),
                        camera_rotations_first.reshape((-1, 3)),
                        focals_first.reshape((-1,)),
                        boxes.reshape((-1,) + boxes.shape[-2:]),
                        validity.reshape((-1,) + validity.shape[-1:]),
                        train=train,
                    )
                    rot = flat_rot.reshape(batch_shape + flat_rot.shape[-2:])
                    trans = flat_trans.reshape(batch_shape + flat_trans.shape[-2:])
            rotations.append(rot)
            translations.append(trans)
        return (
            jnp.concatenate(rotations, axis=-2),
            jnp.concatenate(translations, axis=-2),
        )

    def compute_object_bounding_boxes(
        self,
        o2w_matrices: jnp.ndarray,
        w2c_matrices: jnp.ndarray,
        focals: jnp.ndarray,
        height: int,
        width: int,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Project each object's 3D box edge points into every camera and fit
        a screen box. Reference: environment_model.py:234-327.

        :param o2w_matrices: (B, T, O, 4, 4).
        :param w2c_matrices: (B, T, C, 4, 4).
        :param focals: (B, T, C).
        :return: ((B, T, C, O, 4) normalized (l, t, r, b) boxes clamped to
                 [0, 1], (B, T, C, O, P, 2) projected edge points).
        """
        all_boxes, all_points = [], []
        for object_idx in range(self.object_ids.objects_count):
            model_idx = self.object_ids.model_idx_by_object_idx(object_idx)
            box = jnp.asarray(
                self.scene.object_models[model_idx].bounding_box, focals.dtype
            )
            points = bbox_lib.aabb_edge_points(box)  # (P, 3)
            o2w = o2w_matrices[..., object_idx, :, :]
            world_points = rays_lib.transform_points(points, o2w[..., None, :, :])
            # Add camera axis: (B, T, C, P, 3)
            camera_points = rays_lib.transform_points(
                world_points[..., None, :, :], w2c_matrices[..., None, :, :]
            )
            f = focals[..., None, None]
            # Guard points at the camera plane (z ~ 0): the projection would be
            # inf/NaN and NaN survives clipping into the crops downstream.
            z = camera_points[..., 2:3]
            z_safe = jnp.where(jnp.abs(z) < 1e-6, -1e-6, z)
            projected = -camera_points[..., :2] / z_safe * f
            projected = projected.at[..., 1].multiply(-1.0)  # rows grow down

            # Points behind the camera must not constrain the box
            # (environment_model.py:292-305).
            behind = camera_points[..., 2] > 0
            for_min = jnp.where(behind[..., None], 1e20, projected)
            for_max = jnp.where(behind[..., None], -1e20, projected)
            left = jnp.min(for_min[..., 0], axis=-1)
            right = jnp.max(for_max[..., 0], axis=-1)
            top = jnp.min(for_min[..., 1], axis=-1)
            bottom = jnp.max(for_max[..., 1], axis=-1)
            all_boxes.append(jnp.stack([left, top, right, bottom], axis=-1))
            all_points.append(projected)

        boxes = jnp.stack(all_boxes, axis=-2)  # (B, T, C, O, 4)
        points = jnp.stack(all_points, axis=-3)  # (B, T, C, O, P, 2)

        scale = jnp.asarray([width, height, width, height], boxes.dtype)
        boxes = (boxes + scale / 2) / scale
        points = (points + jnp.asarray([width, height], boxes.dtype) / 2) / jnp.asarray(
            [width, height], boxes.dtype
        )
        return jnp.clip(boxes, 0.0, 1.0), jnp.clip(points, 0.0, 1.0)

    def _compute_object_encodings(
        self,
        observations: jnp.ndarray,
        camera_rotations: jnp.ndarray,
        camera_translations: jnp.ndarray,
        bounding_boxes: jnp.ndarray,
        reconstructed_boxes: jnp.ndarray,
        shuffle_style: bool,
        train: bool,
    ):
        """Style/deformation codes per object. Static objects use their exactly
        reconstructed boxes, dynamic ones the dataset boxes; first camera only.
        Optional temporal style shuffling regularizes style/pose entanglement.
        Reference: environment_model.py:406-472.

        :param observations: (B, T, C, H, W, 3).
        :param bounding_boxes: (B, T, C, dynamic_objects, 4).
        :param reconstructed_boxes: (B, T, C, O, 4).
        :return: ((B, T, O, S) style, (B, T, O, D) deformation, attention list,
                 crops list).
        """
        b, t = observations.shape[:2]
        flat_obs = observations[:, :, 0].reshape((-1,) + observations.shape[-3:])
        flat_cam_rot = camera_rotations[:, :, 0].reshape(-1, 3)
        flat_cam_trans = camera_translations[:, :, 0].reshape(-1, 3)

        styles, deformations, attentions, crops_list = [], [], [], []
        for object_idx in range(self.object_ids.objects_count):
            model_idx = self.object_ids.model_idx_by_object_idx(object_idx)
            if self.object_ids.is_static_model(model_idx):
                boxes = reconstructed_boxes[:, :, 0, object_idx]
            else:
                dyn_idx = self.object_ids.dynamic_object_idx_by_object_idx(object_idx)
                boxes = bounding_boxes[:, :, 0, dyn_idx]
            flat_boxes = boxes.reshape(-1, 4)

            encoder = self.object_encoder_modules[model_idx]
            style, deformation, attention, crops = encoder(
                flat_obs, flat_boxes, flat_cam_rot, flat_cam_trans, train=train
            )
            style = style.reshape(b, t, -1)
            deformation = deformation.reshape(b, t, -1)

            if shuffle_style and t > 1:
                perm_key = self.make_rng("style_shuffle")
                perm = jax.random.permutation(perm_key, t)
                # Never the identity permutation (environment_model.py:455-463).
                is_identity = jnp.all(perm == jnp.arange(t))
                perm = jnp.where(is_identity, jnp.roll(perm, 1), perm)
                style = style[:, perm]

            styles.append(style)
            deformations.append(deformation)
            attentions.append(attention.reshape((b, t) + attention.shape[1:]))
            crops_list.append(crops.reshape((b, t) + crops.shape[1:]))

        return (
            jnp.stack(styles, axis=2),
            jnp.stack(deformations, axis=2),
            attentions,
            crops_list,
        )

    def compute_scene_encoding(
        self,
        observations: jnp.ndarray,
        camera_rotations: jnp.ndarray,
        camera_translations: jnp.ndarray,
        focals: jnp.ndarray,
        bounding_boxes: jnp.ndarray,
        bounding_boxes_validity: jnp.ndarray,
        global_frame_indexes: jnp.ndarray,
        shuffle_style: bool = False,
        train: bool = True,
    ) -> Tuple[SceneEncoding, Dict]:
        """Observations -> SceneEncoding plus auxiliary outputs.

        Reference: environment_model.py:772-839 (forward_scene_encoding_from_
        observations) and the first half of forward_from_observations (847-980).

        :param observations: (B, T, C, H, W, 3) in [0, 1]-ish (normalized).
        :param camera_rotations: (B, T, C, 3); camera_translations likewise.
        :param focals: (B, T, C) raw dataset focals (multiplier applied here).
        :param bounding_boxes: (B, T, C, dynamic_objects, 4) normalized ltrb.
        :param bounding_boxes_validity: (B, T, C, dynamic_objects) bool.
        :param global_frame_indexes: (B, T) int.
        :return: (SceneEncoding, aux dict with reconstructed boxes, projected
                 points, attention, crops, matrices).
        """
        height, width = observations.shape[-3], observations.shape[-2]

        camera_rotations, camera_translations, focals = self._apply_camera_offsets(
            camera_rotations, camera_translations, focals, global_frame_indexes,
            train,
        )
        rescaled_focals = focals * self.focal_length_multiplier

        c2w = euler_translation_to_matrix(camera_rotations, camera_translations)
        w2c = invert_rigid(c2w)

        object_rotations, object_translations = self._compute_object_poses(
            observations,
            w2c[:, :, 0],
            camera_rotations[:, :, 0],
            rescaled_focals[:, :, 0],
            bounding_boxes[:, :, 0],
            bounding_boxes_validity[:, :, 0],
            train,
        )
        o2w = euler_translation_to_matrix(object_rotations, object_translations)

        reconstructed_boxes, projected_points = self.compute_object_bounding_boxes(
            o2w,
            jax.lax.stop_gradient(w2c),
            jax.lax.stop_gradient(rescaled_focals),
            height,
            width,
        )

        style, deformation, attention, crops = self._compute_object_encodings(
            observations,
            camera_rotations,
            camera_translations,
            bounding_boxes,
            jax.lax.stop_gradient(reconstructed_boxes),
            shuffle_style,
            train,
        )

        # Presence: static objects always, dynamic if seen by any camera
        # (environment_model.py:957-963).
        static_count = self.object_ids.static_objects_count
        static_presence = jnp.ones(
            bounding_boxes_validity.shape[:2] + (static_count,), dtype=bool
        )
        dynamic_presence = jnp.any(bounding_boxes_validity, axis=2)
        object_in_scene = jnp.concatenate(
            [static_presence, dynamic_presence], axis=-1
        )

        encoding = SceneEncoding(
            camera_rotations=camera_rotations,
            camera_translations=camera_translations,
            focals=focals,
            object_rotations=object_rotations,
            object_translations=object_translations,
            object_style=style,
            object_deformation=deformation,
            object_in_scene=object_in_scene,
        )
        aux = {
            "reconstructed_bounding_boxes": reconstructed_boxes,
            "reconstructed_3d_bounding_boxes": projected_points,
            "object_attention": attention,
            "object_crops": crops,
            "rescaled_focals": rescaled_focals,
            "c2w": c2w,
            "w2c": w2c,
            "o2w": o2w,
        }
        return encoding, aux

    # ------------------------------------------------------------------
    # Rendering
    # ------------------------------------------------------------------

    def render_sampled_rays(
        self,
        encoding: SceneEncoding,
        sampled_directions: jnp.ndarray,
        perturb: bool = False,
        step: jnp.ndarray = 0,
        canonical_pose: bool = False,
        train: bool = True,
        compute_divergence: bool = False,
    ) -> Dict:
        """Render camera-frame ray directions through the composed scene.

        :param sampled_directions: (B, T, C, n, 3) camera-frame directions.
        :return: composer results (coarse/fine, per-object + global).
        """
        c2w = euler_translation_to_matrix(
            encoding.camera_rotations, encoding.camera_translations
        )
        origins = jnp.zeros(encoding.camera_rotations.shape)
        normals = jnp.zeros_like(origins).at[..., 2].set(-1.0)
        origins, directions, normals = rays_lib.transform_rays(
            origins, sampled_directions, normals, c2w
        )

        o2w = euler_translation_to_matrix(
            encoding.object_rotations, encoding.object_translations
        )
        w2o = invert_rigid(o2w)

        # Broadcast per-observation object state over the camera axis.
        def with_cameras(x):
            return x[:, :, None]

        cameras = sampled_directions.shape[2]
        w2o_c = jnp.broadcast_to(
            with_cameras(w2o), w2o.shape[:2] + (cameras,) + w2o.shape[2:]
        )
        style_c = jnp.broadcast_to(
            with_cameras(encoding.object_style),
            encoding.object_style.shape[:2] + (cameras,) + encoding.object_style.shape[2:],
        )
        deformation_c = jnp.broadcast_to(
            with_cameras(encoding.object_deformation),
            encoding.object_deformation.shape[:2]
            + (cameras,)
            + encoding.object_deformation.shape[2:],
        )
        in_scene_c = jnp.broadcast_to(
            with_cameras(encoding.object_in_scene),
            encoding.object_in_scene.shape[:2]
            + (cameras,)
            + encoding.object_in_scene.shape[2:],
        )

        return self.composer(
            origins,
            directions,
            normals,
            w2o_c,
            style_c,
            deformation_c,
            in_scene_c,
            perturb=perturb,
            step=step,
            canonical_pose=canonical_pose,
            use_running_average=not train,
            compute_divergence=compute_divergence,
        )

    def forward_from_observations(
        self,
        observations: jnp.ndarray,
        camera_rotations: jnp.ndarray,
        camera_translations: jnp.ndarray,
        focals: jnp.ndarray,
        bounding_boxes: jnp.ndarray,
        bounding_boxes_validity: jnp.ndarray,
        global_frame_indexes: jnp.ndarray,
        samples_per_image: int,
        perturb: bool = False,
        patch_size: int = 0,
        patch_strides: Optional[Sequence[int]] = None,
        shuffle_style: bool = False,
        step: jnp.ndarray = 0,
        canonical_pose: bool = False,
        train: bool = True,
        compute_divergence: bool = False,
        decode_patches: bool = False,
    ) -> Dict:
        """The full training path: encode, sample rays, render.
        Reference: environment_model.py:847-1039.

        :param decode_patches: run the VAE decoder on the rendered feature
            patches (requires patch sampling + scene.autoencoder).

        Sampling strategy mirrors the reference's dispatch (975-985):
        patch_size > 0 -> strided patch; samples_per_image == 0 with strides ->
        whole-image strided grid; otherwise weighted or uniform sampling.
        """
        height, width = observations.shape[-3], observations.shape[-2]
        if self.scene.autoencoder is not None and self.is_initializing():
            # Materialize the FULL autoencoder (encoder included) at init:
            # phase-1 checkpoints carry both halves, and the encoder-mixing
            # variant (decode_mixed_grids) needs encoder parameters even when
            # the training path only decodes.
            self.autoencoder_model.encode(
                observations.reshape((-1,) + observations.shape[-3:]),
                train=False,
            )
        encoding, aux = self.compute_scene_encoding(
            observations,
            camera_rotations,
            camera_translations,
            focals,
            bounding_boxes,
            bounding_boxes_validity,
            global_frame_indexes,
            shuffle_style,
            train,
        )
        rescaled_focals = aux["rescaled_focals"]

        ray_directions, _, _ = rays_lib.camera_rays(height, width, rescaled_focals)

        # patch_size > 0 alone selects patch sampling (it needs no ray
        # count — the patch geometry fixes it); dispatching on
        # `patch_size and samples_per_image` used to silently fall through
        # to the whole-image grid when samples_per_image == 0.
        if patch_size:
            key = self.make_rng("ray_sampling")
            sampled_directions, sampled_observations, sampled_positions = (
                sampling.sample_rays_strided_patch(
                    key,
                    ray_directions,
                    observations,
                    patch_size,
                    list(patch_strides),
                    jax.lax.stop_gradient(aux["reconstructed_bounding_boxes"]),
                    self.scene.sampling_weights,
                )
            )
        elif samples_per_image == 0 and patch_strides:
            sampled_directions, sampled_observations, sampled_positions = (
                sampling.sample_all_rays_strided_grid(
                    ray_directions, observations, list(patch_strides)
                )
            )
        elif self.scene.use_weighted_sampling:
            key = self.make_rng("ray_sampling")
            sampled_directions, sampled_observations, sampled_positions = (
                sampling.sample_rays_weighted(
                    key,
                    ray_directions,
                    observations,
                    samples_per_image,
                    jax.lax.stop_gradient(aux["reconstructed_bounding_boxes"]),
                    self.scene.sampling_weights,
                )
            )
        else:
            key = self.make_rng("ray_sampling")
            sampled_directions, sampled_observations, sampled_positions = (
                sampling.sample_rays_uniform(
                    key, ray_directions, observations, samples_per_image
                )
            )

        # SP-style ray sharding: when the ambient mesh has a "rays" axis
        # (parallel.create_2d_mesh under jax.set_mesh), split the sampled ray
        # axis across it — rays are independent until the per-ray integral,
        # so XLA keeps the whole render local and all-gathers only the
        # integrated features (SURVEY.md §2.i sequence-parallel row).
        from playableenvironments_tpu.parallel.mesh import constrain_ray_axis

        sampled_directions = constrain_ray_axis(sampled_directions, -2)

        results = self.render_sampled_rays(
            encoding,
            sampled_directions,
            perturb=perturb,
            step=step,
            canonical_pose=canonical_pose,
            train=train,
            compute_divergence=compute_divergence,
        )

        # Ray-to-object-center distances for the localization loss
        # (environment_model.py:653-706).
        c2w = aux["c2w"]
        origins = rays_lib.transform_points(
            jnp.zeros(encoding.camera_rotations.shape), c2w
        )
        world_directions = rays_lib.transform_points(
            sampled_directions, c2w[..., None, :, :], translate=False
        )
        results["ray_object_distances"] = self._ray_object_distances(
            origins, world_directions, aux["o2w"]
        )

        if decode_patches:
            if self.scene.autoencoder is None or not patch_size:
                raise ValueError(
                    "decode_patches requires scene.autoencoder and patch sampling"
                )
            results = self.decode_rendered_patches(results, patch_size, train)

        results["observations"] = sampled_observations
        results["positions"] = sampled_positions
        results["scene_encoding"] = encoding
        results.update(
            {
                k: aux[k]
                for k in (
                    "reconstructed_bounding_boxes",
                    "reconstructed_3d_bounding_boxes",
                    "object_attention",
                    "object_crops",
                )
            }
        )
        return results

    def _ray_object_distances(
        self, ray_origins: jnp.ndarray, ray_directions: jnp.ndarray, o2w: jnp.ndarray
    ) -> jnp.ndarray:
        """Squared point-line distance between each ray and each object center.
        Reference: environment_model.py:653-706.

        :param ray_origins: (B, T, C, 3); ray_directions (B, T, C, n, 3).
        :param o2w: (B, T, O, 4, 4).
        :return: (B, T, C, n, O).
        """
        unit_dirs = ray_directions / jnp.linalg.norm(
            ray_directions, axis=-1, keepdims=True
        )
        distances = []
        for object_idx in range(self.object_ids.objects_count):
            model_idx = self.object_ids.model_idx_by_object_idx(object_idx)
            box = jnp.asarray(
                self.scene.object_models[model_idx].bounding_box, o2w.dtype
            )
            center = bbox_lib.aabb_center(box)
            world_center = rays_lib.transform_points(
                center, o2w[..., object_idx, :, :]
            )
            # (B, T, 1, 1, 3) against rays (B, T, C, n, 3)
            rel = ray_origins[..., None, :] - world_center[..., None, None, :]
            along = jnp.sum(rel * unit_dirs, axis=-1, keepdims=True) * unit_dirs
            distances.append(jnp.sum(jnp.square(rel - along), axis=-1))
        return jnp.stack(distances, axis=-1)

    def render_frame_from_scene_encoding(
        self,
        encoding: SceneEncoding,
        image_size: Tuple[int, int],
        patch_strides: Optional[Sequence[int]] = None,
        ray_tile: int = 0,
        perturb: bool = False,
        step: jnp.ndarray = 0,
        canonical_pose: bool = False,
        train: bool = False,
    ) -> Dict:
        """Render full frames (optionally on strided feature grids) from a
        scene encoding. Reference: environment_model.py:1041-1158 +
        render_full_frame_from_scene_encoding (581-651).

        :param ray_tile: if > 0, render rays in trace-time tiles of this
            size (the reference's samples_per_image_batching without leaving
            the program). Each tile is a separate composer call in one HLO:
            compile time grows with the tile count and XLA may still
            interleave tiles, so this is a live-buffer hint, not a hard
            memory bound — prefer the fused fast path (render.fast) for
            full-frame eval renders.
        :return: composer results with ray axes flattened over the image grid;
            use `sampling.split_strided_grid_samples` to fold back.
        """
        height, width = image_size
        rescaled_focals = encoding.focals * self.focal_length_multiplier
        ray_directions, _, _ = rays_lib.camera_rays(height, width, rescaled_focals)
        observations_dummy = jnp.zeros(ray_directions.shape)

        if patch_strides:
            sampled_directions, _, sampled_positions = (
                sampling.sample_all_rays_strided_grid(
                    ray_directions, observations_dummy, list(patch_strides)
                )
            )
        else:
            n = height * width
            sampled_directions = ray_directions.reshape(
                ray_directions.shape[:-3] + (n, 3)
            )
            sampled_positions = jnp.broadcast_to(
                rays_lib.pixel_grid_positions(height, width).reshape(n, 2),
                sampled_directions.shape[:-1] + (2,),
            )

        if ray_tile and sampled_directions.shape[-2] > ray_tile:
            # Static trace-time tiling over the ray axis: each tile is one
            # composer call unrolled into the same program (the reference's
            # host-side samples_per_image_batching loop,
            # environment_model.py:474-521, without leaving the program).
            # See the ray_tile docstring for the compile-time/memory caveats.
            total = sampled_directions.shape[-2]
            tile_results = []
            for begin in range(0, total, ray_tile):
                tile = sampled_directions[..., begin : begin + ray_tile, :]
                tile_results.append(
                    self.render_sampled_rays(
                        encoding, tile, perturb=perturb, step=step,
                        canonical_pose=canonical_pose, train=train,
                    )
                )
            ray_axis = sampled_directions.ndim - 2

            def concat(*leaves):
                return jnp.concatenate(leaves, axis=ray_axis)

            results = jax.tree.map(concat, *tile_results)
        else:
            # Full-frame SP: under an ambient 2D (data, rays) mesh the whole
            # image's ray axis spreads over the rays axis — the multi-chip
            # form of the reference's samples_per_image_batching knob
            # (environment_model.py:474-521). No-op on a 1D mesh.
            from playableenvironments_tpu.parallel.mesh import constrain_ray_axis

            sampled_directions = constrain_ray_axis(sampled_directions, -2)
            results = self.render_sampled_rays(
                encoding,
                sampled_directions,
                perturb=perturb,
                step=step,
                canonical_pose=canonical_pose,
                train=train,
            )

        results["positions"] = sampled_positions
        return results

    # ------------------------------------------------------------------
    # Consistency forwards (auxiliary supervision signals)
    # ------------------------------------------------------------------

    def _consistency_geometry(self, encoding: SceneEncoding, image_size):
        height, width = image_size
        rescaled_focals = encoding.focals * self.focal_length_multiplier
        ray_directions, ray_origins, focal_normals = (
            rays_lib.camera_rays(height, width, rescaled_focals)[0],
            jnp.zeros(encoding.camera_rotations.shape),
            jnp.zeros(encoding.camera_rotations.shape).at[..., 2].set(-1.0),
        )
        c2w = euler_translation_to_matrix(
            encoding.camera_rotations, encoding.camera_translations
        )
        o2w = euler_translation_to_matrix(
            encoding.object_rotations, encoding.object_translations
        )
        w2o = invert_rigid(o2w)
        return ray_directions, ray_origins, focal_normals, c2w, w2o

    def forward_pose_consistency(
        self,
        encoding: SceneEncoding,
        optical_flow: jnp.ndarray,
        bounding_boxes: jnp.ndarray,
        bounding_boxes_validity: jnp.ndarray,
        samples_per_image: int,
        perturb: bool = False,
        step: jnp.ndarray = 0,
        train: bool = True,
    ) -> Dict:
        """Optical-flow-matched expected-position pairs for every dynamic
        object (environment_model.py:1197-1361): rays are drawn inside the
        object's box in frame t, matched through the flow into frame t+1,
        and both are resolved to 3D first-surface positions — the inputs of
        pose_consistency_loss.

        :param optical_flow: (B, T, C, H, W, 2) normalized (d_row, d_col).
        :param bounding_boxes: (B, T, C, dynamic_objects, 4) normalized ltrb.
        :param bounding_boxes_validity: (B, T, C, dynamic_objects) bool.
        :return: {"coarse": {"dynamic_object_i": (previous (B, T-1, C, n, 3),
                 next (B, T-1, C, n, 3), pair_valid (B, T-1, C))}}.
        """
        height, width = optical_flow.shape[-3], optical_flow.shape[-2]
        directions, origins, normals, c2w, w2o = self._consistency_geometry(
            encoding, (height, width)
        )

        static = self.object_ids.static_objects_count
        results = {"coarse": {}}
        for dynamic_idx in range(self.object_ids.dynamic_objects_count):
            object_idx = static + dynamic_idx
            box = bounding_boxes[..., dynamic_idx, :]
            validity = bounding_boxes_validity[..., dynamic_idx]
            w2o_obj = w2o[..., object_idx, :, :][:, :, None]  # camera axis
            style = encoding.object_style[..., object_idx, :][:, :, None]
            deform = encoding.object_deformation[..., object_idx, :][:, :, None]

            key = self.make_rng("sampling")
            prev_dirs, prev_flow, prev_positions = (
                sampling.sample_rays_at_object(
                    key,
                    directions[:, :-1],
                    optical_flow[:, :-1],
                    samples_per_image,
                    box[:, :-1],
                )
            )
            next_positions = prev_positions + prev_flow
            # Positions are pixel/H while align_corners=True maps p*(H-1):
            # an up-to-1-px mapping skew, INTENTIONALLY uncorrected to match
            # the reference (environment_model.py:1325-1326 passes
            # correct_range=False: the flow comes from an unknown higher
            # resolution, so the residual error is unknown but small).
            next_dirs = sampling.sample_at_positions(
                directions[:, 1:], next_positions
            )

            prev_o, prev_d, prev_n = rays_lib.transform_rays(
                origins[:, :-1], prev_dirs, normals[:, :-1], c2w[:, :-1]
            )
            next_o, next_d, next_n = rays_lib.transform_rays(
                origins[:, 1:], next_dirs, normals[:, 1:], c2w[:, 1:]
            )

            prev_result = self.composer.forward_expected_positions(
                object_idx, prev_o, prev_d, prev_n, w2o_obj[:, :-1],
                style[:, :-1], deform[:, :-1], validity[:, :-1],
                perturb=perturb, step=step, use_running_average=not train,
            )
            next_result = self.composer.forward_expected_positions(
                object_idx, next_o, next_d, next_n, w2o_obj[:, 1:],
                style[:, 1:], deform[:, 1:], validity[:, 1:],
                perturb=perturb, step=step, use_running_average=not train,
            )
            pair_valid = jnp.logical_and(validity[:, :-1], validity[:, 1:])
            results["coarse"][f"dynamic_object_{dynamic_idx}"] = (
                prev_result["coarse"][0], next_result["coarse"][0], pair_valid
            )
        return results

    def forward_keypoint_consistency(
        self,
        encoding: SceneEncoding,
        keypoints: jnp.ndarray,
        keypoints_validity: jnp.ndarray,
        image_size,
        max_samples_per_image: int,
        perturb: bool = False,
        step: jnp.ndarray = 0,
        train: bool = True,
    ) -> Dict:
        """Keypoint-anchored expected positions per dynamic object
        (environment_model.py:1363-1505): rays through random points of the
        COCO skeleton, the SAME body point across observations/cameras, give
        3D positions whose cross-observation spread keypoint_consistency_loss
        penalizes; opacity at confident keypoints feeds keypoint_opacity_loss.

        :param keypoints: (B, T, C, K, 3, dynamic_objects) normalized
            (row, col, confidence).
        :param keypoints_validity: (B, T, C, dynamic_objects) bool.
        :return: {"coarse": {"dynamic_object_i": (expected (B, T, C, n, 3),
                 confidence (B, T, C, n), opacity (B, T, C, n),
                 positions (B, T, C, n, 2))}}.
        """
        height, width = image_size
        directions, origins, normals, c2w, w2o = self._consistency_geometry(
            encoding, (height, width)
        )

        static = self.object_ids.static_objects_count
        results = {"coarse": {}}
        for dynamic_idx in range(self.object_ids.dynamic_objects_count):
            object_idx = static + dynamic_idx
            obj_keypoints = keypoints[..., dynamic_idx]
            validity = keypoints_validity[..., dynamic_idx]
            w2o_obj = w2o[..., object_idx, :, :][:, :, None]
            style = encoding.object_style[..., object_idx, :][:, :, None]
            deform = encoding.object_deformation[..., object_idx, :][:, :, None]

            key = self.make_rng("sampling")
            sampled_dirs, positions, confidence = (
                sampling.sample_rays_at_keypoints(
                    key, directions, obj_keypoints, max_samples_per_image
                )
            )
            confidence = confidence * validity[..., None]

            world_o, world_d, world_n = rays_lib.transform_rays(
                origins, sampled_dirs, normals, c2w
            )
            result = self.composer.forward_expected_positions(
                object_idx, world_o, world_d, world_n, w2o_obj,
                style, deform, validity,
                perturb=perturb, step=step, use_running_average=not train,
            )
            expected, opacity = result["coarse"]
            results["coarse"][f"dynamic_object_{dynamic_idx}"] = (
                expected, confidence, opacity, positions
            )
        return results

    # ------------------------------------------------------------------
    # Feature decoding (the multiresolution backpropagated decoder path)
    # ------------------------------------------------------------------

    def decode_rendered_patches(
        self, results: Dict, patch_size: int, train: bool = True
    ) -> Dict:
        """Decode NeRF feature patches into RGB patches.

        The published model's path (environment_model_multiresolution_
        backpropagated_decoder.py:21-111): the renderer emits, per sample,
        the concatenation of every latent level's features; per level, the
        samples belonging to that level's strided patch are selected, folded
        into a square feature patch, and the stack is decoded by the VAE
        decoder. Adds to each pass's "global" dict:
        - "reconstructed_observations": (B, T, C, P, P, 3) with
          P = patch_size * stride_0,
        - "splitted_integrated_features": per-level feature samples.
        """
        from playableenvironments_tpu.models.autoencoder import (
            autoencoder_strides,
            features_count_by_layer,
        )

        ae_cfg = self.scene.autoencoder
        strides = autoencoder_strides(ae_cfg)
        counts = features_count_by_layer(ae_cfg)

        for pass_name in ("coarse", "fine"):
            if pass_name not in results:
                continue
            global_results = results[pass_name]["global"]
            features = global_results["integrated_features"]  # (B,T,C,n,F)

            # Feature-axis split by level (split_features_by_layer).
            level_features, begin = [], 0
            for count in counts:
                level_features.append(features[..., begin : begin + count])
                begin += count

            patches, split_features = [], []
            for level_idx, feats in enumerate(level_features):
                # Sample-axis split: keep only this level's patch samples.
                chunk = sampling.split_strided_samples(feats, patch_size, strides)[
                    level_idx
                ]
                split_features.append(chunk)
                patches.append(sampling.samples_to_patch(chunk))

            # Flatten (B, T, C) for the conv decoder.
            lead = patches[0].shape[:-3]
            flat_patches = [p.reshape((-1,) + p.shape[-3:]) for p in patches]
            decoded = self.autoencoder_model.decode(flat_patches, train=train)
            global_results["reconstructed_observations"] = decoded.reshape(
                lead + decoded.shape[1:]
            )
            global_results["splitted_integrated_features"] = split_features
        return results

    def decode_rendered_grids(
        self, results: Dict, image_size: Tuple[int, int], train: bool = False
    ) -> Dict:
        """Decode whole-image strided feature grids into full RGB frames.

        Full-frame equivalent of decode_rendered_patches (reference:
        environment_model_backpropagated_autoencoder.py:170-245): the renderer
        was run on `sample_all_rays_strided_grid` with the autoencoder's
        strides; per level, its grid slice is folded to (H/s, W/s) and the
        decoder upsamples to full resolution.
        """
        from playableenvironments_tpu.models.autoencoder import (
            autoencoder_strides,
            features_count_by_layer,
        )

        ae_cfg = self.scene.autoencoder
        strides = autoencoder_strides(ae_cfg)
        counts = features_count_by_layer(ae_cfg)

        for pass_name in ("coarse", "fine"):
            if pass_name not in results:
                continue
            global_results = results[pass_name]["global"]
            features = global_results["integrated_features"]

            level_features, begin = [], 0
            for count in counts:
                level_features.append(features[..., begin : begin + count])
                begin += count

            grids = []
            for level_idx, feats in enumerate(level_features):
                folded = sampling.split_strided_grid_samples(
                    feats, strides, image_size
                )[level_idx]
                grids.append(folded)

            lead = grids[0].shape[:-3]
            flat_grids = [g.reshape((-1,) + g.shape[-3:]) for g in grids]
            decoded = self.autoencoder_model.decode(flat_grids, train=train)
            global_results["reconstructed_observations"] = decoded.reshape(
                lead + decoded.shape[1:]
            )
        return results

    def decode_mixed_grids(
        self,
        observations: jnp.ndarray,
        results: Dict,
        image_size: Tuple[int, int],
        train: bool = False,
    ) -> Dict:
        """Decode whole-image grids with ENCODER-FEATURE MIXING: the VAE
        encoder's latents, with the rendered NeRF samples scattered in at
        their grid positions, feed the decoder. The backpropagated-
        autoencoder pipeline variant (environment_model_backpropagated_
        autoencoder.py:170-245 + the multiresolution split 178-218); the
        published model instead decodes NeRF features alone
        (decode_rendered_grids).

        :param observations: (B, T, C, H, W, 3) ground-truth frames (the
            encoder's input).
        :param results: renderer output on `sample_all_rays_strided_grid`
            with the autoencoder's strides.
        """
        from playableenvironments_tpu.models.autoencoder import (
            autoencoder_strides,
            features_count_by_layer,
        )

        ae_cfg = self.scene.autoencoder
        strides = autoencoder_strides(ae_cfg)
        counts = features_count_by_layer(ae_cfg)
        height, width = image_size

        lead = observations.shape[:-3]
        flat_observations = observations.reshape((-1,) + observations.shape[-3:])
        encoded_levels = self.autoencoder_model.encode(flat_observations, train)

        for pass_name in ("coarse", "fine"):
            if pass_name not in results:
                continue
            global_results = results[pass_name]["global"]
            features = global_results["integrated_features"]
            positions = results["positions"]

            level_features, begin = [], 0
            for count in counts:
                level_features.append(features[..., begin : begin + count])
                begin += count
            level_positions = sampling.split_strided_grid_samples(
                positions, strides, image_size
            )

            mixed_levels = []
            for level_idx, (feats, level) in enumerate(
                zip(level_features, encoded_levels)
            ):
                # Encoder levels are (mean ++ logvar); mix into the mean.
                mean = level[..., : level.shape[-1] // 2]  # (N, h_l, w_l, F_l)
                level_samples = sampling.split_strided_grid_samples(
                    feats, strides, image_size
                )[level_idx]  # (B, T, C, gh, gw, F_l)
                flat_samples = level_samples.reshape(
                    (mean.shape[0], -1, level_samples.shape[-1])
                )
                flat_pos = level_positions[level_idx].reshape(
                    (mean.shape[0], -1, 2)
                )
                mixed = sampling.insert_samples_into_features(
                    mean, flat_samples, flat_pos, (height, width)
                )
                mixed_levels.append(mixed)

            decoded = self.autoencoder_model.decode(mixed_levels, train)
            global_results["reconstructed_observations"] = decoded.reshape(
                lead + decoded.shape[1:]
            )
        return results

    def __call__(self, *args, **kwargs):
        """Default entry point == forward_from_observations (init convenience)."""
        return self.forward_from_observations(*args, **kwargs)
