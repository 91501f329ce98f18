"""Reconstructed-dataset creators: render the test split through the model
into a mirrored on-disk dataset for offline metric computation.

Replaces evaluation/reconstructed_dataset_creator.py (plain reconstruction),
reconstructed_playability_dataset_creator.py (action re-enactment), and
reconstructed_camera_manipulation_dataset_creator.py (novel-view replay).
Artifact copies use Python file copies instead of rsync subprocesses
(reconstructed_dataset_creator.py:133).
"""

from __future__ import annotations

import os
import pickle
import shutil
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from playableenvironments_tpu.data.dataset import MulticameraVideoDataset
from playableenvironments_tpu.data.video import Video
from playableenvironments_tpu.render.environment_model import EnvironmentModel
from playableenvironments_tpu.scene.encoding import SceneEncoding
from playableenvironments_tpu.train.trainer_synthesis import split_rngs


def _save_frame(array: np.ndarray, path: str):
    """PNG write through the native C++ encoder (thread-pool libpng), PIL
    fallback — the creators write one file per rendered frame."""
    from playableenvironments_tpu.data.video import _save_image

    _save_image(np.asarray(array), path)


def _copy_metadata(src_camera_dir: str, dst_camera_dir: str):
    """Copy the pickled annotation files alongside rendered frames
    (the reference rsyncs them, reconstructed_dataset_creator.py:133-134)."""
    for filename in list(Video.PICKLE_FILES.values()) + list(
        Video.OPTIONAL_PICKLE_FILES.values()
    ):
        src = os.path.join(src_camera_dir, filename)
        if os.path.isfile(src):
            shutil.copy(src, os.path.join(dst_camera_dir, filename))


class FrameRenderer:
    """Shared full-frame rendering path for the creators: scene encoding ->
    strided-grid render -> (decoder if configured)."""

    def __init__(
        self,
        model: EnvironmentModel,
        variables,
        image_size,
        patch_strides: Optional[Sequence[int]] = None,
        ray_tile: int = 0,
        use_fast: bool = True,
        mesh=None,
    ):
        """:param mesh: optional (data, rays) jax.sharding.Mesh
        (parallel.create_2d_mesh): full-frame renders shard their ray axis
        over the `rays` mesh axis — a full frame is exactly where multi-chip
        ray sharding pays (reference knob: samples_per_image_batching,
        environment_model.py:474-521). None = single-device (round-2
        behavior)."""
        self.model = model
        self.variables = variables
        self.image_size = tuple(image_size)
        self.patch_strides = list(patch_strides) if patch_strides else None
        self.ray_tile = ray_tile
        # The fused-kernel inference path (render.fast): ~2x the XLA
        # composer on TPU. Interpret mode keeps it runnable on CPU.
        self.use_fast = use_fast
        self.mesh = mesh
        self._encode = jax.jit(self._encode_impl)
        self._render = jax.jit(
            self._render_fast_impl if use_fast else self._render_impl
        )

    def _mesh_context(self):
        import contextlib

        return (
            jax.set_mesh(self.mesh)
            if self.mesh is not None
            else contextlib.nullcontext()
        )

    def _render_fast_impl(self, encoding: SceneEncoding):
        from playableenvironments_tpu.render import fast

        return fast.render_frame_fast(
            self.model.scene,
            self.variables,
            encoding,
            self.image_size,
            patch_strides=self.patch_strides,
            focal_length_multiplier=self.model.focal_length_multiplier,
            interpret=jax.default_backend() == "cpu",
        )

    def _encode_impl(self, args):
        (encoding, _), _ = self.model.apply(
            self.variables,
            *args,
            train=False,
            method=EnvironmentModel.compute_scene_encoding,
            rngs=split_rngs(jax.random.PRNGKey(0)),
            mutable=["batch_stats"],
        )
        return encoding

    def _render_impl(self, encoding: SceneEncoding):
        out, _ = self.model.apply(
            self.variables,
            encoding,
            self.image_size,
            self.patch_strides,
            self.ray_tile,
            False,
            method=EnvironmentModel.render_frame_from_scene_encoding,
            rngs=split_rngs(jax.random.PRNGKey(0)),
            mutable=["batch_stats"],
        )
        if self.model.scene.autoencoder is not None and self.patch_strides:
            out, _ = self.model.apply(
                self.variables,
                out,
                self.image_size,
                False,
                method=EnvironmentModel.decode_rendered_grids,
                mutable=["batch_stats"],
            )
            frames = out["coarse"]["global"]["reconstructed_observations"]
        else:
            from playableenvironments_tpu.render import sampling

            features = out["coarse"]["global"]["integrated_features"]
            if self.patch_strides:
                features = sampling.split_strided_grid_samples(
                    features, self.patch_strides, self.image_size
                )[0]
                h, w = self.image_size
                n, t, c = features.shape[:3]
                frames = jax.image.resize(
                    features, (n, t, c, h, w, features.shape[-1]), method="bilinear"
                )
            else:
                h, w = self.image_size
                frames = features.reshape(
                    features.shape[:-2] + (h, w, features.shape[-1])
                )
        return jnp.clip(frames, 0.0, 1.0)

    def encode(self, batch) -> SceneEncoding:
        with self._mesh_context():
            return self._encode(batch.environment_model_args())

    def render(self, encoding: SceneEncoding) -> jnp.ndarray:
        """:return: (B, T, C, H, W, 3) frames in [0, 1]."""
        with self._mesh_context():
            return self._render(encoding)


class ReconstructedDatasetCreator:
    """Render every frame of every video into a mirror dataset.
    Reference: evaluation/reconstructed_dataset_creator.py:97-142."""

    def __init__(self, renderer: FrameRenderer, batch_size: int = 4):
        self.renderer = renderer
        self.batch_size = batch_size

    def reconstruct_dataset(
        self, dataset: MulticameraVideoDataset, output_root: str
    ) -> str:
        os.makedirs(output_root, exist_ok=True)
        dataset.set_observations_count(1)
        for batch in dataset.iterate_batches(
            self.batch_size, shuffle=False, drop_last=False
        ):
            encoding = self.renderer.encode(batch)
            frames = np.asarray(self.renderer.render(encoding))
            for element_idx in range(frames.shape[0]):
                video_idx = int(batch.video_indexes[element_idx])
                frame_idx = int(batch.video_frame_indexes[element_idx, 0])
                for camera_pos, camera_idx in enumerate(dataset.allowed_cameras):
                    camera_dir = os.path.join(
                        output_root, f"{video_idx:05}", f"{camera_idx:05}"
                    )
                    os.makedirs(camera_dir, exist_ok=True)
                    _save_frame(
                        frames[element_idx, 0, camera_pos],
                        os.path.join(camera_dir, f"{frame_idx:05}.png"),
                    )
        # Copy annotations so the mirror is a loadable dataset.
        for video_idx, video in enumerate(dataset.videos):
            for camera_idx in dataset.allowed_cameras:
                src = video.videos[camera_idx].path
                dst = os.path.join(output_root, f"{video_idx:05}", f"{camera_idx:05}")
                if src and os.path.isdir(dst):
                    _copy_metadata(src, dst)
        return output_root


class ReconstructedCameraManipulationDatasetCreator:
    """Freeze the frame-0 scene state and replay the ground-truth camera
    trajectory (novel-view evaluation).
    Reference: reconstructed_camera_manipulation_dataset_creator.py:112-176."""

    def __init__(self, renderer: FrameRenderer, batch_size: int = 1):
        self.renderer = renderer
        self.batch_size = batch_size

    def reconstruct_dataset(
        self, dataset: MulticameraVideoDataset, output_root: str,
        observations_count: int,
    ) -> str:
        os.makedirs(output_root, exist_ok=True)
        # NON-overlapping windows: with the default stride-1 index space,
        # every later window re-renders (and overwrites) earlier windows'
        # frames with its own t=0 reconstruction, degrading the mirror to a
        # per-frame recon. (The reference pre-fragments eval videos to one
        # window each; this handles longer videos too.)
        dataset.set_observations_count(
            observations_count,
            window_stride=(dataset.skip_frames + 1) * (observations_count - 1) + 1,
        )
        for batch in dataset.iterate_batches(
            self.batch_size, shuffle=False, drop_last=False
        ):
            encoding = self.renderer.encode(batch)
            # Frame-0 object state broadcast across the trajectory; cameras
            # keep their per-frame ground truth.
            frozen = SceneEncoding(
                camera_rotations=encoding.camera_rotations,
                camera_translations=encoding.camera_translations,
                focals=encoding.focals,
                object_rotations=jnp.broadcast_to(
                    encoding.object_rotations[:, :1], encoding.object_rotations.shape
                ),
                object_translations=jnp.broadcast_to(
                    encoding.object_translations[:, :1],
                    encoding.object_translations.shape,
                ),
                object_style=jnp.broadcast_to(
                    encoding.object_style[:, :1], encoding.object_style.shape
                ),
                object_deformation=jnp.broadcast_to(
                    encoding.object_deformation[:, :1],
                    encoding.object_deformation.shape,
                ),
                object_in_scene=jnp.broadcast_to(
                    encoding.object_in_scene[:, :1], encoding.object_in_scene.shape
                ),
            )
            frames = np.asarray(self.renderer.render(frozen))
            for element_idx in range(frames.shape[0]):
                video_idx = int(batch.video_indexes[element_idx])
                for t in range(frames.shape[1]):
                    frame_idx = int(batch.video_frame_indexes[element_idx, t])
                    for camera_pos, camera_idx in enumerate(dataset.allowed_cameras):
                        camera_dir = os.path.join(
                            output_root, f"{video_idx:05}", f"{camera_idx:05}"
                        )
                        os.makedirs(camera_dir, exist_ok=True)
                        _save_frame(
                            frames[element_idx, t, camera_pos],
                            os.path.join(camera_dir, f"{frame_idx:05}.png"),
                        )
        for video_idx, video in enumerate(dataset.videos):
            for camera_idx in dataset.allowed_cameras:
                src = video.videos[camera_idx].path
                dst = os.path.join(output_root, f"{video_idx:05}", f"{camera_idx:05}")
                if src and os.path.isdir(dst):
                    _copy_metadata(src, dst)
        return output_root


class ReconstructedPlayabilityDatasetCreator:
    """Re-enact sequences with one ground-truth frame + inferred actions
    (zero variation), rendering the dynamics rollouts; inferred actions are
    recorded into metadata.pkl.
    Reference: reconstructed_playability_dataset_creator.py:177-324."""

    def __init__(
        self,
        renderer: FrameRenderer,
        playable_model,
        playable_variables,
        centroids: List[jnp.ndarray],
        batch_size: int = 1,
    ):
        from playableenvironments_tpu.eval.action_modifiers import (
            zero_variation_action_modifier,
        )

        self.renderer = renderer
        self.playable_model = playable_model
        self.playable_variables = playable_variables
        self.centroids = centroids
        self.batch_size = batch_size
        self.action_modifier = zero_variation_action_modifier

    def reconstruct_dataset(
        self, dataset: MulticameraVideoDataset, output_root: str,
        observations_count: int,
    ) -> str:
        from playableenvironments_tpu.render.playable_model import (
            PlayableEnvironmentModel,
        )

        os.makedirs(output_root, exist_ok=True)
        # Non-overlapping re-enactment windows (see the camera-manipulation
        # creator): overlapping windows would overwrite each rollout frame
        # with the next window's t=0 GT-seeded render.
        dataset.set_observations_count(
            observations_count,
            window_stride=(dataset.skip_frames + 1) * (observations_count - 1) + 1,
        )
        inferred_actions_by_video: Dict[int, Dict[int, List[int]]] = {}

        for batch in dataset.iterate_batches(
            self.batch_size, shuffle=False, drop_last=False
        ):
            encoding = self.renderer.encode(batch)
            results, _ = self.playable_model.apply(
                self.playable_variables,
                encoding,
                1,  # one ground-truth frame, rest re-enacted
                self.centroids,
                self.action_modifier,
                True,
                method=PlayableEnvironmentModel.animate,
                rngs={
                    "action_sampling": jax.random.PRNGKey(0),
                    "gumbel": jax.random.PRNGKey(1),
                },
                mutable=["batch_stats"],
            )
            # Re-render with reconstructed object states.
            new_rot = encoding.object_rotations
            new_trans = encoding.object_translations
            new_style = encoding.object_style
            new_deform = encoding.object_deformation
            from playableenvironments_tpu.config import ObjectIds

            static = ObjectIds(self.playable_model.scene).static_objects_count
            for dyn_idx, res in enumerate(results):
                obj = static + dyn_idx
                new_rot = new_rot.at[..., obj, :].set(
                    res["reconstructed_object_rotations"]
                )
                new_trans = new_trans.at[..., obj, :].set(
                    res["reconstructed_object_translations"]
                )
                new_style = new_style.at[..., obj, :].set(
                    res["reconstructed_object_style"]
                )
                new_deform = new_deform.at[..., obj, :].set(
                    res["reconstructed_object_deformation"]
                )
            reenacted = encoding.replace(
                object_rotations=new_rot,
                object_translations=new_trans,
                object_style=new_style,
                object_deformation=new_deform,
            )
            frames = np.asarray(self.renderer.render(reenacted))

            for element_idx in range(frames.shape[0]):
                video_idx = int(batch.video_indexes[element_idx])
                actions_per_frame = inferred_actions_by_video.setdefault(video_idx, {})
                for t in range(frames.shape[1]):
                    frame_idx = int(batch.video_frame_indexes[element_idx, t])
                    if t < frames.shape[1] - 1:
                        action = int(
                            np.argmax(
                                np.asarray(results[0]["sampled_actions"])[
                                    element_idx, t
                                ]
                            )
                        )
                        actions_per_frame[frame_idx] = action
                    for camera_pos, camera_idx in enumerate(dataset.allowed_cameras):
                        camera_dir = os.path.join(
                            output_root, f"{video_idx:05}", f"{camera_idx:05}"
                        )
                        os.makedirs(camera_dir, exist_ok=True)
                        _save_frame(
                            frames[element_idx, t, camera_pos],
                            os.path.join(camera_dir, f"{frame_idx:05}.png"),
                        )

        for video_idx, video in enumerate(dataset.videos):
            for camera_idx in dataset.allowed_cameras:
                src = video.videos[camera_idx].path
                dst = os.path.join(output_root, f"{video_idx:05}", f"{camera_idx:05}")
                if src and os.path.isdir(dst):
                    _copy_metadata(src, dst)
                    # Write inferred actions into metadata.pkl
                    # (reconstructed_playability_dataset_creator.py:300-320).
                    metadata_path = os.path.join(dst, "metadata.pkl")
                    if os.path.isfile(metadata_path):
                        with open(metadata_path, "rb") as f:
                            metadata = pickle.load(f)
                        for frame_idx, action in inferred_actions_by_video.get(
                            video_idx, {}
                        ).items():
                            if frame_idx < len(metadata):
                                entry = metadata[frame_idx]
                                if not isinstance(entry, dict):
                                    entry = {}
                                entry["inferred_action"] = action
                                metadata[frame_idx] = entry
                        with open(metadata_path, "wb") as f:
                            pickle.dump(metadata, f)
        return output_root
