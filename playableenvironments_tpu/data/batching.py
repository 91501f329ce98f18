"""Fixed-shape batches for the training/eval pipelines.

Replaces dataset/batching.py's BatchElement/Batch/collate: a Batch here is a
plain pytree of numpy/JAX arrays with static shapes, ready for
device_put/sharding — there is no pin_memory/cuda stage (the reference's
device boundary, batching.py:252-264); JAX handles transfer at dispatch.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import flax.struct
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class Batch:
    """One training batch.

    Shapes: B = batch, T = observations_count, C = cameras, O = dynamic
    objects, K = observation_stacking. Observations are stacked along the
    channel axis as in the reference (batching.py:80-103), NHWC layout.
    """

    observations: jnp.ndarray  # (B, T, C, H, W, 3*K) float32 [0, 1]
    camera_rotations: jnp.ndarray  # (B, T, C, 3)
    camera_translations: jnp.ndarray  # (B, T, C, 3)
    focals: jnp.ndarray  # (B, T, C)
    bounding_boxes: jnp.ndarray  # (B, T, C, O, 4) normalized ltrb
    bounding_boxes_validity: jnp.ndarray  # (B, T, C, O) bool
    global_frame_indexes: jnp.ndarray  # (B, T) int32
    video_frame_indexes: jnp.ndarray  # (B, T) int32
    video_indexes: jnp.ndarray  # (B,) int32
    actions: Optional[jnp.ndarray] = None  # (B, T) int32 (ground truth, eval only)
    keypoints: Optional[jnp.ndarray] = None  # (B, T, C, KP, 3, O)
    keypoints_validity: Optional[jnp.ndarray] = None
    optical_flow: Optional[jnp.ndarray] = None  # (B, T, C, H, W, 2) normalized

    @property
    def batch_size(self) -> int:
        return self.observations.shape[0]

    def environment_model_args(self):
        """Positional args for EnvironmentModel.forward_from_observations."""
        return (
            self.observations,
            self.camera_rotations,
            self.camera_translations,
            self.focals,
            self.bounding_boxes,
            self.bounding_boxes_validity,
            self.global_frame_indexes,
        )


def collate(samples: Sequence[dict]) -> Batch:
    """Stack per-sample dicts (from MulticameraVideoDataset) into a Batch."""

    def stack(key):
        return np.stack([s[key] for s in samples])

    optional = {}
    for key in ("actions", "keypoints", "keypoints_validity", "optical_flow"):
        if samples[0].get(key) is not None:
            optional[key] = stack(key)
    return Batch(
        observations=stack("observations"),
        camera_rotations=stack("camera_rotations"),
        camera_translations=stack("camera_translations"),
        focals=stack("focals"),
        bounding_boxes=stack("bounding_boxes"),
        bounding_boxes_validity=stack("bounding_boxes_validity"),
        global_frame_indexes=stack("global_frame_indexes"),
        video_frame_indexes=stack("video_frame_indexes"),
        video_indexes=np.asarray([s["video_index"] for s in samples], np.int32),
        **optional,
    )
