"""SceneEncoding: the compact per-frame scene state.

This pytree is the exact contract between the synthesis model and the action
model (reference: the `scene_encoding` dict built at
model/environment_model.py:828-837): camera parameters plus per-object pose,
style, deformation and presence. Phase-3 training operates purely on this
state — it never renders (SURVEY.md §3.2).

Axis convention: the object axis comes before the per-object feature axis
((..., objects, 3) etc.), unlike the reference's trailing-object layout —
keeps feature vectors contiguous in the lane dimension on TPU.
"""

from __future__ import annotations

from typing import Optional

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class SceneEncoding:
    """Per-frame scene state.

    Shapes use B = batch, T = observations_count, C = cameras, O = objects.
    """

    camera_rotations: jnp.ndarray  # (B, T, C, 3)
    camera_translations: jnp.ndarray  # (B, T, C, 3)
    focals: jnp.ndarray  # (B, T, C)
    object_rotations: jnp.ndarray  # (B, T, O, 3)
    object_translations: jnp.ndarray  # (B, T, O, 3)
    object_style: jnp.ndarray  # (B, T, O, style_features)
    object_deformation: jnp.ndarray  # (B, T, O, deformation_features)
    object_in_scene: jnp.ndarray  # (B, T, O) bool

    @property
    def objects_count(self) -> int:
        return self.object_rotations.shape[-2]

    def select_frame(self, frame_idx: int) -> "SceneEncoding":
        """Slice a single observation index, keeping the T axis (size 1)."""
        sl = slice(frame_idx, frame_idx + 1)
        return SceneEncoding(
            camera_rotations=self.camera_rotations[:, sl],
            camera_translations=self.camera_translations[:, sl],
            focals=self.focals[:, sl],
            object_rotations=self.object_rotations[:, sl],
            object_translations=self.object_translations[:, sl],
            object_style=self.object_style[:, sl],
            object_deformation=self.object_deformation[:, sl],
            object_in_scene=self.object_in_scene[:, sl],
        )
