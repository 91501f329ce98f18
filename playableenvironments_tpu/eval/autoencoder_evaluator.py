"""Phase-1 training-time evaluator.

Replaces evaluation/autoencoder/autoencoder_evaluator.py (133 LoC) and
image_decoder_evaluator.py (105 LoC): during VAE training, periodically run a
held-out image batch through the autoencoder in eval mode and log (1) a
[ground truth | reconstruction] grid, (2) validation reconstruction / KL
losses, (3) per-resolution latent statistics (|mean|, exp(logvar) means) —
the signals the reference logs to wandb per eval interval.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from playableenvironments_tpu.train import losses


class AutoencoderEvaluator:
    """Periodic qualitative + quantitative phase-1 evaluation."""

    def __init__(self, trainer, val_images: np.ndarray, max_grid_images: int = 4):
        """:param trainer: AutoencoderTrainer (provides model + config).
        :param val_images: (N, H, W, 3) held-out images in [0, 1]."""
        self.trainer = trainer
        self.val_images = jnp.asarray(val_images)
        self.max_grid_images = max_grid_images
        self._forward = jax.jit(self._forward_impl)

    def _forward_impl(self, params, batch_stats, images, key):
        out, _ = self.trainer.model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            sample_key=key,
            train=False,
            mutable=["batch_stats"],
        )
        rec = losses.image_reconstruction_loss(
            images, out["reconstructed_observations"]
        )
        kl_by_level = [
            losses.spatial_kl_gaussian(level)
            for level in out["encoded_observations"]
        ]
        stats = {"val_reconstruction_loss": rec}
        for level_idx, (level, kl) in enumerate(
            zip(out["encoded_observations"], kl_by_level)
        ):
            features = level.shape[-1] // 2
            stats[f"val_kl_loss_level_{level_idx}"] = kl
            stats[f"val_latent_abs_mean_level_{level_idx}"] = jnp.mean(
                jnp.abs(level[..., :features])
            )
            stats[f"val_latent_variance_level_{level_idx}"] = jnp.mean(
                jnp.exp(level[..., features:])
            )
        return out["reconstructed_observations"], stats

    def evaluate(self, state, logger, step: int) -> Dict[str, float]:
        """Log the grid + stats; returns the scalar stats."""
        reconstructed, stats = self._forward(
            state.params, state.batch_stats, self.val_images,
            jax.random.PRNGKey(0),
        )
        scalars = {k: float(v) for k, v in stats.items()}
        logger.log(scalars, step)

        n = min(self.max_grid_images, self.val_images.shape[0])
        gt_row = np.concatenate(list(np.asarray(self.val_images[:n])), axis=1)
        rec_row = np.concatenate(
            list(np.clip(np.asarray(reconstructed[:n]), 0.0, 1.0)), axis=1
        )
        logger.log_image(
            "autoencoder_reconstruction",
            np.concatenate([gt_row, rec_row], axis=0),
            step,
        )
        return scalars
