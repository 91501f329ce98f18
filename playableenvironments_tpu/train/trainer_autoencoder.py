"""Phase-1 trainer: the variational feature renderer (VAE) on plain images.

Replaces training/autoencoder/autoencoder_trainer.py: image reconstruction +
spatial KL (+ optional perceptual), Adam with staircase lr decay, one jitted
step. Input augmentation sets are omitted — the reference's are effectively
disabled by a `hasattr`-on-dict bug (dataset/transforms.py:169-244,
SURVEY.md §2.e).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from playableenvironments_tpu.config import AutoencoderConfig
from playableenvironments_tpu.models.autoencoder import MultiresAutoencoder
from playableenvironments_tpu.train import losses
from playableenvironments_tpu.train.state import TrainState, create_train_state, make_optimizer


@dataclass(frozen=True)
class AutoencoderTrainingConfig:
    learning_rate: float = 4e-4
    lr_gamma: float = 0.926118
    lr_decay_iterations: int = 10000
    weight_decay: float = 0.0
    max_steps: int = 300000
    reconstruction_lambda: float = 1.0
    perceptual_lambda: float = 0.0
    kl_lambda: float = 5e-6
    # Optional torch VGG19 checkpoint for the perceptual term (zero-egress:
    # default weights are randomly initialized but fixed — self-consistent).
    vgg_weights_path: str = ""
    # Rematerialize the forward (jax.checkpoint) instead of keeping every
    # conv activation alive for the backward: trades ~1/3 more FLOPs for a
    # large cut in peak HBM — phase-1 at 512x288 is HBM-bound, so this buys
    # batch-size headroom beyond the published bs 20.
    remat: bool = False


class AutoencoderTrainer:
    """Jitted train step for the MultiresAutoencoder on (N, H, W, 3) images."""

    def __init__(self, ae_cfg: AutoencoderConfig, cfg: AutoencoderTrainingConfig):
        self.model = MultiresAutoencoder(ae_cfg)
        self.ae_cfg = ae_cfg
        self.cfg = cfg
        self.vgg_variables = None
        if cfg.perceptual_lambda > 0.0:
            from playableenvironments_tpu.eval.perceptual import (
                init_vgg19,
                load_torch_vgg_weights,
            )

            if cfg.vgg_weights_path:
                self.vgg_variables, _ = load_torch_vgg_weights(cfg.vgg_weights_path)
            else:
                self.vgg_variables = init_vgg19(jax.random.PRNGKey(7))

    def init_state(self, key: jax.Array, example_images: jnp.ndarray) -> TrainState:
        # jit the init (eager per-op dispatch is seconds each over a
        # tunneled TPU; see __graft_entry__.entry).
        variables = jax.jit(self.model.init)(
            {"params": key}, example_images, sample_key=key
        )
        tx = make_optimizer(
            self.cfg.learning_rate,
            self.cfg.lr_gamma,
            self.cfg.lr_decay_iterations,
            self.cfg.weight_decay,
        )
        return create_train_state(
            variables["params"], variables.get("batch_stats", {}), tx
        )

    def compute_losses(self, params, batch_stats, images, key):
        """VAE objective (autoencoder_trainer.py:57-68): pixel MSE + spatial KL."""

        def forward(params, batch_stats, images, key):
            return self.model.apply(
                {"params": params, "batch_stats": batch_stats},
                images,
                sample_key=key,
                train=True,
                mutable=["batch_stats"],
            )

        if self.cfg.remat:
            # Save only conv/matmul outputs; recompute elementwise chains
            # (a monolithic no-policy checkpoint would re-materialize every
            # residual at once in the backward — no peak-memory win).
            forward = jax.checkpoint(
                forward, policy=jax.checkpoint_policies.dots_saveable
            )
        out, mutated = forward(params, batch_stats, images, key)
        rec = losses.image_reconstruction_loss(
            images, out["reconstructed_observations"]
        )
        kl = jnp.mean(
            jnp.stack(
                [losses.spatial_kl_gaussian(level) for level in out["encoded_observations"]]
            )
        )
        total = self.cfg.reconstruction_lambda * rec + self.cfg.kl_lambda * kl
        metrics = {"loss": total, "reconstruction_loss": rec, "kl_loss": kl}
        if self.vgg_variables is not None:
            from playableenvironments_tpu.eval.perceptual import perceptual_loss

            def perceptual_fn(reconstructed):
                value, _ = perceptual_loss(
                    self.vgg_variables, images, reconstructed,
                    compute_dtype=self.ae_cfg.compute_dtype,
                )
                return value

            if self.cfg.remat:
                perceptual_fn = jax.checkpoint(perceptual_fn)
            perceptual = perceptual_fn(out["reconstructed_observations"])
            total = total + self.cfg.perceptual_lambda * perceptual
            metrics["perceptual_loss"] = perceptual
            metrics["loss"] = total
        return total, (metrics, mutated["batch_stats"], out)

    def train_step(
        self, state: TrainState, images: jnp.ndarray, key: jax.Array
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        def loss_fn(params):
            return self.compute_losses(params, state.batch_stats, images, key)

        (_, (metrics, new_batch_stats, _)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        return (
            state.apply_gradients(grads).replace(batch_stats=new_batch_stats),
            metrics,
        )
