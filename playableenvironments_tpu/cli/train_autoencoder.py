"""Phase-1 feature-renderer (VAE) training entry point
(reference train_autoencoder.py).

Usage: python -m playableenvironments_tpu.cli.train_autoencoder --config <yaml>
"""

from __future__ import annotations

import argparse
import os


def main():
    # Multi-host (DCN) coordination, when configured; must precede any
    # backend-initializing jax call in this process.
    from playableenvironments_tpu.parallel import maybe_initialize_distributed

    maybe_initialize_distributed()
    parser = argparse.ArgumentParser(description="Phase-1 autoencoder training")
    parser.add_argument("--config", required=True)
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from playableenvironments_tpu import config as config_lib
    from playableenvironments_tpu.cli.common import (
        build_dataset,
        load_yaml,
        output_dirs,
    )
    from playableenvironments_tpu.train import checkpointing
    from playableenvironments_tpu.train.trainer_autoencoder import (
        AutoencoderTrainer,
        AutoencoderTrainingConfig,
    )
    from playableenvironments_tpu.utils.logger import Logger
    from playableenvironments_tpu.utils.meters import AverageMeter

    cfg = load_yaml(args.config)
    results_dir, checkpoints_dir = output_dirs(cfg)
    logger = Logger(results_dir, cfg.get("logging", {}).get("run_name", "ae"))

    scene = config_lib.scene_from_dict(cfg["model"], cfg.get("playable_model"))
    t = cfg["training"]
    train_cfg = AutoencoderTrainingConfig(
        learning_rate=float(t.get("learning_rate", 4e-4)),
        lr_gamma=float(t.get("lr_gamma", 0.926118)),
        lr_decay_iterations=int(t.get("lr_decay_iterations", 10000)),
        max_steps=args.max_steps or int(t.get("max_steps", 300000)),
        kl_lambda=float(t.get("loss_weights", {}).get("KL_loss_lambda", 5e-6)),
        perceptual_lambda=float(
            t.get("loss_weights", {}).get("perceptual_loss_lambda", 0.0)
        ),
        vgg_weights_path=str(t.get("vgg_weights_path", "")),
    )
    trainer = AutoencoderTrainer(scene.autoencoder, train_cfg)

    dataset = build_dataset(cfg, "train")
    batch_size = int(t["batching"].get("batch_size", 20))

    def image_batches(seed):
        for batch in dataset.iterate_batches(batch_size, seed=seed):
            # (B, T, C, H, W, 3) -> flatten to a plain image batch.
            obs = batch.observations
            yield jnp.asarray(obs.reshape((-1,) + obs.shape[-3:]))

    example = next(image_batches(args.seed))
    state = trainer.init_state(jax.random.PRNGKey(args.seed), example)
    latest = checkpointing.latest_checkpoint(checkpoints_dir)
    if latest:
        state = checkpointing.restore_checkpoint(latest, state)
        logger.print(f"resumed from {latest}")

    step_fn = jax.jit(trainer.train_step, donate_argnums=0)
    meter = AverageMeter()
    log_interval = int(t.get("log_interval_steps", 10))
    save_freq = int(t.get("save_freq", 30000))
    epoch = 0
    while int(state.step) < train_cfg.max_steps:
        for images in image_batches(args.seed + epoch):
            key = jax.random.fold_in(jax.random.PRNGKey(args.seed), int(state.step))
            state, metrics = step_fn(state, images, key)
            step = int(state.step)
            meter.add({k: float(v) for k, v in metrics.items()})
            if step % log_interval == 0:
                logger.log(meter.pop_all(), step)
            if step % save_freq == 0 or step >= train_cfg.max_steps:
                checkpointing.save_checkpoint(checkpoints_dir, state)
            if step >= train_cfg.max_steps:
                break
        epoch += 1
    checkpointing.save_checkpoint(checkpoints_dir, state)
    logger.close()
    print(f"autoencoder training complete; checkpoints in {checkpoints_dir}")


if __name__ == "__main__":
    main()
