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
    from playableenvironments_tpu.cli.common import apply_debug_flags

    apply_debug_flags(cfg)
    results_dir, checkpoints_dir = output_dirs(cfg)
    logger = Logger(results_dir, cfg.get("logging", {}).get("run_name", "ae"))

    scene = config_lib.scene_from_dict(cfg["model"], cfg.get("playable_model"))
    # Published configs carry a dedicated `autoencoder_training:` block
    # (reference AutoencoderConfiguration reads its own YAML); fall back to
    # `training:` for single-phase smoke configs.
    t = cfg.get("autoencoder_training") or cfg["training"]
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
        remat=bool(t.get("remat", False)),
    )
    trainer = AutoencoderTrainer(scene.autoencoder, train_cfg)

    dataset = build_dataset(cfg, "train")
    batch_size = int(
        t.get("batch_size") or t.get("batching", {}).get("batch_size", 20)
    )

    # Data-parallel mesh (the phase-2 pattern): per-host interleaved batch
    # slices assemble into one global batch; XLA psums gradients over ICI.
    import math

    from playableenvironments_tpu.parallel import create_mesh, replicate, shard_batch

    process_index, process_count = jax.process_index(), jax.process_count()
    is_main = process_index == 0
    devices_count = len(jax.devices())
    if process_count > 1:
        if batch_size % devices_count:
            raise ValueError(
                f"batch_size {batch_size} must divide over {devices_count} devices"
            )
        mesh = create_mesh()
    else:
        mesh = create_mesh(jax.devices()[: math.gcd(batch_size, devices_count)])
    local_batch = batch_size // process_count

    def image_batches(seed):
        for batch in dataset.iterate_batches(
            local_batch, seed=seed,
            process_index=process_index, process_count=process_count,
        ):
            # (B, T, C, H, W, 3) -> flatten to a plain image batch.
            obs = batch.observations
            images = jnp.asarray(obs.reshape((-1,) + obs.shape[-3:]))
            yield shard_batch(images, mesh)

    example = next(image_batches(args.seed))
    state = trainer.init_state(jax.random.PRNGKey(args.seed), example)

    quick_dir = os.path.join(checkpoints_dir, "quick")
    resume_from = checkpointing.latest_checkpoint_any(checkpoints_dir, quick_dir)
    if resume_from:
        state = checkpointing.restore_checkpoint(resume_from, state)
        logger.print(f"resumed from {resume_from}")
    state = replicate(state, mesh)

    from playableenvironments_tpu.parallel import compile_barrier

    # Compile on every process before the first dispatch (see
    # parallel.mesh.compile_barrier: the first psum's context creation runs
    # under a 30 s rendezvous deadline that compile skew can blow).
    step_fn = compile_barrier(
        jax.jit(trainer.train_step, donate_argnums=0),
        state, example, jax.random.PRNGKey(args.seed),
    )
    meter = AverageMeter()
    log_interval = int(t.get("log_interval_steps", 10))
    save_freq = int(t.get("save_freq", 30000))
    quick_save_freq = int(t.get("quick_save_freq", 500))
    eval_freq = int(t.get("eval_freq", 0))

    evaluator = None
    if eval_freq:
        # Training-time GT/reconstruction grids + latent stats (reference
        # evaluation/autoencoder/autoencoder_evaluator.py).
        from playableenvironments_tpu.eval.autoencoder_evaluator import (
            AutoencoderEvaluator,
        )

        try:
            val_dataset = build_dataset(cfg, "val")
        except FileNotFoundError:
            val_dataset = dataset
        val_batch = next(val_dataset.iterate_batches(2, shuffle=False))
        val_images = val_batch.observations.reshape(
            (-1,) + val_batch.observations.shape[-3:]
        )
        evaluator = AutoencoderEvaluator(trainer, val_images)

    from playableenvironments_tpu.cli.common import ProfileWindow

    profile = ProfileWindow(t, results_dir, logger.print)

    epoch = 0
    try:
        while int(state.step) < train_cfg.max_steps:
            for images in image_batches(args.seed + epoch):
                key = jax.random.fold_in(jax.random.PRNGKey(args.seed), int(state.step))
                profile.before_step(int(state.step))
                with jax.profiler.StepTraceAnnotation(
                    "train_step", step_num=int(state.step)
                ):
                    state, metrics = step_fn(state, images, key)
                profile.after_step(int(state.step), metrics)
                step = int(state.step)
                meter.add({k: float(v) for k, v in metrics.items()})
                if step % log_interval == 0 and is_main:
                    logger.log(meter.pop_all(), step)
                if (step % save_freq == 0 or step >= train_cfg.max_steps) and is_main:
                    checkpointing.save_checkpoint(
                        checkpoints_dir, jax.device_get(state)
                    )
                elif step % quick_save_freq == 0 and is_main:
                    checkpointing.save_checkpoint(
                        quick_dir, jax.device_get(state), keep=2
                    )
                if evaluator is not None and step % eval_freq == 0 and is_main:
                    evaluator.evaluate(jax.device_get(state), logger, step)
                if step >= train_cfg.max_steps:
                    break
            epoch += 1
    finally:
        profile.close()
    if is_main:
        checkpointing.save_checkpoint(checkpoints_dir, jax.device_get(state))
    logger.close()
    print(f"autoencoder training complete; checkpoints in {checkpoints_dir}")


if __name__ == "__main__":
    main()
