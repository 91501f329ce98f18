"""Player-detector training entry point.

Replaces evaluation/detection/train_detector.py (FasterRCNN fine-tune on
MulticameraVideoDataset boxes via the vendored torchvision engine) with the
in-framework CenterNet trainer. The resulting checkpoint plugs into the
reconstructed-dataset evaluators as their detector (MDR/ADD metrics).

Usage: python -m playableenvironments_tpu.cli.train_detector --config <yaml>
"""

from __future__ import annotations

import argparse


def main():
    # Multi-host (DCN) coordination, when configured; must precede any
    # backend-initializing jax call in this process.
    from playableenvironments_tpu.parallel import maybe_initialize_distributed

    maybe_initialize_distributed()
    parser = argparse.ArgumentParser(description="Player-detector training")
    parser.add_argument("--config", required=True)
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import os

    import jax

    from playableenvironments_tpu.cli.common import load_yaml, output_dirs
    from playableenvironments_tpu.data.dataset import MulticameraVideoDataset
    from playableenvironments_tpu.parallel import mesh as mesh_lib
    from playableenvironments_tpu.train import checkpointing
    from playableenvironments_tpu.train.trainer_detector import (
        DetectorTrainer,
        DetectorTrainingConfig,
        dataset_detection_batches,
        evaluate_detection,
    )
    from playableenvironments_tpu.utils.logger import Logger
    from playableenvironments_tpu.utils.meters import AverageMeter

    cfg = load_yaml(args.config)
    results_dir, checkpoints_dir = output_dirs(cfg)
    checkpoints_dir = os.path.join(checkpoints_dir, "detector")
    os.makedirs(checkpoints_dir, exist_ok=True)
    logger = Logger(results_dir, "detector")

    d = cfg.get("detector_training", {})
    trainer_cfg = DetectorTrainingConfig(
        learning_rate=float(d.get("learning_rate", 1e-3)),
        weight_decay=float(d.get("weight_decay", 1e-4)),
        max_steps=int(args.max_steps or d.get("max_steps", 1000)),
        base_features=int(d.get("base_features", 32)),
    )
    trainer = DetectorTrainer(trainer_cfg)

    data_cfg = cfg["data"]
    dataset = MulticameraVideoDataset(
        os.path.join(data_cfg["data_root"], "train"),
        observations_count=1,
        target_size=tuple(data_cfg.get("target_size", (None, None)))
        if data_cfg.get("target_size")
        else None,
    )

    # Validation split for the training-time detection-quality evaluation
    # (reference: per-epoch COCO eval, evaluation/detection/engine.py:65+);
    # falls back to the training split when no val split exists.
    eval_freq = int(d.get("eval_freq", 0))
    val_dataset = dataset
    if eval_freq:
        val_dir = os.path.join(data_cfg["data_root"], "val")
        if os.path.isdir(val_dir):
            val_dataset = MulticameraVideoDataset(
                val_dir, observations_count=1,
                target_size=dataset.target_size,
            )

    key = jax.random.PRNGKey(args.seed)
    example = next(dataset_detection_batches(dataset, args.batch_size))
    state = trainer.init_state(key, example[0])

    mesh = mesh_lib.create_mesh()
    train_step = jax.jit(trainer.train_step, donate_argnums=0)

    meter = AverageMeter()
    step = 0
    while step < trainer_cfg.max_steps:
        for images, boxes, validity in dataset_detection_batches(
            dataset, args.batch_size, seed=args.seed + step
        ):
            if len(mesh.devices.flat) > 1 and images.shape[0] % len(
                mesh.devices.flat
            ) == 0:
                images, boxes, validity = mesh_lib.shard_batch(
                    (images, boxes, validity), mesh
                )
            state, losses = train_step(state, images, boxes, validity)
            meter.add({k: float(v) for k, v in losses.items()})
            step += 1
            if step % 50 == 0:
                logger.log(meter.pop_all(), step)
            if eval_freq and step % eval_freq == 0:
                val_metrics = evaluate_detection(
                    trainer, state,
                    dataset_detection_batches(
                        val_dataset, args.batch_size, shuffle=False
                    ),
                    max_batches=int(d.get("eval_batches", 8)),
                )
                logger.log(
                    {f"val_{k}": v for k, v in val_metrics.items()}, step
                )
            if step >= trainer_cfg.max_steps:
                break

    checkpointing.save_checkpoint(checkpoints_dir, state, step)
    print(f"detector checkpoint written to {checkpoints_dir} (step {step})")


if __name__ == "__main__":
    main()
