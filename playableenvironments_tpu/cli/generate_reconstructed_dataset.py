"""Render the test split into a mirrored dataset
(reference generate_reconstructed_dataset.py).

Usage: python -m playableenvironments_tpu.cli.generate_reconstructed_dataset
       --config <yaml> --checkpoint <phase2 ckpt> [--output <dir>]
"""

from __future__ import annotations

import argparse
import os


def build_renderer(cfg, checkpoint, seed=0, batch=None):
    import jax

    from playableenvironments_tpu.cli.common import (
        with_batching_overrides,
        build_dataset,
        build_environment_model,
        build_eval_mesh,
        synthesis_training_config,
    )
    from playableenvironments_tpu.eval.creators import FrameRenderer
    from playableenvironments_tpu.train import checkpointing
    from playableenvironments_tpu.train.trainer_synthesis import SynthesisTrainer

    env_model = build_environment_model(cfg)
    dataset = build_dataset(
        with_batching_overrides(cfg, observations_count=1), "test"
    )
    if batch is None:
        batch = next(dataset.iterate_batches(1, shuffle=False))
    trainer = SynthesisTrainer(env_model, synthesis_training_config(cfg))
    state = trainer.init_state(jax.random.PRNGKey(seed), batch)
    params, batch_stats = checkpointing.restore_params(
        checkpoint, state.params, state.batch_stats
    )
    strides = None
    if env_model.scene.autoencoder is not None:
        from playableenvironments_tpu.models.autoencoder import autoencoder_strides

        strides = autoencoder_strides(env_model.scene.autoencoder)
    h, w = dataset.videos[0].image_size()
    renderer = FrameRenderer(
        env_model, {"params": params, "batch_stats": batch_stats}, (h, w),
        strides, mesh=build_eval_mesh(cfg),
    )
    return renderer, dataset, env_model


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--output", default=None)
    parser.add_argument("--batch_size", type=int, default=4)
    args = parser.parse_args()

    from playableenvironments_tpu.cli.common import load_yaml, output_dirs
    from playableenvironments_tpu.eval.creators import ReconstructedDatasetCreator

    cfg = load_yaml(args.config)
    renderer, dataset, _ = build_renderer(cfg, args.checkpoint)
    results_dir, _ = output_dirs(cfg)
    output = args.output or os.path.join(results_dir, "reconstructed_dataset")
    creator = ReconstructedDatasetCreator(renderer, args.batch_size)
    creator.reconstruct_dataset(dataset, output)
    print(f"reconstructed dataset written to {output}")


if __name__ == "__main__":
    main()
