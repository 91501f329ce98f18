"""Playability evaluation dataset: sequences re-enacted from one ground-truth
frame + inferred actions (zero variation)
(reference generate_reconstructed_playability_dataset.py).
"""

from __future__ import annotations

import argparse
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--environment_checkpoint", required=True)
    parser.add_argument("--playable_checkpoint", required=True)
    parser.add_argument("--output", default=None)
    parser.add_argument("--observations_count", type=int, default=8)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import jax

    from playableenvironments_tpu.cli.common import load_yaml, output_dirs
    from playableenvironments_tpu.cli.generate_reconstructed_dataset import build_renderer
    from playableenvironments_tpu.eval.creators import (
        ReconstructedPlayabilityDatasetCreator,
    )
    from playableenvironments_tpu.render.playable_model import PlayableEnvironmentModel
    from playableenvironments_tpu.train import checkpointing
    from playableenvironments_tpu.train.trainer_playable import (
        PlayableTrainer,
        PlayableTrainingConfig,
    )

    cfg = load_yaml(args.config)
    renderer, dataset, env_model = build_renderer(cfg, args.environment_checkpoint)

    playable = PlayableEnvironmentModel(env_model.scene)
    batch = next(dataset.iterate_batches(1, shuffle=False))
    trainer = PlayableTrainer(env_model, playable, PlayableTrainingConfig())
    state = trainer.init_state(
        jax.random.PRNGKey(args.seed), batch,
        renderer.variables["params"], renderer.variables.get("batch_stats", {}),
    )
    state = checkpointing.restore_checkpoint(args.playable_checkpoint, state)
    centroids = [
        state.extra["centroids"][str(i)]
        for i in range(len(env_model.scene.animation_models))
    ]
    centroids = trainer._per_object_centroids(centroids)

    results_dir, _ = output_dirs(cfg)
    output = args.output or os.path.join(
        results_dir, "reconstructed_playability_dataset"
    )
    creator = ReconstructedPlayabilityDatasetCreator(
        renderer, playable,
        {"params": state.params, "batch_stats": state.batch_stats},
        centroids,
    )
    creator.reconstruct_dataset(dataset, output, args.observations_count)
    print(f"playability dataset written to {output}")


if __name__ == "__main__":
    main()
