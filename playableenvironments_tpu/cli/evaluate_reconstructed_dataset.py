"""Compute paired metrics between the test split and a reconstructed dataset
(reference evaluate_reconstructed_dataset.py).

Usage: python -m playableenvironments_tpu.cli.evaluate_reconstructed_dataset
       --config <yaml> --generated <dir> [--output results.yaml]
"""

from __future__ import annotations

import argparse
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--generated", required=True)
    parser.add_argument("--output", default=None)
    parser.add_argument("--window_size", type=int, default=16)
    parser.add_argument("--no_fid", action="store_true")
    parser.add_argument(
        "--detector_checkpoint", default=None,
        help="trained CenterNet detector checkpoint (cli.train_detector); "
             "enables the MDR/ADD detection metrics",
    )
    args = parser.parse_args()

    from playableenvironments_tpu.cli.common import load_yaml, output_dirs
    from playableenvironments_tpu.eval.evaluators import (
        ReconstructedDatasetEvaluator,
        save_results_yaml,
    )

    cfg = load_yaml(args.config)
    reference_root = os.path.join(cfg["data"]["data_root"], "test")

    detector = None
    if args.detector_checkpoint:
        import jax
        import jax.numpy as jnp

        from playableenvironments_tpu.data.dataset import MulticameraVideoDataset
        from playableenvironments_tpu.train import checkpointing
        from playableenvironments_tpu.train.trainer_detector import (
            DetectorTrainer,
            DetectorTrainingConfig,
        )

        d = cfg.get("detector_training", {})
        trainer = DetectorTrainer(
            DetectorTrainingConfig(base_features=int(d.get("base_features", 32)))
        )
        probe = MulticameraVideoDataset(reference_root, observations_count=1)
        sample = probe[0]["observations"][0, 0, ..., :3]
        state = trainer.init_state(jax.random.PRNGKey(0), jnp.asarray(sample[None]))
        state = checkpointing.restore_checkpoint(args.detector_checkpoint, state)
        detector = trainer.detect_fn(state)

    evaluator = ReconstructedDatasetEvaluator(
        window_size=args.window_size, compute_fid=not args.no_fid,
        detector=detector,
    )
    results = evaluator.compute_metrics(reference_root, args.generated)
    results_dir, _ = output_dirs(cfg)
    output = args.output or os.path.join(
        results_dir, "reconstructed_dataset_evaluation.yaml"
    )
    save_results_yaml(results, output)
    for key, value in sorted(results.items()):
        print(f"{key}: {value:.6f}")
    print(f"results written to {output}")


if __name__ == "__main__":
    main()
