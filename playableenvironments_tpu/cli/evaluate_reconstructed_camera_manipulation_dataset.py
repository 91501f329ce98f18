"""Paired metrics between the test split and a camera-manipulation mirror
(reference evaluate_reconstructed_camera_manipulation_dataset.py — the same
quality metrics as the plain reconstruction evaluator, run over the
novel-view dataset produced by generate_reconstructed_camera_manipulation_dataset).

Usage: python -m playableenvironments_tpu.cli.evaluate_reconstructed_camera_manipulation_dataset
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
    args = parser.parse_args()

    from playableenvironments_tpu.cli.common import load_yaml, output_dirs
    from playableenvironments_tpu.eval.evaluators import (
        ReconstructedDatasetEvaluator,
        save_results_yaml,
    )

    cfg = load_yaml(args.config)
    reference_root = os.path.join(cfg["data"]["data_root"], "test")

    evaluator = ReconstructedDatasetEvaluator(
        window_size=args.window_size, compute_fid=not args.no_fid
    )
    results = evaluator.compute_metrics(reference_root, args.generated)
    results_dir, _ = output_dirs(cfg)
    output = args.output or os.path.join(
        results_dir, "reconstructed_camera_manipulation_dataset_evaluation.yaml"
    )
    save_results_yaml(results, output)
    for key, value in sorted(results.items()):
        print(f"{key}: {value:.6f}")
    print(f"results written to {output}")


if __name__ == "__main__":
    main()
