"""Standalone FVD between the test split and a reconstructed dataset
(reference evaluate_fvd_reconstructed_dataset.py — run separately there
because FVD lives in a TensorFlow session; kept as its own entry point for
CLI parity).

Usage: python -m playableenvironments_tpu.cli.evaluate_fvd_reconstructed_dataset
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
    parser.add_argument("--clip_length", type=int, default=16)
    args = parser.parse_args()

    from playableenvironments_tpu.cli.common import load_yaml, output_dirs
    from playableenvironments_tpu.eval.evaluators import (
        ReconstructedDatasetFVDEvaluator,
        save_results_yaml,
    )

    cfg = load_yaml(args.config)
    reference_root = os.path.join(cfg["data"]["data_root"], "test")

    evaluator = ReconstructedDatasetFVDEvaluator(clip_length=args.clip_length)
    results = evaluator.compute_metrics(reference_root, args.generated)
    results_dir, _ = output_dirs(cfg)
    output = args.output or os.path.join(
        results_dir, "reconstructed_dataset_fvd_evaluation.yaml"
    )
    save_results_yaml(results, output)
    for key, value in sorted(results.items()):
        print(f"{key}: {value:.6f}")
    print(f"results written to {output}")


if __name__ == "__main__":
    main()
