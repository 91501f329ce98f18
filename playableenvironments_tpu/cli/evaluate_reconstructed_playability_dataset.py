"""Playability metrics: paired quality + action-space diagnostics + FVD
(reference evaluate_reconstructed_playability_dataset.py +
evaluate_fvd_reconstructed_dataset.py — FVD is integrated here since there is
no TensorFlow process boundary to work around).
"""

from __future__ import annotations

import argparse
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--generated", required=True)
    parser.add_argument("--output", default=None)
    parser.add_argument("--plots", default=None,
                        help="directory for movement density / mean-vector plots")
    args = parser.parse_args()

    from playableenvironments_tpu.cli.common import load_yaml, output_dirs
    from playableenvironments_tpu.eval.evaluators import (
        ReconstructedPlayabilityDatasetEvaluator,
        save_results_yaml,
    )

    cfg = load_yaml(args.config)
    reference_root = os.path.join(cfg["data"]["data_root"], "test")
    actions_count = int(cfg.get("data", {}).get("actions_count", 7))
    results_dir_default, _ = output_dirs(cfg)
    plots_directory = args.plots or os.path.join(results_dir_default, "plots")
    evaluator = ReconstructedPlayabilityDatasetEvaluator(
        actions_count=actions_count, compute_fid=True,
        plots_directory=plots_directory,
    )
    results = evaluator.compute_metrics(reference_root, args.generated)
    output = args.output or os.path.join(
        results_dir_default, "reconstructed_playability_dataset_evaluation.yaml"
    )
    save_results_yaml(results, output)
    for key, value in sorted(results.items()):
        print(f"{key}: {value}")
    print(f"results written to {output}")


if __name__ == "__main__":
    main()
