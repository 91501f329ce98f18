"""Novel-view evaluation dataset: frozen frame-0 scene + ground-truth camera
trajectory (reference generate_reconstructed_camera_manipulation_dataset.py).
"""

from __future__ import annotations

import argparse
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--output", default=None)
    parser.add_argument("--observations_count", type=int, default=16)
    args = parser.parse_args()

    from playableenvironments_tpu.cli.common import load_yaml, output_dirs
    from playableenvironments_tpu.cli.generate_reconstructed_dataset import build_renderer
    from playableenvironments_tpu.eval.creators import (
        ReconstructedCameraManipulationDatasetCreator,
    )

    cfg = load_yaml(args.config)
    renderer, dataset, _ = build_renderer(cfg, args.checkpoint)
    results_dir, _ = output_dirs(cfg)
    output = args.output or os.path.join(
        results_dir, "reconstructed_camera_manipulation_dataset"
    )
    creator = ReconstructedCameraManipulationDatasetCreator(renderer)
    creator.reconstruct_dataset(dataset, output, args.observations_count)
    print(f"camera-manipulation dataset written to {output}")


if __name__ == "__main__":
    main()
