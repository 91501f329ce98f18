"""Standalone FID between two image directories (the vendored
pytorch_fid/fid_score.py CLI, SURVEY.md §2.f).

Usage: python -m playableenvironments_tpu.cli.fid <dir_a> <dir_b>
       [--batch_size 32] [--inception_weights weights.npz]
"""

from __future__ import annotations

import argparse
import os

IMAGE_EXTENSIONS = (".png", ".jpg", ".jpeg", ".bmp")


def _image_paths(directory: str):
    paths = []
    for root, _, files in os.walk(directory):
        for name in sorted(files):
            if name.lower().endswith(IMAGE_EXTENSIONS):
                paths.append(os.path.join(root, name))
    if not paths:
        raise SystemExit(f"no images found under {directory}")
    return paths


def main():
    parser = argparse.ArgumentParser(description="FID between two image dirs")
    parser.add_argument("dir_a")
    parser.add_argument("dir_b")
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument(
        "--inception_weights", default=None,
        help="optional InceptionV3 weights .npz (eval.inception_v3."
             "load_inception_params_npz) for published-number-comparable "
             "values; default embedder is self-consistent only",
    )
    args = parser.parse_args()

    import numpy as np

    from playableenvironments_tpu.data.video import _load_image
    from playableenvironments_tpu.eval.distribution_metrics import IncrementalFID

    embed_fn = None
    if args.inception_weights:
        from playableenvironments_tpu.eval.inception_v3 import (
            inception_image_embedder,
            load_inception_params_npz,
        )

        embed_fn = inception_image_embedder(
            load_inception_params_npz(args.inception_weights)
        )
    fid = IncrementalFID(embed_fn)

    for which, directory in (("reference", args.dir_a), ("generated", args.dir_b)):
        paths = _image_paths(directory)
        update = fid.update_reference if which == "reference" else fid.update_generated
        for begin in range(0, len(paths), args.batch_size):
            chunk = paths[begin : begin + args.batch_size]
            frames = np.stack([_load_image(p) for p in chunk])
            update(frames)

    print(f"fid: {fid.compute():.6f}")


if __name__ == "__main__":
    main()
