"""Metric-weight parity validation CLI.

The reference's quality metrics run on published pretrained embedders
(pytorch_fid InceptionV3 — pytorch_fid/inception.py:322; tfhub Kinetics I3D —
evaluation/metrics/fvd.py:32-34; the lpips package; torchvision VGG). This
zero-egress build cannot ship those weights, so this CLI gives a PASS/FAIL
parity verdict instead of a leap of faith:

  # Self-check (no weight files needed, runs anywhere):
  python -m playableenvironments_tpu.cli.validate_metric_weights

  # With your weight files (a machine that downloaded them):
  python -m ... --inception pt_inception-2015-12-05.pth \\
                --i3d i3d_kinetics_rgb.npz \\
                --lpips_lins lpips_vgg.pth --vgg16 vgg16.pth \\
                --vgg19 vgg19.pth --write_goldens my_goldens.json
  # Later / on another machine, prove nothing drifted:
  python -m ... --inception ... --goldens my_goldens.json

Exit code 0 = every requested check passed.
"""

from __future__ import annotations

import argparse
import json
import sys


def main():
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--inception", help="torchvision/pytorch_fid InceptionV3 .pth")
    parser.add_argument("--i3d", help="tfhub Kinetics-400 RGB I3D variables .npz")
    parser.add_argument("--lpips_lins", help="lpips package vgg.pth (linear heads)")
    parser.add_argument("--vgg16", help="torchvision VGG16 .pth (LPIPS backbone)")
    parser.add_argument("--vgg19", help="torchvision VGG19 .pth (perceptual loss)")
    parser.add_argument(
        "--goldens", default=None,
        help="golden signature JSON to compare against (default: the shipped "
        "synthetic goldens when no weight files are given)",
    )
    parser.add_argument(
        "--write_goldens", default=None,
        help="write the computed signatures to this JSON instead of comparing",
    )
    parser.add_argument("--rtol", type=float, default=2e-3)
    args = parser.parse_args()

    from playableenvironments_tpu.compat import weight_validation as wv

    any_files = any(
        (args.inception, args.i3d, args.lpips_lins, args.vgg16, args.vgg19)
    )
    if args.vgg16 and not args.lpips_lins:
        raise SystemExit(
            "--vgg16 is the LPIPS backbone and is only validated through the "
            "LPIPS head: pass --lpips_lins with it (for the phase-2 "
            "perceptual-loss VGG, pass --vgg19)"
        )
    if any_files and not (args.goldens or args.write_goldens):
        raise SystemExit(
            "real weight files need --write_goldens (first run: record their "
            "signatures) or --goldens (compare against a recorded file); the "
            "shipped golden_activations.json only matches the synthetic "
            "self-check and would always FAIL real weights"
        )
    variables = {}
    if not any_files:
        print("no weight files given: running the synthetic self-check "
              "(converters + embedders over the pinned published layouts)")
        variables = wv.synthetic_variables()
    else:
        from playableenvironments_tpu.compat import metric_weights as mw

        if args.inception:
            variables["inception_v3"] = mw.load_torch_inception_weights(
                args.inception
            )
        if args.i3d:
            variables["i3d"] = mw.load_tfhub_i3d_weights(args.i3d)
        if args.lpips_lins:
            if not args.vgg16:
                raise SystemExit("--lpips_lins requires --vgg16 (the backbone)")
            variables["lpips"] = mw.load_torch_lpips_weights(
                args.lpips_lins, args.vgg16
            )
        if args.vgg19:
            from playableenvironments_tpu.eval.perceptual import (
                load_torch_vgg_weights,
            )

            variables["vgg19"], _ = load_torch_vgg_weights(args.vgg19)

    signatures = wv.compute_signatures(variables)

    if args.write_goldens:
        path = wv.write_goldens(signatures, args.write_goldens)
        print(f"golden signatures written to {path}")
        return

    golden = wv.load_goldens(args.goldens)
    report = wv.compare_signatures(signatures, golden, rtol=args.rtol)
    failed, missing = [], []
    for name, verdict in sorted(report.items()):
        print(f"{name}: {verdict['status']}")
        if verdict["status"] == "MISSING":
            # Non-fatal, but visible: the goldens record this embedder and
            # this run didn't compute it — partial coverage, not full.
            missing.append(name)
        elif verdict["status"] != "PASS":
            failed.append(name)
            if "computed" in verdict:
                print(f"  computed: {json.dumps(verdict['computed'])}")
                print(f"  golden:   {json.dumps(verdict['golden'])}")
    if failed:
        raise SystemExit(f"FAILED: {failed}")
    if missing:
        print(
            f"passed, but NOT validated this run (no weights given): {missing}"
        )
    else:
        print("all checks passed")


if __name__ == "__main__":
    main()
