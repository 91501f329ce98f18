"""Regenerate golden_activations.json from the independent torch/TF twins.

Usage: python -m playableenvironments_tpu.compat.regenerate_goldens

The goldens' provenance is the twin side (compat/torch_twins.py): plain-torch
pytorch_fid InceptionV3, torch VGG19/LPIPS, TF2 tfhub-layout I3D — NOT the
flax pipeline they validate. Each entry records its source. After writing,
the script cross-checks the flax pipeline against the new goldens and fails
loudly on disagreement, so a regeneration can never ship goldens the repo
itself does not satisfy.
"""

from __future__ import annotations

import sys


def main() -> int:
    from playableenvironments_tpu.compat import torch_twins as tt
    from playableenvironments_tpu.compat import weight_validation as wv

    signatures = tt.twin_signatures()
    sources = {
        "inception_v3": "torch twin (pytorch_fid topology)",
        "i3d": "tensorflow twin (tfhub kinetics-i3d graph)",
        "lpips": "torch twin (lpips heads + torchvision vgg16)",
        "vgg19": "torch twin (torchvision features layout)",
    }
    for name, signature in signatures.items():
        signature["source"] = sources[name]
    path = wv.write_goldens(signatures)
    print(f"wrote {sorted(signatures)} goldens (twin provenance) to {path}")

    report = wv.compare_signatures(
        wv.compute_signatures(wv.synthetic_variables()), wv.load_goldens()
    )
    failed = [n for n, r in report.items() if r["status"] != "PASS"]
    for name, entry in sorted(report.items()):
        print(f"  flax-vs-twin {name}: {entry['status']}")
    if failed:
        print(f"FLAX PIPELINE DISAGREES WITH TWINS: {failed}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
