"""Metric-weight parity validation (golden activation signatures).

The zero-egress build cannot ship the published InceptionV3 / I3D / LPIPS /
VGG weights (reference: pytorch_fid/inception.py:322, the tfhub I3D of
evaluation/metrics/fvd.py:32-34, the lpips package), so quality-metric parity
with the paper rests on two executable checks instead of a leap of faith:

1. **Synthetic self-check** (runs anywhere, no weight files): state dicts are
   synthesized deterministically over the PINNED published key layouts
   (compat/layouts/*.json), converted, executed on fixed inputs, and compared
   against golden activation signatures checked into this repo
   (golden_activations.json). This proves the converter + flax embedder
   pipeline computes exactly the math it computed when the goldens were
   generated — any regression in a converter, model topology, or layout
   breaks it loudly.

2. **Real-weight check** (runs on a machine WITH the weight files): the same
   signature computation over the user's torchvision/pytorch_fid/lpips/tfhub
   archives; `--write_goldens` records them once, later runs (or other
   machines) `--goldens` compare. Combined with check 1 this pins end-to-end
   parity of the metric stack to the user's exact weight files.

CLI: `python -m playableenvironments_tpu.cli.validate_metric_weights`.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Mapping, Optional

import numpy as np

LAYOUTS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "layouts")
GOLDEN_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "golden_activations.json"
)

# Fixed deterministic inputs: small enough to run on CPU in seconds, large
# enough that every conv/branch of each embedder touches real data.
#
# The deep embedders (InceptionV3, I3D) get NATIVE-resolution inputs
# (299/224) so no resize sits inside the signature path: the framework
# resizes (jax.image.resize vs torch F.interpolate vs tf.image.resize)
# agree only to ~1e-6 per pixel, and an input-layer perturbation of 1e-6
# amplifies ~1e4x through 94 He-initialized conv layers — swamping the
# topology signal the goldens exist to pin. With bit-identical inputs the
# same stack agrees cross-framework to ~1e-6 end to end (measured). Resize
# parity is asserted separately (tests/test_torch_twins.py), where a 1e-6
# difference is measurable instead of amplified.
_INPUT_SEED = 1234


def synthesize_state(layout_name: str, seed: int = 0) -> Dict[str, np.ndarray]:
    """Deterministic state dict over a pinned key layout (compat/layouts).

    Scales matter, not just shapes: with tiny uniform weights the signal
    dies across ~90 layers and the embedding degenerates to the last
    biases — a golden signature over that would not notice a corrupted
    early layer. He-scaled weight tensors, ~1 BN gammas/variances, and
    small biases keep activations O(1) through depth so every layer's
    values are load-bearing in the signature.
    """
    with open(os.path.join(LAYOUTS_DIR, layout_name)) as f:
        keys = json.load(f)
    # tfhub kernels are (t, h, w, in, out); torch kernels are (out, in, h, w).
    fan_out_axis = -1 if "tfhub" in layout_name else 0
    rng = np.random.default_rng(seed)
    out = {}
    for key, shape in keys.items():
        leaf = key.rsplit(".", 1)[-1]
        if "var" in leaf or key.endswith("moving_variance"):
            value = 1.0 + np.abs(rng.normal(scale=0.1, size=shape))
        elif len(shape) >= 2:
            fan_in = max(int(np.prod(shape)) // int(shape[fan_out_axis]), 1)
            value = rng.normal(scale=np.sqrt(2.0 / fan_in), size=shape)
        elif leaf in ("weight", "gamma"):
            value = 1.0 + rng.normal(scale=0.05, size=shape)  # BN gamma
        else:
            value = rng.normal(scale=0.05, size=shape)  # bias / beta / mean
        out[key] = value.astype(np.float32)
    return out


def _on_cpu():
    """Context pinning a signature computation to the CPU backend.

    Signatures certify topology + conversion math, so they must be
    device-independent: TPU rounding (multi-pass f32 convs, rsqrt
    approximations) injects ~1e-7 per layer, and early-layer noise
    amplifies ~1e4x through the 94-layer random-weight stacks — far past
    any usable tolerance. The real metric computation still runs on the
    accelerator; only this validation path is pinned."""
    import jax

    return jax.default_device(jax.devices("cpu")[0])


def _signature(values: np.ndarray) -> Dict:
    flat = np.asarray(values, np.float64).reshape(-1)
    return {
        "mean": float(flat.mean()),
        "std": float(flat.std()),
        "head": [float(v) for v in flat[:8]],
    }


def _inception_signature(variables: Dict) -> Dict:
    from playableenvironments_tpu.eval.inception_v3 import (
        inception_image_embedder,
    )

    rng = np.random.default_rng(_INPUT_SEED)
    images = rng.random((2, 299, 299, 3)).astype(np.float32)
    with _on_cpu():
        return _signature(inception_image_embedder(variables)(images))


def _i3d_signature(variables: Dict) -> Dict:
    from playableenvironments_tpu.eval.i3d import i3d_video_embedder

    rng = np.random.default_rng(_INPUT_SEED + 1)
    videos = rng.random((1, 16, 224, 224, 3)).astype(np.float32)
    with _on_cpu():
        return _signature(i3d_video_embedder(variables)(videos))


def _lpips_signature(variables: Dict) -> Dict:
    import jax
    import jax.numpy as jnp

    from playableenvironments_tpu.eval.perceptual import LPIPS

    rng = np.random.default_rng(_INPUT_SEED + 2)
    with _on_cpu():
        a = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
        b = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
        distances = jax.jit(LPIPS().apply)(variables, a, b)
        return _signature(np.asarray(distances))


def _vgg19_signature(variables: Dict) -> Dict:
    import jax
    import jax.numpy as jnp

    from playableenvironments_tpu.eval.perceptual import (
        VGG19_CUTS,
        VGG19_PLAN,
        VGGFeatures,
    )

    rng = np.random.default_rng(_INPUT_SEED + 3)
    with _on_cpu():
        images = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
        net = VGGFeatures(VGG19_PLAN, VGG19_CUTS)
        features = jax.jit(net.apply)(variables, images)
    flat = np.concatenate(
        [np.asarray(f, np.float64).mean(axis=(1, 2)).reshape(-1) for f in features]
    )
    return _signature(flat)


SIGNATURE_FNS: Dict[str, Callable[[Dict], Dict]] = {
    "inception_v3": _inception_signature,
    "i3d": _i3d_signature,
    "lpips": _lpips_signature,
    "vgg19": _vgg19_signature,
}


def synthetic_variables() -> Dict[str, Dict]:
    """Convert deterministically-synthesized published-layout state dicts
    through the real converters (the exact code path real weights take)."""
    from playableenvironments_tpu.compat import metric_weights as mw
    from playableenvironments_tpu.eval.perceptual import (
        VGG19_PLAN,
        convert_torch_vgg_state_dict,
    )

    return {
        "inception_v3": mw.convert_torch_inception_state_dict(
            synthesize_state("inception_v3_torch_keys.json")
        ),
        "i3d": mw.convert_tfhub_i3d_variables(
            synthesize_state("i3d_tfhub_keys.json", seed=1)
        ),
        "lpips": mw.convert_lpips_state_dict(
            synthesize_state("lpips_vgg_keys.json", seed=2),
            synthesize_state("vgg16_torch_keys.json", seed=3),
        ),
        "vgg19": convert_torch_vgg_state_dict(
            synthesize_state("vgg19_torch_keys.json", seed=4), VGG19_PLAN
        ),
    }


def compute_signatures(variables_by_name: Mapping[str, Dict]) -> Dict[str, Dict]:
    return {
        name: SIGNATURE_FNS[name](variables)
        for name, variables in variables_by_name.items()
    }


def compare_signatures(
    computed: Mapping[str, Dict],
    golden: Mapping[str, Dict],
    rtol: float = 2e-3,
    atol: float = 1e-4,
) -> Dict[str, Dict]:
    """Per-embedder verdicts. Tolerances cover CPU-vs-TPU float drift
    (bf16 matmul accumulation stays f32; residual ~1e-3 relative).

    Golden entries with no computed counterpart report as MISSING (non-fatal)
    so a subset run can't read as full coverage: without it, a CLI invocation
    passing only some weight files against a goldens file recording more
    embedders would print 'all checks passed' while silently skipping the
    rest."""
    report = {}
    for name in golden:
        if name not in computed:
            report[name] = {"status": "MISSING"}
    for name, signature in computed.items():
        if name not in golden:
            report[name] = {"status": "NO_GOLDEN"}
            continue
        reference = golden[name]
        fields = {}
        ok = True
        for field in ("mean", "std", "head"):
            got = np.asarray(signature[field], np.float64)
            want = np.asarray(reference[field], np.float64)
            close = bool(
                np.allclose(got, want, rtol=rtol, atol=atol)
            )
            ok = ok and close
            fields[field] = close
        report[name] = {
            "status": "PASS" if ok else "FAIL",
            "fields": fields,
            "computed": signature,
            "golden": reference,
        }
    return report


def load_goldens(path: Optional[str] = None) -> Dict[str, Dict]:
    with open(path or GOLDEN_PATH) as f:
        return json.load(f)


def write_goldens(signatures: Mapping[str, Dict], path: Optional[str] = None):
    target = path or GOLDEN_PATH
    existing: Dict[str, Dict] = {}
    if os.path.isfile(target):
        with open(target) as f:
            existing = json.load(f)
    existing.update(signatures)
    with open(target, "w") as f:
        json.dump(existing, f, indent=1, sort_keys=True)
    return target
