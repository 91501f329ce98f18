"""Import reference (PyTorch) checkpoints into the flax modules.

The reference trains AdaInStyleNerfModel / PositionalRayBender / skybox
models (model/nerf_models/*) whose parameter layouts map 1:1 onto our flax
modules — the positional-encoding feature order, skip placement, and
AdaIN (Linear style affine + BatchNorm1d(affine=False)) structure are
identical by construction, so converted weights reproduce reference outputs
bit-for-bit up to float summation order (parity-tested against the reference
code run as an oracle, tests/test_torch_import.py).

Input is a plain {name: numpy array} mapping (e.g.
`{k: v.numpy() for k, v in torch.load(p)["model"].items()}`) — torch itself
is only needed to produce it, not here.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np


def _linear(state: Mapping[str, np.ndarray], prefix: str, bias: bool = True):
    out = {"kernel": np.ascontiguousarray(np.asarray(state[f"{prefix}.weight"]).T)}
    if bias:
        out["bias"] = np.asarray(state[f"{prefix}.bias"])
    return out


def convert_adain_nerf(
    state: Mapping[str, np.ndarray],
    prefix: str = "",
    backbone_layers_count: int = 8,
) -> Tuple[Dict, Dict]:
    """AdaInStyleNerfModel state_dict -> (params, batch_stats) for
    models.nerf.AdaInNerfMLP.

    Reference layout (adain_style_nerf_model.py:42-71):
      backbone_layers.{i}.{weight,bias}
      alpha_head.{weight,bias}
      features_head.0               Linear (no bias)        -> feat_0
      features_head.1               AffineTransformAdaIn    -> adain_0
      features_head.3               Linear (no bias)        -> feat_1
      features_head.4               AffineTransformAdaIn    -> adain_1
      features_head.6               Linear                  -> feat_out
    """
    p = prefix
    params: Dict = {}
    batch_stats: Dict = {}
    for i in range(backbone_layers_count):
        params[f"backbone_{i}"] = _linear(state, f"{p}backbone_layers.{i}")
    params["alpha_head"] = _linear(state, f"{p}alpha_head")

    head = f"{p}features_head"
    params["feat_0"] = _linear(state, f"{head}.0", bias=False)
    params["feat_1"] = _linear(state, f"{head}.3", bias=False)
    params["feat_out"] = _linear(state, f"{head}.6")
    for flax_name, torch_idx in (("adain_0", 1), ("adain_1", 4)):
        params[flax_name] = {
            "affine": _linear(state, f"{head}.{torch_idx}.affine_transform")
        }
        batch_stats[flax_name] = {
            "norm": {
                "mean": np.asarray(
                    state[f"{head}.{torch_idx}.ada_in.normalization.running_mean"]
                ),
                "var": np.asarray(
                    state[f"{head}.{torch_idx}.ada_in.normalization.running_var"]
                ),
            }
        }
    return params, batch_stats


def convert_positional_ray_bender(
    state: Mapping[str, np.ndarray],
    prefix: str = "",
    layers_count: int = 6,
) -> Dict:
    """PositionalRayBender state_dict -> params for models.nerf's bender.

    Reference layout (positional_ray_bender_model.py:40-79):
      backbone_layers.{i}.{weight,bias} -> backbone_{i}
      output_head.weight (no bias)      -> output_head (kernel only)
    """
    p = prefix
    params: Dict = {}
    for i in range(layers_count):
        params[f"backbone_{i}"] = _linear(state, f"{p}backbone_layers.{i}")
    params["output_head"] = _linear(state, f"{p}output_head", bias=False)
    return params


def split_state_dict(
    state: Mapping[str, np.ndarray], prefix: str
) -> Dict[str, np.ndarray]:
    """Sub-dict of keys under `prefix.` with the prefix stripped."""
    out = {}
    for key, value in state.items():
        if key.startswith(prefix + "."):
            out[key[len(prefix) + 1 :]] = value
    return out
