"""Converters from the PUBLISHED metric-network weight layouts.

The metric stack (FID/FVD/LPIPS/VGG-sim) runs entirely in JAX; published
parity needs the published weights, which cannot be downloaded here (zero
egress). These converters accept the EXACT on-disk layouts a user would drop
in:

- InceptionV3: torchvision / pytorch_fid state_dict (`Conv2d_1a_3x3.conv.
  weight`, `Mixed_5b.branch5x5_1.bn.running_var`, ... —
  /root/reference/pytorch_fid/inception.py:322's `pt_inception-2015-12-05`
  file uses torchvision key names).
- I3D: the tfhub Kinetics-400 RGB checkpoint variable names
  (`RGB/inception_i3d/Mixed_3b/Branch_1/Conv3d_0b_3x3/conv_3d/w`, ... —
  /root/reference/evaluation/metrics/fvd.py:32-34's module).
- LPIPS: the `lpips` package's VGG16 linear-head checkpoint
  (`lin0.model.1.weight`, ...) plus a torchvision VGG16 backbone.

Every converter is STRICT: it raises with the offending key on anything
missing, so a wrong file fails loudly instead of producing silently-random
metrics. Key-layout fixtures in tests/fixtures/ pin the expected layouts.
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Tuple

import numpy as np


def _np(value) -> np.ndarray:
    if hasattr(value, "numpy"):
        value = value.detach().numpy() if hasattr(value, "detach") else value.numpy()
    return np.asarray(value)


# ---------------------------------------------------------------------------
# InceptionV3 (torchvision / pytorch_fid layout)
# ---------------------------------------------------------------------------

# torch branch name -> our module name, per inception block type
# (eval/inception_v3.py InceptionA..E).
_INCEPTION_BRANCHES = {
    "A": {
        "branch1x1": "b0", "branch5x5_1": "b1a", "branch5x5_2": "b1b",
        "branch3x3dbl_1": "b2a", "branch3x3dbl_2": "b2b",
        "branch3x3dbl_3": "b2c", "branch_pool": "b3",
    },
    "B": {
        "branch3x3": "b0", "branch3x3dbl_1": "b1a", "branch3x3dbl_2": "b1b",
        "branch3x3dbl_3": "b1c",
    },
    "C": {
        "branch1x1": "b0", "branch7x7_1": "b1a", "branch7x7_2": "b1b",
        "branch7x7_3": "b1c", "branch7x7dbl_1": "b2a", "branch7x7dbl_2": "b2b",
        "branch7x7dbl_3": "b2c", "branch7x7dbl_4": "b2d",
        "branch7x7dbl_5": "b2e", "branch_pool": "b3",
    },
    "D": {
        "branch3x3_1": "b0a", "branch3x3_2": "b0b", "branch7x7x3_1": "b1a",
        "branch7x7x3_2": "b1b", "branch7x7x3_3": "b1c", "branch7x7x3_4": "b1d",
    },
    "E": {
        "branch1x1": "b0", "branch3x3_1": "b1a", "branch3x3_2a": "b1b",
        "branch3x3_2b": "b1c", "branch3x3dbl_1": "b2a", "branch3x3dbl_2": "b2b",
        "branch3x3dbl_3a": "b2c", "branch3x3dbl_3b": "b2d", "branch_pool": "b3",
    },
}

_INCEPTION_BLOCKS = {
    "Mixed_5b": "A", "Mixed_5c": "A", "Mixed_5d": "A",
    "Mixed_6a": "B",
    "Mixed_6b": "C", "Mixed_6c": "C", "Mixed_6d": "C", "Mixed_6e": "C",
    "Mixed_7a": "D",
    "Mixed_7b": "E", "Mixed_7c": "E",
}

_INCEPTION_STEM = (
    "Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
    "Conv2d_3b_1x1", "Conv2d_4a_3x3",
)


def _basic_conv(state: Mapping, torch_prefix: str) -> Tuple[Dict, Dict]:
    """One torchvision BasicConv2d (conv + bn) -> our BasicConv tree."""
    try:
        weight = _np(state[f"{torch_prefix}.conv.weight"])
        params = {
            "conv": {"kernel": np.transpose(weight, (2, 3, 1, 0))},
            "bn": {
                "scale": _np(state[f"{torch_prefix}.bn.weight"]),
                "bias": _np(state[f"{torch_prefix}.bn.bias"]),
            },
        }
        stats = {
            "bn": {
                "mean": _np(state[f"{torch_prefix}.bn.running_mean"]),
                "var": _np(state[f"{torch_prefix}.bn.running_var"]),
            }
        }
    except KeyError as missing:
        raise KeyError(
            f"InceptionV3 state_dict is missing {missing} — expected the "
            "torchvision/pytorch_fid layout (Conv2d_1a_3x3.conv.weight, ...)"
        ) from None
    return params, stats


def convert_torch_inception_state_dict(
    state: Mapping[str, np.ndarray],
) -> Dict:
    """torchvision/pytorch_fid InceptionV3 state_dict -> InceptionV3Features
    variables ({"params": ..., "batch_stats": ...}). The classifier (`fc.*`)
    and training-only AuxLogits are dropped (FID reads the final pool)."""
    params: Dict = {}
    stats: Dict = {}
    for name in _INCEPTION_STEM:
        params[name], stats[name] = _basic_conv(state, name)
    for block, kind in _INCEPTION_BLOCKS.items():
        block_params: Dict = {}
        block_stats: Dict = {}
        for torch_branch, ours in _INCEPTION_BRANCHES[kind].items():
            block_params[ours], block_stats[ours] = _basic_conv(
                state, f"{block}.{torch_branch}"
            )
        params[block] = block_params
        stats[block] = block_stats

    # Fail-loud contract: compare against the EXACT set of consumed key
    # names, not block-name prefixes — a variant with extra branches nested
    # under a recognized block (Mixed_5b.branch_extra...) must be rejected,
    # not silently ignored (FID from a different network than supplied).
    conv_prefixes = list(_INCEPTION_STEM) + [
        f"{block}.{branch}"
        for block, kind in _INCEPTION_BLOCKS.items()
        for branch in _INCEPTION_BRANCHES[kind]
    ]
    consumed = {
        f"{p}.{suffix}"
        for p in conv_prefixes
        for suffix in (
            "conv.weight", "bn.weight", "bn.bias",
            "bn.running_mean", "bn.running_var", "bn.num_batches_tracked",
        )
    }
    leftovers = [
        k for k in state
        if k not in consumed and not k.startswith(("fc.", "AuxLogits."))
    ]
    if leftovers:
        raise KeyError(
            f"unrecognized InceptionV3 keys (first 5): {sorted(leftovers)[:5]}"
        )
    return {"params": params, "batch_stats": stats}


def load_torch_inception_weights(path: str) -> Dict:
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    return convert_torch_inception_state_dict(state)


# ---------------------------------------------------------------------------
# I3D (tfhub Kinetics-400 RGB layout)
# ---------------------------------------------------------------------------

_I3D_STEM = ("Conv3d_1a_7x7", "Conv3d_2b_1x1", "Conv3d_2c_3x3")
_I3D_BLOCKS = (
    "Mixed_3b", "Mixed_3c", "Mixed_4b", "Mixed_4c", "Mixed_4d",
    "Mixed_4e", "Mixed_4f", "Mixed_5b", "Mixed_5c",
)
# tfhub branch unit -> our module name (eval/i3d.py InceptionBlock3D).
_I3D_BRANCHES = {
    "Branch_0/Conv3d_0a_1x1": "b0",
    "Branch_1/Conv3d_0a_1x1": "b1a",
    "Branch_1/Conv3d_0b_3x3": "b1b",
    "Branch_2/Conv3d_0a_1x1": "b2a",
    "Branch_2/Conv3d_0b_3x3": "b2b",
    "Branch_3/Conv3d_0b_1x1": "b3",
}
_I3D_PREFIX = "RGB/inception_i3d/"


def _i3d_unit(variables: Mapping, tf_prefix: str) -> Tuple[Dict, Dict]:
    """One tfhub Unit3D (conv_3d + batch_norm, no gamma) -> our Unit3D."""
    try:
        params = {
            "conv": {"kernel": _np(variables[f"{tf_prefix}/conv_3d/w"])},
            "bn": {"bias": _np(variables[f"{tf_prefix}/batch_norm/beta"]).reshape(-1)},
        }
        stats = {
            "bn": {
                "mean": _np(
                    variables[f"{tf_prefix}/batch_norm/moving_mean"]
                ).reshape(-1),
                "var": _np(
                    variables[f"{tf_prefix}/batch_norm/moving_variance"]
                ).reshape(-1),
            }
        }
    except KeyError as missing:
        raise KeyError(
            f"I3D variables are missing {missing} — expected the tfhub "
            "Kinetics-400 RGB layout (RGB/inception_i3d/.../conv_3d/w, ...)"
        ) from None
    return params, stats


def convert_tfhub_i3d_variables(variables: Mapping[str, np.ndarray]) -> Dict:
    """tfhub I3D variable map -> I3D module variables. TF kernels are already
    (t, h, w, in, out); the 1x1x1 Logits conv becomes our Dense head."""
    params: Dict = {}
    stats: Dict = {}
    for name in _I3D_STEM:
        params[name], stats[name] = _i3d_unit(variables, _I3D_PREFIX + name)
    for block in _I3D_BLOCKS:
        block_params: Dict = {}
        block_stats: Dict = {}
        for tf_branch, ours in _I3D_BRANCHES.items():
            block_params[ours], block_stats[ours] = _i3d_unit(
                variables, f"{_I3D_PREFIX}{block}/{tf_branch}"
            )
        params[block] = block_params
        stats[block] = block_stats
    logits_w = _np(variables[f"{_I3D_PREFIX}Logits/Conv3d_0c_1x1/conv_3d/w"])
    logits_b = _np(variables[f"{_I3D_PREFIX}Logits/Conv3d_0c_1x1/conv_3d/b"])
    params["logits"] = {
        "kernel": logits_w.reshape(logits_w.shape[-2], logits_w.shape[-1]),
        "bias": logits_b.reshape(-1),
    }
    return {"params": params, "batch_stats": stats}


def load_tfhub_i3d_weights(path: str) -> Dict:
    """npz archive of the tfhub variable map (export the hub module's
    variables with their original names) -> I3D variables."""
    archive = np.load(path)
    return convert_tfhub_i3d_variables({k: archive[k] for k in archive.files})


# ---------------------------------------------------------------------------
# LPIPS (lpips package layout)
# ---------------------------------------------------------------------------

def convert_lpips_state_dict(
    lins_state: Mapping[str, np.ndarray],
    vgg16_state: Mapping[str, np.ndarray],
) -> Dict:
    """lpips `vgg.pth` linear heads (lin{i}.model.1.weight, (1, C, 1, 1))
    plus a torchvision VGG16 features state_dict -> LPIPS module params."""
    from playableenvironments_tpu.eval.perceptual import VGG16_PLAN

    params: Dict = {"backbone": {}}
    torch_idx = 0
    for block_idx, widths in enumerate(VGG16_PLAN):
        for conv_idx, _ in enumerate(widths):
            try:
                weight = _np(vgg16_state[f"features.{torch_idx}.weight"])
                bias = _np(vgg16_state[f"features.{torch_idx}.bias"])
            except KeyError as missing:
                raise KeyError(
                    f"VGG16 state_dict is missing {missing} — expected the "
                    "torchvision layout (features.0.weight, ...)"
                ) from None
            params["backbone"][f"conv{block_idx}_{conv_idx}"] = {
                "kernel": np.transpose(weight, (2, 3, 1, 0)),
                "bias": bias,
            }
            torch_idx += 2
        torch_idx += 1
    for idx in range(5):
        key = f"lin{idx}.model.1.weight"
        if key not in lins_state:
            raise KeyError(
                f"LPIPS state_dict is missing {key} — expected the lpips "
                "package layout (lin0.model.1.weight, ...)"
            )
        params[f"lin_{idx}"] = _np(lins_state[key]).reshape(-1)
    return {"params": params}


def load_torch_lpips_weights(lins_path: str, vgg16_path: str) -> Dict:
    import torch

    lins = torch.load(lins_path, map_location="cpu", weights_only=False)
    vgg = torch.load(vgg16_path, map_location="cpu", weights_only=False)
    if hasattr(vgg, "state_dict"):
        vgg = vgg.state_dict()
    return convert_lpips_state_dict(lins, vgg)
