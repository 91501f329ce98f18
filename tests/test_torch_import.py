"""Reference-checkpoint import parity: run the PyTorch reference modules as
oracles, convert their state_dicts, and require matching flax outputs.

This is the BASELINE.md bit-compatibility north star: a user's reference
checkpoints load into this framework and reproduce the reference's numbers.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from playableenvironments_tpu.compat.torch_import import (
    convert_adain_nerf,
    convert_positional_ray_bender,
    split_state_dict,
)

REFERENCE = "/root/reference"


def _reference_importable():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    try:
        import torch  # noqa: F401
        from model.nerf_models.adain_style_nerf_model import (  # noqa: F401
            AdaInStyleNerfModel,
        )
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _reference_importable(),
    reason="reference code / torch not importable in this environment",
)

BOX = ((-0.75, 0.75), (-0.5, 0.5), (0.0, 2.15))


def _torch_state(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def test_adain_nerf_checkpoint_parity(rng):
    import torch
    from model.nerf_models.adain_style_nerf_model import AdaInStyleNerfModel

    from playableenvironments_tpu.config import (
        NerfMLPConfig,
        PositionalEncoderConfig,
    )
    from playableenvironments_tpu.models.nerf import AdaInNerfMLP

    model_config = {
        "layers_width": 64,
        "backbone_layers_count": 4,
        "output_features": 24,
        "skip_layer_idx": 2,
        "style_features": 16,
        "empty_space_alpha": -3.5,
        "position_encoder": {"octaves": 6, "append_original": True},
        "bounding_box": BOX,
    }
    torch_model = AdaInStyleNerfModel({}, model_config).eval()
    # Non-trivial BN running stats: one training-mode pass.
    torch_model.train()
    with torch.no_grad():
        torch_model.compute_network_pass(
            torch.rand(128, 3), torch.zeros(128, 3), torch.zeros(128, 3),
            torch.rand(128, 16),
        )
    torch_model.eval()

    # Points INSIDE the box (the torch forward boolean-filters outside ones).
    lo = np.asarray([b[0] for b in BOX])
    hi = np.asarray([b[1] for b in BOX])
    points = (rng.uniform(0.05, 0.95, (64, 3)) * (hi - lo) + lo).astype(
        np.float32
    )
    style = rng.normal(size=(64, 16)).astype(np.float32)

    with torch.no_grad():
        t_feats, t_alpha, _ = torch_model(
            torch.from_numpy(points), torch.zeros(64, 3), torch.zeros(64, 3),
            torch.from_numpy(style),
        )

    params, batch_stats = convert_adain_nerf(
        _torch_state(torch_model), backbone_layers_count=4
    )
    cfg = NerfMLPConfig(
        layers_width=64, backbone_layers_count=4, output_features=24,
        skip_layer_idx=2,
        position_encoder=PositionalEncoderConfig(octaves=6),
    )
    flax_model = AdaInNerfMLP(cfg, style_features=16, bounding_box=BOX)
    j_feats, j_alpha = flax_model.apply(
        {"params": jax.tree.map(jnp.asarray, params),
         "batch_stats": jax.tree.map(jnp.asarray, batch_stats)},
        jnp.asarray(points), jnp.asarray(style), None, True,
    )
    np.testing.assert_allclose(
        np.asarray(j_feats), t_feats.numpy(), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(j_alpha), t_alpha.numpy(), atol=2e-5, rtol=1e-4
    )


def test_ray_bender_checkpoint_parity(rng):
    import torch
    from model.nerf_models.positional_ray_bender_model import (
        PositionalRayBender,
    )

    from playableenvironments_tpu.compat import torch_import  # noqa: F401

    model_config = {
        "layers_width": 32,
        "layers_count": 4,
        "skip_layer_idx": 2,
        "deformation_features": 8,
        "position_encoder": {
            "octaves": 4, "append_original": True, "num_steps": 100,
        },
        "bounding_box": BOX,
    }
    torch_model = PositionalRayBender({}, model_config).eval()
    torch_model.set_step(60)  # mid-annealing: octave weights non-trivial
    with torch.no_grad():
        # The near-zero output init (positional_ray_bender_model.py:66-79)
        # makes relative comparison meaningless; scale to O(0.1).
        torch_model.output_head.weight *= 1.0e4

    lo = np.asarray([b[0] for b in BOX])
    hi = np.asarray([b[1] for b in BOX])
    points = (rng.uniform(0.05, 0.95, (32, 3)) * (hi - lo) + lo).astype(
        np.float32
    )
    deformation = rng.normal(size=(32, 8)).astype(np.float32)
    with torch.no_grad():
        t_disp = torch_model.compute_network_pass(
            torch.from_numpy(points), torch.from_numpy(deformation)
        ).numpy()

    params = convert_positional_ray_bender(
        _torch_state(torch_model), layers_count=4
    )

    # Drive our pure-function bender (render.fast) with the converted params.
    import dataclasses

    from playableenvironments_tpu.config import (
        ObjectModelConfig,
        NerfMLPConfig,
        PositionalEncoderConfig,
        RayBenderConfig,
    )
    from playableenvironments_tpu.render.fast import _bender_displacements

    cfg = ObjectModelConfig(
        name="player", bounding_box=BOX, positions_count_coarse=4,
        nerf=NerfMLPConfig(position_encoder=PositionalEncoderConfig(octaves=4)),
        bender=RayBenderConfig(
            kind="positional", layers_width=32, layers_count=4,
            skip_layer_idx=2,
            position_encoder=PositionalEncoderConfig(octaves=4, num_steps=100),
        ),
    )
    j_disp = _bender_displacements(
        cfg,
        jax.tree.map(jnp.asarray, params),
        jnp.asarray(points),
        jnp.asarray(deformation),
        step=60,
    )
    # The torch compute_network_pass is pre-clamp; ours clamps into the box —
    # compare on the clamped versions of both.
    t_clamped = np.clip(t_disp, lo - points, hi - points)
    np.testing.assert_allclose(
        np.asarray(j_disp), t_clamped, atol=2e-5, rtol=1e-4
    )
