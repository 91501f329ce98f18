"""Reference-checkpoint import parity: run the PyTorch reference modules as
oracles, convert their state_dicts, and require matching flax outputs.

This is the BASELINE.md bit-compatibility north star: a user's reference
checkpoints load into this framework and reproduce the reference's numbers.
"""

import os
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
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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


def test_object_encoder_v4_checkpoint_parity(rng):
    """Convert a reference ObjectEncoderV4 and require matching style/
    deformation/attention on identical crops (full-image box -> our bilinear
    crop is exactly identity; the reference conv stack is driven submodule-
    by-submodule to bypass roi_pool's max-pool crop semantics, a documented
    divergence)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F
    from model.layers.residual_block import ResidualBlock as TorchResidualBlock

    from playableenvironments_tpu.compat.torch_import import (
        convert_object_encoder_v4,
    )
    from playableenvironments_tpu.config import ObjectEncoderConfig
    from playableenvironments_tpu.models.object_encoders import ObjectEncoderV4

    h, w = 16, 24

    class TorchEncoder(nn.Module):
        """Reference ObjectEncoderV4's exact module layout
        (object_encoder_v4.py:41-60) built on the reference ResidualBlock;
        the real class only adds torchvision.ops.roi_pool (absent here, and
        a crop op this framework deliberately replaces)."""

        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3 + 6, 16, 3, stride=1, padding=1, bias=False)
            self.bn1 = nn.BatchNorm2d(16)
            self.initial_backbone = nn.Sequential(
                TorchResidualBlock(16, 16 + 1, downsample_factor=1,
                                   drop_final_activation=True))
            self.final_backbone = nn.Sequential(
                TorchResidualBlock(16, 32, downsample_factor=2),
                TorchResidualBlock(32, 32, downsample_factor=1),
                TorchResidualBlock(32, 64, downsample_factor=2),
                TorchResidualBlock(64, 64, downsample_factor=1))
            self.style_head = nn.Linear(64, 12)
            self.deformation_head = nn.Linear(64, 6)

    torch_model = TorchEncoder()
    torch_model.train()
    obs = torch.rand(3, 3, h, w)
    rot = torch.rand(3, 3) * 0.2
    trans = torch.rand(3, 3)
    with torch.no_grad():
        # Warm the BN running stats through the same manual pipeline.
        for _ in range(2):
            pose = torch.cat([rot, trans], dim=-1)[:, :, None, None]
            x = torch.cat([obs, pose.expand(-1, -1, h, w)], dim=1)
            x = torch_model.conv1(x)
            x = F.avg_pool2d(x, 2)
            x = torch_model.bn1(x)
            x = F.leaky_relu(x, 0.2)
            init = torch_model.initial_backbone(x)
            att = torch.sigmoid(init[:, -1:])
            feats = F.leaky_relu(init[:, :-1], 0.2) * att
            y = torch_model.final_backbone(feats)
            pooled = F.adaptive_avg_pool2d(y, (1, 1)).squeeze(-1).squeeze(-1)
    torch_model.eval()
    with torch.no_grad():
        pose = torch.cat([rot, trans], dim=-1)[:, :, None, None]
        x = torch.cat([obs, pose.expand(-1, -1, h, w)], dim=1)
        x = torch_model.conv1(x)
        x = F.avg_pool2d(x, 2)
        x = torch_model.bn1(x)
        x = F.leaky_relu(x, 0.2)
        init = torch_model.initial_backbone(x)
        att = torch.sigmoid(init[:, -1:])
        feats = F.leaky_relu(init[:, :-1], 0.2) * att
        y = torch_model.final_backbone(feats)
        pooled = F.adaptive_avg_pool2d(y, (1, 1)).squeeze(-1).squeeze(-1)
        style_t = torch_model.style_head(pooled).numpy()
        deform_t = torch_model.deformation_head(pooled).numpy()
        att_t = att.numpy()

    params, stats = convert_object_encoder_v4(_torch_state(torch_model))
    enc = ObjectEncoderV4(
        ObjectEncoderConfig(kind="v4", input_size=(h, w), style_features=12,
                            deformation_features=6)
    )
    obs_j = jnp.asarray(obs.numpy().transpose(0, 2, 3, 1))
    boxes_j = jnp.asarray(np.tile([0.0, 0.0, 1.0, 1.0], (3, 1)), jnp.float32)
    style_j, deform_j, att_j, _ = enc.apply(
        {"params": params, "batch_stats": stats},
        obs_j, boxes_j, jnp.asarray(rot.numpy()), jnp.asarray(trans.numpy()),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(style_j), style_t, atol=2e-4)
    np.testing.assert_allclose(np.asarray(deform_j), deform_t, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(att_j).transpose(0, 3, 1, 2), att_t, atol=2e-4
    )


def test_object_encoder_v5_checkpoint_parity(rng):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F
    from model.layers.residual_block import ResidualBlock as TorchResidualBlock

    from playableenvironments_tpu.compat.torch_import import (
        convert_object_encoder_v5,
    )
    from playableenvironments_tpu.config import ObjectEncoderConfig
    from playableenvironments_tpu.models.object_encoders import ObjectEncoderV5

    h, w = 32, 32

    class TorchEncoder(nn.Module):
        """Reference ObjectEncoderV5's exact module layout
        (object_encoder_v5.py:41-62)."""

        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.initial_backbone = nn.Sequential(
                TorchResidualBlock(64, 64, downsample_factor=2),
                TorchResidualBlock(64, 64, downsample_factor=1))
            self.final_backbone = nn.Sequential(
                TorchResidualBlock(64, 128, downsample_factor=2),
                TorchResidualBlock(128, 128, downsample_factor=1),
                TorchResidualBlock(128, 256, downsample_factor=2),
                TorchResidualBlock(256, 256, downsample_factor=1),
                TorchResidualBlock(256, 512, downsample_factor=2),
                TorchResidualBlock(512, 512, downsample_factor=1))
            self.style_head = nn.Linear(512, 10)
            self.deformation_head = nn.Linear(512, 4)

    torch_model = TorchEncoder()

    def torch_pipeline(o):
        x = torch_model.conv1(o)
        x = torch_model.bn1(x)
        x = F.leaky_relu(x, 0.2)
        x = torch_model.initial_backbone(x)
        x = torch_model.final_backbone(x)
        pooled = F.adaptive_avg_pool2d(x, (1, 1)).squeeze(-1).squeeze(-1)
        return (torch_model.style_head(pooled),
                torch_model.deformation_head(pooled))

    obs = torch.rand(2, 3, h, w)
    torch_model.train()
    with torch.no_grad():
        torch_pipeline(obs)
    torch_model.eval()
    with torch.no_grad():
        style_t, deform_t = (t.numpy() for t in torch_pipeline(obs))

    params, stats = convert_object_encoder_v5(_torch_state(torch_model))
    enc = ObjectEncoderV5(
        ObjectEncoderConfig(kind="v5", input_size=(h, w), style_features=10,
                            deformation_features=4)
    )
    obs_j = jnp.asarray(obs.numpy().transpose(0, 2, 3, 1))
    boxes_j = jnp.asarray(np.tile([0.0, 0.0, 1.0, 1.0], (2, 1)), jnp.float32)
    style_j, deform_j, _, _ = enc.apply(
        {"params": params, "batch_stats": stats}, obs_j, boxes_j, train=False
    )
    np.testing.assert_allclose(np.asarray(style_j), style_t, atol=2e-4)
    np.testing.assert_allclose(np.asarray(deform_j), deform_t, atol=2e-4)


def test_autoencoder_v8_checkpoint_parity(rng):
    """EncoderV4 + DecoderV6 (the published v8 feature renderer) convert and
    reproduce the reference encode -> decode outputs."""
    import torch
    from model.autoencoder_models.encoder_v4 import EncoderV4
    from model.autoencoder_models.decoder_v6 import DecoderV6

    from playableenvironments_tpu.compat.torch_import import (
        convert_multires_decoder,
        convert_multires_encoder,
    )
    from playableenvironments_tpu.config import AutoencoderConfig
    from playableenvironments_tpu.models.autoencoder import (
        MultiresDecoder,
        MultiresEncoder,
    )

    model_config = {
        "input_features": 3,
        "bottleneck_features": 32,
        "bottleneck_blocks": 2,
        "downsampling_layers_count": [2, 1],
        "variational": True,
    }
    torch_enc = EncoderV4(model_config)
    torch_dec = DecoderV6(model_config)
    obs = torch.rand(2, 3, 32, 32)
    torch_enc.train(); torch_dec.train()
    with torch.no_grad():
        levels = torch_enc(obs)
        means = [l[:, : l.shape[1] // 2] for l in levels]
        torch_dec(means)
    torch_enc.eval(); torch_dec.eval()
    with torch.no_grad():
        levels_t = torch_enc(obs)
        means_t = [l[:, : l.shape[1] // 2] for l in levels_t]
        decoded_t = torch_dec(means_t).numpy()

    cfg = AutoencoderConfig(
        variant="v8", input_features=3, bottleneck_features=32,
        bottleneck_blocks=2, downsampling_layers_count=(2, 1),
    )
    enc_params, enc_stats = convert_multires_encoder(
        _torch_state(torch_enc), (2, 1), 2
    )
    dec_params, dec_stats = convert_multires_decoder(
        _torch_state(torch_dec), (2, 1), 2
    )
    obs_j = jnp.asarray(obs.numpy().transpose(0, 2, 3, 1))
    levels_j = MultiresEncoder(cfg).apply(
        {"params": enc_params, "batch_stats": enc_stats}, obs_j, train=False
    )
    for lt, lj in zip(levels_t, levels_j):
        np.testing.assert_allclose(
            np.asarray(lj).transpose(0, 3, 1, 2), lt.numpy(), atol=3e-4
        )
    means_j = [l[..., : l.shape[-1] // 2] for l in levels_j]
    decoded_j = MultiresDecoder(cfg).apply(
        {"params": dec_params, "batch_stats": dec_stats}, means_j, train=False
    )
    np.testing.assert_allclose(
        np.asarray(decoded_j).transpose(0, 3, 1, 2), decoded_t, atol=3e-4
    )


def test_convert_environment_model_end_to_end(rng):
    """Compose a reference-layout phase-2 state_dict (submodules individually
    parity-tested above), convert it with convert_environment_model, and
    require (a) the tree matches EnvironmentModel.init's structure and shapes
    exactly and (b) the model runs with the converted weights."""
    import torch
    import torch.nn as nn
    from model.layers.residual_block import ResidualBlock as TorchResidualBlock
    from model.nerf_models.adain_style_nerf_model import AdaInStyleNerfModel
    from model.nerf_models.positional_ray_bender_model import (
        PositionalRayBender as PositionalRayBenderModel,
    )

    from playableenvironments_tpu.compat.torch_import import (
        convert_environment_model,
    )
    from playableenvironments_tpu.config import (
        NerfMLPConfig,
        ObjectEncoderConfig,
        ObjectModelConfig,
        ParameterEncoderConfig,
        PositionalEncoderConfig,
        RayBenderConfig,
        SceneConfig,
    )
    from playableenvironments_tpu.render.environment_model import EnvironmentModel

    style_features, deformation_features = 16, 8
    nerf_cfg = dict(
        layers_width=64, backbone_layers_count=4, output_features=3,
        skip_layer_idx=2,
        position_encoder=PositionalEncoderConfig(octaves=4),
    )

    def object_model(name, bender_kind):
        return ObjectModelConfig(
            name=name, bounding_box=BOX, positions_count_coarse=4,
            z_near_min=0.1, z_far_max=50.0,
            nerf=NerfMLPConfig(**nerf_cfg),
            bender=(
                RayBenderConfig(kind="positional", layers_width=32,
                                layers_count=3, skip_layer_idx=1,
                                position_encoder=PositionalEncoderConfig(octaves=4))
                if bender_kind == "positional" else RayBenderConfig(kind="zeroed")
            ),
            style_features=style_features,
            deformation_features=deformation_features,
        )

    scene = SceneConfig(
        object_models=(object_model("bg", "zeroed"), object_model("pl", "positional")),
        parameter_encoders=(
            ParameterEncoderConfig(kind="static", objects_count=1),
            ParameterEncoderConfig(
                kind="classic", objects_count=1,
                translation_range=(((-5.0, 5.0), (-5.0, 5.0), (0.01, 0.01)),),
                rotation_range=(((0.0, 0.0),) * 3,),
            ),
        ),
        object_encoders=(
            ObjectEncoderConfig(kind="v5", input_size=(32, 32),
                                style_features=style_features,
                                deformation_features=deformation_features),
            ObjectEncoderConfig(kind="v4", input_size=(16, 16),
                                style_features=style_features,
                                deformation_features=deformation_features),
        ),
        static_object_models=1,
        apply_activation=True,
        sampling_weights=(0.5, 0.5),
    )

    # --- assemble a reference-layout state dict --------------------------
    torch.manual_seed(0)
    state = {}

    def add(prefix, module):
        for k, v in module.state_dict().items():
            state[f"{prefix}.{k}"] = v.detach().numpy()

    nerf_model_config = {
        "layers_width": 64, "backbone_layers_count": 4, "output_features": 3,
        "skip_layer_idx": 2, "style_features": style_features,
        "empty_space_alpha": -3.5,
        "position_encoder": {"octaves": 4, "append_original": True},
        "bounding_box": BOX,
    }
    bender_model_config = {
        "layers_width": 32, "layers_count": 3, "skip_layer_idx": 1,
        "deformation_features": deformation_features,
        "position_encoder": {"octaves": 4, "append_original": True,
                             "num_steps": 1000},
        "bounding_box": BOX,
    }
    for i in range(2):
        add(f"object_composer.object_models_coarse.{i}.nerf_model",
            AdaInStyleNerfModel({}, nerf_model_config))
    add("object_composer.object_models_coarse.1.ray_bender",
        PositionalRayBenderModel({}, bender_model_config))

    class TorchEncoderV5(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.initial_backbone = nn.Sequential(
                TorchResidualBlock(64, 64, downsample_factor=2),
                TorchResidualBlock(64, 64, downsample_factor=1))
            self.final_backbone = nn.Sequential(
                TorchResidualBlock(64, 128, downsample_factor=2),
                TorchResidualBlock(128, 128, downsample_factor=1),
                TorchResidualBlock(128, 256, downsample_factor=2),
                TorchResidualBlock(256, 256, downsample_factor=1),
                TorchResidualBlock(256, 512, downsample_factor=2),
                TorchResidualBlock(512, 512, downsample_factor=1))
            self.style_head = nn.Linear(512, style_features)
            self.deformation_head = nn.Linear(512, deformation_features)

    class TorchEncoderV4(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(9, 16, 3, stride=1, padding=1, bias=False)
            self.bn1 = nn.BatchNorm2d(16)
            self.initial_backbone = nn.Sequential(
                TorchResidualBlock(16, 17, downsample_factor=1,
                                   drop_final_activation=True))
            self.final_backbone = nn.Sequential(
                TorchResidualBlock(16, 32, downsample_factor=2),
                TorchResidualBlock(32, 32, downsample_factor=1),
                TorchResidualBlock(32, 64, downsample_factor=2),
                TorchResidualBlock(64, 64, downsample_factor=1))
            self.style_head = nn.Linear(64, style_features)
            self.deformation_head = nn.Linear(64, deformation_features)

    add("object_encoders.0", TorchEncoderV5())
    add("object_encoders.1", TorchEncoderV4())

    memory_size = 5
    for j in range(memory_size):
        state[f"camera_parameters_offsets.storage.storage.{j}"] = (
            np.float32(rng.standard_normal(7) * 0.01)
        )

    params, batch_stats = convert_environment_model(state, scene, cameras_count=1)

    # --- structure/shape equality with a fresh init ----------------------
    model = EnvironmentModel(scene, focal_length_multiplier=1.0,
                             enable_camera_offsets=True,
                             camera_memory_size=memory_size,
                             training_cameras_count=1)
    observations = jnp.full((1, 2, 1, 16, 24, 3), 0.5)
    cam_rot = jnp.zeros((1, 2, 1, 3)).at[..., 0].set(-0.5)
    cam_trans = jnp.zeros((1, 2, 1, 3)).at[..., 1].set(6.0).at[..., 2].set(6.0)
    focals = jnp.full((1, 2, 1), 30.0)
    boxes = jnp.broadcast_to(jnp.asarray([0.4, 0.3, 0.6, 0.7]), (1, 2, 1, 1, 4))
    validity = jnp.ones((1, 2, 1, 1), bool)
    frames = jnp.zeros((1, 2), jnp.int32)
    rngs = {k: jax.random.PRNGKey(i) for i, k in enumerate(
        ("params", "ray_sampling", "sampling", "alpha_noise", "style_shuffle"))}
    init_vars = jax.jit(
        lambda r: model.init(r, observations, cam_rot, cam_trans, focals,
                             boxes, validity, frames, samples_per_image=8)
    )(rngs)

    def shapes(tree):
        return jax.tree.map(lambda x: jnp.shape(x), tree)

    assert shapes(init_vars["params"]) == shapes(params)
    converted_stats_shapes = shapes(batch_stats)
    init_stats_shapes = shapes(init_vars["batch_stats"])
    assert init_stats_shapes == converted_stats_shapes

    out, _ = model.apply(
        {"params": params, "batch_stats": batch_stats},
        observations, cam_rot, cam_trans, focals, boxes, validity, frames,
        samples_per_image=8, train=False,
        rngs={k: v for k, v in rngs.items() if k != "params"},
        mutable=["batch_stats"],
    )
    feats = out["coarse"]["global"]["integrated_features"]
    assert np.all(np.isfinite(np.asarray(feats)))


def test_import_checkpoint_cli_and_generate(tmp_path, rng):
    """Save a reference-layout torch checkpoint for the smoke config's scene,
    import it through cli.import_checkpoint, and render the test split from
    the imported checkpoint via cli.generate_reconstructed_dataset."""
    import sys as _sys

    import torch
    import torch.nn as nn
    import yaml
    from model.layers.residual_block import ResidualBlock as TorchResidualBlock
    from model.nerf_models.adain_style_nerf_model import AdaInStyleNerfModel
    from model.nerf_models.positional_ray_bender_model import (
        PositionalRayBender as PositionalRayBenderModel,
    )

    from playableenvironments_tpu.data.synthetic import make_synthetic_dataset

    root = str(tmp_path)
    data_root = os.path.join(root, "data")
    make_synthetic_dataset(data_root, videos=1, frames=6, height=16, width=24)

    cfg = yaml.safe_load(open(os.path.join(REPO, "configs", "synthetic_smoke.yaml")))
    cfg["data"]["data_root"] = data_root
    cfg["logging"]["output_root"] = os.path.join(root, "results")
    cfg["logging"]["checkpoints_root"] = os.path.join(root, "checkpoints")
    config_path = os.path.join(root, "cfg.yaml")
    yaml.safe_dump(cfg, open(config_path, "w"))

    # --- reference-layout state dict for the smoke scene ------------------
    torch.manual_seed(0)
    state = {}

    def add(prefix, module):
        for k, v in module.state_dict().items():
            state[f"{prefix}.{k}"] = v

    def nerf_cfg(box):
        return {
            "layers_width": 32, "backbone_layers_count": 3,
            "output_features": 3, "skip_layer_idx": 1, "style_features": 8,
            "empty_space_alpha": -3.5,
            "position_encoder": {"octaves": 4, "append_original": True},
            "bounding_box": box,
        }

    bg_box = ((-12.0, 12.0), (-12.0, 12.0), (-0.5, 0.0))
    pl_box = ((-0.6, 0.6), (-0.6, 0.6), (0.0, 2.0))
    add("object_composer.object_models_coarse.0.nerf_model",
        AdaInStyleNerfModel({}, nerf_cfg(bg_box)))
    add("object_composer.object_models_coarse.1.nerf_model",
        AdaInStyleNerfModel({}, nerf_cfg(pl_box)))
    add("object_composer.object_models_coarse.1.ray_bender",
        PositionalRayBenderModel({}, {
            "layers_width": 16, "layers_count": 2, "skip_layer_idx": 1,
            "deformation_features": 4,
            "position_encoder": {"octaves": 2, "append_original": True,
                                 "num_steps": 500},
            "bounding_box": pl_box,
        }))

    class TorchEncoderV5(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.initial_backbone = nn.Sequential(
                TorchResidualBlock(64, 64, downsample_factor=2),
                TorchResidualBlock(64, 64, downsample_factor=1))
            self.final_backbone = nn.Sequential(
                TorchResidualBlock(64, 128, downsample_factor=2),
                TorchResidualBlock(128, 128, downsample_factor=1),
                TorchResidualBlock(128, 256, downsample_factor=2),
                TorchResidualBlock(256, 256, downsample_factor=1),
                TorchResidualBlock(256, 512, downsample_factor=2),
                TorchResidualBlock(512, 512, downsample_factor=1))
            self.style_head = nn.Linear(512, 8)
            self.deformation_head = nn.Linear(512, 4)

    class TorchEncoderV4(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(9, 16, 3, stride=1, padding=1, bias=False)
            self.bn1 = nn.BatchNorm2d(16)
            self.initial_backbone = nn.Sequential(
                TorchResidualBlock(16, 17, downsample_factor=1,
                                   drop_final_activation=True))
            self.final_backbone = nn.Sequential(
                TorchResidualBlock(16, 32, downsample_factor=2),
                TorchResidualBlock(32, 32, downsample_factor=1),
                TorchResidualBlock(32, 64, downsample_factor=2),
                TorchResidualBlock(64, 64, downsample_factor=1))
            self.style_head = nn.Linear(64, 8)
            self.deformation_head = nn.Linear(64, 4)

    add("object_encoders.0", TorchEncoderV5())
    add("object_encoders.1", TorchEncoderV4())

    torch_path = os.path.join(root, "reference_checkpoint.pth.tar")
    torch.save({"model": state, "step": 12345}, torch_path)

    def run_cli(module, *args):
        import importlib

        argv = _sys.argv
        _sys.argv = [module] + list(args)
        try:
            importlib.import_module(module).main()
        finally:
            _sys.argv = argv

    imported_dir = os.path.join(root, "imported")
    run_cli("playableenvironments_tpu.cli.import_checkpoint",
            "--config", config_path, "--torch_checkpoint", torch_path,
            "--output", imported_dir)

    from playableenvironments_tpu.train.checkpointing import latest_checkpoint

    ckpt = latest_checkpoint(imported_dir)
    assert ckpt is not None

    out = os.path.join(root, "reconstructed")
    run_cli("playableenvironments_tpu.cli.generate_reconstructed_dataset",
            "--config", config_path, "--checkpoint", ckpt, "--output", out,
            "--batch_size", "2")
    assert os.path.isdir(os.path.join(out, "00000", "00000"))


def test_lstm_cell_conversion_parity(rng):
    import torch

    from playableenvironments_tpu.compat.torch_import import convert_lstm_cell

    import flax.linen as fnn

    torch.manual_seed(3)
    in_features, hidden = 11, 8
    cell_t = torch.nn.LSTMCell(in_features, hidden)
    x = torch.randn(4, in_features)
    h0 = torch.randn(4, hidden)
    c0 = torch.randn(4, hidden)
    with torch.no_grad():
        h1, c1 = cell_t(x, (h0, c0))

    params = convert_lstm_cell(
        {k: v.detach().numpy() for k, v in cell_t.state_dict().items()}, ""
    )
    cell_j = fnn.OptimizedLSTMCell(hidden)
    (c1_j, h1_j), y = cell_j.apply(
        {"params": params},
        (jnp.asarray(c0.numpy()), jnp.asarray(h0.numpy())),
        jnp.asarray(x.numpy()),
    )
    np.testing.assert_allclose(np.asarray(h1_j), h1.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c1_j), c1.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(y), h1.numpy(), atol=1e-5)


def test_dynamics_network_checkpoint_parity(rng):
    import torch
    from model.dynamics_network_v9 import DynamicsNetworkV9

    from playableenvironments_tpu.compat.torch_import import (
        convert_dynamics_network,
    )
    from playableenvironments_tpu.config import (
        AnimationModelConfig,
        DynamicsNetworkConfig,
    )
    from playableenvironments_tpu.models.dynamics import DynamicsNetwork

    torch.manual_seed(1)
    style_features, deformation_features = 6, 4
    actions, dims, hidden = 5, 3, 16
    model_config = {
        "style_features": style_features,
        "deformation_features": deformation_features,
        "actions_count": actions, "action_space_dimension": dims,
        "rotation_axis": 2, "force_rotation_axis_translations": None,
        "force_rotations_zero": False, "bounding_box": BOX,
        "output_features": hidden, "cells_count": 2,
    }
    torch_model = DynamicsNetworkV9({}, model_config).eval()

    bs = 4
    rot = torch.rand(bs, 3) * 0.5
    trans = torch.rand(bs, 3)
    style = torch.rand(bs, style_features)
    deform = torch.rand(bs, deformation_features)
    action = torch.nn.functional.one_hot(
        torch.arange(bs) % actions, actions
    ).float()
    variation = torch.rand(bs, dims)
    with torch.no_grad():
        torch_model.reinit_memory()
        rot_t, trans_t, style_t, deform_t = torch_model(
            rot, trans, style, deform, action, variation
        )

    params = convert_dynamics_network(
        {k: v.detach().numpy() for k, v in torch_model.state_dict().items()},
        "", cells_count=2,
    )
    cfg = AnimationModelConfig(
        actions_count=actions, action_space_dimension=dims,
        style_features=style_features, deformation_features=deformation_features,
        dynamics=DynamicsNetworkConfig(
            output_features=hidden, layers_count=2,
            force_rotations_zero=False, force_z_translations_zero=False,
            rotation_axis=2,
        ),
    )
    net = DynamicsNetwork(cfg, BOX)
    carry, (rot_j, trans_j, style_j, deform_j) = net.apply(
        {"params": params},
        None,
        jnp.asarray(rot.numpy()), jnp.asarray(trans.numpy()),
        jnp.asarray(style.numpy()), jnp.asarray(deform.numpy()),
        jnp.asarray(action.numpy()), jnp.asarray(variation.numpy()),
    )
    np.testing.assert_allclose(np.asarray(rot_j), rot_t.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(trans_j), trans_t.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(style_j), style_t.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(deform_j), deform_t.numpy(), atol=1e-4)


def test_action_network_checkpoint_parity(rng):
    import torch
    from model.action_network_v5 import ActionNetworkV5

    from playableenvironments_tpu.compat.torch_import import (
        convert_action_network,
    )
    from playableenvironments_tpu.config import (
        ActionNetworkConfig,
        AnimationModelConfig,
    )
    from playableenvironments_tpu.models.action import ActionNetwork

    torch.manual_seed(2)
    actions, dims = 4, 3
    model_config = {
        "layers_width": 24, "layers_count": 2,
        "actions_count": actions, "action_space_dimension": dims,
        "use_deformation": False, "deformation_features": 0,
        "style_features": 0, "bounding_box": BOX,
    }
    torch_model = ActionNetworkV5({}, model_config)
    # The reference's sample() hard-codes .cuda() (action_network_v5.py:76);
    # sampled outputs are not compared, so run it on CPU.
    torch_model.sample = lambda mean, log_variance: (
        torch.randn(mean.size()) * torch.exp(0.5 * log_variance) + mean
    )
    torch_model.sample_variance = lambda mean, variance: (
        torch.randn(mean.size()) * torch.sqrt(variance) + mean
    )

    bs, t = 3, 5
    rot = torch.rand(bs, t, 3) * 0.5
    trans = torch.rand(bs, t, 3)
    in_scene = torch.ones(bs, t, dtype=torch.bool)
    # Warm running stats, then eval. Force one low-variance feature per BN:
    # the reference normalizes by (std + eps) while MaskedBatchNorm uses
    # sqrt(var + eps), which only diverges when std is small.
    torch_model.train()
    with torch.no_grad():
        torch_model(rot, trans, in_scene)
        for name, buf in torch_model.named_buffers():
            if name.endswith("running_std"):
                buf[0] = 0.01
    torch_model.eval()
    with torch.no_grad():
        (logits_t, dir_dist_t, _, state_dist_t, _) = torch_model(
            rot, trans, in_scene
        )

    params, stats = convert_action_network(
        {k: v.detach().numpy() for k, v in torch_model.state_dict().items()},
        "", layers_count=2,
    )
    cfg = AnimationModelConfig(
        actions_count=actions, action_space_dimension=dims,
        action_network=ActionNetworkConfig(layers_width=24, layers_count=2),
    )
    net = ActionNetwork(cfg, BOX, use_deformation=False)
    out = net.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(rot.numpy()), jnp.asarray(trans.numpy()), None,
        jnp.asarray(in_scene.numpy()), jax.random.PRNGKey(0),
        use_running_average=True,
    )
    np.testing.assert_allclose(
        np.asarray(out["action_states_distribution"]),
        state_dist_t.numpy(), atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["action_directions_distribution"]),
        dir_dist_t.numpy(), atol=5e-4,
    )


def test_import_phase3_checkpoint_cli(tmp_path, rng):
    """Phase-3 import: a reference-layout playable checkpoint (frozen env
    model + animation model) converts into environment + playable orbax
    checkpoints, which re-enact the test split via
    generate_reconstructed_playability_dataset."""
    import sys as _sys

    import torch
    import torch.nn as nn
    import yaml
    from model.dynamics_network_v9 import DynamicsNetworkV9
    from model.layers.residual_block import ResidualBlock as TorchResidualBlock
    from model.nerf_models.adain_style_nerf_model import AdaInStyleNerfModel
    from model.nerf_models.positional_ray_bender_model import (
        PositionalRayBender as PositionalRayBenderModel,
    )
    from model.action_network_v5 import ActionNetworkV5

    from playableenvironments_tpu.data.synthetic import make_synthetic_dataset

    root = str(tmp_path)
    data_root = os.path.join(root, "data")
    make_synthetic_dataset(data_root, videos=1, frames=8, height=16, width=24)

    cfg = yaml.safe_load(open(os.path.join(REPO, "configs", "synthetic_smoke.yaml")))
    cfg["data"]["data_root"] = data_root
    cfg["logging"]["output_root"] = os.path.join(root, "results")
    cfg["logging"]["checkpoints_root"] = os.path.join(root, "checkpoints")
    config_path = os.path.join(root, "cfg.yaml")
    yaml.safe_dump(cfg, open(config_path, "w"))

    torch.manual_seed(0)
    state = {}

    def add(prefix, module):
        for k, v in module.state_dict().items():
            state[f"{prefix}.{k}"] = v

    def nerf_cfg(box):
        return {
            "layers_width": 32, "backbone_layers_count": 3,
            "output_features": 3, "skip_layer_idx": 1, "style_features": 8,
            "empty_space_alpha": -3.5,
            "position_encoder": {"octaves": 4, "append_original": True},
            "bounding_box": box,
        }

    bg_box = ((-12.0, 12.0), (-12.0, 12.0), (-0.5, 0.0))
    pl_box = ((-0.6, 0.6), (-0.6, 0.6), (0.0, 2.0))
    env = "environment_model."
    add(env + "object_composer.object_models_coarse.0.nerf_model",
        AdaInStyleNerfModel({}, nerf_cfg(bg_box)))
    add(env + "object_composer.object_models_coarse.1.nerf_model",
        AdaInStyleNerfModel({}, nerf_cfg(pl_box)))
    add(env + "object_composer.object_models_coarse.1.ray_bender",
        PositionalRayBenderModel({}, {
            "layers_width": 16, "layers_count": 2, "skip_layer_idx": 1,
            "deformation_features": 4,
            "position_encoder": {"octaves": 2, "append_original": True,
                                 "num_steps": 500},
            "bounding_box": pl_box,
        }))

    class TorchEncoderV5(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.initial_backbone = nn.Sequential(
                TorchResidualBlock(64, 64, downsample_factor=2),
                TorchResidualBlock(64, 64, downsample_factor=1))
            self.final_backbone = nn.Sequential(
                TorchResidualBlock(64, 128, downsample_factor=2),
                TorchResidualBlock(128, 128, downsample_factor=1),
                TorchResidualBlock(128, 256, downsample_factor=2),
                TorchResidualBlock(256, 256, downsample_factor=1),
                TorchResidualBlock(256, 512, downsample_factor=2),
                TorchResidualBlock(512, 512, downsample_factor=1))
            self.style_head = nn.Linear(512, 8)
            self.deformation_head = nn.Linear(512, 4)

    class TorchEncoderV4(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(9, 16, 3, stride=1, padding=1, bias=False)
            self.bn1 = nn.BatchNorm2d(16)
            self.initial_backbone = nn.Sequential(
                TorchResidualBlock(16, 17, downsample_factor=1,
                                   drop_final_activation=True))
            self.final_backbone = nn.Sequential(
                TorchResidualBlock(16, 32, downsample_factor=2),
                TorchResidualBlock(32, 32, downsample_factor=1),
                TorchResidualBlock(32, 64, downsample_factor=2),
                TorchResidualBlock(64, 64, downsample_factor=1))
            self.style_head = nn.Linear(64, 8)
            self.deformation_head = nn.Linear(64, 4)

    add(env + "object_encoders.0", TorchEncoderV5())
    add(env + "object_encoders.1", TorchEncoderV4())

    anim = "object_animation_models.0."
    add(anim + "dynamics_network", DynamicsNetworkV9({}, {
        "style_features": 8, "deformation_features": 4,
        "actions_count": 4, "action_space_dimension": 3,
        "rotation_axis": 2, "force_rotation_axis_translations": 0.01,
        "force_rotations_zero": True, "bounding_box": pl_box,
        "output_features": 16, "cells_count": 1,
    }))
    add(anim + "action_network", ActionNetworkV5({}, {
        "layers_width": 16, "layers_count": 2,
        "actions_count": 4, "action_space_dimension": 3,
        "use_deformation": False, "deformation_features": 0,
        "style_features": 0, "bounding_box": pl_box,
    }))
    state[anim + "centroid_estimator.estimated_centroids"] = torch.zeros(4, 3)

    torch_path = os.path.join(root, "playable_checkpoint.pth.tar")
    torch.save({"model": state}, torch_path)

    def run_cli(module, *args):
        import importlib

        argv = _sys.argv
        _sys.argv = [module] + list(args)
        try:
            importlib.import_module(module).main()
        finally:
            _sys.argv = argv

    imported_dir = os.path.join(root, "imported")
    run_cli("playableenvironments_tpu.cli.import_checkpoint",
            "--config", config_path, "--torch_checkpoint", torch_path,
            "--output", imported_dir, "--phase3")

    from playableenvironments_tpu.train.checkpointing import latest_checkpoint

    env_ckpt = latest_checkpoint(os.path.join(imported_dir, "environment"))
    playable_ckpt = latest_checkpoint(os.path.join(imported_dir, "playable"))
    assert env_ckpt is not None and playable_ckpt is not None

    out = os.path.join(root, "playability")
    run_cli(
        "playableenvironments_tpu.cli.generate_reconstructed_playability_dataset",
        "--config", config_path, "--environment_checkpoint", env_ckpt,
        "--playable_checkpoint", playable_ckpt, "--output", out,
    )
    assert os.path.isdir(os.path.join(out, "00000", "00000"))
