"""Whole-pipeline render parity against the reference code as a NUMERIC ORACLE.

test_torch_import.py pins individual modules (NeRF MLP, bender, encoders) to
the reference; these tests pin the COMPOSITION semantics — the layer where a
subtle divergence would hide behind self-authored oracles. They instantiate
the reference's own ObjectComposer / EnvironmentModel classes
(/root/reference/model/object_composer.py:786-893, compose at :399-447;
/root/reference/model/environment_model.py:847-1039), run them forward on a
tiny scene, convert the torch state_dict with compat.torch_import, and
require the repo's SceneComposer, render.fast, and EnvironmentModel to
reproduce the integrated features/alphas/depths end to end:

- z-bound slab test + clamp (object_composer.py:520-523)
- deterministic linspace positions (ray_helper.py create_ray_positions)
- dense masked bbox compute vs the reference's boolean-gather filtering
- empty_space_alpha for absent objects (object_composer.py:545-547)
- sort-merge composition vs the repo's sort-free transmittance
- fix_object_overlaps=True (object_composer.py:220-293) + skybox, the
  Minecraft semantics
- the coarse->fine hierarchical pass (separate and shared fine weights)
- the full observations->encoders->poses->rays->composer chain
- the pose/keypoint-consistency forwards (random sampling collapsed to a
  deterministic ray via a one-pixel box / coincident keypoints)

The reference code is CUDA-hardwired (`.cuda()` tensor calls) and uses the
removed `np.bool` alias; a test-local shim maps both to CPU equivalents.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REFERENCE = "/root/reference"
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)


def _reference_importable():
    try:
        import torch  # noqa: F401
        from model.object_composer import ObjectComposer  # noqa: F401

        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _reference_importable(),
    reason="reference code / torch not importable in this environment",
)


@pytest.fixture()
def cpu_reference(monkeypatch):
    """Run the CUDA-hardwired reference on CPU: `.cuda()` becomes identity
    (ray_helper.py create_ray_positions and friends call it on every tensor)
    and the removed `np.bool` alias (object_composer.py:350) is restored."""
    import torch

    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    monkeypatch.setattr(
        torch.nn.Module, "cuda", lambda self, *a, **k: self, raising=False
    )
    if not hasattr(np, "bool"):
        monkeypatch.setattr(np, "bool", bool, raising=False)
    import collections
    import collections.abc

    if not hasattr(collections, "Sequence"):  # removed in py3.10
        # (ray_helper.py:452 isinstance check)
        monkeypatch.setattr(
            collections, "Sequence", collections.abc.Sequence, raising=False
        )


STYLE_FEATURES = 16
DEFORMATION_FEATURES = 8
BG_BOX = ((-10.0, 10.0), (-10.0, 10.0), (-12.0, -9.0))
PLAYER_BOX = ((-1.0, 1.0), (-1.0, 1.0), (-1.2, 1.2))
SKYBOX_BOX = ((-200.0, 200.0), (-200.0, 200.0), (-200.0, 200.0))


def _ref_nerf_config(output_features):
    return {
        "architecture": "model.nerf_models.adain_style_nerf_model",
        "layers_width": 32,
        "backbone_layers_count": 4,
        "output_features": output_features,
        "skip_layer_idx": 2,
        "position_encoder": {"octaves": 4, "append_original": True},
    }


def _ref_object_model(box, positions, output_features, bender,
                      use_fine=False, positions_fine=None):
    if bender == "positional":
        bender_config = {
            "architecture": "model.nerf_models.positional_ray_bender_model",
            "layers_width": 16,
            "layers_count": 3,
            "skip_layer_idx": 1,
            "position_encoder": {
                "octaves": 4, "append_original": True, "num_steps": 1000,
            },
        }
    else:
        bender_config = {
            "architecture": "model.nerf_models.zeroed_ray_bender_model",
        }
    return {
        "architecture": "model.nerf_models.ray_bending_style_nerf_model",
        "bounding_box": [list(r) for r in box],
        "positions_count_coarse": positions,
        "positions_count_fine": positions_fine or positions,
        "use_fine": use_fine,
        "empty_space_alpha": -3.5,
        "z_near_min": 0.1,
        "z_far_max": 60.0,
        "deformation_features": DEFORMATION_FEATURES,
        "style_features": STYLE_FEATURES,
        "nerf_model": _ref_nerf_config(output_features),
        "ray_bender_model": bender_config,
    }


def _ref_config(object_models, static_count, apply_activation,
                fix_object_overlaps, parameter_encoders=None,
                object_encoders=None, extra_model=None, extra_top=None):
    """Reference-format nested config dict, the shape ObjectComposer /
    ObjectIDsHelper / EnvironmentModel index into (utils/configuration.py
    just wraps the parsed YAML)."""
    n = len(object_models)
    model = {
        "apply_activation": apply_activation,
        "fix_object_overlaps": fix_object_overlaps,
        "static_object_models": static_count,
        "object_models": object_models,
        "object_parameters_encoder": parameter_encoders
        or [{"objects_count": 1} for _ in range(n)],
        "object_encoders": object_encoders or [{} for _ in range(n)],
    }
    if extra_model:
        model.update(extra_model)
    config = {"model": model}
    if extra_top:
        config.update(extra_top)
    return config


def _repo_scene(object_models, static_count, apply_activation,
                fix_object_overlaps):
    """config.SceneConfig mirroring a reference config built by
    _ref_object_model (same widths/boxes/encoders)."""
    from playableenvironments_tpu.config import (
        NerfMLPConfig,
        ObjectEncoderConfig,
        ObjectModelConfig,
        ParameterEncoderConfig,
        PositionalEncoderConfig,
        RayBenderConfig,
        SceneConfig,
    )

    repo_models = []
    for om in object_models:
        nerf = om["nerf_model"]
        kind = (
            "skybox"
            if nerf["architecture"].endswith("skybox_adain_style_nerf_model_v3")
            else "adain"
        )
        bender_arch = om["ray_bender_model"]["architecture"]
        if bender_arch.endswith("positional_ray_bender_model"):
            b = om["ray_bender_model"]
            bender = RayBenderConfig(
                kind="positional",
                layers_width=b["layers_width"],
                layers_count=b["layers_count"],
                skip_layer_idx=b["skip_layer_idx"],
                position_encoder=PositionalEncoderConfig(
                    octaves=b["position_encoder"]["octaves"],
                    num_steps=b["position_encoder"]["num_steps"],
                ),
            )
        else:
            bender = RayBenderConfig(kind="zeroed")
        repo_models.append(
            ObjectModelConfig(
                name="object",
                bounding_box=tuple(tuple(r) for r in om["bounding_box"]),
                positions_count_coarse=om["positions_count_coarse"],
                positions_count_fine=om["positions_count_fine"],
                use_fine=om["use_fine"],
                empty_space_alpha=om["empty_space_alpha"],
                z_near_min=om["z_near_min"],
                z_far_max=om["z_far_max"],
                style_features=STYLE_FEATURES,
                deformation_features=DEFORMATION_FEATURES,
                nerf=NerfMLPConfig(
                    kind=kind,
                    layers_width=nerf["layers_width"],
                    backbone_layers_count=nerf["backbone_layers_count"],
                    output_features=nerf["output_features"],
                    skip_layer_idx=nerf["skip_layer_idx"],
                    position_encoder=PositionalEncoderConfig(
                        octaves=nerf["position_encoder"]["octaves"]
                    ),
                ),
                bender=bender,
            )
        )
    n = len(repo_models)
    return SceneConfig(
        object_models=tuple(repo_models),
        parameter_encoders=tuple(
            ParameterEncoderConfig(kind="static", objects_count=1)
            for _ in range(n)
        ),
        object_encoders=tuple(
            ObjectEncoderConfig(
                kind="v4", input_size=(16, 16),
                style_features=STYLE_FEATURES,
                deformation_features=DEFORMATION_FEATURES,
            )
            for _ in range(n)
        ),
        static_object_models=static_count,
        apply_activation=apply_activation,
        fix_object_overlaps=fix_object_overlaps,
        sampling_weights=tuple(1.0 / n for _ in range(n)),
    )


def _composer_inputs(objects_count, rays=24, batch=2, seed=0):
    """World-frame ray batch aimed down -z through both object boxes, plus
    per-object transforms/latents in the REFERENCE's layouts
    (w2o (..., 4, 4, objects), latents (..., features, objects))."""
    rng = np.random.default_rng(seed)
    origins = np.zeros((batch, 3), np.float32)
    directions = rng.normal(size=(batch, rays, 3)).astype(np.float32)
    directions[..., :2] *= 0.08
    directions[..., 2] = -1.0
    normals = np.zeros((batch, 3), np.float32)
    normals[..., 2] = -1.0

    # Object 0 (background slab) at identity; object 1 (player) translated
    # to z=-5 so its box spans z in [-6.2, -3.8] — disjoint from the slab's
    # [-12, -9]: the cross-object sort order is unambiguous (ties between
    # equal positions_t are resolved arbitrarily by torch.sort and would
    # make the comparison ill-posed).
    w2o = np.stack([np.eye(4, dtype=np.float32)] * objects_count, axis=-1)
    w2o = np.tile(w2o[None], (batch, 1, 1, 1))
    if objects_count > 1:
        # Last object = the player: translate to world z=-5 so its box
        # spans z in [-6.2, -3.8].
        w2o[:, 2, 3, -1] = 5.0  # world z=-5 -> object z=0
    style = rng.normal(size=(batch, STYLE_FEATURES, objects_count)).astype(
        np.float32
    )
    deformation = rng.normal(
        size=(batch, DEFORMATION_FEATURES, objects_count)
    ).astype(np.float32)
    in_scene = np.ones((batch, objects_count), bool)
    if objects_count > 1:
        in_scene[1, -1] = False  # absent-object path (empty_space_alpha)
    return origins, directions, normals, w2o, style, deformation, in_scene


def _torch_state(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _run_reference_composer(config, inputs, step=0):
    import torch
    from model.object_composer import ObjectComposer

    torch.manual_seed(0)
    composer = ObjectComposer(config)
    composer.eval()
    if step:
        composer.set_step(step)
    # Fresh-init alpha heads emit all-negative alphas (relu -> 0 -> all
    # weights exactly 0: a vacuous oracle). Bias them positive so the
    # transmittance/composition math actually discriminates.
    with torch.no_grad():
        for model in list(composer.object_models_coarse) + list(
            composer.object_models_fine
        ):
            if model is None:
                continue
            head = getattr(model.nerf_model, "alpha_head", None)
            if head is not None:
                head.bias += 1.5

    origins, directions, normals, w2o, style, deformation, in_scene = inputs
    with torch.no_grad():
        out = composer.forward(
            torch.from_numpy(origins),
            torch.from_numpy(directions),
            torch.from_numpy(normals),
            torch.from_numpy(w2o),
            torch.from_numpy(style),
            torch.from_numpy(deformation),
            torch.from_numpy(in_scene),
            perturb=False,
        )
    state = {f"object_composer.{k}": v for k, v in _torch_state(composer).items()}
    return out, state


def _run_repo_composer(scene, state, inputs, step=0, separate_fine=False):
    from playableenvironments_tpu.compat.torch_import import (
        convert_object_composer,
    )
    from playableenvironments_tpu.render.composer import SceneComposer

    params, stats = convert_object_composer(
        state, scene, separate_fine=separate_fine
    )
    composer = SceneComposer(scene, separate_fine=separate_fine)
    origins, directions, normals, w2o, style, deformation, in_scene = inputs
    out = composer.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(origins),
        jnp.asarray(directions),
        jnp.asarray(normals),
        jnp.moveaxis(jnp.asarray(w2o), -1, -3),
        jnp.moveaxis(jnp.asarray(style), -1, -2),
        jnp.moveaxis(jnp.asarray(deformation), -1, -2),
        jnp.asarray(in_scene),
        perturb=False,
        step=jnp.asarray(step),
        use_running_average=True,
    )
    return params, stats, out


def _assert_integration_close(
    ref_entry, repo_entry, atol=2e-4, rtol=2e-4, global_entry=False
):
    for key in ("integrated_features", "opacity", "weights", "depth"):
        repo_value = np.asarray(repo_entry[key])
        ref_value = ref_entry[key].numpy()
        if key == "weights" and global_entry:
            # The reference sorts merged samples by t before integrating
            # (object_composer.py:434-445); the repo's sort-free
            # transmittance keeps object-concatenation order (same values,
            # same integrals — a permutation per ray). Compare as sorted
            # per-ray multisets.
            repo_value = np.sort(repo_value, axis=-1)
            ref_value = np.sort(ref_value, axis=-1)
        np.testing.assert_allclose(
            repo_value, ref_value, atol=atol, rtol=rtol, err_msg=key
        )


@pytest.mark.parametrize("apply_activation,features", [(False, 8), (True, 3)])
def test_composer_forward_parity(cpu_reference, apply_activation, features):
    """SceneComposer vs the reference ObjectComposer.forward on converted
    weights: per-object AND globally composed integrations, tennis semantics
    (fix_object_overlaps off), both feature-rendering (192-style) and
    RGB+sigmoid modes."""
    object_models = [
        _ref_object_model(BG_BOX, 8, features, "zeroed"),
        _ref_object_model(PLAYER_BOX, 12, features, "positional"),
    ]
    config = _ref_config(object_models, 1, apply_activation, False)
    scene = _repo_scene(object_models, 1, apply_activation, False)
    inputs = _composer_inputs(2)

    ref_out, state = _run_reference_composer(config, inputs, step=500)
    _, _, repo_out = _run_repo_composer(scene, state, inputs, step=500)

    for entry in ("object_0", "object_1", "global"):
        _assert_integration_close(
            ref_out["coarse"][entry], repo_out["coarse"][entry],
            global_entry=entry == "global",
        )
    # The oracle must have discriminating power: weights actually vary.
    assert float(np.abs(ref_out["coarse"]["global"]["weights"].numpy()).max()) > 1e-3


def test_composer_forward_parity_hierarchical_fine(cpu_reference):
    """The coarse->fine hierarchical path as a reference oracle
    (object_composer.py:26-29 separate fine instances; :563-578 inverse-CDF
    resampling from coarse weights; ray_helper.py:1320-1403
    create_ray_positions_weighted — midpoint bins, weights[1:-1], merged
    sort of coarse+fine t values). perturb=False on both sides makes the
    inverse-CDF samples deterministic linspace quantiles, so the comparison
    is exact up to float summation order. Both objects run use_fine with
    DIFFERENT fine counts (6 and 9) and the reference's independently
    initialized fine networks are imported via separate_fine=True."""
    features = 8
    object_models = [
        _ref_object_model(BG_BOX, 8, features, "zeroed",
                          use_fine=True, positions_fine=6),
        _ref_object_model(PLAYER_BOX, 12, features, "positional",
                          use_fine=True, positions_fine=9),
    ]
    config = _ref_config(object_models, 1, False, False)
    scene = _repo_scene(object_models, 1, False, False)
    inputs = _composer_inputs(2)

    ref_out, state = _run_reference_composer(config, inputs, step=500)
    _, _, repo_out = _run_repo_composer(
        scene, state, inputs, step=500, separate_fine=True
    )

    assert "fine" in ref_out and "fine" in repo_out
    for pass_name in ("coarse", "fine"):
        for entry in ("object_0", "object_1", "global"):
            _assert_integration_close(
                ref_out[pass_name][entry], repo_out[pass_name][entry],
                global_entry=entry == "global",
            )
    # Oracle discriminating power: the fine pass carries the merged
    # coarse+fine sample counts and actually differs from the coarse pass.
    fine_weights = ref_out["fine"]["global"]["weights"].numpy()
    assert fine_weights.shape[-1] == (8 + 6) + (12 + 9)
    assert float(np.abs(fine_weights).max()) > 1e-3
    assert not np.allclose(
        ref_out["fine"]["global"]["integrated_features"].numpy(),
        ref_out["coarse"]["global"]["integrated_features"].numpy(),
        atol=1e-4,
    )


def test_composer_fine_shared_weights_parity(cpu_reference):
    """The repo's default fine mode (separate_fine=False: the fine pass
    reuses the coarse parameters) against the reference with its fine
    instances' weights overwritten by the coarse ones — the two designs
    coincide exactly when coarse and fine weights are tied, which pins the
    repo's weight-sharing shortcut to the reference's math."""
    features = 8
    object_models = [
        _ref_object_model(BG_BOX, 8, features, "zeroed",
                          use_fine=True, positions_fine=6),
        _ref_object_model(PLAYER_BOX, 12, features, "positional",
                          use_fine=True, positions_fine=9),
    ]
    config = _ref_config(object_models, 1, False, False)
    scene = _repo_scene(object_models, 1, False, False)
    inputs = _composer_inputs(2)

    import torch
    from model.object_composer import ObjectComposer

    torch.manual_seed(0)
    composer = ObjectComposer(config)
    composer.eval()
    composer.set_step(500)
    with torch.no_grad():
        for model in composer.object_models_coarse:
            model.nerf_model.alpha_head.bias += 1.5
        # Tie fine weights to coarse.
        for coarse, fine in zip(
            composer.object_models_coarse, composer.object_models_fine
        ):
            fine.load_state_dict(coarse.state_dict())

    origins, directions, normals, w2o, style, deformation, in_scene = inputs
    with torch.no_grad():
        ref_out = composer.forward(
            torch.from_numpy(origins),
            torch.from_numpy(directions),
            torch.from_numpy(normals),
            torch.from_numpy(w2o),
            torch.from_numpy(style),
            torch.from_numpy(deformation),
            torch.from_numpy(in_scene),
            perturb=False,
        )
    state = {
        f"object_composer.{k}": v for k, v in _torch_state(composer).items()
    }
    _, _, repo_out = _run_repo_composer(
        scene, state, inputs, step=500, separate_fine=False
    )
    for pass_name in ("coarse", "fine"):
        for entry in ("object_0", "object_1", "global"):
            _assert_integration_close(
                ref_out[pass_name][entry], repo_out[pass_name][entry],
                global_entry=entry == "global",
            )


def test_composer_forward_parity_overlap_fix_and_skybox(cpu_reference):
    """Minecraft semantics: fix_object_overlaps=True (static samples inside a
    dynamic object's span are nulled, object_composer.py:220-293) with a
    skybox object (SkyboxAdaInStyleNerfModelV3: PE(origin, direction),
    forced alpha 10.0) behind a player whose box OVERLAPS the background
    slab in depth."""
    features = 8
    skybox = _ref_object_model(SKYBOX_BOX, 1, features, "zeroed")
    skybox["nerf_model"] = dict(
        _ref_nerf_config(features),
        architecture="model.nerf_models.skybox_adain_style_nerf_model_v3",
    )
    # The published minecraft skybox pins its single sample far behind the
    # scene via z bounds (z_near_min 90 / z_far_max 91, 013_minecraft yaml).
    skybox["z_near_min"] = 50.0
    skybox["z_far_max"] = 51.0
    background = _ref_object_model(BG_BOX, 8, features, "zeroed")
    player = _ref_object_model(PLAYER_BOX, 12, features, "positional")
    object_models = [skybox, background, player]

    config = _ref_config(object_models, 2, False, True)
    scene = _repo_scene(object_models, 2, False, True)

    inputs = list(_composer_inputs(3))
    # Move the player INTO the background slab (world z=-10) so the overlap
    # fix has real work: static samples in [-11.2, -8.8] get nulled.
    w2o = inputs[3]
    w2o[:, 2, 3, 2] = 10.0
    ref_out, state = _run_reference_composer(config, inputs, step=500)
    _, _, repo_out = _run_repo_composer(scene, state, inputs, step=500)

    for entry in ("object_0", "object_1", "object_2", "global"):
        _assert_integration_close(
            ref_out["coarse"][entry], repo_out["coarse"][entry],
            global_entry=entry == "global",
        )

    # The fix changed the global result (the test would otherwise pass
    # trivially with the overlap branch never mattering).
    config_off = _ref_config(object_models, 2, False, False)
    ref_off, _ = _run_reference_composer(config_off, inputs, step=500)
    assert not np.allclose(
        ref_off["coarse"]["global"]["integrated_features"].numpy(),
        ref_out["coarse"]["global"]["integrated_features"].numpy(),
        atol=1e-5,
    )


def test_fast_path_render_parity(cpu_reference):
    """render.fast (the pure-XLA inference twin with ray compaction) against
    the reference ObjectComposer.forward global integration."""
    features = 8
    object_models = [
        _ref_object_model(BG_BOX, 8, features, "zeroed"),
        _ref_object_model(PLAYER_BOX, 12, features, "positional"),
    ]
    config = _ref_config(object_models, 1, False, False)
    scene = _repo_scene(object_models, 1, False, False)
    inputs = _composer_inputs(2)

    ref_out, state = _run_reference_composer(config, inputs, step=500)

    from playableenvironments_tpu.compat.torch_import import (
        convert_object_composer,
    )
    from playableenvironments_tpu.render import fast

    params, stats = convert_object_composer(state, scene)
    origins, directions, normals, w2o, style, deformation, in_scene = inputs
    out = fast.render_rays_fast(
        scene,
        {"params": {"composer": params}, "batch_stats": {"composer": stats}},
        jnp.asarray(origins),
        jnp.asarray(directions),
        jnp.asarray(normals),
        jnp.moveaxis(jnp.asarray(w2o), -1, -3),
        jnp.moveaxis(jnp.asarray(style), -1, -2),
        jnp.moveaxis(jnp.asarray(deformation), -1, -2),
        jnp.asarray(in_scene),
        step=500,
        block_points=64,
        interpret=True,  # Pallas backbone off-TPU
    )
    ref_global = ref_out["coarse"]["global"]
    # 5e-3, not 2e-4: the fast path trades exact f32 summation order for
    # compacted-domain blocking (its flax-twin tests budget 5e-2); observed
    # max divergence vs the torch oracle is ~9e-4.
    np.testing.assert_allclose(
        np.asarray(out["coarse"]["global"]["integrated_features"]),
        ref_global["integrated_features"].numpy(),
        atol=5e-3,
        rtol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out["coarse"]["global"]["opacity"]),
        ref_global["opacity"].numpy(),
        atol=5e-3,
        rtol=5e-3,
    )


def _roi_pool_torch_stub(input, rois, output_size):
    """Faithful pure-torch reimplementation of torchvision.ops.roi_pool
    (roi_pool_kernel.cpp): torchvision is NOT installed in this image, so the
    reference encoders cannot run without it. Quantized inclusive ROI
    (round(coord), +1), integer floor/ceil bin edges clamped to the image,
    MAX over each bin, 0 for empty bins. The repo twin (ops.roi_crop.roi_pool)
    is pinned against this same spec in
    test_roi_pool_matches_torchvision_semantics."""
    import math

    import torch

    if isinstance(output_size, (tuple, list)):
        out_h, out_w = output_size
    else:
        out_h = out_w = output_size
    count = rois.shape[0]
    channels, height, width = input.shape[1:]
    out = torch.zeros((count, channels, out_h, out_w), dtype=input.dtype)

    def _round(v):  # std::round for the non-negative coords used here
        return int(math.floor(v + 0.5))

    for k in range(count):
        b = int(rois[k, 0])
        x1, y1 = _round(float(rois[k, 1])), _round(float(rois[k, 2]))
        x2, y2 = _round(float(rois[k, 3])), _round(float(rois[k, 4]))
        roi_w, roi_h = max(x2 - x1 + 1, 1), max(y2 - y1 + 1, 1)
        bin_h, bin_w = roi_h / out_h, roi_w / out_w
        for ph in range(out_h):
            hs = min(max(int(math.floor(ph * bin_h)) + y1, 0), height)
            he = min(max(int(math.ceil((ph + 1) * bin_h)) + y1, 0), height)
            for pw in range(out_w):
                ws = min(max(int(math.floor(pw * bin_w)) + x1, 0), width)
                we = min(max(int(math.ceil((pw + 1) * bin_w)) + x1, 0), width)
                if he > hs and we > ws:
                    out[k, :, ph, pw] = input[b, :, hs:he, ws:we].amax(
                        dim=(-1, -2)
                    )
    return out


def _install_torchvision_stub():
    import types

    if "torchvision" in sys.modules:
        return
    ops = types.ModuleType("torchvision.ops")
    ops.roi_pool = _roi_pool_torch_stub
    tv = types.ModuleType("torchvision")
    tv.ops = ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops


def test_roi_pool_matches_torchvision_semantics(cpu_reference):
    """ops.roi_crop.roi_pool (dense separable masked max) against the
    scalar-loop torchvision spec on random images and boxes, including
    degenerate and out-of-range boxes."""
    import torch

    from playableenvironments_tpu.ops.roi_crop import roi_pool

    rng = np.random.default_rng(3)
    images = rng.normal(size=(5, 11, 17, 3)).astype(np.float32)
    boxes = np.stack(
        [
            rng.uniform(0, 8, 5), rng.uniform(0, 5, 5),
            rng.uniform(8, 17, 5), rng.uniform(5, 11, 5),
        ],
        axis=-1,
    ).astype(np.float32)
    boxes[3] = [4.2, 3.7, 4.3, 3.8]   # sub-pixel box
    boxes[4] = [0.0, 0.0, 17.0, 11.0]  # full image

    got = np.asarray(roi_pool(jnp.asarray(images), jnp.asarray(boxes), (6, 7)))

    rois = torch.cat(
        [
            torch.arange(5, dtype=torch.float32)[:, None],
            torch.from_numpy(boxes),
        ],
        dim=-1,
    )
    want = _roi_pool_torch_stub(
        torch.from_numpy(np.moveaxis(images, -1, 1)).contiguous(), rois, (6, 7)
    ).numpy()
    np.testing.assert_allclose(got, np.moveaxis(want, 1, -1), atol=1e-6)


def test_environment_model_full_chain_parity(cpu_reference):
    """The full observations -> encoders -> poses -> rays -> composed render
    chain: the reference's EnvironmentModel.forward_from_observations
    (environment_model.py:847-1039) vs the repo's on a converted checkpoint.
    Deterministic end to end: all pixels via the stride-1 grid sampler on
    both sides, perturb off, style shuffle off, eval-mode BatchNorm."""
    import torch

    _install_torchvision_stub()  # reference encoders import torchvision
    from model.environment_model import EnvironmentModel as RefEnvironmentModel

    from playableenvironments_tpu.compat.torch_import import (
        convert_environment_model,
    )
    from playableenvironments_tpu.config import (
        ObjectEncoderConfig,
        ParameterEncoderConfig,
    )
    from playableenvironments_tpu.render.environment_model import (
        EnvironmentModel,
    )

    features = 8
    background = _ref_object_model(
        ((-12.0, 12.0), (-12.0, 12.0), (-1.0, 0.0)), 6, features, "zeroed"
    )
    player = _ref_object_model(
        ((-0.75, 0.75), (-0.5, 0.5), (0.0, 2.0)), 10, features, "positional"
    )
    zero_range = [[[0.0, 0.0], [0.0, 0.0], [0.0, 0.0]]]
    parameter_encoders = [
        {
            "architecture": "model.static_object_parameters_encoder",
            "objects_count": 1,
            "translation_range": zero_range,
            "rotation_range": zero_range,
        },
        {
            "architecture": "model.classic_object_parameters_encoder",
            "objects_count": 1,
            "translation_range": [[[-8.0, 8.0], [-8.0, 8.0], [0.01, 0.01]]],
            "rotation_range": zero_range,
        },
    ]
    object_encoders = [
        {
            "architecture": "model.object_encoder_v5",
            "input_size": [32, 32],
            "style_features": STYLE_FEATURES,
            "deformation_features": DEFORMATION_FEATURES,
        },
        {
            "architecture": "model.object_encoder_v4",
            "input_size": [16, 16],
            "style_features": STYLE_FEATURES,
            "deformation_features": DEFORMATION_FEATURES,
        },
    ]
    config = _ref_config(
        [background, player], 1, False, False,
        parameter_encoders=parameter_encoders,
        object_encoders=object_encoders,
        extra_model={
            "use_weighted_sampling": False,
            "sampling_weights": [0.5, 0.5],
            "enable_camera_parameters_offsets": False,
            "camera_parameters_memory_size": 4,
        },
        extra_top={
            "data": {"focal_length_multiplier": 1.0},
            "training": {"batching": {"allowed_cameras": [0]}},
        },
    )

    torch.manual_seed(1)
    ref_model = RefEnvironmentModel(config)
    ref_model.eval()
    with torch.no_grad():
        for om in ref_model.object_composer.object_models_coarse:
            om.nerf_model.alpha_head.bias += 1.5

    # A tiny ground-plane scene seen from a raised camera (the graft-entry
    # geometry): player standing at world y ~ 2 inside its detection box.
    batch, T, cams, height, width = 1, 2, 1, 12, 16
    observations = np.linspace(
        0.1, 0.9, batch * T * cams * height * width * 3, dtype=np.float32
    ).reshape(batch, T, cams, height, width, 3)
    camera_rotations = np.zeros((batch, T, cams, 3), np.float32)
    camera_rotations[..., 0] = -0.6
    camera_translations = np.zeros((batch, T, cams, 3), np.float32)
    camera_translations[..., 1] = 8.0
    camera_translations[..., 2] = 10.0
    focals = np.full((batch, T, cams), 20.0, np.float32)
    boxes = np.broadcast_to(
        np.asarray([0.4, 0.3, 0.6, 0.7], np.float32),
        (batch, T, cams, 1, 4),
    ).copy()
    validity = np.ones((batch, T, cams, 1), bool)
    frames = np.zeros((batch, T), np.int64)

    with torch.no_grad():
        ref_out = ref_model.forward_from_observations(
            torch.from_numpy(np.moveaxis(observations, -1, -3)).contiguous(),
            torch.from_numpy(camera_rotations),
            torch.from_numpy(camera_translations),
            torch.from_numpy(focals),
            torch.from_numpy(np.moveaxis(boxes, -2, -1)).contiguous(),
            torch.from_numpy(validity),
            torch.from_numpy(frames),
            torch.from_numpy(frames),
            torch.zeros((batch,), dtype=torch.int64),
            samples_per_image=0,
            perturb=False,
            patch_stride=[1],
        )

    state = _torch_state(ref_model)
    scene = _repo_scene([background, player], 1, False, False)
    import dataclasses

    scene = dataclasses.replace(
        scene,
        use_weighted_sampling=False,
        parameter_encoders=(
            ParameterEncoderConfig(kind="static", objects_count=1),
            ParameterEncoderConfig(
                kind="classic",
                objects_count=1,
                translation_range=(((-8.0, 8.0), (-8.0, 8.0), (0.01, 0.01)),),
                rotation_range=(((0.0, 0.0), (0.0, 0.0), (0.0, 0.0)),),
            ),
        ),
        object_encoders=(
            ObjectEncoderConfig(
                kind="v5", input_size=(32, 32),
                style_features=STYLE_FEATURES,
                deformation_features=DEFORMATION_FEATURES,
                crop_mode="roi_pool",
            ),
            ObjectEncoderConfig(
                kind="v4", input_size=(16, 16),
                style_features=STYLE_FEATURES,
                deformation_features=DEFORMATION_FEATURES,
                crop_mode="roi_pool",
            ),
        ),
    )
    params, stats = convert_environment_model(state, scene, cameras_count=1)
    model = EnvironmentModel(scene, focal_length_multiplier=1.0)
    out, _ = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(observations),
        jnp.asarray(camera_rotations),
        jnp.asarray(camera_translations),
        jnp.asarray(focals),
        jnp.asarray(boxes),
        jnp.asarray(validity),
        jnp.asarray(frames.astype(np.int32)),
        samples_per_image=0,
        patch_strides=[1],
        perturb=False,
        train=False,
        mutable=["batch_stats"],
    )

    # Same pixels in the same order (pins both grid samplers).
    np.testing.assert_allclose(
        np.asarray(out["observations"]),
        ref_out["observations"].numpy(),
        atol=1e-6,
    )
    # Scene encoding: poses (geometry; tight) and latents (conv stacks; 1e-3).
    enc = out["scene_encoding"]
    ref_enc = ref_out["scene_encoding"]
    np.testing.assert_allclose(
        np.asarray(enc.object_translations),
        np.moveaxis(ref_enc["object_translation_parameters"].numpy(), -1, -2),
        atol=1e-4, rtol=1e-4, err_msg="object translations",
    )
    np.testing.assert_allclose(
        np.asarray(enc.object_rotations),
        np.moveaxis(ref_enc["object_rotation_parameters"].numpy(), -1, -2),
        atol=1e-4, rtol=1e-4, err_msg="object rotations",
    )
    np.testing.assert_allclose(
        np.asarray(enc.object_style),
        np.moveaxis(ref_enc["object_style"].numpy(), -1, -2),
        atol=1e-3, rtol=1e-3, err_msg="style",
    )
    np.testing.assert_allclose(
        np.asarray(enc.object_deformation),
        np.moveaxis(ref_enc["object_deformation"].numpy(), -1, -2),
        atol=1e-3, rtol=1e-3, err_msg="deformation",
    )
    np.testing.assert_allclose(
        np.asarray(out["reconstructed_bounding_boxes"]),
        np.moveaxis(ref_out["reconstructed_bounding_boxes"].numpy(), -2, -1),
        atol=1e-4, rtol=1e-4, err_msg="reconstructed boxes",
    )
    # The composed render itself, every pixel.
    np.testing.assert_allclose(
        np.asarray(out["coarse"]["global"]["integrated_features"]),
        ref_out["coarse"]["global"]["integrated_features"].numpy(),
        atol=2e-3, rtol=2e-3, err_msg="integrated features",
    )
    np.testing.assert_allclose(
        np.asarray(out["coarse"]["global"]["opacity"]),
        ref_out["coarse"]["global"]["opacity"].numpy(),
        atol=2e-3, rtol=2e-3, err_msg="opacity",
    )


def _consistency_setup(cpu_reference):
    """Shared ref/repo EnvironmentModel pair (converted weights) + the tiny
    raised-camera scene geometry, for the pose/keypoint-consistency oracle
    tests. Mirrors the full-chain test's construction."""
    import dataclasses

    import torch

    _install_torchvision_stub()
    from model.environment_model import EnvironmentModel as RefEnvironmentModel

    from playableenvironments_tpu.compat.torch_import import (
        convert_environment_model,
    )
    from playableenvironments_tpu.config import (
        ObjectEncoderConfig,
        ParameterEncoderConfig,
    )
    from playableenvironments_tpu.render.environment_model import (
        EnvironmentModel,
    )

    features = 8
    background = _ref_object_model(
        ((-12.0, 12.0), (-12.0, 12.0), (-1.0, 0.0)), 6, features, "zeroed"
    )
    player = _ref_object_model(
        ((-0.75, 0.75), (-0.5, 0.5), (0.0, 2.0)), 10, features, "positional"
    )
    zero_range = [[[0.0, 0.0], [0.0, 0.0], [0.0, 0.0]]]
    parameter_encoders = [
        {
            "architecture": "model.static_object_parameters_encoder",
            "objects_count": 1,
            "translation_range": zero_range,
            "rotation_range": zero_range,
        },
        {
            "architecture": "model.classic_object_parameters_encoder",
            "objects_count": 1,
            "translation_range": [[[-8.0, 8.0], [-8.0, 8.0], [0.01, 0.01]]],
            "rotation_range": zero_range,
        },
    ]
    object_encoders = [
        {
            "architecture": "model.object_encoder_v5",
            "input_size": [32, 32],
            "style_features": STYLE_FEATURES,
            "deformation_features": DEFORMATION_FEATURES,
        },
        {
            "architecture": "model.object_encoder_v4",
            "input_size": [16, 16],
            "style_features": STYLE_FEATURES,
            "deformation_features": DEFORMATION_FEATURES,
        },
    ]
    config = _ref_config(
        [background, player], 1, False, False,
        parameter_encoders=parameter_encoders,
        object_encoders=object_encoders,
        extra_model={
            "use_weighted_sampling": False,
            "sampling_weights": [0.5, 0.5],
            "enable_camera_parameters_offsets": False,
            "camera_parameters_memory_size": 4,
        },
        extra_top={
            "data": {"focal_length_multiplier": 1.0},
            "training": {"batching": {"allowed_cameras": [0]}},
        },
    )
    torch.manual_seed(1)
    ref_model = RefEnvironmentModel(config)
    ref_model.eval()
    with torch.no_grad():
        for om in ref_model.object_composer.object_models_coarse:
            om.nerf_model.alpha_head.bias += 1.5

    scene = _repo_scene([background, player], 1, False, False)
    scene = dataclasses.replace(
        scene,
        use_weighted_sampling=False,
        parameter_encoders=(
            ParameterEncoderConfig(kind="static", objects_count=1),
            ParameterEncoderConfig(
                kind="classic",
                objects_count=1,
                translation_range=(((-8.0, 8.0), (-8.0, 8.0), (0.01, 0.01)),),
                rotation_range=(((0.0, 0.0), (0.0, 0.0), (0.0, 0.0)),),
            ),
        ),
        object_encoders=(
            ObjectEncoderConfig(
                kind="v5", input_size=(32, 32),
                style_features=STYLE_FEATURES,
                deformation_features=DEFORMATION_FEATURES,
            ),
            ObjectEncoderConfig(
                kind="v4", input_size=(16, 16),
                style_features=STYLE_FEATURES,
                deformation_features=DEFORMATION_FEATURES,
            ),
        ),
    )
    params, stats = convert_environment_model(
        _torch_state(ref_model), scene, cameras_count=1
    )
    repo_model = EnvironmentModel(scene, focal_length_multiplier=1.0)
    return ref_model, repo_model, {"params": params, "batch_stats": stats}


def _consistency_inputs():
    """Geometry + pose/latent tensors shared by both consistency tests:
    a raised pitched camera over a player standing at the world origin."""
    rng = np.random.default_rng(7)
    batch, T, cams, height, width = 1, 2, 1, 12, 16
    camera_rotations = np.zeros((batch, T, cams, 3), np.float32)
    camera_rotations[..., 0] = -0.6
    camera_translations = np.zeros((batch, T, cams, 3), np.float32)
    camera_translations[..., 1] = 8.0
    camera_translations[..., 2] = 10.0
    focals = np.full((batch, T, cams), 20.0, np.float32)
    object_rotations = np.zeros((batch, T, 2, 3), np.float32)
    object_translations = np.zeros((batch, T, 2, 3), np.float32)
    style = rng.normal(size=(batch, T, 2, STYLE_FEATURES)).astype(np.float32)
    deformation = rng.normal(
        size=(batch, T, 2, DEFORMATION_FEATURES)
    ).astype(np.float32)
    return (batch, T, cams, height, width, camera_rotations,
            camera_translations, focals, object_rotations,
            object_translations, style, deformation)


def _repo_encoding(inputs):
    from playableenvironments_tpu.scene.encoding import SceneEncoding

    (batch, T, cams, height, width, camera_rotations, camera_translations,
     focals, object_rotations, object_translations, style,
     deformation) = inputs
    return SceneEncoding(
        camera_rotations=jnp.asarray(camera_rotations),
        camera_translations=jnp.asarray(camera_translations),
        focals=jnp.asarray(focals),
        object_rotations=jnp.asarray(object_rotations),
        object_translations=jnp.asarray(object_translations),
        object_style=jnp.asarray(style),
        object_deformation=jnp.asarray(deformation),
        object_in_scene=jnp.ones((batch, T, 2), dtype=bool),
    )


def test_pose_consistency_parity(cpu_reference):
    """forward_pose_consistency as a reference oracle
    (environment_model.py:1197-1361). The box-weighted ray sampling is
    random on both sides (torch global RNG vs explicit keys), so the box is
    collapsed to ONE pixel: every drawn sample becomes the same ray on both
    sides and the outputs — flow-matched expected 3D first-surface
    positions in frames t and t+1 — are deterministic and comparable
    elementwise."""
    import torch

    ref_model, repo_model, variables = _consistency_setup(cpu_reference)
    inputs = _consistency_inputs()
    (batch, T, cams, height, width, camera_rotations, camera_translations,
     focals, object_rotations, object_translations, style,
     deformation) = inputs

    # One-pixel box at (row 8, col 8) — on the player as seen by this
    # camera (the base-to-head axis projects to rows 7.5-9.8 at col 8);
    # floor/ceil of the denormalized edges reproduce exactly this pixel on
    # both sides.
    box = np.asarray(
        [8 / width, 8 / height, 9 / width, 9 / height], np.float32
    )
    boxes = np.broadcast_to(box, (batch, T, cams, 1, 4)).copy()
    validity = np.ones((batch, T, cams, 1), bool)

    # Constant flow of exactly (+1 row, -1 col) pixels, normalized: the
    # matched next-frame position lands on another exact pixel center, so
    # the continuous resampling interpolates trivially on both sides.
    flow = np.zeros((batch, T, cams, height, width, 2), np.float32)
    flow[..., 0] = 1.0 / height
    flow[..., 1] = -1.0 / width

    samples = 6
    frames = np.zeros((batch, T), np.int64)
    with torch.no_grad():
        ref_out = ref_model.forward_pose_consistency(
            torch.from_numpy(np.moveaxis(flow, -1, -3)).contiguous(),
            torch.from_numpy(camera_rotations),
            torch.from_numpy(camera_translations),
            torch.from_numpy(focals),
            torch.from_numpy(np.moveaxis(boxes, -2, -1)).contiguous(),
            torch.from_numpy(validity),
            torch.from_numpy(frames),
            torch.from_numpy(frames),
            torch.zeros((batch,), dtype=torch.int64),
            torch.from_numpy(np.moveaxis(style, -2, -1)).contiguous(),
            torch.from_numpy(np.moveaxis(deformation, -2, -1)).contiguous(),
            torch.from_numpy(np.moveaxis(object_rotations, -2, -1)).contiguous(),
            torch.from_numpy(np.moveaxis(object_translations, -2, -1)).contiguous(),
            samples_per_image=samples,
            perturb=False,
        )

    encoding = _repo_encoding(inputs)
    repo_out = repo_model.apply(
        variables,
        encoding,
        jnp.asarray(flow),
        jnp.asarray(boxes),
        jnp.asarray(validity),
        samples,
        perturb=False,
        train=False,
        method=repo_model.forward_pose_consistency,
        rngs={"sampling": jax.random.PRNGKey(0)},
    )

    ref_prev = ref_out["coarse"]["dynamic_object_0"][0][0].numpy()
    ref_next = ref_out["coarse"]["dynamic_object_0"][1][0].numpy()
    repo_prev, repo_next = (
        np.asarray(repo_out["coarse"]["dynamic_object_0"][0]),
        np.asarray(repo_out["coarse"]["dynamic_object_0"][1]),
    )
    # All samples are the same collapsed ray: every row must agree and the
    # two implementations must match.
    np.testing.assert_allclose(
        ref_prev, np.broadcast_to(ref_prev[..., :1, :], ref_prev.shape),
        atol=1e-6, err_msg="reference samples did not collapse",
    )
    np.testing.assert_allclose(
        repo_prev, ref_prev, atol=2e-4, rtol=2e-4, err_msg="previous positions"
    )
    np.testing.assert_allclose(
        repo_next, ref_next, atol=2e-4, rtol=2e-4, err_msg="next positions"
    )
    # Discriminating power: the ray actually hits the player (non-trivial
    # expected position) and the flow moved the matched point.
    assert float(np.abs(ref_prev).max()) > 0.05
    assert float(np.abs(ref_next - ref_prev).max()) > 1e-4


def test_keypoint_consistency_parity(cpu_reference):
    """forward_keypoint_consistency as a reference oracle
    (environment_model.py:1363-1505). Skeleton-edge sampling is random on
    both sides, so all 17 COCO keypoints are COINCIDENT: every sampled
    skeleton point degenerates to the same pixel and the expected 3D
    positions / confidences / opacities are deterministic."""
    import torch

    ref_model, repo_model, variables = _consistency_setup(cpu_reference)
    inputs = _consistency_inputs()
    (batch, T, cams, height, width, camera_rotations, camera_translations,
     focals, object_rotations, object_translations, style,
     deformation) = inputs

    K = 17
    keypoints = np.zeros((batch, T, cams, K, 3, 1), np.float32)
    keypoints[..., 0, :] = 0.72  # row (on the player: rows 7.5-9.8 of 12)
    keypoints[..., 1, :] = 0.5   # col
    keypoints[..., 2, :] = 0.9   # confidence
    keypoints_validity = np.ones((batch, T, cams, 1), bool)
    boxes = np.broadcast_to(
        np.asarray([0.4, 0.3, 0.6, 0.7], np.float32),
        (batch, T, cams, 1, 4),
    ).copy()
    validity = np.ones((batch, T, cams, 1), bool)
    observations = np.zeros((batch, T, cams, height, width, 3), np.float32)
    frames = np.zeros((batch, T), np.int64)
    samples = 8

    with torch.no_grad():
        ref_out = ref_model.forward_keypoint_consistency(
            torch.from_numpy(np.moveaxis(observations, -1, -3)).contiguous(),
            torch.from_numpy(camera_rotations),
            torch.from_numpy(camera_translations),
            torch.from_numpy(focals),
            torch.from_numpy(np.moveaxis(boxes, -2, -1)).contiguous(),
            torch.from_numpy(validity),
            torch.from_numpy(frames),
            torch.from_numpy(frames),
            torch.zeros((batch,), dtype=torch.int64),
            torch.from_numpy(np.moveaxis(style, -2, -1)).contiguous(),
            torch.from_numpy(np.moveaxis(deformation, -2, -1)).contiguous(),
            torch.from_numpy(np.moveaxis(object_rotations, -2, -1)).contiguous(),
            torch.from_numpy(np.moveaxis(object_translations, -2, -1)).contiguous(),
            torch.from_numpy(keypoints),
            torch.from_numpy(keypoints_validity),
            max_samples_per_image=samples,
            perturb=False,
        )

    encoding = _repo_encoding(inputs)
    repo_out = repo_model.apply(
        variables,
        encoding,
        jnp.asarray(keypoints),
        jnp.asarray(keypoints_validity),
        (height, width),
        samples,
        perturb=False,
        train=False,
        method=repo_model.forward_keypoint_consistency,
        rngs={"sampling": jax.random.PRNGKey(0)},
    )

    ref_entry = ref_out["coarse"]["dynamic_object_0"]
    repo_entry = repo_out["coarse"]["dynamic_object_0"]
    names = ("expected positions", "confidence", "opacity",
             "sampled positions")
    for idx, name in enumerate(names):
        ref_value = ref_entry[idx].numpy()
        repo_value = np.asarray(repo_entry[idx])
        np.testing.assert_allclose(
            repo_value, ref_value, atol=2e-4, rtol=2e-4, err_msg=name
        )
    # Discriminating power: confident samples, the ray hits the player.
    assert float(ref_entry[1].numpy().max()) > 0.5
    assert float(ref_entry[2].numpy().max()) > 0.05
