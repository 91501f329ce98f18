"""End-to-end tests for the EnvironmentModel orchestrator."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from playableenvironments_tpu.config import (
    NerfMLPConfig,
    ObjectEncoderConfig,
    ObjectModelConfig,
    ParameterEncoderConfig,
    PositionalEncoderConfig,
    RayBenderConfig,
    SceneConfig,
)
from playableenvironments_tpu.render.environment_model import (
    CameraParametersStorage,
    EnvironmentModel,
)
from playableenvironments_tpu.scene.encoding import SceneEncoding

B, T, C, H, W = 2, 2, 1, 16, 24
N_OBJ = 2  # 1 static background + 1 dynamic player


def tiny_scene():
    background = ObjectModelConfig(
        name="background",
        bounding_box=((-10.0, 10.0), (-10.0, 10.0), (-1.0, 0.0)),
        positions_count_coarse=4,
        z_near_min=0.1,
        z_far_max=50.0,
        nerf=NerfMLPConfig(
            layers_width=16, backbone_layers_count=2, output_features=3,
            skip_layer_idx=1, position_encoder=PositionalEncoderConfig(octaves=2),
        ),
        bender=RayBenderConfig(kind="zeroed"),
        style_features=8,
        deformation_features=4,
    )
    player = ObjectModelConfig(
        name="player",
        bounding_box=((-0.5, 0.5), (-0.5, 0.5), (0.0, 2.0)),
        positions_count_coarse=8,
        z_near_min=0.1,
        z_far_max=50.0,
        nerf=NerfMLPConfig(
            layers_width=16, backbone_layers_count=2, output_features=3,
            skip_layer_idx=1, position_encoder=PositionalEncoderConfig(octaves=2),
        ),
        bender=RayBenderConfig(
            kind="positional", layers_width=8, layers_count=2, skip_layer_idx=1,
            position_encoder=PositionalEncoderConfig(octaves=2, num_steps=100),
        ),
        style_features=8,
        deformation_features=4,
    )
    return SceneConfig(
        object_models=(background, player),
        parameter_encoders=(
            ParameterEncoderConfig(kind="static", objects_count=1),
            ParameterEncoderConfig(
                kind="classic",
                objects_count=1,
                translation_range=((( -8.0, 8.0), (-8.0, 8.0), (0.01, 0.01)),),
                rotation_range=(((0.0, 0.0), (0.0, 0.0), (0.0, 0.0)),),
                zero_axis=2,
            ),
        ),
        object_encoders=(
            ObjectEncoderConfig(kind="v5", input_size=(8, 16), style_features=8,
                                deformation_features=4),
            ObjectEncoderConfig(kind="v4", input_size=(8, 8), style_features=8,
                                deformation_features=4),
        ),
        static_object_models=1,
        apply_activation=True,
        sampling_weights=(0.6, 0.4),
    )


def batch_inputs():
    observations = jnp.full((B, T, C, H, W, 3), 0.5)
    camera_rotations = jnp.zeros((B, T, C, 3)).at[..., 0].set(-0.6)
    camera_translations = jnp.zeros((B, T, C, 3)).at[..., 1].set(8.0).at[..., 2].set(10.0)
    focals = jnp.full((B, T, C), 30.0)
    boxes = jnp.broadcast_to(jnp.asarray([0.4, 0.3, 0.6, 0.7]), (B, T, C, 1, 4))
    validity = jnp.ones((B, T, C, 1), dtype=bool)
    frame_indexes = jnp.zeros((B, T), dtype=jnp.int32)
    return (observations, camera_rotations, camera_translations, focals,
            boxes, validity, frame_indexes)


RNGS = {
    "params": jax.random.PRNGKey(0),
    "ray_sampling": jax.random.PRNGKey(1),
    "sampling": jax.random.PRNGKey(2),
    "alpha_noise": jax.random.PRNGKey(3),
    "style_shuffle": jax.random.PRNGKey(4),
}


@pytest.fixture(scope="module")
def model_and_vars():
    model = EnvironmentModel(tiny_scene(), focal_length_multiplier=1.0)
    variables = model.init(RNGS, *batch_inputs(), samples_per_image=12)
    return model, variables


def test_forward_from_observations_shapes(model_and_vars):
    model, variables = model_and_vars
    out, _ = model.apply(
        variables, *batch_inputs(), samples_per_image=12, perturb=True,
        rngs=RNGS, mutable=["batch_stats"],
    )
    n = 12
    assert out["coarse"]["global"]["integrated_features"].shape == (B, T, C, n, 3)
    assert out["observations"].shape == (B, T, C, n, 3)
    assert out["positions"].shape == (B, T, C, n, 2)
    assert out["ray_object_distances"].shape == (B, T, C, n, N_OBJ)
    assert out["reconstructed_bounding_boxes"].shape == (B, T, C, N_OBJ, 4)
    enc = out["scene_encoding"]
    assert isinstance(enc, SceneEncoding)
    assert enc.object_rotations.shape == (B, T, N_OBJ, 3)
    assert enc.object_style.shape == (B, T, N_OBJ, 8)
    assert enc.object_in_scene.shape == (B, T, N_OBJ)
    # apply_activation -> features are sigmoid outputs in [0, 1]
    feats = np.asarray(out["coarse"]["global"]["integrated_features"])
    assert feats.min() >= 0.0 and feats.max() <= 1.0


def test_scene_encoding_only(model_and_vars):
    model, variables = model_and_vars
    (enc, aux), _ = model.apply(
        variables, *batch_inputs(), train=False,
        method=EnvironmentModel.compute_scene_encoding,
        rngs=RNGS, mutable=["batch_stats"],
    )
    # Static object pose at range midpoints (zeros); player on the ground.
    np.testing.assert_allclose(np.asarray(enc.object_rotations[..., 0, :]), 0.0)
    player_trans = np.asarray(enc.object_translations[..., 1, :])
    np.testing.assert_allclose(player_trans[..., 2], 0.01, atol=1e-5)
    assert np.all(np.asarray(enc.object_in_scene))
    assert aux["reconstructed_bounding_boxes"].shape == (B, T, C, N_OBJ, 4)
    boxes = np.asarray(aux["reconstructed_bounding_boxes"])
    assert boxes.min() >= 0.0 and boxes.max() <= 1.0


def test_render_frame_from_scene_encoding(model_and_vars):
    model, variables = model_and_vars
    (enc, _), _ = model.apply(
        variables, *batch_inputs(), train=False,
        method=EnvironmentModel.compute_scene_encoding,
        rngs=RNGS, mutable=["batch_stats"],
    )
    out, _ = model.apply(
        variables, enc, (H, W), patch_strides=[4], train=False,
        method=EnvironmentModel.render_frame_from_scene_encoding,
        rngs=RNGS, mutable=["batch_stats"],
    )
    n = (H // 4) * (W // 4)
    assert out["coarse"]["global"]["integrated_features"].shape == (B, T, C, n, 3)


def test_render_frame_tiled_matches_untiled(model_and_vars):
    model, variables = model_and_vars
    (enc, _), _ = model.apply(
        variables, *batch_inputs(), train=False,
        method=EnvironmentModel.compute_scene_encoding,
        rngs=RNGS, mutable=["batch_stats"],
    )
    kwargs = dict(
        image_size=(H, W), patch_strides=[4], train=False,
        method=EnvironmentModel.render_frame_from_scene_encoding,
        rngs=RNGS, mutable=["batch_stats"],
    )
    out_full, _ = model.apply(variables, enc, **kwargs)
    out_tiled, _ = model.apply(variables, enc, ray_tile=8, **kwargs)
    np.testing.assert_allclose(
        np.asarray(out_full["coarse"]["global"]["integrated_features"]),
        np.asarray(out_tiled["coarse"]["global"]["integrated_features"]),
        atol=1e-5,
    )


def test_patch_sampling_path(model_and_vars):
    model, variables = model_and_vars
    out, _ = model.apply(
        variables, *batch_inputs(), samples_per_image=144, patch_size=4,
        patch_strides=[2, 4], perturb=True, shuffle_style=True,
        rngs=RNGS, mutable=["batch_stats"],
    )
    n = 4 * 4 + 2 * 2  # strided patch sizes (4, 2)
    assert out["coarse"]["global"]["integrated_features"].shape == (B, T, C, n, 3)


def test_jit_forward(model_and_vars):
    model, variables = model_and_vars

    @functools.partial(jax.jit, static_argnames=("spi",))
    def run(v, inputs, spi):
        return model.apply(
            v, *inputs, samples_per_image=spi, perturb=True,
            rngs=RNGS, mutable=["batch_stats"],
        )[0]["coarse"]["global"]["integrated_features"]

    out = run(variables, batch_inputs(), 8)
    assert np.isfinite(np.asarray(out)).all()


def test_camera_parameters_storage():
    storage = CameraParametersStorage(memory_size=10, cameras_count=2)
    idx = jnp.asarray([[0, 3], [5, 9]])
    variables = storage.init(jax.random.PRNGKey(0), idx)
    rot, trans, focal = storage.apply(variables, idx, True)
    assert rot.shape == (2, 2, 2, 3)
    assert trans.shape == (2, 2, 2, 3)
    assert focal.shape == (2, 2, 2)
    np.testing.assert_allclose(np.asarray(rot), 0.0)  # zero-init
    # Eval mode returns zeros even with nonzero parameters.
    variables = jax.tree.map(lambda x: x + 1.0, variables)
    rot_eval, trans_eval, _ = storage.apply(variables, idx, False)
    np.testing.assert_allclose(np.asarray(rot_eval), 0.0)
    rot_tr, trans_tr, focal_tr = storage.apply(variables, idx, True)
    np.testing.assert_allclose(np.asarray(rot_tr), 1.0)
    np.testing.assert_allclose(np.asarray(trans_tr), 10.0)
    np.testing.assert_allclose(np.asarray(focal_tr), 1000.0)


def test_forward_pose_consistency(model_and_vars):
    """Zero optical flow + a static scene: previous and next expected
    positions must coincide (same rays, same geometry)."""
    model, variables = model_and_vars
    (observations, camera_rotations, camera_translations, focals, boxes,
     validity, frame_indexes) = batch_inputs()
    (encoding, _), _ = model.apply(
        variables, observations, camera_rotations, camera_translations,
        focals, boxes, validity, frame_indexes, train=False,
        method=EnvironmentModel.compute_scene_encoding,
        rngs=RNGS, mutable=["batch_stats"],
    )
    flow = jnp.zeros((B, T, C, H, W, 2))
    out, _ = model.apply(
        variables, encoding, flow, boxes, validity, 6,
        method=EnvironmentModel.forward_pose_consistency,
        rngs=RNGS, mutable=["batch_stats"],
    )
    prev, nxt, pair_valid = out["coarse"]["dynamic_object_0"]
    assert prev.shape == (B, T - 1, C, 6, 3)
    assert nxt.shape == (B, T - 1, C, 6, 3)
    assert pair_valid.shape == (B, T - 1, C)
    # Same encoding at both steps + zero flow -> identical expected points.
    np.testing.assert_allclose(np.asarray(prev), np.asarray(nxt), atol=1e-4)

    from playableenvironments_tpu.train import losses as L

    loss = L.pose_consistency_loss(prev, nxt, pair_valid)
    assert float(loss) < 1e-6


def test_forward_keypoint_consistency(model_and_vars):
    model, variables = model_and_vars
    (observations, camera_rotations, camera_translations, focals, boxes,
     validity, frame_indexes) = batch_inputs()
    (encoding, _), _ = model.apply(
        variables, observations, camera_rotations, camera_translations,
        focals, boxes, validity, frame_indexes, train=False,
        method=EnvironmentModel.compute_scene_encoding,
        rngs=RNGS, mutable=["batch_stats"],
    )
    kp = jnp.concatenate(
        [
            jnp.full((B, T, C, 17, 1, 1), 0.5),
            jnp.full((B, T, C, 17, 1, 1), 0.5),
            jnp.ones((B, T, C, 17, 1, 1)),  # confidence
        ],
        axis=-2,
    )
    kp_validity = jnp.ones((B, T, C, 1), dtype=bool)
    out, _ = model.apply(
        variables, encoding, kp, kp_validity, (H, W), 8,
        method=EnvironmentModel.forward_keypoint_consistency,
        rngs=RNGS, mutable=["batch_stats"],
    )
    expected, confidence, opacity, positions = out["coarse"]["dynamic_object_0"]
    assert expected.shape == (B, T, C, 8, 3)
    assert confidence.shape == (B, T, C, 8)
    assert opacity.shape == (B, T, C, 8)
    assert positions.shape == (B, T, C, 8, 2)
    # All keypoints identical at (0.5, 0.5) -> every sampled position is 0.5.
    np.testing.assert_allclose(np.asarray(positions), 0.5, atol=1e-6)
    # Same encoding across observations -> consistency loss is ~0.
    from playableenvironments_tpu.train import losses as L

    loss = L.keypoint_consistency_loss(expected, confidence, 0.1)
    assert float(loss) < 1e-6
    op_loss = L.keypoint_opacity_loss(opacity, confidence, 0.1)
    assert np.isfinite(float(op_loss))


def test_published_configs_build():
    """configs/tennis.yaml and configs/minecraft.yaml (the published
    experiments translated) parse into scenes, models, and trainers."""
    import os

    import yaml

    from playableenvironments_tpu.cli.common import (
        build_environment_model,
        synthesis_training_config,
    )
    from playableenvironments_tpu.train.trainer_synthesis import SynthesisTrainer

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name, objects, static in (("tennis.yaml", 4, 2), ("minecraft.yaml", 3, 2)):
        cfg = yaml.safe_load(open(os.path.join(repo, "configs", name)))
        model = build_environment_model(cfg)
        scene = model.scene
        assert len(scene.object_models) == objects
        assert scene.static_object_models == static
        assert scene.autoencoder is not None
        assert len(scene.animation_models) == 2
        trainer = SynthesisTrainer(model, synthesis_training_config(cfg))
        assert trainer.cfg.samples_per_image in (144, 1600)
        from playableenvironments_tpu.config import ObjectIds

        ids = ObjectIds(scene)
        assert ids.objects_count == 4  # both datasets: 2 static + 2 players
        if name == "minecraft.yaml":
            assert scene.fix_object_overlaps
            assert scene.object_models[1].nerf.kind == "skybox"
            assert scene.parameter_encoders[2].kind == "learned_v4"
            # ONE player model serves BOTH player objects (objects_count: 2).
            assert scene.parameter_encoders[2].objects_count == 2
            assert ids.model_idx_by_object_idx(3) == 2
            assert scene.parameter_encoders[2].expansion_rows == 2.8
            assert scene.object_encoders[2].expansion_cols == 2.0


def test_minecraft_structure_forward():
    """A shrunken minecraft.yaml scene (skybox + shared two-object player
    model + learned_v4 pose encoder + overlap fix) runs end-to-end."""
    import dataclasses
    import os

    import yaml

    from playableenvironments_tpu.cli.common import build_environment_model

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = yaml.safe_load(open(os.path.join(repo, "configs", "minecraft.yaml")))
    model = build_environment_model(cfg)
    scene = model.scene

    def shrink_pe(pe):
        return dataclasses.replace(pe, octaves=min(pe.octaves, 3))

    def shrink_om(om):
        return dataclasses.replace(
            om,
            positions_count_coarse=min(om.positions_count_coarse, 4),
            ray_compaction=1.0,
            style_features=8,
            deformation_features=4,
            nerf=dataclasses.replace(
                om.nerf, layers_width=16, backbone_layers_count=2,
                output_features=6, skip_layer_idx=1,
                position_encoder=shrink_pe(om.nerf.position_encoder),
            ),
            bender=dataclasses.replace(
                om.bender, layers_width=8, layers_count=2, skip_layer_idx=1,
                position_encoder=shrink_pe(om.bender.position_encoder),
            ),
        )

    small = dataclasses.replace(
        scene,
        autoencoder=None,
        apply_activation=True,
        object_models=tuple(shrink_om(om) for om in scene.object_models),
        object_encoders=tuple(
            dataclasses.replace(oe, input_size=(8, 16), style_features=8,
                                deformation_features=4)
            for oe in scene.object_encoders
        ),
    )
    from playableenvironments_tpu.render.environment_model import EnvironmentModel

    m = EnvironmentModel(small, focal_length_multiplier=1.0)
    observations = jnp.full((1, 2, 1, 16, 24, 3), 0.5)
    cam_rot = jnp.zeros((1, 2, 1, 3))
    cam_trans = jnp.zeros((1, 2, 1, 3)).at[..., 1].set(1.0)
    focals = jnp.full((1, 2, 1), 30.0)
    boxes = jnp.broadcast_to(
        jnp.asarray([[0.3, 0.4, 0.4, 0.7], [0.6, 0.4, 0.7, 0.7]]),
        (1, 2, 1, 2, 4),
    )
    validity = jnp.ones((1, 2, 1, 2), bool)
    frames = jnp.zeros((1, 2), jnp.int32)
    rngs = {k: jax.random.PRNGKey(i) for i, k in enumerate(
        ("params", "ray_sampling", "sampling", "alpha_noise", "style_shuffle"))}
    variables = jax.jit(
        lambda r: m.init(r, observations, cam_rot, cam_trans, focals,
                         boxes, validity, frames, samples_per_image=8)
    )(rngs)
    out, _ = m.apply(
        variables, observations, cam_rot, cam_trans, focals, boxes, validity,
        frames, samples_per_image=8, train=True,
        rngs={k: v for k, v in rngs.items() if k != "params"},
        mutable=["batch_stats"],
    )
    feats = out["coarse"]["global"]["integrated_features"]
    assert feats.shape[-1] == 6
    assert bool(jnp.all(jnp.isfinite(feats)))


def test_scene_level_separate_fine_builds_fine_instances():
    """`SceneConfig.separate_fine` plumbs through EnvironmentModel: the
    composer builds independent fine networks (reference semantics —
    object_composer.py:26-29 always instantiates separate fine modules) and
    reference-format configs with use_fine imply it."""
    import dataclasses

    from playableenvironments_tpu.config import scene_from_dict

    # Reference-format dict with use_fine -> separate_fine implied.
    model_d = {
        "object_models": [
            {
                "bounding_box": [[-2.0, 2.0], [-2.0, 2.0], [-1.0, 0.0]],
                "positions_count_coarse": 4,
                "positions_count_fine": 3,
                "use_fine": True,
                "z_near_min": 0.1,
                "z_far_max": 20.0,
                "style_features": 8,
                "deformation_features": 4,
                "nerf_model": {
                    "layers_width": 16,
                    "backbone_layers_count": 2,
                    "output_features": 3,
                    "skip_layer_idx": 1,
                    "position_encoder": {"octaves": 2},
                },
                "ray_bender_model": {
                    "architecture": "model.nerf_models.zeroed_ray_bender_model"
                },
            }
        ],
        "object_parameters_encoder": [{"objects_count": 1}],
        "object_encoders": [{"input_size": [8, 8], "style_features": 8,
                             "deformation_features": 4}],
        "static_object_models": 1,
        "apply_activation": True,
        "sampling_weights": [1.0],
    }
    parsed = scene_from_dict(model_d)
    assert parsed.separate_fine is True
    assert (
        scene_from_dict(dict(model_d, separate_fine=False)).separate_fine
        is False
    )

    # EnvironmentModel init grows the independent fine parameters.
    scene = tiny_scene()
    scene = dataclasses.replace(
        scene,
        separate_fine=True,
        object_models=tuple(
            dataclasses.replace(om, use_fine=True, positions_count_fine=3)
            for om in scene.object_models
        ),
    )
    model = EnvironmentModel(scene, focal_length_multiplier=1.0)
    obs, cam_rot, cam_trans, focals, boxes, validity, frames = batch_inputs()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "alpha_noise": jax.random.PRNGKey(2)},
        obs, cam_rot, cam_trans, focals, boxes, validity, frames,
        samples_per_image=8,
    )
    composer_params = variables["params"]["composer"]
    assert "object_model_fine_0" in composer_params
    assert "object_model_fine_1" in composer_params
