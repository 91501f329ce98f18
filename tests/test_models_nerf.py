"""Tests for encodings, AdaIN layers, radiance fields, and the scene composer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from playableenvironments_tpu.config import (
    NerfMLPConfig,
    ObjectIds,
    ObjectModelConfig,
    ObjectEncoderConfig,
    ParameterEncoderConfig,
    PositionalEncoderConfig,
    RayBenderConfig,
    SceneConfig,
)
from playableenvironments_tpu.models import encoding, layers
from playableenvironments_tpu.models.nerf import AdaInNerfMLP, ObjectRadianceField
from playableenvironments_tpu.render.composer import SceneComposer

UNIT_BOX = ((-1.0, 1.0), (-1.0, 1.0), (-1.0, 1.0))


# --------------------------------------------------------------------------
# Encoding
# --------------------------------------------------------------------------

def test_positional_encoding_values():
    x = jnp.asarray([[0.5, -0.25]])
    out = np.asarray(encoding.positional_encoding(x, octaves=3, append_original=True))
    assert out.shape == (1, 2 + 2 * 3 * 2)
    np.testing.assert_allclose(out[0, :2], [0.5, -0.25], atol=1e-6)
    # First octave block: sin(x), then cos(x) over both dims.
    np.testing.assert_allclose(out[0, 2:4], np.sin([0.5, -0.25]), atol=1e-6)
    np.testing.assert_allclose(out[0, 4:6], np.cos([0.5, -0.25]), atol=1e-6)
    # Second octave: sin(2x).
    np.testing.assert_allclose(out[0, 6:8], np.sin([1.0, -0.5]), atol=1e-6)


def test_encoding_size():
    assert encoding.encoding_size(3, 10, True) == 63
    assert encoding.encoding_size(3, 10, False) == 60
    assert encoding.encoding_size(6, 4, True) == 54


def test_annealing_weights_schedule():
    # At step 0 all octaves are off; at num_steps all are fully on.
    w0 = np.asarray(encoding.annealing_weights(4, 0, 100))
    np.testing.assert_allclose(w0, 0.0, atol=1e-6)
    w_full = np.asarray(encoding.annealing_weights(4, 100, 100))
    np.testing.assert_allclose(w_full, 1.0, atol=1e-6)
    # Midway: lower octaves on, higher off.
    w_mid = np.asarray(encoding.annealing_weights(4, 50, 100))
    assert w_mid[0] > 0.99 and w_mid[-1] < 0.01
    assert np.all(np.diff(w_mid) <= 1e-6)


# --------------------------------------------------------------------------
# Layers
# --------------------------------------------------------------------------

def test_rotation_encode_decode_roundtrip():
    angles = jnp.asarray([[0.3, -2.0, 1.5]])
    encoded = layers.encode_rotation(angles)
    assert encoded.shape == (1, 6)
    decoded = layers.decode_rotation(encoded)
    np.testing.assert_allclose(np.asarray(decoded), np.asarray(angles), atol=1e-5)


def test_gumbel_softmax_hard_is_onehot(key):
    logits = jnp.asarray([[2.0, 0.0, -1.0], [0.0, 3.0, 0.0]])
    sample = layers.gumbel_softmax(key, logits, hard=True)
    s = np.asarray(sample)
    np.testing.assert_allclose(s.sum(-1), 1.0, atol=1e-5)
    assert np.all((np.abs(s - 1.0) < 1e-5).sum(-1) == 1)


def test_gumbel_softmax_gradients_flow(key):
    logits = jnp.zeros((4, 3))

    def loss(lg):
        return jnp.sum(layers.gumbel_softmax(key, lg, hard=True) * jnp.arange(3.0))

    g = jax.grad(loss)(logits)
    assert np.abs(np.asarray(g)).sum() > 0  # straight-through gradient exists


def test_masked_batch_norm_ignores_masked(key):
    bn = layers.MaskedBatchNorm(features=4)
    x = jax.random.normal(key, (32, 4))
    mask = jnp.asarray([True] * 16 + [False] * 16)
    variables = bn.init(key, x, mask)
    y, updated = bn.apply(variables, x, mask, mutable=["batch_stats"])
    # Normalized stats over the first 16 rows only.
    y_np = np.asarray(y)[:16]
    np.testing.assert_allclose(y_np.mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(y_np.std(0), 1.0, atol=1e-2)
    # Running stats moved toward the masked mean.
    ra_mean = np.asarray(updated["batch_stats"]["mean"])
    expected = 0.1 * np.asarray(x[:16]).mean(0)
    np.testing.assert_allclose(ra_mean, expected, atol=1e-5)


def test_adain_scale_bias_init_is_identity_modulation(key):
    """At init the affine outputs scale=1, bias=0 -> output == normalized input."""
    adain = layers.AffineTransformAdaIn(features=8, style_features=4)
    x = jax.random.normal(key, (16, 8))
    style = jnp.zeros((16, 4))
    variables = adain.init(key, x, style)
    y = adain.apply(variables, x, style, mutable=["batch_stats"])[0]
    norm = layers.MaskedBatchNorm(features=8)
    nv = norm.init(key, x)
    y_norm = norm.apply(nv, x, mutable=["batch_stats"])[0]
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_norm), atol=1e-5)


# --------------------------------------------------------------------------
# Radiance fields
# --------------------------------------------------------------------------

def make_object_cfg(**kw):
    defaults = dict(
        name="obj",
        bounding_box=UNIT_BOX,
        positions_count_coarse=8,
        empty_space_alpha=-3.5,
        z_near_min=0.01,
        z_far_max=100.0,
        nerf=NerfMLPConfig(layers_width=32, backbone_layers_count=3,
                           output_features=6, skip_layer_idx=1,
                           position_encoder=PositionalEncoderConfig(octaves=4)),
        bender=RayBenderConfig(kind="zeroed"),
        style_features=8,
        deformation_features=4,
    )
    defaults.update(kw)
    return ObjectModelConfig(**defaults)


def test_object_field_masks_outside_bbox(key):
    cfg = make_object_cfg()
    field = ObjectRadianceField(cfg)
    # Two rays x 4 samples: first ray inside the box, second far outside.
    positions = jnp.stack([
        jnp.zeros((4, 3)) + 0.1,
        jnp.zeros((4, 3)) + 5.0,
    ])[None]  # (1, 2, 4, 3)
    origins = jnp.zeros((1, 2, 3))
    directions = jnp.ones((1, 2, 3))
    style = jnp.ones((1, 8))
    deformation = jnp.ones((1, 4))
    variables = field.init(key, positions, origins, directions, style, deformation)
    feats, alphas, disp, div = field.apply(
        variables, positions, origins, directions, style, deformation,
        mutable=["batch_stats"],
    )[0]
    assert feats.shape == (1, 2, 4, 6)
    np.testing.assert_allclose(np.asarray(alphas[0, 1]), -3.5)  # outside
    np.testing.assert_allclose(np.asarray(feats[0, 1]), 0.0)
    assert np.all(np.asarray(alphas[0, 0]) != -3.5)


def test_object_field_bfloat16_compute_close_to_f32(key):
    """compute_dtype=bfloat16 shares f32 params, returns f32 outputs close
    to the f32 path, and keeps gradients finite."""
    import dataclasses

    cfg32 = make_object_cfg()
    cfg16 = dataclasses.replace(
        cfg32,
        nerf=dataclasses.replace(cfg32.nerf, compute_dtype="bfloat16"),
        bender=dataclasses.replace(cfg32.bender, compute_dtype="bfloat16"),
    )
    f32, f16 = ObjectRadianceField(cfg32), ObjectRadianceField(cfg16)
    positions = jax.random.uniform(
        jax.random.PRNGKey(1), (1, 3, 4, 3), minval=-0.9, maxval=0.9
    )
    origins = jnp.zeros((1, 3, 3))
    directions = jnp.ones((1, 3, 3))
    style = jnp.ones((1, 8)) * 0.3
    deformation = jnp.ones((1, 4)) * 0.3
    variables = f32.init(key, positions, origins, directions, style, deformation)

    out32 = f32.apply(variables, positions, origins, directions, style,
                      deformation, mutable=["batch_stats"])[0]
    out16 = f16.apply(variables, positions, origins, directions, style,
                      deformation, mutable=["batch_stats"])[0]
    assert out16[0].dtype == jnp.float32 and out16[1].dtype == jnp.float32
    scale = float(jnp.max(jnp.abs(out32[0]))) + 1e-9
    assert float(jnp.max(jnp.abs(out32[0] - out16[0]))) / scale < 0.05

    def loss(v):
        feats, alphas, _, _ = f16.apply(
            v, positions, origins, directions, style, deformation,
            mutable=["batch_stats"],
        )[0]
        return jnp.sum(feats ** 2) + jnp.sum(alphas ** 2)

    grads = jax.grad(loss)(variables)
    leaves = jax.tree.leaves(grads)
    assert all(g.dtype == jnp.float32 for g in leaves)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)


def test_object_field_positional_bender_near_zero_and_clamped(key):
    cfg = make_object_cfg(
        bender=RayBenderConfig(
            kind="positional", layers_width=16, layers_count=2, skip_layer_idx=1,
            position_encoder=PositionalEncoderConfig(octaves=2, num_steps=100),
        )
    )
    field = ObjectRadianceField(cfg)
    positions = jax.random.uniform(key, (1, 3, 5, 3), minval=-0.9, maxval=0.9)
    origins = jnp.zeros((1, 3, 3))
    directions = jnp.ones((1, 3, 3))
    style = jnp.ones((1, 8))
    deformation = jnp.ones((1, 4))
    variables = field.init(key, positions, origins, directions, style, deformation)
    _, _, disp, _ = field.apply(
        variables, positions, origins, directions, style, deformation,
        step=50, mutable=["batch_stats"],
    )[0]
    disp = np.asarray(disp)
    assert np.abs(disp).max() < 1e-3  # near-zero init
    bent = np.asarray(positions) + disp
    assert np.all(bent >= -1.0 - 1e-5) and np.all(bent <= 1.0 + 1e-5)


def test_object_field_canonical_pose_zeroes_displacements(key):
    cfg = make_object_cfg(
        bender=RayBenderConfig(
            kind="positional", layers_width=16, layers_count=2, skip_layer_idx=1,
            position_encoder=PositionalEncoderConfig(octaves=2, num_steps=100),
        )
    )
    field = ObjectRadianceField(cfg)
    positions = jnp.zeros((1, 2, 3, 3)) + 0.2
    origins, directions = jnp.zeros((1, 2, 3)), jnp.ones((1, 2, 3))
    style, deformation = jnp.ones((1, 8)), jnp.ones((1, 4))
    variables = field.init(key, positions, origins, directions, style, deformation)
    _, _, disp, _ = field.apply(
        variables, positions, origins, directions, style, deformation,
        canonical_pose=True, mutable=["batch_stats"],
    )[0]
    np.testing.assert_allclose(np.asarray(disp), 0.0)


# --------------------------------------------------------------------------
# ObjectIds
# --------------------------------------------------------------------------

def make_scene(objects_counts=(1, 2), static_models=1, **kw):
    models = tuple(make_object_cfg(name=f"m{i}") for i in range(len(objects_counts)))
    params = tuple(
        ParameterEncoderConfig(objects_count=c) for c in objects_counts
    )
    encoders = tuple(ObjectEncoderConfig() for _ in objects_counts)
    return SceneConfig(
        object_models=models,
        parameter_encoders=params,
        object_encoders=encoders,
        static_object_models=static_models,
        **kw,
    )


def test_object_ids_mapping():
    ids = ObjectIds(make_scene(objects_counts=(1, 2), static_models=1))
    assert ids.objects_count == 3
    assert ids.static_objects_count == 1
    assert ids.dynamic_objects_count == 2
    assert ids.model_idx_by_object_idx(0) == 0
    assert ids.model_idx_by_object_idx(1) == 1
    assert ids.model_idx_by_object_idx(2) == 1
    assert ids.object_idx_by_dynamic_object_idx(0) == 1
    assert ids.dynamic_object_idx_by_object_idx(2) == 1
    assert ids.animation_model_idx_by_dynamic_object_idx(1) == 0


def test_scene_config_validates_alignment():
    with pytest.raises(ValueError):
        SceneConfig(
            object_models=(make_object_cfg(),),
            parameter_encoders=(),
            object_encoders=(),
        )


# --------------------------------------------------------------------------
# SceneComposer
# --------------------------------------------------------------------------

def test_composer_end_to_end_shapes_and_sharing(key):
    scene = make_scene(objects_counts=(1, 2), static_models=1)
    composer = SceneComposer(scene)
    n_obj, rays = 3, 6
    origins = jnp.zeros((2, 3)).at[:, 2].set(3.0)
    directions = jnp.asarray([[0.0, 0.0, -1.0]] * rays)[None].repeat(2, 0)
    normals = jnp.asarray([0.0, 0.0, -1.0])[None].repeat(2, 0)
    w2o = jnp.eye(4)[None, None].repeat(2, 0).repeat(n_obj, 1)
    style = jnp.ones((2, n_obj, 8))
    deformation = jnp.ones((2, n_obj, 4))
    in_scene = jnp.ones((2, n_obj), dtype=bool)

    variables = composer.init(
        key, origins, directions, normals, w2o, style, deformation, in_scene
    )
    # Parameter sharing: one field per MODEL, not per object.
    assert set(variables["params"].keys()) == {"object_model_0", "object_model_1"}

    out = composer.apply(
        variables, origins, directions, normals, w2o, style, deformation,
        in_scene, mutable=["batch_stats"],
    )[0]
    total_samples = 8 * 3  # three objects x 8 coarse samples
    assert out["coarse"]["global"]["integrated_features"].shape == (2, rays, 6)
    assert out["coarse"]["global"]["weights"].shape == (2, rays, total_samples)
    for i in range(3):
        assert out["coarse"][f"object_{i}"]["opacity"].shape == (2, rays)


def test_composer_object_not_in_scene_is_transparent(key):
    scene = make_scene(objects_counts=(1,), static_models=0)
    composer = SceneComposer(scene)
    origins = jnp.zeros((1, 3)).at[:, 2].set(3.0)
    directions = jnp.asarray([[[0.0, 0.0, -1.0]]])
    normals = jnp.asarray([[0.0, 0.0, -1.0]])
    w2o = jnp.eye(4)[None, None]
    style = jnp.ones((1, 1, 8))
    deformation = jnp.ones((1, 1, 4))

    variables = composer.init(
        key, origins, directions, normals, w2o, style, deformation,
        jnp.ones((1, 1), dtype=bool),
    )
    out_present = composer.apply(
        variables, origins, directions, normals, w2o, style, deformation,
        jnp.ones((1, 1), dtype=bool), mutable=["batch_stats"],
    )[0]
    out_absent = composer.apply(
        variables, origins, directions, normals, w2o, style, deformation,
        jnp.zeros((1, 1), dtype=bool), mutable=["batch_stats"],
    )[0]
    # A ray through the box sees some opacity when present, none when absent.
    assert float(out_present["coarse"]["global"]["opacity"][0, 0]) > 0.0
    np.testing.assert_allclose(
        np.asarray(out_absent["coarse"]["global"]["opacity"]), 0.0, atol=1e-5
    )


def test_composer_perturb_uses_rngs(key):
    scene = make_scene(objects_counts=(1,), static_models=0)
    composer = SceneComposer(scene)
    origins = jnp.zeros((1, 3)).at[:, 2].set(3.0)
    directions = jnp.asarray([[[0.0, 0.0, -1.0]]])
    normals = jnp.asarray([[0.0, 0.0, -1.0]])
    w2o = jnp.eye(4)[None, None]
    style = jnp.ones((1, 1, 8))
    deformation = jnp.ones((1, 1, 4))
    in_scene = jnp.ones((1, 1), dtype=bool)

    variables = composer.init(
        key, origins, directions, normals, w2o, style, deformation, in_scene
    )
    k1, k2 = jax.random.split(key)
    outs = [
        composer.apply(
            variables, origins, directions, normals, w2o, style, deformation,
            in_scene, True, mutable=["batch_stats"],
            rngs={"sampling": k, "alpha_noise": k},
        )[0]
        for k in (k1, k2)
    ]
    d1 = np.asarray(outs[0]["coarse"]["global"]["depth"])
    d2 = np.asarray(outs[1]["coarse"]["global"]["depth"])
    assert not np.allclose(d1, d2)  # different keys -> different stratified jitter
