"""Tests for the multiresolution VAE and the backpropagated-decoder path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from playableenvironments_tpu.config import (
    AutoencoderConfig,
    NerfMLPConfig,
    ObjectEncoderConfig,
    ObjectModelConfig,
    ParameterEncoderConfig,
    PositionalEncoderConfig,
    RayBenderConfig,
    SceneConfig,
)
from playableenvironments_tpu.models.autoencoder import (
    MultiresAutoencoder,
    autoencoder_strides,
    features_count_by_layer,
)
from playableenvironments_tpu.render.environment_model import EnvironmentModel
from playableenvironments_tpu.train.trainer_autoencoder import (
    AutoencoderTrainer,
    AutoencoderTrainingConfig,
)
from playableenvironments_tpu.train.trainer_synthesis import (
    LossWeights,
    SynthesisTrainer,
    SynthesisTrainingConfig,
)

AE_CFG = AutoencoderConfig(
    variant="v8", input_features=3, bottleneck_features=32,
    bottleneck_blocks=1, downsampling_layers_count=(2, 1),
)


def test_feature_bookkeeping():
    assert features_count_by_layer(AE_CFG) == [16, 32]
    assert autoencoder_strides(AE_CFG) == [4, 8]
    # Published tennis config: 128 bottleneck, (2, 1) -> [64, 128], strides [4, 8].
    tennis = AutoencoderConfig(bottleneck_features=128, downsampling_layers_count=(2, 1))
    assert features_count_by_layer(tennis) == [64, 128]
    assert sum(features_count_by_layer(tennis)) == 192  # == NeRF output_features


def test_autoencoder_roundtrip_shapes(key):
    model = MultiresAutoencoder(AE_CFG)
    images = jax.random.uniform(key, (2, 32, 48, 3))
    variables = model.init({"params": key}, images, sample_key=key)
    out, _ = model.apply(
        variables, images, sample_key=key, mutable=["batch_stats"]
    )
    assert out["reconstructed_observations"].shape == (2, 32, 48, 3)
    encoded = out["encoded_observations"]
    assert len(encoded) == 2
    assert encoded[0].shape == (2, 8, 12, 2 * 16)  # H/4, mean+logvar
    assert encoded[1].shape == (2, 4, 6, 2 * 32)  # H/8
    rec = np.asarray(out["reconstructed_observations"])
    assert rec.min() >= 0.0 and rec.max() <= 1.0  # sigmoid output


def test_autoencoder_v9_variant(key):
    cfg = AutoencoderConfig(
        variant="v9", bottleneck_features=32, bottleneck_blocks=1,
        downsampling_layers_count=(3,),
    )
    model = MultiresAutoencoder(cfg)
    images = jax.random.uniform(key, (1, 32, 32, 3))
    variables = model.init({"params": key}, images, sample_key=key)
    out, _ = model.apply(variables, images, sample_key=key, mutable=["batch_stats"])
    assert out["reconstructed_observations"].shape == (1, 32, 32, 3)
    # Deep variant has the extra mid-set residual blocks.
    assert any("mid_res" in k for k in variables["params"]["encoder"])


def test_decoder_from_latents(key):
    model = MultiresAutoencoder(AE_CFG)
    images = jax.random.uniform(key, (2, 32, 48, 3))
    variables = model.init({"params": key}, images, sample_key=key)
    latents = [
        jax.random.normal(key, (2, 8, 12, 16)),
        jax.random.normal(key, (2, 4, 6, 32)),
    ]
    decoded, _ = model.apply(
        variables, latents, method=MultiresAutoencoder.decode,
        mutable=["batch_stats"],
    )
    assert decoded.shape == (2, 32, 48, 3)


def test_autoencoder_trainer_loss_decreases(key):
    trainer = AutoencoderTrainer(
        AE_CFG, AutoencoderTrainingConfig(learning_rate=1e-3, kl_lambda=1e-6)
    )
    images = jax.random.uniform(key, (4, 16, 16, 3))
    state = trainer.init_state(key, images)
    step = jax.jit(trainer.train_step)
    first, last = None, None
    for i in range(10):
        state, metrics = step(state, images, jax.random.PRNGKey(i))
        if first is None:
            first = float(metrics["reconstruction_loss"])
        last = float(metrics["reconstruction_loss"])
    assert np.isfinite(last) and last < first


def test_autoencoder_trainer_perceptual_term(key):
    """perceptual_lambda adds a VGG feature-distance term to the loss
    (autoencoder_trainer.py:57-68's ParallelPerceptualLoss member)."""
    trainer = AutoencoderTrainer(
        AE_CFG,
        AutoencoderTrainingConfig(
            learning_rate=1e-3, kl_lambda=1e-6, perceptual_lambda=0.1
        ),
    )
    assert trainer.vgg_variables is not None
    images = jax.random.uniform(key, (2, 16, 16, 3))
    state = trainer.init_state(key, images)
    state, metrics = jax.jit(trainer.train_step)(
        state, images, jax.random.PRNGKey(0)
    )
    assert "perceptual_loss" in metrics
    assert np.isfinite(float(metrics["perceptual_loss"]))
    assert float(metrics["loss"]) >= float(metrics["reconstruction_loss"])


# ---------------------------------------------------------------------------
# Decoder-path environment model
# ---------------------------------------------------------------------------

def decoder_scene():
    nerf_features = sum(features_count_by_layer(AE_CFG))  # 48
    background = ObjectModelConfig(
        name="background",
        bounding_box=((-12.0, 12.0), (-12.0, 12.0), (-1.0, 0.0)),
        positions_count_coarse=4,
        z_near_min=0.1, z_far_max=60.0,
        nerf=NerfMLPConfig(layers_width=16, backbone_layers_count=2,
                           output_features=nerf_features, skip_layer_idx=1,
                           position_encoder=PositionalEncoderConfig(octaves=2)),
        bender=RayBenderConfig(kind="zeroed"),
        style_features=8, deformation_features=4,
    )
    return SceneConfig(
        object_models=(background,),
        parameter_encoders=(ParameterEncoderConfig(kind="static", objects_count=1),),
        object_encoders=(ObjectEncoderConfig(kind="v5", input_size=(8, 16),
                                             style_features=8, deformation_features=4),),
        static_object_models=1,
        apply_activation=False,
        sampling_weights=(1.0,),
        autoencoder=AE_CFG,
    )


def decoder_batch():
    from playableenvironments_tpu.data.batching import Batch

    B, T, C, H, W = 1, 1, 1, 64, 64
    return Batch(
        observations=jnp.full((B, T, C, H, W, 3), 0.5),
        camera_rotations=jnp.zeros((B, T, C, 3)).at[..., 0].set(-0.5),
        camera_translations=jnp.zeros((B, T, C, 3)).at[..., 1].set(6.0).at[..., 2].set(8.0),
        focals=jnp.full((B, T, C), 40.0),
        bounding_boxes=jnp.zeros((B, T, C, 0, 4)),
        bounding_boxes_validity=jnp.zeros((B, T, C, 0), dtype=bool),
        global_frame_indexes=jnp.zeros((B, T), jnp.int32),
        video_frame_indexes=jnp.zeros((B, T), jnp.int32),
        video_indexes=jnp.zeros((B,), jnp.int32),
    )


RNGS = {
    "params": jax.random.PRNGKey(0),
    "ray_sampling": jax.random.PRNGKey(1),
    "sampling": jax.random.PRNGKey(2),
    "alpha_noise": jax.random.PRNGKey(3),
    "style_shuffle": jax.random.PRNGKey(4),
}


def test_environment_model_decoder_path():
    model = EnvironmentModel(decoder_scene())
    batch = decoder_batch()
    patch_size, strides = 8, (4, 8)

    variables = model.init(
        RNGS, *batch.environment_model_args(), samples_per_image=144,
        patch_size=patch_size, patch_strides=strides, decode_patches=True,
    )
    assert "autoencoder" in variables["params"]

    out, _ = model.apply(
        variables, *batch.environment_model_args(), samples_per_image=144,
        patch_size=patch_size, patch_strides=strides, decode_patches=True,
        rngs=RNGS, mutable=["batch_stats"],
    )
    g = out["coarse"]["global"]
    # 8x8 finest patch at stride 4 decodes to a 32x32 pixel patch.
    assert g["reconstructed_observations"].shape == (1, 1, 1, 32, 32, 3)
    assert len(g["splitted_integrated_features"]) == 2
    assert g["splitted_integrated_features"][0].shape == (1, 1, 1, 64, 16)
    assert g["splitted_integrated_features"][1].shape == (1, 1, 1, 16, 32)


def test_decoder_trainer_step():
    model = EnvironmentModel(decoder_scene())
    batch = decoder_batch()
    cfg = SynthesisTrainingConfig(
        samples_per_image=144, patch_size=8, patch_strides=(4, 8),
        decode_patches=True, crop_to_patch=True, frozen_autoencoder_steps=5,
        max_steps=100,
        loss_weights=LossWeights(reconstruction=1.0),
    )
    trainer = SynthesisTrainer(model, cfg)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    ae_before = jax.tree.leaves(state.params["autoencoder"])
    new_state, metrics = jax.jit(trainer.train_step)(
        state, batch, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(metrics["loss"]))
    # Frozen autoencoder: its params must not move during the freeze window.
    ae_after = jax.tree.leaves(new_state.params["autoencoder"])
    for a, b in zip(ae_before, ae_after):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # Main params did move.
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(state.params["composer"]),
            jax.tree.leaves(new_state.params["composer"]),
        )
    )


def test_full_frame_decode_from_scene_encoding():
    model = EnvironmentModel(decoder_scene())
    batch = decoder_batch()
    variables = model.init(
        RNGS, *batch.environment_model_args(), samples_per_image=144,
        patch_size=8, patch_strides=(4, 8), decode_patches=True,
    )
    (enc, _), _ = model.apply(
        variables, *batch.environment_model_args(), train=False,
        method=EnvironmentModel.compute_scene_encoding,
        rngs=RNGS, mutable=["batch_stats"],
    )
    out, _ = model.apply(
        variables, enc, (64, 64), patch_strides=[4, 8], train=False,
        method=EnvironmentModel.render_frame_from_scene_encoding,
        rngs=RNGS, mutable=["batch_stats"],
    )
    out, _ = model.apply(
        variables, out, (64, 64), False,
        method=EnvironmentModel.decode_rendered_grids,
        mutable=["batch_stats"],
    )
    assert out["coarse"]["global"]["reconstructed_observations"].shape == (
        1, 1, 1, 64, 64, 3,
    )


def test_insert_samples_into_features(key):
    from playableenvironments_tpu.render import sampling

    features = jnp.zeros((2, 4, 6, 3))
    samples = jnp.ones((2, 2, 3)) * jnp.asarray([[[1.0], [2.0]]])
    # Positions in a 16x24 original image (factor 4): cells (0,0) and (3,5).
    positions = jnp.asarray(
        [[[0.5 / 16, 0.5 / 24], [14.0 / 16, 22.0 / 24]]]
    ).repeat(2, 0)
    mixed = sampling.insert_samples_into_features(
        features, samples, positions, (16, 24)
    )
    np.testing.assert_allclose(np.asarray(mixed[0, 0, 0]), 1.0)
    np.testing.assert_allclose(np.asarray(mixed[0, 3, 5]), 2.0)
    assert float(jnp.abs(mixed).sum()) == pytest.approx(2 * 3 * (1 + 2))

    # Gradients flow into the scattered samples.
    g = jax.grad(
        lambda s: jnp.sum(
            sampling.insert_samples_into_features(features, s, positions, (16, 24))
        )
    )(samples)
    np.testing.assert_allclose(np.asarray(g), 1.0)


def test_encoder_mixed_full_frame_decode():
    """The backpropagated-autoencoder variant: encoder latents mixed with
    rendered grid samples decode to a full frame."""
    model = EnvironmentModel(decoder_scene())
    batch = decoder_batch()
    variables = model.init(
        RNGS, *batch.environment_model_args(), samples_per_image=144,
        patch_size=8, patch_strides=(4, 8), decode_patches=True,
    )
    out, _ = model.apply(
        variables, *batch.environment_model_args(), samples_per_image=0,
        patch_strides=(4, 8),
        rngs=RNGS, mutable=["batch_stats"],
    )
    mixed, _ = model.apply(
        variables, batch.observations, out, (64, 64), False,
        method=EnvironmentModel.decode_mixed_grids,
        rngs=RNGS, mutable=["batch_stats"],
    )
    frame = mixed["coarse"]["global"]["reconstructed_observations"]
    assert frame.shape == (1, 1, 1, 64, 64, 3)
    assert np.isfinite(np.asarray(frame)).all()


def test_autoencoder_evaluator(key, tmp_path):
    """Phase-1 training-time evaluator (reference autoencoder_evaluator.py):
    val losses logged + GT/reconstruction grid image written."""
    import json
    import os

    from playableenvironments_tpu.eval.autoencoder_evaluator import (
        AutoencoderEvaluator,
    )
    from playableenvironments_tpu.utils.logger import Logger

    trainer = AutoencoderTrainer(
        AE_CFG, AutoencoderTrainingConfig(learning_rate=1e-3, kl_lambda=1e-6)
    )
    images = jax.random.uniform(key, (4, 16, 16, 3))
    state = trainer.init_state(key, images)
    evaluator = AutoencoderEvaluator(trainer, np.asarray(images))
    logger = Logger(str(tmp_path), "ae_eval", use_wandb=False)
    scalars = evaluator.evaluate(state, logger, step=1)
    logger.close()

    assert np.isfinite(scalars["val_reconstruction_loss"])
    assert "val_kl_loss_level_0" in scalars
    assert "val_latent_variance_level_0" in scalars
    lines = open(os.path.join(tmp_path, "metrics.jsonl")).read().strip().splitlines()
    logged = json.loads(lines[-1])
    assert "val_reconstruction_loss" in logged
    images_dir = os.path.join(tmp_path, "images")
    assert any("autoencoder_reconstruction" in f for f in os.listdir(images_dir))


def test_autoencoder_trainer_multidevice(key):
    """Phase-1 train step over a 2-device data mesh (VERDICT: phases 1/3 must
    be mesh citizens like phase 2)."""
    from playableenvironments_tpu.parallel import create_mesh, replicate, shard_batch

    trainer = AutoencoderTrainer(
        AE_CFG, AutoencoderTrainingConfig(learning_rate=1e-3, kl_lambda=1e-6)
    )
    images = jax.random.uniform(key, (4, 16, 16, 3))
    state = trainer.init_state(key, images)
    mesh = create_mesh(jax.devices()[:2])
    sharded = shard_batch(jnp.asarray(images), mesh)
    rep_state = replicate(jax.tree.map(jnp.array, state), mesh)
    step = jax.jit(trainer.train_step, donate_argnums=0)
    new_state, metrics = step(rep_state, sharded, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert len(sharded.sharding.device_set) == 2


def test_remat_matches_plain_gradients(rng):
    """training.remat trades FLOPs for memory; it must not change a single
    gradient bit-for-semantics (same forward, same cotangents)."""
    from playableenvironments_tpu.train.trainer_autoencoder import (
        AutoencoderTrainer,
        AutoencoderTrainingConfig,
    )

    images = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))

    def grads_with(remat):
        trainer = AutoencoderTrainer(
            AE_CFG,
            AutoencoderTrainingConfig(kl_lambda=1e-6, remat=remat),
        )
        state = trainer.init_state(jax.random.PRNGKey(0), images)

        def loss(params):
            total, _ = trainer.compute_losses(
                params, state.batch_stats, images, jax.random.PRNGKey(1)
            )
            return total

        return jax.grad(loss)(state.params)

    plain = grads_with(False)
    remat = grads_with(True)
    for a, b in zip(jax.tree.leaves(plain), jax.tree.leaves(remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_graft_autoencoder_warm_start(tmp_path, rng):
    """Phase-2 warm-starts its feature renderer from a PHASE-1 checkpoint
    (reference model.autoencoder.weights_filename,
    environment_model_backpropagated_autoencoder.py:27-40)."""
    from playableenvironments_tpu.train import checkpointing
    from playableenvironments_tpu.train.trainer_autoencoder import (
        AutoencoderTrainer,
        AutoencoderTrainingConfig,
    )

    scene = decoder_scene()
    # Phase 1: a couple of steps so the AE params are non-initial.
    p1_trainer = AutoencoderTrainer(
        scene.autoencoder, AutoencoderTrainingConfig(kl_lambda=1e-6)
    )
    images = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    p1_state = p1_trainer.init_state(jax.random.PRNGKey(3), images)
    step = jax.jit(p1_trainer.train_step)
    for i in range(2):
        p1_state, _ = step(p1_state, images, jax.random.PRNGKey(i))
    ckpt = checkpointing.save_checkpoint(str(tmp_path), p1_state)

    # Phase 2 init, then graft.
    model = EnvironmentModel(scene)
    batch = decoder_batch()
    cfg = SynthesisTrainingConfig(
        samples_per_image=16, patch_size=8, patch_strides=(4, 8),
        decode_patches=True, loss_weights=LossWeights(reconstruction=1.0),
    )
    trainer = SynthesisTrainer(model, cfg)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    grafted = checkpointing.graft_autoencoder(ckpt, state)

    for a, b in zip(
        jax.tree.leaves(grafted.params["autoencoder"]),
        jax.tree.leaves(p1_state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # Other submodules untouched.
    for a, b in zip(
        jax.tree.leaves(grafted.params["composer"]),
        jax.tree.leaves(state.params["composer"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # The grafted model still steps.
    new_state, metrics = jax.jit(trainer.train_step)(
        grafted, batch, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(metrics["loss"]))
