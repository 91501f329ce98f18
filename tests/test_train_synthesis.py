"""End-to-end phase-2 training slice: loss goes down on synthetic data, the
train step jits, checkpoints round-trip, and the step runs sharded on an
8-device CPU mesh."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from playableenvironments_tpu.data.dataset import MulticameraVideoDataset
from playableenvironments_tpu.data.synthetic import make_synthetic_dataset
from playableenvironments_tpu.parallel import create_mesh, replicate, shard_batch
from playableenvironments_tpu.render.environment_model import EnvironmentModel
from playableenvironments_tpu.train import checkpointing
from playableenvironments_tpu.train import losses
from playableenvironments_tpu.train.trainer_synthesis import (
    LossWeights,
    SynthesisTrainer,
    SynthesisTrainingConfig,
)
from test_environment_model import tiny_scene


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    return make_synthetic_dataset(
        str(root), videos=1, frames=10, height=16, width=24, cameras=1
    )


@pytest.fixture(scope="module")
def setup(data_root):
    dataset = MulticameraVideoDataset(
        os.path.join(data_root, "train"), observations_count=2
    )
    batch = next(dataset.iterate_batches(batch_size=2))
    model = EnvironmentModel(tiny_scene(), focal_length_multiplier=1.0)
    cfg = SynthesisTrainingConfig(
        learning_rate=2e-3,
        samples_per_image=24,
        max_steps=1000,
        loss_weights=LossWeights(
            reconstruction=1.0, opacity=0.01, attention=0.01, bounding_box=0.1,
            sharpness=0.01, displacements_magnitude=0.001,
        ),
    )
    trainer = SynthesisTrainer(model, cfg)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    return trainer, state, batch, dataset


def test_train_step_runs_and_updates(setup):
    trainer, state, batch, _ = setup
    new_state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(1))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    # At least one parameter moved.
    leaves_before = jax.tree.leaves(state.params)
    leaves_after = jax.tree.leaves(new_state.params)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves_before, leaves_after)
    )


def test_loss_decreases_under_jit(setup):
    trainer, state, batch, _ = setup
    state = jax.tree.map(jnp.copy, state)  # donation must not eat the fixture
    step = jax.jit(trainer.train_step, donate_argnums=0)
    first_loss, last_loss = None, None
    for i in range(12):
        state, metrics = step(state, batch, jax.random.PRNGKey(100 + i))
        loss = float(metrics["coarse_reconstruction_loss"])
        if first_loss is None:
            first_loss = loss
        last_loss = loss
    assert np.isfinite(last_loss)
    assert last_loss < first_loss  # overfit a single batch


def test_checkpoint_roundtrip(setup, tmp_path):
    trainer, state, batch, _ = setup
    state1, _ = trainer.train_step(state, batch, jax.random.PRNGKey(7))
    path = checkpointing.save_checkpoint(str(tmp_path), state1)
    assert checkpointing.latest_checkpoint(str(tmp_path)) == path

    restored = checkpointing.restore_checkpoint(path, state)
    assert int(restored.step) == int(state1.step)
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # Cross-phase style partial restore.
    params, batch_stats = checkpointing.restore_params(
        path, state.params, state.batch_stats
    )
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(state1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_multichip_data_parallel_step(setup):
    """The full train step compiles and runs with the batch sharded over an
    8-device CPU mesh (the multi-chip dry-run path)."""
    trainer, state, batch, dataset = setup
    assert jax.device_count() == 8
    mesh = create_mesh()

    big_batch = next(dataset.iterate_batches(batch_size=8, seed=3))
    sharded_batch = shard_batch(big_batch, mesh)
    sharded_state = replicate(state, mesh)

    step = jax.jit(trainer.train_step)
    new_state, metrics = step(sharded_state, sharded_batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # Data sharding survived compilation: batch input was split over devices.
    assert len(sharded_batch.observations.sharding.device_set) == 8


def test_masked_mean_and_acmv():
    v = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    m = jnp.asarray([True, True, False, False])
    np.testing.assert_allclose(float(losses.masked_mean(v, m)), 1.5, atol=1e-6)

    # ACMV: actions perfectly explain movement -> low; shuffled -> high.
    movements = jnp.asarray([[0.0, 1.0]] * 6 + [[1.0, 0.0]] * 6)
    actions = jnp.asarray([[1.0, 0.0]] * 6 + [[0.0, 1.0]] * 6)
    low = float(losses.acmv_loss(movements, actions))
    actions_bad = jnp.asarray([[1.0, 0.0], [0.0, 1.0]] * 6)
    high = float(losses.acmv_loss(movements, actions_bad))
    assert low < 0.05 and high > 0.5


def test_camera_relative_movements():
    """Hand-built fixture for both frames (playable_model_trainer.py:234-263):
    the world movement is rotated by MINUS the camera yaw about the
    ground-normal axis; tilt components are untouched."""
    movements = jnp.asarray([[[1.0, 0.0, 0.0]]])  # (bs=1, T-1=1, 3)
    # Camera yawed +90 deg about z (T=2 frames, 1 camera); only frame 0 counts.
    half_pi = float(np.pi / 2)
    cams = jnp.asarray([[[[0.3, 0.1, half_pi]], [[0.0, 0.0, 0.0]]]])  # (1,2,1,3)
    out = losses.camera_relative_movements(movements, cams, rotation_axis=2)
    # R_z(-90deg) @ [1,0,0] = [0,-1,0].
    np.testing.assert_allclose(np.asarray(out[0, 0]), [0.0, -1.0, 0.0], atol=1e-6)

    # World frame (identity camera) is the identity transform.
    cams_id = jnp.zeros((1, 2, 1, 3))
    out_id = losses.camera_relative_movements(movements, cams_id, rotation_axis=2)
    np.testing.assert_allclose(np.asarray(out_id), np.asarray(movements), atol=1e-7)

    # Two cameras must be rejected (reference raises too).
    with pytest.raises(ValueError):
        losses.camera_relative_movements(
            movements, jnp.zeros((1, 2, 2, 3)), rotation_axis=2
        )


def test_mutual_information_smoothing_state():
    d = jax.nn.one_hot(jnp.asarray([0, 1, 2, 0, 1, 2]), 3)
    loss1, matrix = losses.mutual_information_loss(d, d)
    assert matrix.shape == (3, 3)
    # Perfect correlation -> MI = log(3) -> loss = -log(3).
    np.testing.assert_allclose(float(loss1), -np.log(3), atol=1e-4)
    loss2, matrix2 = losses.mutual_information_loss(
        d, d, smoothing_matrix=jnp.ones((3, 3)) / 9, smoothing_alpha=0.5
    )
    assert float(loss2) > float(loss1)  # smoothing toward uniform reduces MI


def test_consistency_losses_in_train_step(setup):
    """Pose + keypoint consistency terms compute and backprop when the batch
    carries optical flow and keypoints."""
    import dataclasses

    trainer, state, batch, _ = setup
    B_, T_, C_ = batch.observations.shape[:3]
    H_, W_ = batch.observations.shape[-3:-1]
    flow = np.full((B_, T_, C_, H_, W_, 2), 0.01, np.float32)
    kp = np.concatenate(
        [
            np.full((B_, T_, C_, 17, 2, 1), 0.5, np.float32),
            np.ones((B_, T_, C_, 17, 1, 1), np.float32),
        ],
        axis=-2,
    )
    rich_batch = dataclasses.replace(
        batch,
        optical_flow=jnp.asarray(flow),
        keypoints=jnp.asarray(kp),
        keypoints_validity=jnp.ones((B_, T_, C_, 1), bool),
    )
    cfg = dataclasses.replace(
        trainer.cfg,
        loss_weights=dataclasses.replace(
            trainer.cfg.loss_weights,
            pose_consistency=1.0,
            keypoint_consistency=1.0,
            keypoint_opacity=0.1,
            consistency_samples=6,
        ),
    )
    rich_trainer = SynthesisTrainer(trainer.model, cfg)
    new_state, metrics = rich_trainer.train_step(
        jax.tree.map(jnp.copy, state), rich_batch, jax.random.PRNGKey(3)
    )
    assert "dynamic_object_0_pose_consistency_loss" in metrics
    assert "dynamic_object_0_keypoint_consistency_loss" in metrics
    assert "dynamic_object_0_keypoint_opacity_loss" in metrics
    assert np.isfinite(float(metrics["loss"]))


def test_dataset_loads_flow_and_keypoints(tmp_path):
    """Flow npy files and keypoint pickles round-trip into the Batch."""
    import pickle

    from playableenvironments_tpu.data.synthetic import make_synthetic_dataset

    root = make_synthetic_dataset(
        str(tmp_path), videos=1, frames=4, height=8, width=12
    )
    cam_dir = os.path.join(root, "train", "00000", "00000")
    flow_dir = os.path.join(cam_dir, "flow")
    os.makedirs(flow_dir)
    for i in range(4):
        np.save(
            os.path.join(flow_dir, f"{i:05d}.npy"),
            np.full((8, 12, 2), 0.25, np.float32),
        )
    kp = [np.full((17, 3, 1), 0.5, np.float32) for _ in range(4)]
    with open(os.path.join(cam_dir, "keypoints.pkl"), "wb") as f:
        pickle.dump(kp, f)
    with open(os.path.join(cam_dir, "keypoints_validity.pkl"), "wb") as f:
        pickle.dump([np.ones(1, bool) for _ in range(4)], f)

    dataset = MulticameraVideoDataset(
        os.path.join(root, "train"), observations_count=2
    )
    batch = next(dataset.iterate_batches(batch_size=1, shuffle=False))
    assert batch.optical_flow is not None
    assert batch.optical_flow.shape == (1, 2, 1, 8, 12, 2)
    np.testing.assert_allclose(np.asarray(batch.optical_flow), 0.25)
    assert batch.keypoints is not None
    assert batch.keypoints.shape == (1, 2, 1, 17, 3, 1)
    assert batch.keypoints_validity.shape == (1, 2, 1, 1)


def test_multichip_data_plus_ray_parallel_step(setup):
    """2D (data, rays) mesh: the full train step compiles and runs with the
    batch sharded over `data` and ray-axis sharding constraints active."""
    from playableenvironments_tpu.parallel import mesh as mesh_lib

    trainer, state, batch, _ = setup
    devices = jax.devices()[:8]
    mesh = mesh_lib.create_2d_mesh(devices, data=2)
    assert mesh.shape["data"] == 2 and mesh.shape["rays"] == 4

    state2 = jax.tree.map(jnp.copy, state)
    with jax.set_mesh(mesh):
        sharded = jax.tree.map(
            lambda x: jax.device_put(
                x,
                jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec("data")
                ),
            ),
            batch,
        )
        replicated = jax.tree.map(
            lambda x: jax.device_put(
                x, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
            ),
            state2,
        )
        new_state, metrics = jax.jit(trainer.train_step)(
            replicated, sharded, jax.random.PRNGKey(5)
        )
        assert np.isfinite(float(metrics["loss"]))
        assert int(new_state.step) == 1


def test_camera_offsets_learning_rate_group(data_root):
    """Camera offsets form their own lr group (the reference's separate
    camera-parameters Adam, trainer.py:34-39): frozen at the default rate
    0.0, trained when the config opts in."""
    dataset = MulticameraVideoDataset(
        os.path.join(data_root, "train"), observations_count=2
    )
    batch = next(dataset.iterate_batches(batch_size=2))

    def run(camera_lr):
        model = EnvironmentModel(
            tiny_scene(), focal_length_multiplier=1.0,
            enable_camera_offsets=True, camera_memory_size=16,
        )
        cfg = SynthesisTrainingConfig(
            learning_rate=2e-3, samples_per_image=8,
            camera_parameters_learning_rate=camera_lr,
            loss_weights=LossWeights(reconstruction=1.0),
        )
        trainer = SynthesisTrainer(model, cfg)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        new_state, _ = jax.jit(trainer.train_step)(
            state, batch, jax.random.PRNGKey(1)
        )
        before = np.asarray(
            jax.tree.leaves(state.params["camera_offsets"])[0]
        )
        after = np.asarray(
            jax.tree.leaves(new_state.params["camera_offsets"])[0]
        )
        return before, after

    before, after = run(0.0)
    np.testing.assert_array_equal(before, after)
    before, after = run(1e-3)
    assert not np.allclose(before, after)


def test_phase2_remat_matches_plain_gradients(setup):
    """training.remat for phase 2: identical gradients, lower live memory
    (the fused NeRF kernel keeps its custom VJP under jax.checkpoint)."""
    import dataclasses

    trainer, state, batch, _ = setup
    remat_trainer = SynthesisTrainer(
        trainer.model, dataclasses.replace(trainer.cfg, remat=True)
    )

    def grads(t):
        def loss(params):
            total, _ = t.compute_losses(
                params, state.batch_stats, batch, jax.random.PRNGKey(5),
                jnp.zeros((), jnp.int32),
            )
            return total

        return jax.jit(jax.grad(loss))(state.params)

    plain = grads(trainer)
    remat = grads(remat_trainer)
    # Recomputation reorders float accumulations -> ~1e-5-relative noise;
    # the guard is against SEMANTIC divergence, not bit equality.
    for a, b in zip(jax.tree.leaves(plain), jax.tree.leaves(remat)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-3
        )


def test_train_step_with_hierarchical_fine(setup):
    """The coarse->fine path trains end to end: a scene with use_fine on
    both objects (different fine counts) runs the full loss set with finite
    decreasing losses and gradients reaching BOTH the coarse parameters and
    the fine resampling path (composer-level numeric parity with the
    reference lives in test_reference_parity.py)."""
    import dataclasses

    _, _, batch, _ = setup
    scene = tiny_scene()
    scene = dataclasses.replace(
        scene,
        object_models=tuple(
            dataclasses.replace(om, use_fine=True, positions_count_fine=fine)
            for om, fine in zip(scene.object_models, (3, 5))
        ),
    )
    model = EnvironmentModel(scene, focal_length_multiplier=1.0)
    trainer = SynthesisTrainer(
        model,
        SynthesisTrainingConfig(
            learning_rate=2e-3,
            samples_per_image=16,
            loss_weights=LossWeights(reconstruction=1.0, opacity=0.01),
        ),
    )
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step = jax.jit(trainer.train_step)
    first = None
    for i in range(5):
        state, metrics = step(state, batch, jax.random.PRNGKey(i + 1))
        loss = float(metrics["loss"])
        assert np.isfinite(loss)
        first = first if first is not None else loss
    assert loss < first, f"fine-path loss did not decrease: {first} -> {loss}"
