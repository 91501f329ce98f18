"""Tests for the action module: dynamics, action network, animation model,
discriminator, and the phase-3 trainer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from playableenvironments_tpu.config import (
    ActionNetworkConfig,
    AnimationModelConfig,
    DynamicsNetworkConfig,
)
from playableenvironments_tpu.models import action as action_lib
from playableenvironments_tpu.models.action import ActionNetwork, ObjectAnimationModel
from playableenvironments_tpu.models.discriminator import SequenceDiscriminator
from playableenvironments_tpu.models.dynamics import DynamicsNetwork

BOX = ((-1.0, 1.0), (-1.0, 1.0), (0.0, 2.0))
ANIM_CFG = AnimationModelConfig(
    actions_count=4,
    action_space_dimension=3,
    style_features=8,
    deformation_features=4,
    dynamics=DynamicsNetworkConfig(
        output_features=16, layers_count=2,
        force_rotations_zero=True, force_z_translations_zero=True, rotation_axis=2,
    ),
    action_network=ActionNetworkConfig(layers_width=16, layers_count=2),
)

BS, T = 3, 5


def states(key):
    keys = jax.random.split(key, 4)
    return (
        jax.random.normal(keys[0], (BS, T, 3)) * 0.1,
        jax.random.normal(keys[1], (BS, T, 3)),
        jax.random.normal(keys[2], (BS, T, 8)),
        jax.random.normal(keys[3], (BS, T, 4)),
    )


def test_sequence_validity():
    in_scene = jnp.asarray([[True, False, True], [True, True, True]])
    v = np.asarray(action_lib.compute_sequence_validity(in_scene))
    np.testing.assert_array_equal(v, [[True, False, False], [True, True, True]])


def test_centroid_update_and_variations(key):
    centroids = jnp.zeros((2, 2))
    directions = jnp.asarray([[[1.0, 0.0], [0.0, 0.0]], [[0.0, 1.0], [0.0, 0.0]]])
    directions = directions[:, None]  # (2, 1, 2, 2) -> (..., 2, S)
    probs = jnp.asarray([[[1.0, 0.0]], [[0.0, 1.0]]])
    validity = jnp.ones((2, 1), bool)
    updated = action_lib.update_centroids(centroids, directions, probs, validity, alpha=0.5)
    np.testing.assert_allclose(np.asarray(updated), [[0.5, 0.0], [0.0, 0.5]], atol=1e-6)

    variations = action_lib.compute_variations(
        updated, jnp.asarray([[1.0, 0.0]]), jnp.asarray([[1.0, 0.0]])
    )
    np.testing.assert_allclose(np.asarray(variations), [[0.5, 0.0]], atol=1e-6)
    # Invalid transitions must not move the centroids.
    frozen = action_lib.update_centroids(
        centroids, directions, probs, jnp.zeros((2, 1), bool), alpha=0.5
    )
    np.testing.assert_allclose(np.asarray(frozen), np.asarray(centroids) * 0.5, atol=1e-6)


def test_dynamics_network_step_and_carry(key):
    dyn = DynamicsNetwork(ANIM_CFG, BOX)
    rot = jnp.zeros((BS, 3))
    trans = jnp.zeros((BS, 3)).at[:, 2].set(0.5)
    style = jnp.ones((BS, 8))
    deform = jnp.ones((BS, 4))
    one_hot = jax.nn.one_hot(jnp.zeros(BS, jnp.int32), 4)
    variation = jnp.zeros((BS, 3))
    variables = dyn.init(key, None, rot, trans, style, deform, one_hot, variation)
    carry, (r2, t2, s2, d2) = dyn.apply(
        variables, None, rot, trans, style, deform, one_hot, variation
    )
    assert len(carry) == 2 and carry[0][0].shape == (BS, 16)
    np.testing.assert_allclose(np.asarray(r2), 0.0, atol=1e-6)  # rotations forced zero
    np.testing.assert_allclose(np.asarray(t2[:, 2]), 0.0, atol=1e-6)  # axis forced
    # Carry changes across steps.
    carry2, _ = dyn.apply(variables, carry, rot, trans, style, deform, one_hot, variation)
    assert not np.allclose(np.asarray(carry[0][1]), np.asarray(carry2[0][1]))


def test_action_network_outputs(key):
    net = ActionNetwork(ANIM_CFG, BOX)
    rot, trans, style, deform = states(key)
    in_scene = jnp.ones((BS, T), bool)
    variables = net.init(key, rot, trans, None, in_scene, key)
    out, _ = net.apply(
        variables, rot, trans, None, in_scene, key, mutable=["batch_stats"]
    )
    assert out["action_logits"].shape == (BS, T - 1, 4)
    assert out["action_directions_distribution"].shape == (BS, T - 1, 2, 3)
    assert out["action_states_distribution"].shape == (BS, T, 2, 3)
    # Direction mean is the state mean difference.
    sd = np.asarray(out["action_states_distribution"])
    dd = np.asarray(out["action_directions_distribution"])
    np.testing.assert_allclose(dd[..., 0, :], sd[:, 1:, 0] - sd[:, :-1, 0], atol=1e-5)


def test_animation_model_forward(key):
    model = ObjectAnimationModel(ANIM_CFG, BOX)
    rot, trans, style, deform = states(key)
    in_scene = jnp.ones((BS, T), bool)
    centroids = jnp.zeros((4, 3))
    rngs = {"params": key, "action_sampling": key, "gumbel": key}
    variables = model.init(rngs, rot, trans, style, deform, in_scene, 2, centroids)
    out, _ = model.apply(
        variables, rot, trans, style, deform, in_scene, 2, centroids,
        rngs={"action_sampling": key, "gumbel": key}, mutable=["batch_stats"],
    )
    assert out["reconstructed_object_rotations"].shape == (BS, T, 3)
    assert out["reconstructed_object_translations"].shape == (BS, T, 3)
    assert out["sampled_actions"].shape == (BS, T - 1, 4)
    assert out["estimated_action_centroids"].shape == (4, 3)
    # First frame is the ground truth (rollout seeds from it).
    np.testing.assert_allclose(
        np.asarray(out["reconstructed_object_translations"][:, 0]),
        np.asarray(trans[:, 0]), atol=1e-6,
    )
    # Centroids were updated (EMA moved away from zeros).
    assert np.abs(np.asarray(out["estimated_action_centroids"])).sum() > 0


def test_teacher_forcing_boundary(key):
    """With gt_count = T-1 every input is ground truth; reconstructions beyond
    frame 0 may differ, but inputs differ between gt_count settings."""
    model = ObjectAnimationModel(ANIM_CFG, BOX)
    rot, trans, style, deform = states(key)
    in_scene = jnp.ones((BS, T), bool)
    centroids = jnp.zeros((4, 3))
    rngs = {"params": key, "action_sampling": key, "gumbel": key}
    variables = model.init(rngs, rot, trans, style, deform, in_scene, T - 1, centroids)
    outs = {}
    for gt in (0, T - 1):
        outs[gt], _ = model.apply(
            variables, rot, trans, style, deform, in_scene,
            jnp.asarray(gt), centroids,
            rngs={"action_sampling": key, "gumbel": key}, mutable=["batch_stats"],
        )
    a = np.asarray(outs[0]["reconstructed_object_translations"])
    b = np.asarray(outs[T - 1]["reconstructed_object_translations"])
    assert not np.allclose(a, b)  # autoregressive vs teacher-forced rollouts differ


def test_discriminator(key):
    disc = SequenceDiscriminator(layers_count=2, layers_width=16)
    seq = jax.random.normal(key, (BS, T, 10))
    validity = jnp.ones((BS, T), bool)
    variables = disc.init(key, seq, validity)
    logits, _ = disc.apply(variables, seq, validity, mutable=["batch_stats"])
    assert logits.shape == (BS,)
    # Masked pooling: marking the tail invalid changes the pooled score
    # (invalid steps' features are excluded from the average; note conv
    # receptive fields still see them, as in the reference's MaskedAvgPool).
    validity2 = validity.at[:, -1].set(False)
    l_masked, _ = disc.apply(variables, seq, validity2, mutable=["batch_stats"])
    l_full, _ = disc.apply(variables, seq, validity, mutable=["batch_stats"])
    assert np.isfinite(np.asarray(l_masked)).all()
    assert not np.allclose(np.asarray(l_masked), np.asarray(l_full))


# ---------------------------------------------------------------------------
# Phase-3 trainer end to end
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def phase3_setup(tmp_path_factory):
    import os
    from test_environment_model import tiny_scene
    import dataclasses

    from playableenvironments_tpu.data.dataset import MulticameraVideoDataset
    from playableenvironments_tpu.data.synthetic import make_synthetic_dataset
    from playableenvironments_tpu.render.environment_model import EnvironmentModel
    from playableenvironments_tpu.render.playable_model import PlayableEnvironmentModel
    from playableenvironments_tpu.train.trainer_playable import (
        PlayableTrainer,
        PlayableTrainingConfig,
    )

    scene = dataclasses.replace(tiny_scene(), animation_models=(ANIM_CFG,))
    root = make_synthetic_dataset(
        str(tmp_path_factory.mktemp("p3")), videos=1, frames=12,
        height=16, width=24,
    )
    dataset = MulticameraVideoDataset(
        os.path.join(root, "train"), observations_count=5
    )
    batch = next(dataset.iterate_batches(batch_size=2))

    env_model = EnvironmentModel(scene)
    from test_environment_model import RNGS
    env_variables = env_model.init(
        RNGS, *batch.environment_model_args(), samples_per_image=8
    )
    playable = PlayableEnvironmentModel(scene)
    cfg = PlayableTrainingConfig(
        learning_rate=1e-3,
        ground_truth_observations_start=2,
        ground_truth_observations_end=4,
        ground_truth_observations_steps=100,
    )
    trainer = PlayableTrainer(env_model, playable, cfg)
    state = trainer.init_state(
        jax.random.PRNGKey(0), batch,
        env_variables["params"], env_variables.get("batch_stats", {}),
    )
    return trainer, state, batch


def test_phase3_train_step(phase3_setup):
    trainer, state, batch = phase3_setup
    step = jax.jit(trainer.train_step)
    first, last = None, None
    st = state
    for i in range(8):
        st, metrics = step(st, batch, jax.random.PRNGKey(i))
        loss = float(metrics["loss"])
        if first is None:
            first = loss
        last = loss
    assert np.isfinite(last)
    assert int(st.step) == 8
    # EMA state threaded: centroids and MI matrices changed.
    c0 = np.asarray(state.extra["centroids"]["0"])
    c1 = np.asarray(st.extra["centroids"]["0"])
    assert not np.allclose(c0, c1)
    m0 = np.asarray(state.extra["mi_matrices"]["0"])
    m1 = np.asarray(st.extra["mi_matrices"]["0"])
    assert not np.allclose(m0, m1)
    # Frozen env model untouched.
    for a, b in zip(
        jax.tree.leaves(state.extra["environment"]["params"]),
        jax.tree.leaves(st.extra["environment"]["params"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_phase3_annealing_schedules(phase3_setup):
    trainer, _, _ = phase3_setup
    cfg = trainer.cfg
    assert int(cfg.ground_truth_observations_at(0)) == 2
    assert int(cfg.ground_truth_observations_at(100)) == 4
    assert cfg.observations_count_at(0) == 7
    assert cfg.observations_count_at(25000) == 9
