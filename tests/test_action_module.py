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
    return trainer, state, batch, dataset


def test_phase3_train_step(phase3_setup):
    trainer, state, batch, _ = phase3_setup
    # Encode once (frozen, deterministic), then step on the cached encoding —
    # the production phase-3 path (EncodingCache + fused_step).
    encoding = jax.jit(trainer.encode_batch)(
        state.extra, batch, jax.random.PRNGKey(100)
    )
    step = jax.jit(trainer.fused_step)
    first, last = None, None
    st = state
    for i in range(8):
        st, metrics = step(st, encoding, jax.random.PRNGKey(i))
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


def test_phase3_loss_decreases(phase3_setup):
    """Overfit one cached encoding: the state-reconstruction loss must go
    DOWN, not merely stay finite (finiteness missed e.g. the optax.masked
    raw-gradient-passthrough bug)."""
    trainer, state, batch, _ = phase3_setup
    encoding = jax.jit(trainer.encode_batch)(
        state.extra, batch, jax.random.PRNGKey(3)
    )
    # No donation: the fixture's state is module-scoped and donating its
    # buffers would invalidate it for later tests on donation-capable
    # backends (CPU ignores donation, but don't rely on that).
    step = jax.jit(trainer.fused_step)
    st = state
    losses_seen = []
    for i in range(40):
        st, metrics = step(st, encoding, jax.random.PRNGKey(i))
        losses_seen.append(
            float(metrics["object_1_translations_reconstruction_loss"])
            + float(metrics["object_1_rotations_reconstruction_loss"])
        )
    first = np.mean(losses_seen[:5])
    last = np.mean(losses_seen[-5:])
    assert np.isfinite(last)
    assert last < first, (first, last)


def test_phase3_annealing_schedules(phase3_setup):
    trainer, _, _, _ = phase3_setup
    cfg = trainer.cfg
    assert int(cfg.ground_truth_observations_at(0)) == 2
    assert int(cfg.ground_truth_observations_at(100)) == 4
    assert cfg.observations_count_at(0) == 7
    assert cfg.observations_count_at(25000) == 9


def test_phase3_gan_fused_step(phase3_setup, tmp_path):
    """GAN path: one fused step = generator + discriminator updates on a
    SHARED encoding; separate masked optimizers (reference alternates two
    Adams, playable_model_trainer_discriminator.py:195-234); the step counter
    advances once per G+D pair."""
    import dataclasses

    from playableenvironments_tpu.render.playable_model import (
        PlayableEnvironmentModel,
    )
    from playableenvironments_tpu.train.trainer_playable import (
        PlayableLossWeights,
        PlayableTrainer,
    )

    base_trainer, base_state, batch, _ = phase3_setup
    env_model = base_trainer.environment_model
    cfg = dataclasses.replace(
        base_trainer.cfg,
        loss_weights=PlayableLossWeights(gan=0.1),
    )
    playable = PlayableEnvironmentModel(env_model.scene, with_discriminators=True)
    trainer = PlayableTrainer(env_model, playable, cfg)
    env = base_state.extra["environment"]  # frozen phase-2 variables
    state = trainer.init_state(
        jax.random.PRNGKey(0), batch, env["params"], env["batch_stats"]
    )
    assert "disc_opt_state" in state.extra

    encoding = jax.jit(trainer.encode_batch)(
        state.extra, batch, jax.random.PRNGKey(5)
    )
    step = jax.jit(trainer.fused_step)
    st = state
    for i in range(2):
        st, metrics = step(st, encoding, jax.random.PRNGKey(i))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["discriminator_loss"]))
    assert "object_1_gan_generator_loss" in metrics
    # One optimization step per G+D pair.
    assert int(st.step) == 2

    # Both parameter groups moved.
    def changed(prefix):
        before = {k: v for k, v in state.params.items() if k.startswith(prefix)}
        after = {k: v for k, v in st.params.items() if k.startswith(prefix)}
        leaves_before = jax.tree.leaves(before)
        leaves_after = jax.tree.leaves(after)
        return any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(leaves_before, leaves_after)
        )

    assert changed("animation_model")
    assert changed("discriminator")

    # A lone GENERATOR step must leave the discriminator params untouched:
    # optax.masked passes masked-out leaves' raw gradients through, and the
    # G adversarial loss has nonzero grads w.r.t. the discriminator
    # (regression: they were added verbatim every generator pass).
    g_state, _ = jax.jit(trainer.train_step)(
        state, encoding, jax.random.PRNGKey(9)
    )
    for key_name, before_v in state.params.items():
        if key_name.startswith("discriminator"):
            after_leaves = jax.tree.leaves(g_state.params[key_name])
            before_leaves = jax.tree.leaves(before_v)
            for a, b in zip(after_leaves, before_leaves):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # The discriminators' spectral-norm power-iteration vectors (u/sigma in
    # batch_stats) must persist across steps — torch spectral_norm carries u
    # forward; restarting from the init vector every step never converges to
    # the true spectral norm (regression: the D pass used to discard them).
    def sn_leaves(stats):
        return {
            path: leaf
            for path, leaf in jax.tree_util.tree_leaves_with_path(stats)
            if "discriminator" in jax.tree_util.keystr(path)
        }

    sn_before = sn_leaves(state.batch_stats)
    sn_after = sn_leaves(st.batch_stats)
    assert sn_before, "expected spectral-norm stats under the discriminators"
    assert any(
        not np.allclose(np.asarray(sn_after[k]), np.asarray(sn_before[k]))
        for k in sn_before
    ), "spectral-norm stats did not persist across the discriminator step"


# ---------------------------------------------------------------------------
# Phase-3 encoding cache
# ---------------------------------------------------------------------------


def _fake_cache():
    from playableenvironments_tpu.scene.encoding import SceneEncoding
    from playableenvironments_tpu.train.encoding_cache import EncodingCache

    frames = 11  # video 0: 6 frames, video 1: 5 frames
    rng = np.random.default_rng(0)
    enc = SceneEncoding(
        camera_rotations=rng.normal(size=(frames, 1, 3)).astype(np.float32),
        camera_translations=rng.normal(size=(frames, 1, 3)).astype(np.float32),
        focals=rng.normal(size=(frames, 1)).astype(np.float32),
        object_rotations=rng.normal(size=(frames, 2, 3)).astype(np.float32),
        object_translations=rng.normal(size=(frames, 2, 3)).astype(np.float32),
        object_style=rng.normal(size=(frames, 2, 4)).astype(np.float32),
        object_deformation=rng.normal(size=(frames, 2, 2)).astype(np.float32),
        object_in_scene=np.ones((frames, 2), bool),
    )
    return EncodingCache(enc, [(0, 6), (6, 5)], skip_frames=0)


def test_encoding_cache_windows_and_gather():
    cache = _fake_cache()
    starts = cache.windows(3)
    # (6-3+1) + (5-3+1) = 7 windows; none crosses a video boundary.
    assert len(starts) == 7
    assert set(starts.tolist()) == {0, 1, 2, 3, 6, 7, 8}
    batch = cache.gather_windows(np.asarray([0, 6]), 3)
    assert batch.object_style.shape == (2, 3, 2, 4)
    np.testing.assert_array_equal(
        np.asarray(batch.object_style[1]), cache.encoding.object_style[6:9]
    )


def test_encoding_cache_multihost_balance():
    cache = _fake_cache()
    # 7 windows over 2 processes: truncated to 6 -> 3 each -> equal batch
    # counts (the per-process slicing fix).
    counts = [
        len(list(cache.iterate_encoding_batches(
            2, 3, seed=1, process_index=p, process_count=2
        )))
        for p in (0, 1)
    ]
    assert counts[0] == counts[1] == 1


def test_encoding_cache_save_load(tmp_path):
    cache = _fake_cache()
    path = str(tmp_path / "cache.npz")
    cache.save(path)
    from playableenvironments_tpu.train.encoding_cache import EncodingCache

    loaded = EncodingCache.load(path)
    assert loaded.video_slices == cache.video_slices
    assert loaded.skip_frames == cache.skip_frames
    np.testing.assert_array_equal(
        loaded.encoding.object_style, cache.encoding.object_style
    )


def test_encoding_cache_build_matches_direct(phase3_setup):
    """The cache path is EXACTLY the on-the-fly encoding: frozen eval-mode
    encodings are key-independent, so cached windows match direct batch
    encodings bit-for-bit (up to float accumulation)."""
    import os

    from playableenvironments_tpu.train.encoding_cache import EncodingCache

    trainer, state, batch, dataset = phase3_setup
    encode_fn = jax.jit(
        lambda b, k: trainer.encode_batch(state.extra, b, k)
    )
    cache = EncodingCache.build(
        encode_fn, dataset, jax.random.PRNGKey(3), batch_size=4
    )
    assert dataset.observations_count == 5  # restored after the build

    # The fixture batch is shuffled; take the deterministic first windows.
    batch0 = next(dataset.iterate_batches(2, shuffle=False))
    direct = encode_fn(batch0, jax.random.PRNGKey(99))
    starts = cache.windows(5)[:2]  # first batch of shuffle=False iteration
    cached = cache.gather_windows(np.asarray(starts), 5)
    for name in ("object_rotations", "object_translations", "object_style",
                 "object_deformation"):
        np.testing.assert_allclose(
            np.asarray(getattr(direct, name)), getattr(cached, name), atol=1e-5,
        )


def test_phase3_multidevice_step(phase3_setup):
    """Phase-3 fused step over a 2-device data mesh (VERDICT: phases 1/3 must
    be mesh citizens like phase 2)."""
    from playableenvironments_tpu.parallel import create_mesh, replicate, shard_batch

    trainer, state, batch, _ = phase3_setup
    encoding = jax.jit(trainer.encode_batch)(
        state.extra, batch, jax.random.PRNGKey(4)
    )
    before = int(state.step)
    mesh = create_mesh(jax.devices()[:2])
    sharded = shard_batch(encoding, mesh)
    # Fresh copies: donation must not delete the module-scoped fixture state.
    rep_state = replicate(jax.tree.map(jnp.array, state), mesh)
    step = jax.jit(trainer.fused_step, donate_argnums=0)
    new_state, metrics = step(rep_state, sharded, jax.random.PRNGKey(5))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == before + 1


def test_playable_evaluator(phase3_setup, tmp_path):
    """Phase-3 training-time evaluator (reference
    playable_model_evaluator.py:88-375): validation losses, per-action
    generated videos, and a zero-variation re-enactment strip."""
    import os

    from playableenvironments_tpu.eval.playable_evaluator import (
        PlayableModelEvaluator,
    )
    from playableenvironments_tpu.utils.logger import Logger

    trainer, state, batch, dataset = phase3_setup
    evaluator = PlayableModelEvaluator(
        trainer, dataset, str(tmp_path),
        batch_size=2, val_batches=1, action_video_frames=3,
    )
    logger = Logger(str(tmp_path), "p3_eval", use_wandb=False)
    losses_out = evaluator.evaluate(state, logger, step=1)
    logger.close()

    assert np.isfinite(losses_out["val_loss"])
    assert any(k.startswith("val_object_") for k in losses_out)
    out_dir = os.path.join(tmp_path, "playable_eval", "step_1")
    actions_count = trainer.scene_animation_configs()[0].actions_count
    gifs = [f for f in os.listdir(out_dir) if f.endswith(".gif")]
    assert len([g for g in gifs if g.startswith("action_")]) == actions_count
    assert "reenactment.gif" in gifs
