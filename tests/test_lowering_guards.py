"""Lowering regression guards: the perf-critical programs must not contain
the TPU-slow op classes that were engineered out (docs/PERFORMANCE.md):

- `sort`: the composer is sort-free (masked-min successors instead of the
  reference's cat+sort), and ray compaction uses a prefix-sum partition.
- `select_and_scatter`: pool transposes (the hottest op class in the
  round-2 phase-1 profile) are reshape-reduce with custom backwards.

These inspect the traced StableHLO on CPU, so a reverted lowering fails CI
without needing a chip. Shapes are chosen large enough that the production
code paths (not tiny-size fallbacks) are taken.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _stablehlo(fn, *args):
    return jax.jit(fn).lower(*args).as_text()


def _count(text, op):
    return text.count(f"stablehlo.{op}") + text.count(f'"{op}"')


def _largest_sort_elems(text):
    """Largest element count among stablehlo.sort operands (0 if none).
    Tiny sorts (e.g. jax.random.permutation over the 2 style-shuffle
    indices) are fine; ray/sample-axis sorts are the regression."""
    import re

    largest = 0
    lines = text.splitlines()
    for i, line in enumerate(lines):
        if "stablehlo.sort" not in line:
            continue
        # The op's type signature follows its comparator region:
        # `}) : (tensor<2xui32>, tensor<2xi32>) -> ...`
        for j in range(i, min(i + 40, len(lines))):
            if "}) : (" in lines[j]:
                for shape in re.findall(r"tensor<([0-9x]*)x?[a-z]", lines[j]):
                    elems = 1
                    for d in shape.split("x"):
                        if d.isdigit():
                            elems *= int(d)
                    largest = max(largest, elems)
                break
    return largest


def test_phase1_step_has_no_slow_ops(rng):
    from playableenvironments_tpu.config import AutoencoderConfig
    from playableenvironments_tpu.train.trainer_autoencoder import (
        AutoencoderTrainer,
        AutoencoderTrainingConfig,
    )

    trainer = AutoencoderTrainer(
        AutoencoderConfig(compute_dtype="bfloat16"),
        AutoencoderTrainingConfig(perceptual_lambda=0.1, kl_lambda=5e-6),
    )
    # Large enough that every pyramid level keeps h, w >= 2*pad + 2 (the
    # strip-form pad backward) and the reshape pools stay on the even path.
    images = jnp.asarray(rng.random((2, 64, 96, 3)).astype(np.float32))
    state = trainer.init_state(jax.random.PRNGKey(0), images)
    text = _stablehlo(trainer.train_step, state, images, jax.random.PRNGKey(1))
    assert _count(text, "select_and_scatter") == 0
    assert _count(text, "sort") == 0
    # With compute_dtype=bfloat16 EVERY convolution (forward + transposes,
    # AE and VGG) must be bf16 — one f32 conv silently halves the MXU rate.
    convs = [l for l in text.splitlines() if "stablehlo.convolution" in l]
    f32_convs = [l for l in convs if "bf16" not in l]
    assert convs and not f32_convs, f32_convs[:3]


def test_phase2_step_has_no_sorts():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import dataclasses

    from test_environment_model import tiny_scene, RNGS
    from playableenvironments_tpu.data.dataset import MulticameraVideoDataset
    from playableenvironments_tpu.data.synthetic import make_synthetic_dataset
    from playableenvironments_tpu.render.environment_model import EnvironmentModel
    from playableenvironments_tpu.train.trainer_synthesis import (
        LossWeights,
        SynthesisTrainer,
        SynthesisTrainingConfig,
    )
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        root = make_synthetic_dataset(tmp, videos=1, frames=4, height=16, width=24)
        dataset = MulticameraVideoDataset(
            os.path.join(root, "train"), observations_count=2
        )
        batch = next(dataset.iterate_batches(batch_size=2))
    trainer = SynthesisTrainer(
        EnvironmentModel(tiny_scene()),
        SynthesisTrainingConfig(
            samples_per_image=8,
            loss_weights=LossWeights(reconstruction=1.0, opacity=0.01),
        ),
    )
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    text = _stablehlo(trainer.train_step, state, batch, jax.random.PRNGKey(1))
    # The only permitted sort is jax.random.permutation over the 2
    # style-shuffle indices; the composer/compaction must stay sort-free.
    assert _largest_sort_elems(text) <= 8
    assert _count(text, "select_and_scatter") == 0


def test_interactive_render_has_no_sorts():
    """The fast inference path (fps-critical) must stay sort-free too."""
    import dataclasses

    from test_models_nerf import make_scene
    from playableenvironments_tpu.render import fast

    scene = dataclasses.replace(
        make_scene(objects_counts=(1, 1), static_models=1),
        apply_activation=True,
    )
    from playableenvironments_tpu.render.composer import SceneComposer

    composer = SceneComposer(scene)
    key = jax.random.PRNGKey(0)
    n_obj, rays = 2, 8
    origins = jnp.zeros((1, 3)).at[:, 2].set(3.0)
    directions = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, -1.0]), (1, rays, 3)
    ) + 0.01 * jax.random.normal(key, (1, rays, 3))
    normals = jnp.asarray([[0.0, 0.0, -1.0]])
    w2o = jnp.eye(4)[None, None].repeat(1, 0).repeat(n_obj, 1)
    style = jax.random.normal(key, (1, n_obj, 8))
    deformation = jax.random.normal(key, (1, n_obj, 4))
    in_scene = jnp.ones((1, n_obj), bool)
    variables = composer.init(
        key, origins, directions, normals, w2o, style, deformation, in_scene
    )

    def render(origins, directions, normals, w2o, style, deformation, in_scene):
        return fast.render_rays_fast(
            scene,
            {"params": {"composer": variables["params"]},
             "batch_stats": {"composer": variables.get("batch_stats", {})}},
            origins, directions, normals, w2o, style, deformation, in_scene,
            block_points=64, interpret=True,
        )

    text = _stablehlo(
        render, origins, directions, normals, w2o, style, deformation, in_scene
    )
    assert _count(text, "sort") == 0
    assert _count(text, "select_and_scatter") == 0


def test_phase3_step_has_no_slow_ops():
    """The fused G+D step (encoding cache + Pallas rollout) must stay free
    of sorts and select_and_scatter beyond tiny RNG permutations."""
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import dataclasses

    from test_environment_model import tiny_scene
    from test_action_module import ANIM_CFG
    from playableenvironments_tpu.data.dataset import MulticameraVideoDataset
    from playableenvironments_tpu.data.synthetic import make_synthetic_dataset
    from playableenvironments_tpu.render.environment_model import EnvironmentModel
    from playableenvironments_tpu.render.playable_model import (
        PlayableEnvironmentModel,
    )
    from playableenvironments_tpu.train.trainer_playable import (
        PlayableTrainer,
        PlayableTrainingConfig,
    )
    import tempfile

    scene = dataclasses.replace(tiny_scene(), animation_models=(ANIM_CFG,))
    with tempfile.TemporaryDirectory() as tmp:
        root = make_synthetic_dataset(tmp, videos=1, frames=8, height=16, width=24)
        dataset = MulticameraVideoDataset(
            os.path.join(root, "train"), observations_count=4
        )
        batch = next(dataset.iterate_batches(batch_size=2))
    env_model = EnvironmentModel(scene)
    playable = PlayableEnvironmentModel(scene)
    trainer = PlayableTrainer(env_model, playable, PlayableTrainingConfig())
    import jax.random as jr

    env_vars = env_model.init(
        {"params": jr.PRNGKey(0), "sampling": jr.PRNGKey(1),
         "ray_sampling": jr.PRNGKey(2), "gumbel": jr.PRNGKey(3),
         "style_shuffle": jr.PRNGKey(4)},
        *batch.environment_model_args(), samples_per_image=8,
    )
    state = trainer.init_state(
        jr.PRNGKey(0), batch, env_vars["params"], env_vars.get("batch_stats", {})
    )
    encoding = jax.jit(trainer.encode_batch)(state.extra, batch, jr.PRNGKey(5))
    text = _stablehlo(trainer.fused_step, state, encoding, jr.PRNGKey(6))
    assert _largest_sort_elems(text) <= 8
    assert _count(text, "select_and_scatter") == 0
