"""Parity: the fast (fused-kernel) render path vs the flax SceneComposer in
eval mode, on CPU with the kernel in interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from playableenvironments_tpu.render import fast
from playableenvironments_tpu.render.composer import SceneComposer
from test_models_nerf import make_scene, make_object_cfg
from playableenvironments_tpu.config import (
    PositionalEncoderConfig,
    RayBenderConfig,
)


def scene_with_bender():
    import dataclasses

    scene = make_scene(objects_counts=(1, 1), static_models=1)
    player = dataclasses.replace(
        scene.object_models[1],
        bender=RayBenderConfig(
            kind="positional", layers_width=16, layers_count=2, skip_layer_idx=1,
            position_encoder=PositionalEncoderConfig(octaves=2, num_steps=100),
        ),
    )
    return dataclasses.replace(scene, object_models=(scene.object_models[0], player))


def test_frame_renderer_fast_matches_flax_path(tmp_path):
    """FrameRenderer(use_fast=True) == use_fast=False on a full frame."""
    import os

    from playableenvironments_tpu.data.dataset import MulticameraVideoDataset
    from playableenvironments_tpu.data.synthetic import make_synthetic_dataset
    from playableenvironments_tpu.eval.creators import FrameRenderer
    from playableenvironments_tpu.render.environment_model import EnvironmentModel
    from test_environment_model import RNGS, tiny_scene

    root = make_synthetic_dataset(
        str(tmp_path), videos=1, frames=4, height=16, width=24
    )
    dataset = MulticameraVideoDataset(
        os.path.join(root, "test"), observations_count=1
    )
    batch = next(dataset.iterate_batches(batch_size=1))
    model = EnvironmentModel(tiny_scene())
    variables = model.init(
        RNGS, *batch.environment_model_args(), samples_per_image=8
    )

    slow = FrameRenderer(model, variables, image_size=(16, 24), use_fast=False)
    fast_r = FrameRenderer(model, variables, image_size=(16, 24), use_fast=True)
    encoding = slow.encode(batch)
    np.testing.assert_allclose(
        np.asarray(fast_r.render(encoding)),
        np.asarray(slow.render(encoding)),
        atol=5e-2, rtol=5e-2,
    )


def test_ray_compaction_matches_dense(key):
    """Compacted evaluation == dense evaluation when the hit budget covers
    every hitting ray."""
    import dataclasses

    scene = scene_with_bender()
    # Compact the player object at a generous budget.
    player = dataclasses.replace(scene.object_models[1], ray_compaction=0.75)
    compact_scene = dataclasses.replace(
        scene, object_models=(scene.object_models[0], player)
    )
    composer = SceneComposer(scene)
    n_obj, rays = 2, 16
    origins = jnp.zeros((2, 3)).at[:, 2].set(3.0)
    directions = jax.random.normal(key, (2, rays, 3)) * 0.35 + jnp.asarray(
        [0.0, 0.0, -1.0]
    )
    normals = jnp.asarray([0.0, 0.0, -1.0])[None].repeat(2, 0)
    w2o = jnp.eye(4)[None, None].repeat(2, 0).repeat(n_obj, 1)
    style = jax.random.normal(key, (2, n_obj, 8))
    deformation = jax.random.normal(key, (2, n_obj, 4))
    in_scene = jnp.ones((2, n_obj), dtype=bool)
    variables = composer.init(
        key, origins, directions, normals, w2o, style, deformation, in_scene
    )
    fv = {"params": {"composer": variables["params"]},
          "batch_stats": {"composer": variables.get("batch_stats", {})}}

    dense = fast.render_rays_fast(
        scene, fv, origins, directions, normals, w2o, style, deformation,
        in_scene, block_points=64, interpret=True,
    )
    compact = fast.render_rays_fast(
        compact_scene, fv, origins, directions, normals, w2o, style,
        deformation, in_scene, block_points=64, interpret=True,
    )
    for field in ("integrated_features", "opacity", "depth"):
        np.testing.assert_allclose(
            np.asarray(compact["coarse"]["global"][field]),
            np.asarray(dense["coarse"]["global"][field]),
            atol=1e-4, rtol=1e-4, err_msg=field,
        )


@pytest.mark.parametrize("apply_activation", [False, True])
def test_fast_path_matches_composer(key, apply_activation):
    import dataclasses

    scene = dataclasses.replace(
        scene_with_bender(), apply_activation=apply_activation
    )
    composer = SceneComposer(scene)
    n_obj, rays = 2, 6
    origins = jnp.zeros((2, 3)).at[:, 2].set(3.0)
    directions = jax.random.normal(key, (2, rays, 3)) * 0.2 + jnp.asarray(
        [0.0, 0.0, -1.0]
    )
    normals = jnp.asarray([0.0, 0.0, -1.0])[None].repeat(2, 0)
    w2o = jnp.eye(4)[None, None].repeat(2, 0).repeat(n_obj, 1)
    style = jax.random.normal(key, (2, n_obj, 8))
    deformation = jax.random.normal(key, (2, n_obj, 4))
    in_scene = jnp.ones((2, n_obj), dtype=bool)

    variables = composer.init(
        key, origins, directions, normals, w2o, style, deformation, in_scene
    )
    # Populate batch stats with one training pass so folding is non-trivial.
    _, mutated = composer.apply(
        variables, origins, directions, normals, w2o, style, deformation,
        in_scene, mutable=["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": mutated["batch_stats"]}

    expected = composer.apply(
        variables, origins, directions, normals, w2o, style, deformation,
        in_scene, use_running_average=True,
    )
    got = fast.render_rays_fast(
        scene, {"params": {"composer": variables["params"]},
                "batch_stats": {"composer": variables["batch_stats"]}},
        origins, directions, normals, w2o, style, deformation, in_scene,
        block_points=64, interpret=True,
    )

    for field in ("integrated_features", "opacity", "depth"):
        np.testing.assert_allclose(
            np.asarray(got["coarse"]["global"][field]),
            np.asarray(expected["coarse"]["global"][field]),
            atol=5e-2, rtol=5e-2,
        )
    # Per-object outputs too.
    np.testing.assert_allclose(
        np.asarray(got["coarse"]["object_1"]["opacity"]),
        np.asarray(expected["coarse"]["object_1"]["opacity"]),
        atol=5e-2, rtol=5e-2,
    )


def test_fast_path_matches_composer_with_overlap_fix(key):
    """fix_object_overlaps zeroes masked static samples' t MID-ARRAY; the
    sort-free fast path must not read them as own-successors (regression:
    negative inter-sample distances -> negative alphas/weights)."""
    import dataclasses

    scene = dataclasses.replace(
        scene_with_bender(), apply_activation=True, fix_object_overlaps=True
    )
    composer = SceneComposer(scene)
    n_obj, rays = 2, 6
    origins = jnp.zeros((2, 3)).at[:, 2].set(3.0)
    # Rays pointed straight through both objects so the dynamic object's
    # sampled t interval genuinely masks static samples.
    directions = jax.random.normal(key, (2, rays, 3)) * 0.05 + jnp.asarray(
        [0.0, 0.0, -1.0]
    )
    normals = jnp.asarray([0.0, 0.0, -1.0])[None].repeat(2, 0)
    w2o = jnp.eye(4)[None, None].repeat(2, 0).repeat(n_obj, 1)
    style = jax.random.normal(key, (2, n_obj, 8))
    deformation = jax.random.normal(key, (2, n_obj, 4))
    in_scene = jnp.ones((2, n_obj), dtype=bool)

    variables = composer.init(
        key, origins, directions, normals, w2o, style, deformation, in_scene
    )
    _, mutated = composer.apply(
        variables, origins, directions, normals, w2o, style, deformation,
        in_scene, mutable=["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": mutated["batch_stats"]}

    expected = composer.apply(
        variables, origins, directions, normals, w2o, style, deformation,
        in_scene, use_running_average=True,
    )
    got = fast.render_rays_fast(
        scene, {"params": {"composer": variables["params"]},
                "batch_stats": {"composer": variables["batch_stats"]}},
        origins, directions, normals, w2o, style, deformation, in_scene,
        block_points=64, interpret=True,
    )

    for field in ("integrated_features", "opacity", "depth"):
        np.testing.assert_allclose(
            np.asarray(got["coarse"]["global"][field]),
            np.asarray(expected["coarse"]["global"][field]),
            atol=5e-2, rtol=5e-2, err_msg=field,
        )
    # Weights/opacities must be physical (regression guard: the unsorted t
    # produced negative alphas with opacity outside [0, 1]).
    for obj in ("object_0", "object_1"):
        op = np.asarray(got["coarse"][obj]["opacity"])
        assert (op > -1e-5).all() and (op < 1.0 + 1e-5).all(), (obj, op)
