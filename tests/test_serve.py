"""Serving-export roundtrip: an exported renderer artifact reproduces the
live renderer's frames from a fresh deserialization (no model code run at
load time beyond the pytree registration)."""

import os

import jax
import numpy as np
import pytest

from playableenvironments_tpu import serve


@pytest.fixture(scope="module")
def renderer_setup(tmp_path_factory):
    from test_environment_model import RNGS, tiny_scene

    from playableenvironments_tpu.data.dataset import MulticameraVideoDataset
    from playableenvironments_tpu.data.synthetic import make_synthetic_dataset
    from playableenvironments_tpu.eval.creators import FrameRenderer
    from playableenvironments_tpu.render.environment_model import EnvironmentModel

    root = make_synthetic_dataset(
        str(tmp_path_factory.mktemp("serve")), videos=1, frames=2,
        height=16, width=24,
    )
    dataset = MulticameraVideoDataset(
        os.path.join(root, "test"), observations_count=1
    )
    batch = next(dataset.iterate_batches(batch_size=1))
    model = EnvironmentModel(tiny_scene())
    variables = model.init(
        RNGS, *batch.environment_model_args(), samples_per_image=8
    )
    renderer = FrameRenderer(model, variables, image_size=(16, 24))
    encoding = renderer.encode(batch)
    return renderer, encoding


def test_export_roundtrip_matches_live_render(renderer_setup, tmp_path):
    renderer, encoding = renderer_setup
    path = serve.export_renderer(
        renderer, encoding, str(tmp_path / "renderer.pexp")
    )
    call = serve.load_artifact(path)
    assert call.header["name"] == "render_16x24"
    assert call.header["platforms"] == ["cpu"]
    got = np.asarray(call(encoding))
    want = np.asarray(renderer.render(encoding))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_artifact_version_gate(tmp_path, renderer_setup):
    renderer, encoding = renderer_setup
    path = serve.export_renderer(
        renderer, encoding, str(tmp_path / "renderer.pexp")
    )
    blob = open(path, "rb").read()
    # Corrupt the version field.
    import json
    import struct

    (head_len,) = struct.unpack("<I", blob[:4])
    header = json.loads(blob[4 : 4 + head_len])
    header["format_version"] = 999
    head = json.dumps(header).encode()
    open(path, "wb").write(struct.pack("<I", len(head)) + head + blob[4 + head_len :])
    with pytest.raises(ValueError, match="unsupported artifact format"):
        serve.load_artifact(path)


def test_export_generic_function(tmp_path):
    import jax.numpy as jnp

    def f(x, y):
        return jnp.tanh(x) @ y

    x = jnp.ones((4, 8))
    y = jnp.ones((8, 2))
    path = serve.export_function(f, (x, y), str(tmp_path / "f.pexp"), name="f")
    call = serve.load_artifact(path)
    np.testing.assert_allclose(
        np.asarray(call(x, y)), np.asarray(f(x, y)), atol=1e-6
    )


def test_export_interactive_loop(tmp_path):
    """The three interactive artifacts replay the live play-session loop
    exactly: reset -> step0 -> step -> render at every stage."""
    import dataclasses

    from test_environment_model import RNGS, tiny_scene
    from test_action_module import ANIM_CFG

    from playableenvironments_tpu.data.dataset import MulticameraVideoDataset
    from playableenvironments_tpu.data.synthetic import make_synthetic_dataset
    from playableenvironments_tpu.eval.creators import FrameRenderer
    from playableenvironments_tpu.render.environment_model import EnvironmentModel
    from playableenvironments_tpu.render.interactive import (
        action_inputs,
        interactive_step,
    )
    from playableenvironments_tpu.render.playable_model import (
        PlayableEnvironmentModel,
    )

    scene = dataclasses.replace(tiny_scene(), animation_models=(ANIM_CFG,))
    root = make_synthetic_dataset(
        str(tmp_path / "data"), videos=1, frames=4, height=16, width=24
    )
    dataset = MulticameraVideoDataset(
        os.path.join(root, "test"), observations_count=1
    )
    batch = next(dataset.iterate_batches(batch_size=1))
    env_model = EnvironmentModel(scene)
    env_vars = env_model.init(
        RNGS, *batch.environment_model_args(), samples_per_image=8
    )
    playable = PlayableEnvironmentModel(scene)
    renderer = FrameRenderer(env_model, env_vars, image_size=(16, 24))
    encoding = jax.tree.map(lambda x: x[:, :1], renderer.encode(batch))

    import jax.numpy as jnp

    playable_vars = None
    # The dynamics params live inside the env-model playable wrapper; init
    # a fresh playable model over the same scene for the dynamics weights.
    one_hots, variations = action_inputs(playable, [0])
    playable_vars = playable.init(
        {"params": jax.random.PRNGKey(0)},
        0, None,
        encoding.object_rotations[:, 0, -1],
        encoding.object_translations[:, 0, -1],
        encoding.object_style[:, 0, -1],
        encoding.object_deformation[:, 0, -1],
        one_hots[0], variations[0],
        method=PlayableEnvironmentModel.dynamics_step,
    )

    from playableenvironments_tpu import serve

    paths = serve.export_interactive(
        playable, playable_vars, renderer, encoding,
        str(tmp_path / "world"),
    )
    render = serve.load_artifact(paths["render"])
    step0 = serve.load_artifact(paths["step0"])
    step = serve.load_artifact(paths["step"])

    initial_style = encoding.object_style
    # Served rollout.
    enc_s, carries_s = step0(encoding, initial_style, one_hots, variations)
    enc_s, carries_s = step(enc_s, initial_style, carries_s, one_hots, variations)
    frame_s = np.asarray(render(enc_s))

    # Live rollout.
    enc_l, carries_l = interactive_step(
        playable, playable_vars, encoding, initial_style, [None], one_hots,
        variations,
    )
    enc_l, carries_l = interactive_step(
        playable, playable_vars, enc_l, initial_style, carries_l, one_hots,
        variations,
    )
    frame_l = np.asarray(renderer.render(enc_l))

    np.testing.assert_allclose(frame_s, frame_l, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(enc_s.object_translations),
        np.asarray(enc_l.object_translations),
        atol=1e-6,
    )
