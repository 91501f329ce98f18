"""I3D video network: shapes, weight loading, FVD integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from playableenvironments_tpu.eval.i3d import (
    I3D,
    i3d_video_embedder,
    load_i3d_params_npz,
)


@pytest.fixture(scope="module")
def tiny_i3d_vars():
    # Init at a small spatial size to keep CPU init cheap.
    net = I3D()
    videos = jnp.zeros((1, 9, 64, 64, 3))
    return jax.jit(net.init)(jax.random.PRNGKey(0), videos)


def test_i3d_logits_shape(tiny_i3d_vars):
    net = I3D()
    videos = jnp.linspace(0, 1, 1 * 9 * 64 * 64 * 3).reshape(1, 9, 64, 64, 3)
    logits = net.apply(tiny_i3d_vars, videos, train=False)
    assert logits.shape == (1, 400)
    assert np.isfinite(np.asarray(logits)).all()


def test_i3d_param_names_match_checkpoint_layout(tiny_i3d_vars):
    params = tiny_i3d_vars["params"]
    assert "Conv3d_1a_7x7" in params and "conv" in params["Conv3d_1a_7x7"]
    assert "Mixed_3b" in params and "b1a" in params["Mixed_3b"]
    assert "logits" in params
    # Kernel of the stem: (7, 7, 7, 3, 64).
    assert params["Conv3d_1a_7x7"]["conv"]["kernel"].shape == (7, 7, 7, 3, 64)


def test_i3d_npz_roundtrip(tmp_path, tiny_i3d_vars):
    """Flatten init variables to npz (incl. a torch-layout kernel) and load
    them back; outputs must match."""
    flat = {}

    def flatten(tree, prefix, into):
        for k, v in tree.items():
            path = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                flatten(v, path, into)
            else:
                into[path] = np.asarray(v)

    flatten(tiny_i3d_vars["params"], "", flat)
    flatten(tiny_i3d_vars.get("batch_stats", {}), "", flat)
    # Store the stem kernel in torch layout to exercise the transpose.
    stem = flat["Conv3d_1a_7x7/conv/kernel"]
    flat["Conv3d_1a_7x7/conv/kernel"] = np.transpose(stem, (4, 3, 0, 1, 2))

    path = str(tmp_path / "i3d.npz")
    np.savez(path, **flat)
    loaded = load_i3d_params_npz(path)

    net = I3D()
    videos = jnp.full((1, 9, 64, 64, 3), 0.3)
    a = net.apply(tiny_i3d_vars, videos, train=False)
    b = net.apply(loaded, videos, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_i3d_fvd_integration(tiny_i3d_vars, rng):
    from playableenvironments_tpu.eval.distribution_metrics import IncrementalFVD

    embed = i3d_video_embedder(tiny_i3d_vars, resize_to=64)
    fvd = IncrementalFVD(embed_fn=embed)
    ref = rng.uniform(0, 1, (2, 9, 32, 32, 3)).astype(np.float32)
    fvd.update_reference(ref)
    fvd.update_generated(ref + rng.normal(0, 0.05, ref.shape).astype(np.float32))
    value = fvd.compute()
    assert np.isfinite(value) and value >= 0
