"""InceptionV3 FID backbone: feature shapes, weight round-trip, FID use."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from playableenvironments_tpu.eval.inception_v3 import (
    InceptionV3Features,
    inception_image_embedder,
    load_inception_params_npz,
)


@pytest.fixture(scope="module")
def tiny_vars():
    net = InceptionV3Features()
    return jax.jit(net.init)(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))


def test_feature_shape(tiny_vars):
    net = InceptionV3Features()
    out = net.apply(tiny_vars, jnp.full((2, 128, 128, 3), 0.4), train=False)
    assert out.shape == (2, 2048)
    assert np.isfinite(np.asarray(out)).all()


def test_npz_roundtrip(tmp_path, tiny_vars):
    flat = {}

    def flatten(tree, prefix, into):
        for k, v in tree.items():
            path = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                flatten(v, path, into)
            else:
                into[path] = np.asarray(v)

    flatten(tiny_vars["params"], "", flat)
    flatten(tiny_vars.get("batch_stats", {}), "", flat)
    stem = flat["Conv2d_1a_3x3/conv/kernel"]
    flat["Conv2d_1a_3x3/conv/kernel"] = np.transpose(stem, (3, 2, 0, 1))

    path = str(tmp_path / "inception.npz")
    np.savez(path, **flat)
    loaded = load_inception_params_npz(path)
    net = InceptionV3Features()
    images = jnp.full((1, 128, 128, 3), 0.3)
    np.testing.assert_allclose(
        np.asarray(net.apply(tiny_vars, images, train=False)),
        np.asarray(net.apply(loaded, images, train=False)),
        atol=1e-5,
    )


def test_fid_integration(tiny_vars, rng):
    from playableenvironments_tpu.eval.distribution_metrics import IncrementalFID

    embed = inception_image_embedder(tiny_vars, resize_to=128)
    fid = IncrementalFID(embed_fn=embed)
    ref = rng.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32)
    fid.update_reference(ref)
    fid.update_generated(ref + rng.normal(0, 0.05, ref.shape).astype(np.float32))
    value = fid.compute()
    assert np.isfinite(value) and value >= 0
