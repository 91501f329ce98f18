"""Tests for ray sampling strategies."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from playableenvironments_tpu.render import sampling


def grid(h, w, batch=()):
    dirs = jnp.arange(h * w * 3, dtype=jnp.float32).reshape(h, w, 3)
    obs = dirs + 1000.0
    dirs = jnp.broadcast_to(dirs, batch + (h, w, 3))
    obs = jnp.broadcast_to(obs, batch + (h, w, 3))
    return dirs, obs


def test_build_weight_image_concentrates_in_boxes():
    boxes = jnp.asarray([[[0.0, 0.0, 0.5, 0.5]]])  # one object top-left quadrant
    img = np.asarray(sampling.build_weight_image(boxes, [1.0], 8, 8))[0]
    assert img[:4, :4].sum() > 0.99 * img.sum()
    np.testing.assert_allclose(img[:4, :4].sum(), 1.0, atol=1e-5)


def test_sample_indices_respect_weights(key):
    w = jnp.zeros((1, 8, 8)).at[:, 2, 3].set(1.0)  # all mass at (2, 3)
    idx = sampling.sample_indices_from_weights(key, w, 50)
    np.testing.assert_array_equal(np.asarray(idx), 2 * 8 + 3)


def test_sample_rays_weighted_gathers_consistent_pairs(key):
    dirs, obs = grid(8, 10, batch=(2,))
    boxes = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0, 1.0]), (2, 1, 4))
    d, o, p = sampling.sample_rays_weighted(key, dirs, obs, 16, boxes, [1.0])
    assert d.shape == (2, 16, 3) and o.shape == (2, 16, 3) and p.shape == (2, 16, 2)
    np.testing.assert_allclose(np.asarray(o - d), 1000.0, atol=1e-4)
    assert np.all(np.asarray(p) >= 0) and np.all(np.asarray(p) < 1)


def test_sample_rays_uniform(key):
    dirs, obs = grid(6, 6)
    d, o, p = sampling.sample_rays_uniform(key, dirs, obs, 10)
    assert d.shape == (10, 3)
    np.testing.assert_allclose(np.asarray(o - d), 1000.0, atol=1e-4)


def test_strided_grid_single_stride():
    dirs, obs = grid(4, 8)
    d, o, p = sampling.sample_all_rays_strided_grid(dirs, obs, [2])
    assert d.shape == (2 * 4, 3)
    # First sample is the center of the first 2x2 cell: pixel (1, 1).
    np.testing.assert_allclose(np.asarray(d[0]), np.asarray(dirs[1, 1]))
    np.testing.assert_allclose(np.asarray(p[0]), [1 / 4, 1 / 8], atol=1e-6)


def test_strided_grid_multi_stride_concat():
    dirs, obs = grid(8, 8)
    d, o, p = sampling.sample_all_rays_strided_grid(dirs, obs, [2, 4])
    assert d.shape == (16 + 4, 3)
    folded = sampling.split_strided_grid_samples(d, [2, 4], (8, 8))
    assert folded[0].shape == (4, 4, 3) and folded[1].shape == (2, 2, 3)
    # Fold-back reproduces the strided grid content.
    np.testing.assert_allclose(np.asarray(folded[0][0, 0]), np.asarray(dirs[1, 1]))
    np.testing.assert_allclose(np.asarray(folded[1][0, 0]), np.asarray(dirs[2, 2]))


def test_strided_patch_alignment_and_coverage(key):
    """Patch samples must lie at cell centers (aligned grid) and form a
    contiguous patch per stride."""
    h, w = 32, 32
    dirs, obs = grid(h, w, batch=(3,))
    boxes = jnp.broadcast_to(jnp.asarray([0.3, 0.3, 0.7, 0.7]), (3, 1, 4))
    patch_size, strides = 8, [2, 4]
    d, o, p = sampling.sample_rays_strided_patch(
        key, dirs, obs, patch_size, strides, boxes, [1.0]
    )
    sizes = sampling.strided_patch_sizes(patch_size, strides)
    assert sizes == [8, 4]
    assert d.shape == (3, 8 * 8 + 4 * 4, 3)

    pix = np.asarray(p) * np.asarray([h, w])
    split = sampling.split_strided_samples(jnp.asarray(pix), patch_size, strides)
    for chunk, stride, size in zip(split, strides, sizes):
        chunk = np.asarray(chunk)
        # Every sample at the center of an (stride x stride) cell.
        assert np.allclose(np.mod(chunk, stride), stride // 2), (stride, chunk[:3])
        # Rows/cols form a contiguous arithmetic grid of the right size.
        rows = chunk[0, :, 0].reshape(size, size)
        assert np.allclose(np.diff(rows, axis=0), stride)
        assert np.all(chunk >= 0) and np.all(chunk[..., 0] < h)


def test_strided_patch_samples_in_bounds_extreme_box(key):
    """A box at the image corner must still give a fully in-bounds patch."""
    h, w = 16, 16
    dirs, obs = grid(h, w, batch=(4,))
    boxes = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.05, 0.05]), (4, 1, 4))
    for k in jax.random.split(key, 5):
        _, _, p = sampling.sample_rays_strided_patch(
            k, dirs, obs, 4, [2, 4], boxes, [1.0]
        )
        pix = np.asarray(p) * np.asarray([h, w])
        assert np.all(pix >= 0) and np.all(pix[..., 0] < h) and np.all(pix[..., 1] < w)


def test_samples_to_patch_roundtrip():
    x = jnp.arange(2 * 16 * 3, dtype=jnp.float32).reshape(2, 16, 3)
    patch = sampling.samples_to_patch(x)
    assert patch.shape == (2, 4, 4, 3)
    np.testing.assert_allclose(
        np.asarray(patch.reshape(2, 16, 3)), np.asarray(x)
    )
