"""Tests for ROI crops, object encoders, and parameter encoders."""

import jax
import jax.numpy as jnp
import numpy as np

from playableenvironments_tpu.config import ObjectEncoderConfig, ParameterEncoderConfig
from playableenvironments_tpu.core.transforms3d import (
    euler_translation_to_matrix,
    invert_rigid,
)
from playableenvironments_tpu.models.object_encoders import (
    ObjectEncoderV4,
    ObjectEncoderV5,
)
from playableenvironments_tpu.models.parameter_encoders import (
    ObjectParametersEncoderV4,
    classic_object_poses,
    normalize_angle_range,
    static_object_poses,
)
from playableenvironments_tpu.ops.roi_crop import (
    crop_and_resize,
    expand_boxes,
)


def _bilinear_sample(image, ys, xs):
    """Corner-gather bilinear sampling oracle (clipped edges) for the crop
    parity test; the production crop uses the separable-matmul form."""
    h, w = image.shape[0], image.shape[1]
    y0 = jnp.clip(jnp.floor(ys), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)[..., None]
    wx = jnp.clip(xs - x0, 0.0, 1.0)[..., None]
    y0i, y1i, x0i, x1i = (
        y0.astype(int), y1.astype(int), x0.astype(int), x1.astype(int)
    )
    top = image[y0i, x0i] * (1 - wx) + image[y0i, x1i] * wx
    bottom = image[y1i, x0i] * (1 - wx) + image[y1i, x1i] * wx
    return top * (1 - wy) + bottom * wy


def test_crop_matches_gather_bilinear():
    """The separable-matmul crop must equal clipped corner-gather bilinear
    sampling exactly (boxes overflowing the image included)."""
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((5, 18, 26, 3), np.float32))
    boxes = jnp.asarray(
        np.stack(
            [
                rng.uniform(-8, 15, 5), rng.uniform(-6, 10, 5),
                rng.uniform(15, 35, 5), rng.uniform(10, 26, 5),
            ],
            axis=1,
        ).astype(np.float32)
    )
    out_h, out_w = 8, 12

    def gather_crop(image, box):
        left, top, right, bottom = box[0], box[1], box[2], box[3]
        ys = top + (jnp.arange(out_h) + 0.5) / out_h * (bottom - top) - 0.5
        xs = left + (jnp.arange(out_w) + 0.5) / out_w * (right - left) - 0.5
        gy = jnp.broadcast_to(ys[:, None], (out_h, out_w))
        gx = jnp.broadcast_to(xs[None, :], (out_h, out_w))
        return _bilinear_sample(image, gy, gx)

    expected = jax.vmap(gather_crop)(images, boxes)
    got = crop_and_resize(images, boxes, (out_h, out_w))
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5)


def test_crop_and_resize_identity():
    """Cropping the full image to its own size reproduces the image."""
    img = jnp.arange(4 * 6 * 1, dtype=jnp.float32).reshape(1, 4, 6, 1)
    boxes = jnp.asarray([[0.0, 0.0, 6.0, 4.0]])
    out = crop_and_resize(img, boxes, (4, 6))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-4)


def test_crop_and_resize_quadrant():
    """Cropping the left half picks left-half content."""
    img = jnp.concatenate(
        [jnp.zeros((1, 8, 4, 1)), jnp.ones((1, 8, 4, 1))], axis=2
    )  # left black, right white
    out = crop_and_resize(img, jnp.asarray([[0.0, 0.0, 4.0, 8.0]]), (4, 4))
    assert float(out.mean()) < 0.2
    out_r = crop_and_resize(img, jnp.asarray([[4.0, 0.0, 8.0, 8.0]]), (4, 4))
    assert float(out_r.mean()) > 0.8


def test_expand_boxes_keeps_feet():
    boxes = jnp.asarray([[0.4, 0.4, 0.6, 0.8]])
    out = np.asarray(expand_boxes(boxes, 0.5, 0.5))
    assert out[0, 0] < 0.4 and out[0, 2] > 0.6  # wider
    assert out[0, 1] < 0.4  # taller upward
    np.testing.assert_allclose(out[0, 3], 0.8)  # bottom anchored


def test_object_encoder_v4_shapes(key):
    cfg = ObjectEncoderConfig(kind="v4", input_size=(16, 16), style_features=8,
                              deformation_features=4)
    enc = ObjectEncoderV4(cfg)
    obs = jax.random.uniform(key, (2, 32, 48, 3))
    boxes = jnp.asarray([[0.2, 0.2, 0.6, 0.9]] * 2)
    rot = jnp.zeros((2, 3))
    trans = jnp.zeros((2, 3))
    variables = enc.init(key, obs, boxes, rot, trans)
    (style, deform, attention, crops), _ = enc.apply(
        variables, obs, boxes, rot, trans, mutable=["batch_stats"]
    )
    assert style.shape == (2, 8)
    assert deform.shape == (2, 4)
    assert attention.shape == (2, 8, 8, 1)
    assert crops.shape == (2, 16, 16, 3)
    assert np.all(np.asarray(attention) >= 0) and np.all(np.asarray(attention) <= 1)


def test_object_encoder_v5_shapes(key):
    cfg = ObjectEncoderConfig(kind="v5", input_size=(32, 64), style_features=8,
                              deformation_features=4)
    enc = ObjectEncoderV5(cfg)
    obs = jax.random.uniform(key, (2, 64, 128, 3))
    boxes = jnp.asarray([[0.0, 0.0, 1.0, 1.0]] * 2)
    variables = enc.init(key, obs, boxes)
    (style, deform, _, crops), _ = enc.apply(
        variables, obs, boxes, mutable=["batch_stats"]
    )
    assert style.shape == (2, 8) and deform.shape == (2, 4)
    assert crops.shape == (2, 32, 64, 3)


def test_static_poses_midpoints():
    cfg = ParameterEncoderConfig(
        objects_count=1,
        translation_range=(((-1.0, 3.0), (2.0, 2.0), (0.0, 0.0)),),
        rotation_range=(((0.0, 0.0), (-1.0, 1.0), (0.5, 0.5)),),
    )
    rot, trans = static_object_poses(cfg, (2, 4))
    assert rot.shape == (2, 4, 1, 3)
    np.testing.assert_allclose(np.asarray(trans[0, 0, 0]), [1.0, 2.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(rot[0, 0, 0]), [0.0, 0.0, 0.5], atol=1e-6)


def test_classic_poses_ground_intersection():
    """Camera at height 10 on +y, looking straight down -y... use a simple
    setup: camera at origin of world looking along -z, ground plane z=0 is
    degenerate; instead: tennis-style, zero_axis=2 (ground z=0), camera at
    z=+10 looking down the -z axis. Feet pixel at the image center ray maps to
    the world origin."""
    cfg = ParameterEncoderConfig(
        kind="classic",
        objects_count=1,
        translation_range=(((-5.0, 5.0), (-5.0, 5.0), (0.3, 0.3)),),
        rotation_range=(((0.0, 0.0), (0.0, 0.0), (0.0, 0.0)),),
        zero_axis=2,
    )
    c2w = euler_translation_to_matrix(jnp.zeros(3), jnp.asarray([0.0, 0.0, 10.0]))
    w2c = invert_rigid(c2w)
    h, w = 100, 100
    focal = jnp.asarray(50.0)
    # Box whose bottom-center is the image center -> ray along -z -> hits
    # ground at world (0, 0, 0); plus z range midpoint 0.3.
    boxes = jnp.asarray([[0.4, 0.3, 0.6, 0.5]])  # bottom at row 50 = center
    validity = jnp.asarray([True])
    rot, trans = classic_object_poses(cfg, w2c, focal, boxes, validity, (h, w))
    np.testing.assert_allclose(np.asarray(trans[0]), [0.0, 0.0, 0.3], atol=1e-5)
    np.testing.assert_allclose(np.asarray(rot[0]), 0.0, atol=1e-6)
    # Invalid box -> zero pose.
    _, trans0 = classic_object_poses(
        cfg, w2c, focal, boxes, jnp.asarray([False]), (h, w)
    )
    np.testing.assert_allclose(np.asarray(trans0[0]), 0.0, atol=1e-6)


def test_normalize_angle_range():
    a = jnp.asarray([0.0, np.pi / 2, -np.pi / 2, np.pi])
    out = np.asarray(normalize_angle_range(a, -np.pi / 4, np.pi / 4))
    assert np.all(out >= -np.pi / 4 - 1e-6) and np.all(out <= np.pi / 4 + 1e-6)
    np.testing.assert_allclose(out[0], 0.0, atol=1e-6)


def test_parameters_encoder_v4_shapes(key):
    cfg = ParameterEncoderConfig(
        kind="learned_v4", objects_count=2, input_size=(16, 16),
        zero_axis=1, rotation_axis=1, edge_to_center_distance=0.4,
        translation_range=(((-5, 5), (0, 0), (-5, 5)),) * 2,
        rotation_range=(((0, 0), (-np.pi, np.pi), (0, 0)),) * 2,
    )
    enc = ObjectParametersEncoderV4(cfg)
    obs = jax.random.uniform(key, (2, 32, 32, 3))
    c2w = euler_translation_to_matrix(
        jnp.asarray([-0.5, 0.0, 0.0]), jnp.asarray([0.0, 8.0, 10.0])
    )
    w2c = jnp.broadcast_to(invert_rigid(c2w), (2, 4, 4))
    cam_rot = jnp.zeros((2, 3))
    focals = jnp.full((2,), 30.0)
    boxes = jnp.broadcast_to(jnp.asarray([0.3, 0.3, 0.5, 0.6]), (2, 2, 4))
    validity = jnp.ones((2, 2), dtype=bool)
    variables = enc.init(key, obs, w2c, cam_rot, focals, boxes, validity)
    (rot, trans), _ = enc.apply(
        variables, obs, w2c, cam_rot, focals, boxes, validity,
        mutable=["batch_stats"],
    )
    assert rot.shape == (2, 2, 3) and trans.shape == (2, 2, 3)
    # Rotation only along the configured axis.
    np.testing.assert_allclose(np.asarray(rot[..., 0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rot[..., 2]), 0.0, atol=1e-6)
    # Translations sit on the ground plane (y = 0).
    np.testing.assert_allclose(np.asarray(trans[..., 1]), 0.0, atol=1e-5)
