"""Plotting + scene viewer: files are written and readable as images."""

import os

import numpy as np

from playableenvironments_tpu.eval import plotting
from playableenvironments_tpu.utils.scene_viewer import view_scene


def _valid_png(path):
    from PIL import Image

    with Image.open(path) as img:
        return img.size[0] > 0


def test_density_and_mean_vector_plots(tmp_path, rng):
    actions = rng.integers(0, 3, size=200)
    vectors = rng.normal(size=(200, 3)).astype(np.float32)
    vectors += actions[:, None]  # make actions separable

    paths = plotting.plot_density_2d(actions, vectors, 3, str(tmp_path))
    assert len(paths) == 3 and all(_valid_png(p) for p in paths)

    merged = plotting.plot_density_2d(
        actions, vectors, 3, str(tmp_path), merged=True
    )
    assert len(merged) == 1 and _valid_png(merged[0])

    mv = plotting.plot_mean_vectors_2d(actions, vectors, 3, str(tmp_path))
    assert _valid_png(mv)

    d1 = plotting.plot_density_1d(
        actions, np.linalg.norm(vectors, axis=-1), 3,
        str(tmp_path / "magnitude.png"),
    )
    assert _valid_png(d1)


def test_density_plot_empty_action_bucket(tmp_path, rng):
    """Actions with no samples must not break plotting."""
    actions = np.zeros(50, np.int64)  # only action 0 used of 4
    vectors = rng.normal(size=(50, 2)).astype(np.float32)
    paths = plotting.plot_density_2d(actions, vectors, 4, str(tmp_path))
    assert len(paths) == 4


def test_scene_viewer_snapshot(tmp_path, rng):
    boxes = [
        np.asarray([[-1.0, 1.0], [-1.0, 1.0], [0.0, 2.0]]),
        np.asarray([[-5.0, 5.0], [-5.0, 5.0], [-0.5, 0.0]]),
    ]
    o2w = [np.eye(4), np.eye(4)]
    o2w[0] = np.eye(4)
    o2w[0][:3, 3] = [2.0, 1.0, 0.0]
    rays_o = np.zeros((1, 3))
    rays_d = rng.normal(size=(32, 3)).astype(np.float32)
    path = view_scene(
        boxes, o2w, camera_positions=np.asarray([[0.0, -10.0, 3.0]]),
        ray_origins=rays_o, ray_directions=rays_d,
        output_path=str(tmp_path / "scene.png"),
    )
    assert _valid_png(path)
