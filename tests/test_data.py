"""Tests for the dataset layer: on-disk format, windowing, batching, synthetic."""

import os
import pickle

import numpy as np
import pytest

from playableenvironments_tpu.data import (
    Batch,
    MulticameraVideo,
    MulticameraVideoDataset,
    PoseParametersNumpy,
    Video,
)
from playableenvironments_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthetic")
    return make_synthetic_dataset(
        str(root), videos=2, frames=10, height=24, width=32, cameras=1
    )


def test_synthetic_dataset_layout(dataset_root):
    train = os.path.join(dataset_root, "train")
    assert sorted(os.listdir(train)) == ["00000", "00001"]
    cam0 = os.path.join(train, "00000", "00000")
    files = os.listdir(cam0)
    assert "00000.png" in files and "00009.png" in files
    for pkl in ("actions.pkl", "cameras.pkl", "focals.pkl",
                "bounding_boxes.pkl", "bounding_box_validity.pkl"):
        assert pkl in files


def test_pickle_reference_module_path(dataset_root):
    """Cameras pickle must reference the reference's module path so reference
    code can unpickle our datasets."""
    cam0 = os.path.join(dataset_root, "train", "00000", "00000", "cameras.pkl")
    raw = open(cam0, "rb").read()
    assert b"utils.lib_3d.pose_parameters" in raw
    # And we can load it back through the compat unpickler.
    video = Video().load(os.path.dirname(cam0))
    assert isinstance(video.cameras[0], PoseParametersNumpy)
    assert video.cameras[0].rotation.shape == (3,)


def test_video_roundtrip(tmp_path):
    frames = [np.random.default_rng(i).uniform(size=(8, 12, 3)).astype(np.float32)
              for i in range(3)]
    video = Video().add_content(
        frames=frames,
        actions=[0, 1, 2],
        rewards=[0.0] * 3,
        metadata=[{}] * 3,
        dones=[False, False, True],
        cameras=[PoseParametersNumpy([0.1, 0.2, 0.3], [1, 2, 3])] * 3,
        focals=[50.0] * 3,
        bounding_boxes=[np.zeros((4, 1), np.float32)] * 3,
        bounding_boxes_validity=[np.ones((1,), bool)] * 3,
    )
    video.save(str(tmp_path / "v"))
    loaded = Video().load(str(tmp_path / "v"))
    assert loaded.frames_count == 3
    np.testing.assert_allclose(loaded.get_frame(1), frames[1], atol=2 / 255)
    assert loaded.actions == [0, 1, 2]
    np.testing.assert_allclose(loaded.cameras[0].translation, [1, 2, 3])
    assert loaded.dynamic_objects_count == 1


def test_video_save_moco_strip(tmp_path):
    """save_moco writes a single horizontally-concatenated strip image
    (reference dataset/video.py:733-763)."""
    frames = [np.full((8, 12, 3), v, np.float32) for v in (0.0, 0.5, 1.0)]
    video = Video().add_content(
        frames=frames,
        actions=[0] * 3,
        rewards=[0.0] * 3,
        metadata=[{}] * 3,
        dones=[False] * 3,
        cameras=[PoseParametersNumpy([0, 0, 0], [0, 0, 0])] * 3,
        focals=[50.0] * 3,
        bounding_boxes=[np.zeros((4, 1), np.float32)] * 3,
        bounding_boxes_validity=[np.ones((1,), bool)] * 3,
    )
    video.save_moco(str(tmp_path / "strip"))
    from playableenvironments_tpu.data.video import _load_image

    strip = _load_image(str(tmp_path / "strip.png"))
    assert strip.shape == (8, 36, 3)
    np.testing.assert_allclose(strip[:, 12:24], 0.5, atol=2 / 255)
    # Resized export and existing-file refusal.
    video.save_moco(str(tmp_path / "small"), target_size=(6, 4))
    assert _load_image(str(tmp_path / "small.png")).shape == (4, 18, 3)
    with pytest.raises(FileExistsError):
        video.save_moco(str(tmp_path / "strip"))


def test_dataset_windowing(dataset_root):
    ds = MulticameraVideoDataset(
        os.path.join(dataset_root, "train"), observations_count=3, skip_frames=1
    )
    # Window span = (1+1)*2+1 = 5; 10 frames -> 6 windows per video, 2 videos.
    assert len(ds) == 12
    sample = ds[0]
    assert sample["observations"].shape == (3, 1, 24, 32, 3)
    assert sample["bounding_boxes"].shape == (3, 1, 1, 4)
    assert sample["global_frame_indexes"].tolist() == [0, 2, 4]

    ds.set_observations_count(2)
    assert len(ds) == 2 * (10 - 2)

    # Non-overlapping windows (the dataset creators' mode: overlapping
    # windows would overwrite each other's rendered frames). skip_frames=1
    # here, so a 2-obs window spans 3 frames; usable starts are 0..7.
    ds.set_observations_count(2, window_stride=2)
    starts = [ds._index[i] for i in range(len(ds))]
    assert starts == [
        (0, 0), (0, 2), (0, 4), (0, 6), (1, 0), (1, 2), (1, 4), (1, 6)
    ]

    # Dataset-global frame numbering must not alias across videos (learned
    # per-frame camera offsets are indexed by it).
    ds.set_observations_count(2)
    first_video = ds[0]
    second_video = ds[len(ds) // 2]
    assert first_video["global_frame_indexes"].tolist() == [0, 2]
    assert second_video["global_frame_indexes"].tolist() == [10, 12]
    assert second_video["video_frame_indexes"].tolist() == [0, 2]


def test_batch_iteration(dataset_root):
    ds = MulticameraVideoDataset(
        os.path.join(dataset_root, "train"), observations_count=2
    )
    batches = list(ds.iterate_batches(batch_size=4, seed=1))
    assert len(batches) == len(ds) // 4
    batch = batches[0]
    assert isinstance(batch, Batch)
    assert batch.observations.shape == (4, 2, 1, 24, 32, 3)
    assert batch.focals.shape == (4, 2, 1)
    assert batch.bounding_boxes_validity.dtype == bool
    args = batch.environment_model_args()
    assert len(args) == 7


def test_synthetic_scene_content(dataset_root):
    """The player box must be visible where the bounding box claims."""
    ds = MulticameraVideoDataset(
        os.path.join(dataset_root, "train"), observations_count=1
    )
    sample = ds[0]
    img = sample["observations"][0, 0]
    box = sample["bounding_boxes"][0, 0, 0]  # (l, t, r, b) normalized
    h, w = img.shape[:2]
    l, t, r, b = (box * [w, h, w, h]).astype(int)
    assert r > l and b > t
    crop = img[t:b, l:r]
    # The crop should be dominated by player red, clearly redder than the rest.
    red_crop = (crop[..., 0] > 0.6) & (crop[..., 1] < 0.4)
    assert red_crop.mean() > 0.3
    outside_red = (img[..., 0] > 0.6) & (img[..., 1] < 0.4)
    assert red_crop.mean() > outside_red.mean()


def test_observation_stacking(dataset_root):
    ds = MulticameraVideoDataset(
        os.path.join(dataset_root, "train"), observations_count=2,
        observation_stacking=2,
    )
    sample = ds[0]
    assert sample["observations"].shape[-1] == 6  # 3 channels x 2 stacked


def test_iterate_batches_process_sharding(dataset_root):
    """Multi-host batch sharding: per-process interleaved slices of one
    global shuffled order, disjoint and collectively exhaustive."""
    from playableenvironments_tpu.data.dataset import MulticameraVideoDataset

    dataset = MulticameraVideoDataset(dataset_root, observations_count=2)
    seen = []
    for p in range(2):
        for batch in dataset.iterate_batches(
            1, seed=3, process_index=p, process_count=2, drop_last=False
        ):
            seen.append(
                (int(batch.video_indexes[0]), int(batch.video_frame_indexes[0, 0]))
            )
    # One epoch across both processes covers every sample exactly once.
    assert len(seen) == len(dataset)
    assert len(set(seen)) == len(seen)
