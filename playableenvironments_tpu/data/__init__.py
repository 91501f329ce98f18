"""Dataset layer: reference-compatible on-disk videos, windowed sampling,
fixed-shape batches, and a synthetic data generator for tests/smoke runs."""

from playableenvironments_tpu.data.batching import Batch
from playableenvironments_tpu.data.dataset import MulticameraVideoDataset
from playableenvironments_tpu.data.video import MulticameraVideo, PoseParametersNumpy, Video
