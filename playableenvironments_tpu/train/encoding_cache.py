"""Precomputed frozen scene encodings for phase-3 training.

Phase 3 trains the action module on the FROZEN phase-2 model's scene
encodings and never renders (SURVEY.md §3.2). The reference re-runs the
no-grad environment forward inside every step
(model/playable_environment_model.py:173-175) — on TPU that re-encodes
bs*T*cameras full-resolution frames through the conv encoders per step while
the actual trainable compute is a few tiny MLPs/LSTMs. Since the encoding is
deterministic in eval mode (no style shuffle, no perturbation, camera offsets
zeroed), we instead encode every frame of the dataset exactly ONCE up front
and train on cached state vectors: steps drop from ~seconds to milliseconds,
image decode/IO leaves the training loop entirely, and sequence-length
annealing becomes pure index arithmetic over the cache.
"""

from __future__ import annotations

import functools
from typing import Iterator, List, Optional, Tuple

import jax
import numpy as np

from playableenvironments_tpu.data.batching import Batch, collate
from playableenvironments_tpu.data.dataset import MulticameraVideoDataset
from playableenvironments_tpu.scene.encoding import SceneEncoding


class EncodingCache:
    """Per-frame scene encodings for a dataset, windowable into batches.

    Leaves are host numpy arrays of shape (total_frames, ...) — per frame:
    cameras (C, 3)x2 + focals (C,), object rotations/translations (O, 3),
    style/deformation (O, F), in_scene (O). A dataset of 100k frames is a few
    hundred MB at most.
    """

    def __init__(
        self,
        encoding: SceneEncoding,
        video_slices: List[Tuple[int, int]],
        skip_frames: int,
    ):
        """:param encoding: pytree with leading axis = total frames (B and T
            axes collapsed away).
        :param video_slices: per video (start, frames_count) into that axis.
        :param skip_frames: the dataset's inter-observation frame skip.
        """
        self.encoding = encoding
        self.video_slices = video_slices
        self.skip_frames = skip_frames

    # ------------------------------------------------------------------

    @classmethod
    def build(
        cls,
        encode_fn,
        dataset: MulticameraVideoDataset,
        key: jax.Array,
        batch_size: int = 32,
        log_fn=None,
    ) -> "EncodingCache":
        """Encode every frame of `dataset` once.

        :param encode_fn: (batch, key) -> SceneEncoding for T=1 batches
            (jit it before passing — e.g.
            ``jax.jit(lambda b, k: trainer.encode_batch(extra, b, k))``).
        :param dataset: the phase-3 training dataset. Iterated at
            observations_count=1 so every frame is visited exactly once; the
            original observations_count is restored afterwards.
        """
        original_count = dataset.observations_count
        dataset.set_observations_count(1)
        try:
            samples = len(dataset)
            if samples == 0:
                # observations_count is 1 here, so every decoded frame is a
                # valid window: zero samples can only mean zero frames.
                raise ValueError(
                    "encoding cache: the dataset has no frames (empty split)"
                )
            video_slices: List[Tuple[int, int]] = []
            start = 0
            for video in dataset.videos:
                video_slices.append((start, video.frames_count))
                start += video.frames_count
            assert start == samples, (start, samples)

            rows: List[SceneEncoding] = []
            for batch_start in range(0, samples, batch_size):
                idxs = list(range(batch_start, min(batch_start + batch_size, samples)))
                pad = batch_size - len(idxs)
                batch = collate([dataset[i] for i in idxs + [idxs[-1]] * pad])
                encoded = encode_fn(batch, jax.random.fold_in(key, batch_start))
                # (B, 1, ...) -> (B, ...) host rows; drop padding.
                encoded = jax.tree.map(
                    lambda x: np.asarray(x)[: len(idxs), 0], encoded
                )
                rows.append(encoded)
                if log_fn is not None and (batch_start // batch_size) % 16 == 0:
                    log_fn(
                        f"encoding cache: {min(batch_start + batch_size, samples)}"
                        f"/{samples} frames"
                    )
            encoding = jax.tree.map(
                lambda *leaves: np.concatenate(leaves, axis=0), *rows
            )
        finally:
            dataset.set_observations_count(original_count)
        return cls(encoding, video_slices, dataset.skip_frames)

    # ------------------------------------------------------------------

    def windows(self, observations_count: int) -> np.ndarray:
        """Global frame indexes of every valid window start (mirrors
        MulticameraVideoDataset.set_observations_count's index space)."""
        block = (self.skip_frames + 1) * (observations_count - 1) + 1
        starts = []
        for video_start, frames_count in self.video_slices:
            usable = frames_count - block + 1
            if usable > 0:
                starts.append(video_start + np.arange(usable))
        if not starts:
            return np.zeros((0,), np.int64)
        return np.concatenate(starts)

    def gather_windows(
        self, starts: np.ndarray, observations_count: int
    ) -> SceneEncoding:
        """Assemble a (bs, T, ...) encoding batch from window start indexes."""
        step = self.skip_frames + 1
        idx = starts[:, None] + np.arange(observations_count)[None, :] * step
        return jax.tree.map(lambda leaf: leaf[idx], self.encoding)

    def iterate_encoding_batches(
        self,
        batch_size: int,
        observations_count: int,
        seed: int = 0,
        shuffle: bool = True,
        drop_last: bool = True,
        process_index: int = 0,
        process_count: int = 1,
    ) -> Iterator[SceneEncoding]:
        """One shuffled epoch of (bs, T, ...) encoding batches.

        Multi-host contract matches MulticameraVideoDataset.iterate_batches:
        same seed -> same global order on every process; each takes its
        interleaved slice of an order pre-truncated to a process_count
        multiple, so per-host batch counts always agree.
        """
        order = self.windows(observations_count)
        if shuffle:
            order = order.copy()
            np.random.default_rng(seed).shuffle(order)
        if process_count > 1:
            usable = (len(order) // process_count) * process_count
            order = order[:usable][process_index::process_count]
        n_batches = (
            len(order) // batch_size if drop_last else -(-len(order) // batch_size)
        )
        for b in range(n_batches):
            starts = order[b * batch_size : (b + 1) * batch_size]
            yield self.gather_windows(starts, observations_count)

    # ------------------------------------------------------------------

    def save(self, path: str, fingerprint: float = 0.0):
        """npz snapshot (cache persists across resumed runs).

        :param fingerprint: identifies the frozen env weights that produced
            the cache (e.g. the param-sum from `params_fingerprint`); `load`
            callers compare it to reject stale caches after a checkpoint swap.
        """
        arrays = {
            f"leaf_{name}": leaf
            for name, leaf in vars(self.encoding).items()
        }
        np.savez_compressed(
            path,
            video_slices=np.asarray(self.video_slices, np.int64),
            skip_frames=np.int64(self.skip_frames),
            fingerprint=np.float64(fingerprint),
            **arrays,
        )

    @classmethod
    def load(cls, path: str, fingerprint: Optional[float] = None) -> "EncodingCache":
        """:param fingerprint: when given, raises ValueError if the stored
        fingerprint differs (cache built from different env weights)."""
        data = np.load(path)
        stored = float(data["fingerprint"]) if "fingerprint" in data.files else 0.0
        if fingerprint is not None and not np.isclose(
            stored, fingerprint, rtol=1e-6, atol=1e-8
        ):
            raise ValueError(
                f"encoding cache at {path} was built from different frozen "
                f"env weights (fingerprint {stored} != {fingerprint}) — "
                "rebuild it"
            )
        leaves = {
            name[len("leaf_"):]: data[name]
            for name in data.files
            if name.startswith("leaf_")
        }
        return cls(
            SceneEncoding(**leaves),
            [tuple(row) for row in data["video_slices"]],
            int(data["skip_frames"]),
        )


def params_fingerprint(params) -> float:
    """A cheap deterministic scalar fingerprint of a parameter pytree."""
    total = 0.0
    for leaf in jax.tree.leaves(params):
        arr = np.asarray(leaf)
        if arr.dtype.kind in "fiu":
            total += float(np.sum(np.abs(arr.astype(np.float64)))) % 1e9
    return total % 1e9
