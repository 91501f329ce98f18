"""FID / FVD: Fréchet distances over image / video embeddings.

The reference computes FID with a vendored InceptionV3 (pytorch_fid/) and FVD
with a TF1-hub I3D graph (evaluation/metrics/fvd.py:32-34). Both depend on
pretrained weights that cannot be downloaded here (zero egress), so the
design is interface-first: `IncrementalFID` / `IncrementalFVD` accumulate
streaming statistics over ANY embedding function; `default_image_embedder` /
`default_video_embedder` are self-contained convolutional embedders (VGG19
features / their temporal extension) usable for relative comparisons, and a
torchvision InceptionV3 or I3D checkpoint can be plugged in through the same
interface for published-number parity.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from playableenvironments_tpu.eval.metrics import FeatureStatistics, frechet_distance
from playableenvironments_tpu.eval.perceptual import (
    VGG19_CUTS,
    VGG19_PLAN,
    VGGFeatures,
)

EmbedFn = Callable[[np.ndarray], np.ndarray]


def default_image_embedder(key: jax.Array, image_size=(64, 64)) -> EmbedFn:
    """A deterministic conv embedder for FID-style comparisons: VGG19
    architecture (random fixed weights), global-average-pooled top features.
    Distances are comparable across runs with the same key, not against
    published Inception-based FID numbers."""
    net = VGGFeatures(VGG19_PLAN, VGG19_CUTS[:4])
    variables = net.init(key, jnp.zeros((1,) + image_size + (3,)))

    @jax.jit
    def embed(images):
        features = net.apply(variables, images)[-1]
        return jnp.mean(features, axis=(1, 2))

    def fn(images: np.ndarray) -> np.ndarray:
        return np.asarray(embed(jnp.asarray(images, jnp.float32)))

    return fn


def default_video_embedder(key: jax.Array, image_size=(64, 64)) -> EmbedFn:
    """Video embedder: per-frame conv features + temporal mean/std pooling —
    an I3D-shaped interface (clip in, one embedding out)."""
    image_fn_net = VGGFeatures(VGG19_PLAN, VGG19_CUTS[:4])
    variables = image_fn_net.init(key, jnp.zeros((1,) + image_size + (3,)))

    @jax.jit
    def embed(videos):
        n, t = videos.shape[0], videos.shape[1]
        flat = videos.reshape((-1,) + videos.shape[2:])
        features = image_fn_net.apply(variables, flat)[-1]
        pooled = jnp.mean(features, axis=(1, 2)).reshape(n, t, -1)
        return jnp.concatenate(
            [jnp.mean(pooled, axis=1), jnp.std(pooled, axis=1)], axis=-1
        )

    def fn(videos: np.ndarray) -> np.ndarray:
        """:param videos: (N, T, H, W, 3) in [0, 1]."""
        return np.asarray(embed(jnp.asarray(videos, jnp.float32)))

    return fn


class IncrementalFrechet:
    """Streaming two-population Fréchet distance over an embedding function.
    Covers the reference's IncrementalFID (pytorch_fid) and IncrementalFVD
    (fvd.py:253-446) usage patterns."""

    def __init__(self, embed_fn: EmbedFn):
        self.embed_fn = embed_fn
        self._stats_a: Optional[FeatureStatistics] = None
        self._stats_b: Optional[FeatureStatistics] = None

    def _update(self, which: str, batch: np.ndarray):
        features = self.embed_fn(batch)
        attr = f"_stats_{which}"
        stats = getattr(self, attr)
        if stats is None:
            stats = FeatureStatistics(features.shape[1])
            setattr(self, attr, stats)
        stats.update(features)

    def update_reference(self, batch: np.ndarray):
        self._update("a", batch)

    def update_generated(self, batch: np.ndarray):
        self._update("b", batch)

    def compute(self) -> float:
        if self._stats_a is None or self._stats_b is None:
            raise ValueError("both populations need at least one batch")
        return frechet_distance(*self._stats_a.finalize(), *self._stats_b.finalize())


def IncrementalFID(embed_fn: Optional[EmbedFn] = None) -> IncrementalFrechet:
    return IncrementalFrechet(embed_fn or default_image_embedder(jax.random.PRNGKey(0)))


def IncrementalFVD(embed_fn: Optional[EmbedFn] = None) -> IncrementalFrechet:
    return IncrementalFrechet(embed_fn or default_video_embedder(jax.random.PRNGKey(0)))
