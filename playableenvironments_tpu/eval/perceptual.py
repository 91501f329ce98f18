"""Perceptual feature networks: VGG19 (perceptual loss) and LPIPS (metric).

Flax re-implementations of the torchvision-based extractors the reference uses
(model/layers/vgg.py slices after relu{1..5}_1; the `lpips` package's VGG16
variant). Pretrained weights cannot be downloaded in this environment (zero
egress): `load_torch_vgg19_weights` / `load_torch_lpips_weights` convert
user-supplied torch checkpoints; without them the networks run with random
weights (architecture and machinery exact, values not comparable to published
numbers — flagged by `pretrained=False` in the loaders' return).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# Convolution channel plan per VGG block.
VGG19_PLAN = ((64, 64), (128, 128), (256, 256, 256, 256), (512, 512, 512, 512), (512, 512, 512, 512))
VGG16_PLAN = ((64, 64), (128, 128), (256, 256, 256), (512, 512, 512), (512, 512, 512))

# Slice cut points: (block, conv-within-block) AFTER whose relu the feature is
# emitted. Reference Vgg19 slices = relu1_1, relu2_1, relu3_1, relu4_1, relu5_1
# (model/layers/vgg.py:31-44); LPIPS-VGG16 = relu1_2, relu2_2, relu3_3,
# relu4_3, relu5_3.
VGG19_CUTS = ((0, 0), (1, 0), (2, 0), (3, 0), (4, 0))
VGG16_CUTS = ((0, 1), (1, 1), (2, 2), (3, 2), (4, 2))

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def _max_pool_2x2(x):
    """2x2/2 max pool; the reshape-reduce lowering (ops/pool.py) has an
    equality-mask backward instead of XLA's select-and-scatter — the single
    most expensive op class in the phase-1 profile on TPU. Odd spatial
    sizes fall back to the native pool inside ops/pool."""
    from playableenvironments_tpu.ops.pool import max_pool_2x2

    return max_pool_2x2(x)


class VGGFeatures(nn.Module):
    """VGG backbone emitting intermediate relu activations at the given cuts.

    Input: (N, H, W, 3) in [0, 1]; ImageNet-normalized internally.
    """

    plan: Tuple[Tuple[int, ...], ...] = VGG19_PLAN
    cuts: Tuple[Tuple[int, int], ...] = VGG19_CUTS
    # Conv dtype; bfloat16 halves the (bandwidth-bound) feature-extraction
    # cost on TPU. Emitted cut activations are cast back to float32.
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        # Plain SAME convs: the space-to-depth lowering was tried here and
        # lost — its pad/reshape stages broke XLA's relu-into-conv fusion,
        # costing more than the MXU lanes it recovered (VGG block-0 convs
        # have 64 features, already half the lanes).
        dtype = jnp.dtype(self.compute_dtype)
        x = ((x - IMAGENET_MEAN) / IMAGENET_STD).astype(dtype)
        outputs = []
        cut_set = set(self.cuts)
        max_block = max(b for b, _ in self.cuts)
        for block_idx, widths in enumerate(self.plan):
            if block_idx > max_block:
                break
            if block_idx > 0:
                x = _max_pool_2x2(x)
            for conv_idx, width in enumerate(widths):
                x = nn.Conv(
                    width, (3, 3), dtype=dtype, name=f"conv{block_idx}_{conv_idx}"
                )(x)
                x = nn.relu(x)
                if (block_idx, conv_idx) in cut_set:
                    outputs.append(x.astype(jnp.float32))
                    if (block_idx, conv_idx) == self.cuts[-1]:
                        return outputs
        return outputs


class LPIPS(nn.Module):
    """Learned perceptual distance: unit-normalized VGG16 feature differences
    through 1x1 non-negative linear heads, spatially averaged and summed."""

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """:param a, b: (N, H, W, 3) in [0, 1]. :return: (N,) distances."""
        backbone = VGGFeatures(VGG16_PLAN, VGG16_CUTS, name="backbone")
        features_a = backbone(a)
        features_b = backbone(b)
        total = 0.0
        for idx, (fa, fb) in enumerate(zip(features_a, features_b)):
            fa = fa / jnp.clip(jnp.linalg.norm(fa, axis=-1, keepdims=True), 1e-10, None)
            fb = fb / jnp.clip(jnp.linalg.norm(fb, axis=-1, keepdims=True), 1e-10, None)
            diff = jnp.square(fa - fb)
            weight = self.param(
                f"lin_{idx}", nn.initializers.ones, (fa.shape[-1],)
            )
            weighted = diff * jnp.abs(weight)  # heads are non-negative
            total = total + jnp.mean(jnp.sum(weighted, axis=-1), axis=(-2, -1))
        return total


def vgg_cosine_similarity(features_a: List[jnp.ndarray], features_b: List[jnp.ndarray]) -> jnp.ndarray:
    """Mean cosine similarity across feature levels (evaluation/metrics:
    VGGCosineSimilarity)."""
    sims = []
    for fa, fb in zip(features_a, features_b):
        fa = fa.reshape(fa.shape[0], -1)
        fb = fb.reshape(fb.shape[0], -1)
        num = jnp.sum(fa * fb, axis=-1)
        den = jnp.linalg.norm(fa, axis=-1) * jnp.linalg.norm(fb, axis=-1)
        sims.append(num / jnp.clip(den, 1e-10, None))
    return jnp.mean(jnp.stack(sims), axis=0)


def perceptual_loss(
    variables,
    observations: jnp.ndarray,
    reconstructed: jnp.ndarray,
    cuts: int = 5,
    compute_dtype: str = "float32",
) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """L1 distance between VGG19 features of (N, H, W, 3) images in [0, 1];
    ground-truth branch stop-gradiented. Reference: training/losses.py:626-721.

    :return: (scalar total, per-level means)."""
    net = VGGFeatures(VGG19_PLAN, VGG19_CUTS[:cuts], compute_dtype=compute_dtype)
    gt = jax.lax.stop_gradient(net.apply(variables, observations))
    rec = net.apply(variables, reconstructed)
    level_losses = [jnp.mean(jnp.abs(g - r)) for g, r in zip(gt, rec)]
    return sum(level_losses), level_losses


def init_vgg19(key: jax.Array, cuts: int = 5):
    net = VGGFeatures(VGG19_PLAN, VGG19_CUTS[:cuts])
    return net.init(key, jnp.zeros((1, 64, 64, 3)))


# ---------------------------------------------------------------------------
# Torch checkpoint conversion (user-supplied weights)
# ---------------------------------------------------------------------------


def convert_torch_vgg_state_dict(
    state, plan=VGG19_PLAN, max_block: Optional[int] = None
) -> Dict:
    """torchvision VGG `state_dict` (features.N.weight/bias, OIHW) ->
    VGGFeatures variables (HWIO). Pure numpy — torch only needed to load
    the .pth (load_torch_vgg_weights)."""
    params = {}
    torch_idx = 0
    for block_idx, widths in enumerate(plan):
        if max_block is not None and block_idx > max_block:
            break
        for conv_idx, _ in enumerate(widths):
            weight = np.asarray(state[f"features.{torch_idx}.weight"])
            bias = np.asarray(state[f"features.{torch_idx}.bias"])
            params[f"conv{block_idx}_{conv_idx}"] = {
                "kernel": np.transpose(weight, (2, 3, 1, 0)),
                "bias": bias,
            }
            torch_idx += 2  # conv + relu
        torch_idx += 1  # pool
    return {"params": params}


def load_torch_vgg_weights(
    path: str, plan=VGG19_PLAN, max_block: Optional[int] = None
) -> Tuple[Dict, bool]:
    """Convert a torchvision VGG checkpoint file to VGGFeatures params.
    Returns (params_dict, pretrained=True); raises FileNotFoundError if the
    file is absent."""
    import torch

    state = torch.load(path, map_location="cpu")
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    state = {k: v.numpy() for k, v in state.items() if hasattr(v, "numpy")}
    return convert_torch_vgg_state_dict(state, plan, max_block), True
