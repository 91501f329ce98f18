"""Single-class player detector: CenterNet-style heatmap + size regression.

TPU-native replacement for the reference's player detectors
(evaluation/metrics/tennis_player_detector.py:137 /
minecraft_player_detector.py:133 — pretrained torchvision FasterRCNNs) and
the vendored torchvision detection-training suite (evaluation/detection/
engine.py, train_detector.py). Pretrained torch weights are unavailable in a
zero-egress build, so detectors are trained in-framework on the dataset's
own bounding-box annotations (the same boxes the reference fine-tuned its
Minecraft FasterRCNN on, train_detector.py).

Why CenterNet and not an RCNN: anchor-free center detection is entirely
static-shape (dense heatmap + fixed top-k decode) — no proposal pruning or
dynamic NMS, so the whole forward jits onto the MXU; NMS is a 3x3 max-pool.

Everything here is fully jittable; decode returns fixed-size (top_k) arrays
with a validity score rather than dynamic detections.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from playableenvironments_tpu.models.layers import ResidualBlock


class CenterNetDetector(nn.Module):
    """Conv backbone (stride 4) -> center heatmap, box size, center offset.

    Output resolution is input/4. All heads are dense; train with
    `detection_loss`, decode with `decode_detections`.
    """

    base_features: int = 32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = True) -> Dict:
        """:param images: (B, H, W, 3) in [0, 1].
        :return: dict of heatmap (B, H/4, W/4) logits, sizes (B, H/4, W/4, 2)
            and offsets (B, H/4, W/4, 2), sizes normalized to image fraction.
        """
        f = self.base_features
        y = nn.Conv(f, (7, 7), strides=(2, 2), name="stem")(images)
        y = nn.relu(nn.BatchNorm(use_running_average=not train, name="stem_bn")(y))
        y = nn.Conv(f * 2, (3, 3), strides=(2, 2), name="down1")(y)
        y = nn.relu(nn.BatchNorm(use_running_average=not train, name="down1_bn")(y))
        y = ResidualBlock(f * 2, name="res1")(y, train)
        y = ResidualBlock(f * 2, name="res2")(y, train)
        # Dilated context instead of further downsampling (keeps H/4 output).
        y = nn.Conv(f * 2, (3, 3), kernel_dilation=(2, 2), name="context")(y)
        y = nn.relu(y)
        heatmap = nn.Conv(
            1, (1, 1), name="heatmap_head",
            bias_init=nn.initializers.constant(-2.19),  # focal-loss prior
        )(y)[..., 0]
        sizes = nn.sigmoid(nn.Conv(2, (1, 1), name="size_head")(y))
        offsets = nn.sigmoid(nn.Conv(2, (1, 1), name="offset_head")(y))
        return {"heatmap": heatmap, "sizes": sizes, "offsets": offsets}


def splat_gaussian_targets(
    boxes: jnp.ndarray,
    validity: jnp.ndarray,
    grid_hw: Tuple[int, int],
    min_sigma: float = 0.8,
) -> Dict:
    """Build dense training targets from normalized ltrb boxes.

    :param boxes: (B, O, 4) normalized (left, top, right, bottom) in [0, 1].
    :param validity: (B, O) bool.
    :param grid_hw: heatmap resolution (H/4, W/4).
    :return: heatmap (B, gh, gw) in [0,1], sizes/offsets (B, gh, gw, 2),
        weight (B, gh, gw) marking cells owning a center.
    """
    gh, gw = grid_hw
    cy = (boxes[..., 1] + boxes[..., 3]) * 0.5 * gh  # grid rows
    cx = (boxes[..., 0] + boxes[..., 2]) * 0.5 * gw
    h = jnp.clip((boxes[..., 3] - boxes[..., 1]), 0.0, 1.0)
    w = jnp.clip((boxes[..., 2] - boxes[..., 0]), 0.0, 1.0)

    rows = jnp.arange(gh)[:, None]
    cols = jnp.arange(gw)[None, :]

    # Per-object Gaussian splats, combined with max (CornerNet/CenterNet).
    # Centered on the INTEGER center cell so the peak is exactly 1 there —
    # detection_loss's positive mask is `gt > 0.999`.
    center_r = jnp.clip(jnp.floor(cy), 0, gh - 1)
    center_c = jnp.clip(jnp.floor(cx), 0, gw - 1)
    sigma_r = jnp.maximum(h * gh / 6.0, min_sigma)[..., None, None]
    sigma_c = jnp.maximum(w * gw / 6.0, min_sigma)[..., None, None]
    d_r = rows[None, None] - center_r[..., None, None]
    d_c = cols[None, None] - center_c[..., None, None]
    per_object = jnp.exp(
        -(d_r**2) / (2 * sigma_r**2) - (d_c**2) / (2 * sigma_c**2)
    )
    per_object = per_object * validity[..., None, None]
    heatmap = jnp.max(per_object, axis=-3)

    # Center-cell regression targets.
    r_idx = jnp.clip(cy.astype(jnp.int32), 0, gh - 1)
    c_idx = jnp.clip(cx.astype(jnp.int32), 0, gw - 1)
    is_center = jnp.logical_and(
        rows[None, None] == r_idx[..., None, None],
        cols[None, None] == c_idx[..., None, None],
    )
    is_center = jnp.logical_and(is_center, validity[..., None, None])

    def scatter(values):
        # values: (B, O) -> (B, gh, gw) via masked max over objects
        return jnp.max(
            jnp.where(is_center, values[..., None, None], 0.0), axis=-3
        )

    sizes = jnp.stack([scatter(h), scatter(w)], axis=-1)
    offsets = jnp.stack(
        [scatter(cy - jnp.floor(cy)), scatter(cx - jnp.floor(cx))], axis=-1
    )
    weight = jnp.any(is_center, axis=-3).astype(jnp.float32)
    return {"heatmap": heatmap, "sizes": sizes, "offsets": offsets,
            "weight": weight}


def detection_loss(outputs: Dict, targets: Dict) -> Dict[str, jnp.ndarray]:
    """Penalty-reduced focal loss on the heatmap + masked L1 on size/offset
    (the CenterNet objective, arXiv:1904.07850)."""
    pred = jax.nn.sigmoid(outputs["heatmap"])
    pred = jnp.clip(pred, 1e-6, 1.0 - 1e-6)
    gt = targets["heatmap"]
    pos = (gt > 0.999).astype(jnp.float32)
    n_pos = jnp.maximum(jnp.sum(pos), 1.0)
    pos_loss = -jnp.log(pred) * (1.0 - pred) ** 2 * pos
    neg_loss = -jnp.log(1.0 - pred) * pred**2 * (1.0 - gt) ** 4 * (1.0 - pos)
    heatmap_loss = (jnp.sum(pos_loss) + jnp.sum(neg_loss)) / n_pos

    w = targets["weight"][..., None]
    n_centers = jnp.maximum(jnp.sum(w), 1.0)
    size_loss = jnp.sum(jnp.abs(outputs["sizes"] - targets["sizes"]) * w) / n_centers
    offset_loss = (
        jnp.sum(jnp.abs(outputs["offsets"] - targets["offsets"]) * w) / n_centers
    )
    total = heatmap_loss + size_loss + 0.5 * offset_loss
    return {
        "loss": total,
        "heatmap_loss": heatmap_loss,
        "size_loss": size_loss,
        "offset_loss": offset_loss,
    }


def decode_detections(outputs: Dict, top_k: int = 8) -> Dict[str, jnp.ndarray]:
    """Fixed-size decode: 3x3 max-pool NMS + top-k peaks.

    :return: scores (B, k), centers (B, k, 2) normalized (row, col),
        boxes (B, k, 4) normalized ltrb.
    """
    heat = jax.nn.sigmoid(outputs["heatmap"])[..., None]
    pooled = nn.max_pool(heat, (3, 3), strides=(1, 1), padding="SAME")
    peaks = jnp.where(heat == pooled, heat, 0.0)[..., 0]

    b, gh, gw = peaks.shape
    flat = peaks.reshape(b, gh * gw)
    scores, idx = jax.lax.top_k(flat, top_k)
    r = idx // gw
    c = idx % gw

    def gather_maps(maps):  # (B, gh, gw, 2) -> (B, k, 2)
        flat_maps = maps.reshape(b, gh * gw, 2)
        return jnp.take_along_axis(flat_maps, idx[..., None], axis=1)

    offsets = gather_maps(outputs["offsets"])
    sizes = gather_maps(outputs["sizes"])
    cy = (r.astype(jnp.float32) + offsets[..., 0]) / gh
    cx = (c.astype(jnp.float32) + offsets[..., 1]) / gw
    h = sizes[..., 0]
    w = sizes[..., 1]
    boxes = jnp.stack(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1
    )
    centers = jnp.stack([cy, cx], axis=-1)
    return {"scores": scores, "centers": centers, "boxes": boxes}
