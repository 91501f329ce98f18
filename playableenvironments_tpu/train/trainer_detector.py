"""Detector training: the TPU-native replacement for the vendored torchvision
detection suite (evaluation/detection/engine.py train/eval loops + its
torch.distributed utilities, utils.py:273-294 — the reference's only
NCCL/DDP code).

Distribution model: one jitted train step; run it under a `jax.sharding.Mesh`
with the batch sharded over the data axis (parallel/mesh.py) and XLA inserts
the gradient all-reduce over ICI — the SPMD equivalent of the reference's
`init_distributed_mode` + DistributedDataParallel branch (engine.py:65).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, Optional, Tuple

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from playableenvironments_tpu.models.detector import (
    CenterNetDetector,
    decode_detections,
    detection_loss,
    splat_gaussian_targets,
)
from playableenvironments_tpu.train.state import TrainState


@dataclasses.dataclass(frozen=True)
class DetectorTrainingConfig:
    learning_rate: float = 1e-3
    weight_decay: float = 1e-4
    max_steps: int = 1000
    base_features: int = 32


class DetectorTrainer:
    """Train a CenterNetDetector on dataset bounding-box annotations
    (the same supervision train_detector.py fine-tuned FasterRCNN on)."""

    def __init__(self, cfg: DetectorTrainingConfig):
        self.cfg = cfg
        self.model = CenterNetDetector(base_features=cfg.base_features)
        self.tx = optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay)

    def init_state(self, key: jax.Array, example_images: jnp.ndarray) -> TrainState:
        variables = jax.jit(
            functools.partial(self.model.init, train=False)
        )(key, example_images)
        return TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
            tx=self.tx,
        )

    def train_step(
        self,
        state: TrainState,
        images: jnp.ndarray,
        boxes: jnp.ndarray,
        validity: jnp.ndarray,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """:param images: (B, H, W, 3); boxes (B, O, 4) normalized ltrb;
        validity (B, O) bool."""

        def loss_fn(params):
            outputs, mutated = self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
            )
            grid_hw = outputs["heatmap"].shape[-2:]
            targets = splat_gaussian_targets(boxes, validity, grid_hw)
            losses = detection_loss(outputs, targets)
            return losses["loss"], (losses, mutated["batch_stats"])

        (_, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads).replace(batch_stats=new_stats)
        return new_state, losses

    def detect_fn(self, state: TrainState, top_k: int = 8, threshold: float = 0.3):
        """Build an eval-mode DetectorFn for the dataset evaluators: one
        (H, W, 3) frame -> (N, 2) normalized (row, col) centers."""
        model = self.model

        @jax.jit
        def forward(params, batch_stats, images):
            outputs = model.apply(
                {"params": params, "batch_stats": batch_stats},
                images,
                train=False,
            )
            return decode_detections(outputs, top_k=top_k)

        def detector(frame: np.ndarray) -> np.ndarray:
            out = forward(state.params, state.batch_stats, frame[None])
            scores = np.asarray(out["scores"][0])
            centers = np.asarray(out["centers"][0])
            return centers[scores >= threshold]

        return detector


@functools.partial(jax.jit, static_argnums=(0, 2))
def _eval_forward(model, variables, top_k, images):
    outputs = model.apply(variables, images, train=False)
    return decode_detections(outputs, top_k=top_k)


def evaluate_detection(
    trainer: DetectorTrainer,
    state: TrainState,
    batches,
    max_batches: int = 8,
    top_k: int = 8,
    threshold: float = 0.3,
    match_threshold: float = 0.1,
) -> Dict[str, float]:
    """Validation-time detection quality: the eval-mode detector over a val
    split, scored as MDR/ADD against the annotated boxes — the observable
    signal the reference gets from its per-epoch COCO evaluation
    (evaluation/detection/engine.py evaluate + coco_eval.py). Without it a
    detector can silently feed garbage into the dataset evaluators' MDR/ADD.

    :param batches: iterable of (images, boxes, validity) — e.g.
        `dataset_detection_batches(val_dataset, bs, shuffle=False)`.
    :return: {"missed_detection_rate", "average_detection_distance",
        "mean_detections_per_image"}.
    """
    from playableenvironments_tpu.eval.metrics import DetectionScore

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    score = DetectionScore(match_threshold)
    detections = 0
    images_seen = 0
    for batch_idx, (images, boxes, validity) in enumerate(batches):
        if batch_idx >= max_batches:
            break
        out = _eval_forward(trainer.model, variables, top_k, jnp.asarray(images))
        scores_np = np.asarray(out["scores"])
        centers_np = np.asarray(out["centers"])
        for b in range(images.shape[0]):
            ref = np.asarray(boxes[b])[np.asarray(validity[b], bool)]
            # ltrb -> (row, col) centers, the DetectorFn coordinate contract.
            ref_centers = np.stack(
                [(ref[:, 1] + ref[:, 3]) / 2.0, (ref[:, 0] + ref[:, 2]) / 2.0],
                axis=-1,
            )
            detected = centers_np[b][scores_np[b] >= threshold]
            score.update(ref_centers, detected)
            detections += len(detected)
            images_seen += 1
    results = score.results()
    results["mean_detections_per_image"] = detections / max(images_seen, 1)
    return results


def dataset_detection_batches(
    dataset, batch_size: int, shuffle: bool = True, seed: int = 0
) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Adapt MulticameraVideoDataset samples into detector batches
    (images, boxes ltrb normalized, validity) — the counterpart of
    evaluation/detection/dataset_adapter logic."""
    for batch in dataset.iterate_batches(batch_size, shuffle=shuffle, seed=seed):
        # (B, T, C, H, W, 3K) -> first observation, first camera, last stack.
        images = np.asarray(batch.observations)[:, 0, 0, ..., :3]
        boxes = np.asarray(batch.bounding_boxes)[:, 0, 0]
        validity = np.asarray(batch.bounding_boxes_validity)[:, 0, 0]
        yield images, boxes, validity
