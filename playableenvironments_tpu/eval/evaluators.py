"""Dataset evaluators: paired metric computation over reference/generated
dataset trees, plus action-space diagnostics for playability datasets.

Replaces evaluation/reconstructed_dataset_evaluator.py (per-frame MSE /
motion-masked MSE / PSNR / SSIM / LPIPS / FID + detection MDR/ADD) and the
action-space half of reconstructed_playability_dataset_evaluator.py (Δ-MSE
action accuracy, action variance, linear-probe score). Detector and
perceptual nets are pluggable (zero-egress environment: see eval.perceptual).
"""

from __future__ import annotations

import os
import pickle
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from playableenvironments_tpu.data.dataset import MulticameraVideoDataset
from playableenvironments_tpu.eval import metrics as metrics_lib
from playableenvironments_tpu.eval.distribution_metrics import (
    IncrementalFID,
    IncrementalFVD,
)

# A detector maps an (H, W, 3) frame to an (N, 2) array of normalized
# (row, col) detection centers. The reference uses FasterRCNN detectors
# (TennisPlayerDetector / MinecraftPlayerDetector); torchvision is absent
# here, so detectors are injected (tests use a color-blob detector).
DetectorFn = Callable[[np.ndarray], np.ndarray]


def box_centers_from_annotations(video, camera_idx: int, frame_idx: int) -> np.ndarray:
    """Normalized (row, col) centers of the annotated boxes of one frame."""
    cam = video.videos[camera_idx]
    boxes = np.asarray(cam.bounding_boxes[frame_idx], np.float32).T  # (O, 4)
    validity = np.asarray(cam.bounding_boxes_validity[frame_idx], bool)
    boxes = boxes[validity]
    centers = np.stack(
        [(boxes[:, 1] + boxes[:, 3]) / 2.0, (boxes[:, 0] + boxes[:, 2]) / 2.0],
        axis=-1,
    ) if len(boxes) else np.zeros((0, 2), np.float32)
    return centers


def _make_vgg_sim_fn(vgg_variables):
    """Jitted per-frame VGG cosine similarity over (N, H, W, 3) batches."""
    from playableenvironments_tpu.eval.perceptual import (
        VGG19_CUTS,
        VGG19_PLAN,
        VGGFeatures,
        vgg_cosine_similarity,
    )

    net = VGGFeatures(VGG19_PLAN, VGG19_CUTS[:3])

    @jax.jit
    def fn(a, b):
        fa = net.apply(vgg_variables, a)
        fb = net.apply(vgg_variables, b)
        return vgg_cosine_similarity(fa, fb)

    return fn


class ReconstructedDatasetEvaluator:
    """Paired evaluation of a generated dataset tree against its reference.

    Reference: evaluation/reconstructed_dataset_evaluator.py:230-403. Windows
    of `window_size` frames feed the motion-masked MSE (evaluation batching
    `observations_count: 16`).
    """

    def __init__(
        self,
        window_size: int = 16,
        detector: Optional[DetectorFn] = None,
        detection_threshold: float = 0.1,
        lpips_fn: Optional[Callable] = None,
        compute_fid: bool = True,
        vgg_variables=None,
    ):
        """:param vgg_variables: VGGFeatures variables; enables the per-frame
        VGG cosine-similarity metric (reconstructed_dataset_evaluator.py:
        VGGCosineSimilarity). Defaults to randomly-initialized features
        (self-consistent; supply torch-converted weights for published-number
        comparability)."""
        self.window_size = window_size
        self.detector = detector
        self.detection_threshold = detection_threshold
        self.lpips_fn = lpips_fn
        self.compute_fid = compute_fid
        self._vgg_selfconsistent = vgg_variables is None
        if vgg_variables is None:
            from playableenvironments_tpu.eval.perceptual import init_vgg19

            vgg_variables = init_vgg19(jax.random.PRNGKey(0), cuts=3)
        self._vgg_sim_fn = _make_vgg_sim_fn(vgg_variables)

    def _on_frames(
        self,
        video_idx: int,
        camera_idx: int,
        ref_frames: np.ndarray,
        gen_frames: np.ndarray,
    ) -> None:
        """Subclass hook over each already-decoded (T, H, W, 3) stack pair."""

    def compute_metrics(
        self, reference_root: str, generated_root: str
    ) -> Dict[str, float]:
        reference = MulticameraVideoDataset(reference_root, observations_count=1)
        generated = MulticameraVideoDataset(generated_root, observations_count=1)
        if len(reference.videos) != len(generated.videos):
            # Same contract as the FVD evaluator: zipping silently truncates
            # (or worse, mispairs) when a generation run died halfway.
            raise ValueError(
                "reference and generated datasets should have the same videos: "
                f"{len(reference.videos)} vs {len(generated.videos)}"
            )

        mses, psnrs, ssims, masked_mses, lpips_values = [], [], [], [], []
        vgg_sims = []
        detection = metrics_lib.DetectionScore(self.detection_threshold)
        fid = IncrementalFID() if self.compute_fid else None

        batched_metrics = jax.jit(
            lambda a, b: (
                metrics_lib.mse(a, b),
                metrics_lib.psnr(a, b),
                metrics_lib.ssim(a, b),
            )
        )

        for video_idx, (ref_video, gen_video) in enumerate(
            zip(reference.videos, generated.videos)
        ):
            for camera_idx in range(ref_video.cameras_count):
                ref_cam = ref_video.videos[camera_idx]
                gen_cam = gen_video.videos[camera_idx]
                frames_count = min(ref_cam.frames_count, gen_cam.frames_count)

                ref_frames = np.stack(
                    [ref_cam.get_frame(i) for i in range(frames_count)]
                )
                gen_frames = np.stack(
                    [gen_cam.get_frame(i) for i in range(frames_count)]
                )

                m, p, s = batched_metrics(
                    jnp.asarray(ref_frames), jnp.asarray(gen_frames)
                )
                mses.extend(np.asarray(m).tolist())
                psnrs.extend(np.asarray(p).tolist())
                ssims.extend(np.asarray(s).tolist())

                for start in range(0, frames_count - self.window_size + 1,
                                   self.window_size):
                    masked_mses.append(
                        float(
                            metrics_lib.motion_masked_mse(
                                jnp.asarray(ref_frames[start : start + self.window_size]),
                                jnp.asarray(gen_frames[start : start + self.window_size]),
                            )
                        )
                    )

                if self.lpips_fn is not None:
                    lpips_values.extend(
                        np.asarray(self.lpips_fn(ref_frames, gen_frames)).tolist()
                    )

                if self._vgg_sim_fn is not None:
                    vgg_sims.extend(
                        np.asarray(
                            self._vgg_sim_fn(
                                jnp.asarray(ref_frames), jnp.asarray(gen_frames)
                            )
                        ).tolist()
                    )

                if self.detector is not None:
                    for i in range(frames_count):
                        ref_centers = box_centers_from_annotations(
                            ref_video, camera_idx, i
                        )
                        detected = self.detector(gen_frames[i])
                        detection.update(ref_centers, detected)

                if fid is not None:
                    fid.update_reference(ref_frames)
                    fid.update_generated(gen_frames)

                # Subclass hook over the already-decoded stacks (the
                # playability evaluator folds its FVD accumulation in here
                # instead of re-decoding every frame a second time).
                self._on_frames(video_idx, camera_idx, ref_frames, gen_frames)

        results = {
            "mse": float(np.mean(mses)),
            "psnr": float(np.mean(psnrs)),
            "ssim": float(np.mean(ssims)),
        }
        if masked_mses:
            results["motion_masked_mse"] = float(np.mean(masked_mses))
        if lpips_values:
            results["lpips"] = float(np.mean(lpips_values))
        if vgg_sims:
            # Random-init features are self-consistent but NOT comparable to
            # the reference's pretrained-VGG number — flag them in the key.
            key = (
                "vgg_cosine_similarity_selfconsistent"
                if self._vgg_selfconsistent
                else "vgg_cosine_similarity"
            )
            results[key] = float(np.mean(vgg_sims))
        if self.detector is not None:
            results.update(detection.results())
        if fid is not None:
            results["fid"] = fid.compute()
        return results


class ReconstructedPlayabilityDatasetEvaluator(ReconstructedDatasetEvaluator):
    """Adds action-space diagnostics + FVD over the re-enacted dataset.
    Reference: reconstructed_playability_dataset_evaluator.py:151-800."""

    def __init__(
        self,
        actions_count: int,
        clip_length: int = 8,
        plots_directory: Optional[str] = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.actions_count = actions_count
        self.clip_length = clip_length
        # When set, movement-density / mean-vector plots are written there
        # (reconstructed_playability_dataset_evaluator.py:467-505).
        self.plots_directory = plots_directory

    def _on_frames(self, video_idx, camera_idx, ref_frames, gen_frames):
        # FVD over aligned clips, folded into the parent's decode loop so
        # every frame is decoded exactly once (camera 0 only, matching the
        # reference's playability FVD).
        if camera_idx != 0:
            return
        frames_count = ref_frames.shape[0]
        for start in range(0, frames_count - self.clip_length + 1, self.clip_length):
            self._fvd.update_reference(
                ref_frames[None, start : start + self.clip_length]
            )
            self._fvd.update_generated(
                gen_frames[None, start : start + self.clip_length]
            )

    def compute_metrics(
        self, reference_root: str, generated_root: str
    ) -> Dict[str, float]:
        self._fvd = IncrementalFVD()
        results = super().compute_metrics(reference_root, generated_root)
        fvd = self._fvd

        # Annotation-only pass (no frame decode): ground-truth object
        # movement (box centers) vs the inferred actions recorded by the
        # playability creator.
        reference = MulticameraVideoDataset(reference_root, observations_count=1)
        generated = MulticameraVideoDataset(generated_root, observations_count=1)
        movements, actions = [], []
        for ref_video, gen_video in zip(reference.videos, generated.videos):
            cam_ref = ref_video.videos[0]
            cam_gen = gen_video.videos[0]
            frames_count = min(cam_ref.frames_count, cam_gen.frames_count)
            for i in range(frames_count - 1):
                entry = cam_gen.metadata[i] if i < len(cam_gen.metadata) else {}
                action = entry.get("inferred_action") if isinstance(entry, dict) else None
                c0 = box_centers_from_annotations(ref_video, 0, i)
                c1 = box_centers_from_annotations(ref_video, 0, i + 1)
                if action is None or len(c0) == 0 or len(c1) == 0:
                    continue
                movements.append((c1[0] - c0[0]))
                actions.append(int(action))

        if movements:
            movements_np = np.stack(movements)
            actions_np = np.asarray(actions)
            results.update(
                metrics_lib.action_variance(movements_np, actions_np, self.actions_count)
            )
            results["delta_mse_action_accuracy"] = (
                metrics_lib.delta_mse_action_accuracy(
                    movements_np, actions_np, self.actions_count
                )
            )
            results["action_classification_score"] = (
                metrics_lib.action_classification_score(movements_np, actions_np)
            )
            if self.plots_directory is not None:
                from playableenvironments_tpu.eval import plotting

                plotting.plot_density_2d(
                    actions_np, movements_np, self.actions_count,
                    self.plots_directory, prefix="world_",
                )
                plotting.plot_density_2d(
                    actions_np, movements_np, self.actions_count,
                    self.plots_directory, prefix="world_", merged=True,
                )
                plotting.plot_mean_vectors_2d(
                    actions_np, movements_np, self.actions_count,
                    self.plots_directory, prefix="world_",
                )
                plotting.plot_density_1d(
                    actions_np,
                    np.linalg.norm(movements_np, axis=-1),
                    self.actions_count,
                    os.path.join(self.plots_directory, "world_magnitude.png"),
                    prefix="world_",
                )
        try:
            results["fvd"] = fvd.compute()
        except ValueError as error:
            # Too few sequences for covariance estimation etc. — record the
            # reason instead of silently dropping the metric.
            print(f"FVD computation failed: {error}")
            results["fvd_error"] = str(error)
        return results


class ReconstructedDatasetFVDEvaluator:
    """Standalone FVD pass over a paired reference/generated dataset tree.

    The reference isolates FVD in its own evaluator + entry script because
    the metric lives in a TensorFlow 1.x session
    (evaluation/reconstructed_dataset_fvd_evaluator.py:11-62,
    evaluate_fvd_reconstructed_dataset.py); here the embedder is JAX so the
    split is kept only for CLI parity."""

    def __init__(self, clip_length: int = 16):
        self.clip_length = clip_length

    def compute_metrics(
        self, reference_root: str, generated_root: str
    ) -> Dict[str, float]:
        reference = MulticameraVideoDataset(reference_root, observations_count=1)
        generated = MulticameraVideoDataset(generated_root, observations_count=1)
        if len(reference.videos) != len(generated.videos):
            raise ValueError(
                "reference and generated datasets should have the same videos: "
                f"{len(reference.videos)} vs {len(generated.videos)}"
            )

        fvd = IncrementalFVD()
        for ref_video, gen_video in zip(reference.videos, generated.videos):
            for camera_idx in range(ref_video.cameras_count):
                ref_cam = ref_video.videos[camera_idx]
                gen_cam = gen_video.videos[camera_idx]
                frames_count = min(ref_cam.frames_count, gen_cam.frames_count)
                if frames_count < self.clip_length:
                    continue
                ref_frames = np.stack(
                    [ref_cam.get_frame(i) for i in range(frames_count)]
                )
                gen_frames = np.stack(
                    [gen_cam.get_frame(i) for i in range(frames_count)]
                )
                for start in range(
                    0, frames_count - self.clip_length + 1, self.clip_length
                ):
                    fvd.update_reference(
                        ref_frames[None, start : start + self.clip_length]
                    )
                    fvd.update_generated(
                        gen_frames[None, start : start + self.clip_length]
                    )
        return {"fvd": fvd.compute()}


def save_results_yaml(results: Dict[str, float], path: str):
    """Dump results as YAML (the evaluate_* scripts' output contract,
    evaluate_reconstructed_dataset.py:60-63)."""
    import yaml

    with open(path, "w") as f:
        yaml.safe_dump(
            {
                k: (v if isinstance(v, str) else float(v))
                for k, v in results.items()
            },
            f,
        )
