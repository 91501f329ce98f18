"""Shared experiment assembly: YAML config -> datasets, models, trainers.

The YAML schema mirrors the reference's (configs/tennis/193_...yaml): `data`,
`model`, `playable_model`, `training`, `playable_model_training`,
`evaluation` sections. Entry scripts call `build_experiment` then drive the
phase-specific loop.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from playableenvironments_tpu import config as config_lib
from playableenvironments_tpu.data.dataset import MulticameraVideoDataset
from playableenvironments_tpu.render.environment_model import EnvironmentModel
from playableenvironments_tpu.train.trainer_synthesis import (
    LossWeights,
    SynthesisTrainer,
    SynthesisTrainingConfig,
)
from playableenvironments_tpu.utils.logger import Logger


def load_yaml(path: str) -> Dict[str, Any]:
    import yaml

    with open(path) as f:
        return yaml.safe_load(f)


def loss_weights_from_dict(d: Dict[str, Any]) -> LossWeights:
    return LossWeights(
        reconstruction=float(d.get("reconstruction_loss_lambda", 1.0)),
        perceptual=float(d.get("perceptual_loss_lambda", 0.0)),
        ray_object_distance=float(d.get("ray_object_distance_loss_lambda", 0.0)),
        bounding_box=float(d.get("bounding_box_loss_lambda", 0.0)),
        displacements_magnitude=float(d.get("displacements_magnitude_loss_lambda", 0.0)),
        divergence=float(d.get("divergence_loss_lambda", 0.0)),
        opacity=float(d.get("opacity_loss_lambda", 0.0)),
        attention=float(d.get("attention_loss_lambda", 0.0)),
        sharpness=float(d.get("sharpness_loss_lambda", 0.0)),
        sharpness_mean=float(d.get("sharpness_loss_mean", 0.5)),
        sharpness_std=float(d.get("sharpness_loss_std", 0.15)),
    )


def synthesis_training_config(cfg: Dict[str, Any]) -> SynthesisTrainingConfig:
    t = cfg["training"]
    has_ae = "autoencoder" in cfg.get("model", {})
    strides = ()
    if has_ae:
        from playableenvironments_tpu.models.autoencoder import autoencoder_strides

        scene = config_lib.scene_from_dict(cfg["model"], cfg.get("playable_model"))
        strides = tuple(autoencoder_strides(scene.autoencoder))
    return SynthesisTrainingConfig(
        learning_rate=float(t.get("learning_rate", 5e-4)),
        lr_gamma=float(t.get("lr_gamma", 0.926118)),
        lr_decay_iterations=int(t.get("lr_decay_iterations", 10000)),
        weight_decay=float(t.get("weight_decay", 0.0)),
        max_steps=int(t.get("max_steps", 300000)),
        samples_per_image=int(t.get("samples_per_image", 144)),
        perturb=bool(t.get("perturb", True)),
        shuffle_style=bool(t.get("shuffle_style", True)),
        patch_size=int(t.get("patch_size", 0)),
        patch_strides=strides,
        loss_weights=loss_weights_from_dict(t.get("loss_weights", {})),
        decode_patches=has_ae and int(t.get("patch_size", 0)) > 0,
        crop_to_patch=bool(t.get("crop_to_patch", True)),
        autoencoder_learning_rate=float(t.get("autoencoder_learning_rate", 1e-4)),
        frozen_autoencoder_steps=int(t.get("frozen_autoencoder_steps", 0)),
        camera_parameters_learning_rate=float(
            t.get("camera_parameters_learning_rate", 0.0)
        ),
        remat=bool(t.get("remat", False)),
    )


def with_batching_overrides(cfg: Dict[str, Any], **overrides) -> Dict[str, Any]:
    """cfg with individual `training.batching` keys overridden, PRESERVING
    the rest of the section. Replacing the whole section (the old inline
    idiom) silently dropped allowed_cameras / observation_stacking, so e.g.
    an exported artifact could be shape-specialized to every camera of a
    multi-camera split instead of the trained subset."""
    training = dict(cfg.get("training", {}))
    batching = dict(training.get("batching", {}))
    batching.update(overrides)
    training["batching"] = batching
    return {**cfg, "training": training}


def build_training_mesh(cfg: Dict[str, Any], batch_size: int):
    """Device mesh from `training.mesh: {data: N, rays: M}`.

    rays > 1 builds a 2D (data, rays) mesh: the batch is sharded over `data`
    and the per-example sampled-ray axis over `rays` (the TPU-native form of
    the reference's ray-axis scaling knob `samples_per_image_batching`,
    environment_model.py:474-521 — chips instead of host-loop chunks). The
    training loop must then run under `jax.set_mesh(mesh)` so the model's
    internal `constrain_ray_axis` sharding constraint sees the rays axis.

    Without the knob (or rays == 1) this is the round-2 behavior: a 1D data
    mesh over every device the batch divides.

    :return: (mesh, is_2d).
    """
    from playableenvironments_tpu.parallel import create_2d_mesh, create_mesh

    mesh_cfg = cfg.get("training", {}).get("mesh") or {}
    rays = int(mesh_cfg.get("rays", 1))
    data = int(mesh_cfg.get("data", 0))
    devices = jax.devices()

    if rays > 1:
        if data <= 0:
            data = max(len(devices) // rays, 1)
        need = data * rays
        if need > len(devices):
            raise ValueError(
                f"training.mesh data={data} x rays={rays} needs {need} "
                f"devices, only {len(devices)} available"
            )
        if batch_size % data:
            raise ValueError(
                f"batch_size {batch_size} must divide over the data axis "
                f"({data}) of the 2D mesh"
            )
        processes = max(jax.process_count(), 1)
        if processes > 1:
            # Multi-host 2D mesh: data shards across hosts, rays within a
            # host (the TPU-pod layout — ray collectives ride ICI, the
            # gradient psum rides DCN). Three structural requirements, all
            # from `make_array_from_process_local_data`: every device must
            # belong to the mesh (a prefix subset would orphan whole
            # processes — they would dispatch programs no mesh device
            # executes), every mesh row (one data shard spanning `rays`
            # devices) must stay process-local (jax.devices() orders
            # devices process-major, so rows are process-local iff `rays`
            # divides each host's device count), and each process must
            # contribute whole rows.
            if need != len(devices):
                raise ValueError(
                    f"multi-host 2D mesh must span every device: data={data}"
                    f" x rays={rays} = {need} != {len(devices)} devices "
                    f"across {processes} processes"
                )
            if len(jax.local_devices()) % rays:
                raise ValueError(
                    f"2D mesh rays axis ({rays}) must divide this host's "
                    f"{len(jax.local_devices())} local devices: mesh rows "
                    "must stay process-local"
                )
            if data % processes:
                raise ValueError(
                    f"2D mesh data axis ({data}) must divide over "
                    f"{processes} processes"
                )
        return create_2d_mesh(devices[:need], data=data), True

    process_count = jax.process_count()
    if data > 0:
        if data > len(devices):
            raise ValueError(
                f"training.mesh data={data} exceeds {len(devices)} devices"
            )
        if process_count > 1 and data < len(devices):
            # A prefix subset can exclude whole processes, which would then
            # dispatch programs no mesh device executes (hang, not error).
            raise ValueError(
                f"training.mesh data={data} must use all {len(devices)} "
                f"devices in a multi-host run (or be omitted)"
            )
        if batch_size % data:
            raise ValueError(
                f"batch_size {batch_size} must divide over the data axis "
                f"({data}) of the mesh"
            )
        return create_mesh(devices[:data]), False
    if process_count > 1:
        if batch_size % len(devices):
            raise ValueError(
                f"batch_size {batch_size} must divide over {len(devices)} "
                "devices in a multi-host run"
            )
        return create_mesh(), False
    # Single host: shard over the largest device prefix the batch divides
    # (a CPU test mesh has 8 virtual devices but smoke batches of 2).
    import math

    usable = math.gcd(batch_size, len(devices))
    return create_mesh(devices[:usable]), False


def build_eval_mesh(cfg: Dict[str, Any]):
    """Optional (data, rays) mesh from `evaluation.mesh: {data: N, rays: M}`
    for full-frame eval renders (dataset creators, play): the frame's ray
    axis shards over `rays`. Returns None when unconfigured or rays <= 1 —
    single-device eval stays the default."""
    mesh_cfg = cfg.get("evaluation", {}).get("mesh") or {}
    rays = int(mesh_cfg.get("rays", 1))
    if rays <= 1:
        return None
    from playableenvironments_tpu.parallel import create_2d_mesh

    data = int(mesh_cfg.get("data", 1))
    devices = jax.devices()
    need = max(data, 1) * rays
    if need > len(devices):
        raise ValueError(
            f"evaluation.mesh data={data} x rays={rays} needs {need} "
            f"devices, only {len(devices)} available"
        )
    return create_2d_mesh(devices[:need], data=max(data, 1))


def build_dataset(
    cfg: Dict[str, Any], split: str, batching_key: str = "batching"
) -> MulticameraVideoDataset:
    data_cfg = cfg["data"]
    batching = cfg.get("training", {}).get(batching_key, {})
    target = data_cfg.get("target_input_size")
    target_size = (int(target[1]), int(target[0])) if target else None  # (h, w)
    return MulticameraVideoDataset(
        os.path.join(data_cfg["data_root"], split),
        observations_count=int(batching.get("observations_count", 1)),
        skip_frames=int(batching.get("skip_frames", 0)),
        observation_stacking=int(batching.get("observation_stacking", 1)),
        allowed_cameras=batching.get("allowed_cameras"),
        target_size=target_size,
    )


def build_environment_model(cfg: Dict[str, Any]) -> EnvironmentModel:
    scene = config_lib.scene_from_dict(cfg["model"], cfg.get("playable_model"))
    training_cameras = cfg.get("training", {}).get("batching", {}).get(
        "allowed_cameras"
    )
    return EnvironmentModel(
        scene,
        focal_length_multiplier=float(
            cfg.get("data", {}).get("focal_length_multiplier", 1.0)
        ),
        enable_camera_offsets=bool(
            cfg.get("model", {}).get("enable_camera_parameters_offsets", False)
        ),
        camera_memory_size=int(
            cfg.get("model", {}).get("camera_parameters_memory_size", 1)
        ),
        training_cameras_count=len(training_cameras) if training_cameras else 1,
    )


def apply_debug_flags(cfg: Dict[str, Any]):
    """`training.debug_nans: true` flips jax_debug_nans so every jitted step
    re-runs un-jitted on NaN and raises at the producing op — the functioning
    equivalent of the reference's NaN forward hooks + detect_anomaly
    (playable_environment_model_discriminator.py:24-84, config-gated there
    too)."""
    debug = bool(
        cfg.get("training", {}).get("debug_nans", False)
        or cfg.get("playable_model_training", {}).get("debug_nans", False)
        or cfg.get("autoencoder_training", {}).get("debug_nans", False)
    )
    if debug:
        jax.config.update("jax_debug_nans", True)
    return debug


class ProfileWindow:
    """One-shot jax.profiler trace of the steps in
    [profile_start_step, profile_start_step + profile_steps), shared by all
    three training loops (the torch.profiler epoch wrap of reference
    trainer.py:94-97, 607-618).

    Fires at most ONCE per process: without the `done` latch, a loop whose
    step counter keeps growing would restart the trace after every stop,
    profiling half the run and flooding <results>/profile with dumps.
    """

    def __init__(self, training_cfg: Dict[str, Any], results_dir: str, log_fn=print):
        self.enabled = bool(training_cfg.get("enable_profiling", False))
        self.start = int(training_cfg.get("profile_start_step", 10))
        self.steps = int(training_cfg.get("profile_steps", 5))
        self.out_dir = os.path.join(results_dir, "profile")
        self.log_fn = log_fn
        self.active = False
        self.done = False

    def before_step(self, step: int):
        """Call with the pre-update step counter; >= (not ==) so loops that
        advance several steps per dispatch still enter the window."""
        if not self.enabled or self.done or self.active:
            return
        if step >= self.start + self.steps:
            # A resume landed past the whole window: skip, don't capture a
            # stray one-step trace at resume time.
            self.done = True
            return
        if step >= self.start:
            jax.profiler.start_trace(self.out_dir)
            self.active = True

    def after_step(self, step: int, result=None):
        """Call with the post-update counter; blocks on `result` so the trace
        captures the device work of the final profiled step."""
        if self.active and step >= self.start + self.steps:
            if result is not None:
                jax.block_until_ready(result)
            jax.profiler.stop_trace()
            self.active = False
            self.done = True
            self.log_fn(f"profiler trace written to {self.out_dir}")

    def close(self):
        """Stop an in-flight trace when the loop exits inside the window
        (max_steps reached between before_step and the stop threshold) —
        otherwise stop_trace is never called and the dump is lost. Call via
        try/finally after every training loop."""
        if self.active:
            jax.profiler.stop_trace()
            self.active = False
            self.done = True
            self.log_fn(f"profiler trace written to {self.out_dir} (loop exit)")


def output_dirs(cfg: Dict[str, Any]) -> Tuple[str, str]:
    """(results_dir, checkpoints_dir) per the logging section
    (utils/configuration.py:244-266's directory structure)."""
    run_name = cfg.get("logging", {}).get("run_name", "run")
    results = os.path.join(
        cfg.get("logging", {}).get("output_root", "results"), run_name
    )
    checkpoints = os.path.join(
        cfg.get("logging", {}).get("checkpoints_root", "checkpoints"), run_name
    )
    os.makedirs(results, exist_ok=True)
    os.makedirs(checkpoints, exist_ok=True)
    return results, checkpoints


def run_synthesis_training(
    cfg: Dict[str, Any],
    max_steps_override: Optional[int] = None,
    seed: int = 0,
) -> str:
    """The phase-2 training loop (reference train.py:73-100): epochs of
    shuffled batches, periodic logging/checkpointing, resume from latest.

    :return: checkpoints directory."""
    from playableenvironments_tpu.train import checkpointing

    results_dir, checkpoints_dir = output_dirs(cfg)
    logger = Logger(results_dir, cfg.get("logging", {}).get("run_name", "run"))

    model = build_environment_model(cfg)
    train_cfg = synthesis_training_config(cfg)
    if max_steps_override:
        train_cfg = dataclasses.replace(train_cfg, max_steps=max_steps_override)
    trainer = SynthesisTrainer(model, train_cfg)

    dataset = build_dataset(cfg, "train")
    batching = cfg["training"]["batching"]
    batch_size = int(batching.get("batch_size", 8))

    # Data-parallel mesh over every device of every host; with one device
    # this degenerates to plain placement. Per-host batches hold this host's
    # interleaved slice of the global batch. `training.mesh: {data, rays}`
    # switches to a 2D mesh with the sampled-ray axis sharded over `rays`.
    import contextlib

    from playableenvironments_tpu.parallel import replicate, shard_batch

    process_index, process_count = jax.process_index(), jax.process_count()
    is_main = process_index == 0
    mesh, mesh_is_2d = build_training_mesh(cfg, batch_size)
    if mesh_is_2d:
        # Same default as synthesis_training_config's samples_per_image — an
        # omitted key must still be validated against the rays axis.
        samples = int(cfg["training"].get("samples_per_image", 144))
        rays_size = dict(mesh.shape)["rays"]
        if samples % rays_size:
            raise ValueError(
                f"training.samples_per_image {samples} must divide over the "
                f"rays axis ({rays_size}) of the 2D mesh"
            )
    local_batch = batch_size // process_count
    # The ambient mesh makes `constrain_ray_axis` (applied inside the model
    # on the sampled-ray axis) an active sharding constraint; on a 1D mesh
    # it is a no-op and this context changes nothing.
    mesh_context = jax.set_mesh(mesh) if mesh_is_2d else contextlib.nullcontext()

    def eval_context():
        """Training-time eval runs on process 0 ONLY, so it must never see
        an ambient mesh that spans other processes: constrain_ray_axis would
        turn its render into a multi-process computation that only one
        process dispatches (the same deadlock class as collective saves).
        A process-local 1D mesh (no rays axis) makes the constraint a no-op."""
        if mesh_is_2d and process_count > 1:
            from playableenvironments_tpu.parallel import create_mesh

            return jax.set_mesh(create_mesh(jax.local_devices()[:1]))
        return contextlib.nullcontext()

    def epoch_batches(epoch_seed):
        for host_batch in dataset.iterate_batches(
            local_batch, seed=epoch_seed,
            process_index=process_index, process_count=process_count,
        ):
            yield shard_batch(host_batch, mesh)

    with mesh_context:
        example = next(epoch_batches(seed))
        state = trainer.init_state(jax.random.PRNGKey(seed), example)
        state = replicate(state, mesh)

        quick_dir = os.path.join(checkpoints_dir, "quick")
        resume_from = checkpointing.latest_checkpoint_any(
            checkpoints_dir, quick_dir
        )
        if resume_from:
            state = checkpointing.restore_checkpoint(resume_from, state)
            state = replicate(state, mesh)
            logger.print(f"resumed from {resume_from} at step {int(state.step)}")
        else:
            # Warm-start the feature renderer from the phase-1 checkpoint
            # (reference `model.autoencoder.weights_filename`, loaded in
            # environment_model_backpropagated_autoencoder.py:27-40; the
            # published phase-2 runs start from a 300k-step pretrained AE).
            ae_ckpt = cfg.get("model", {}).get("autoencoder", {}).get(
                "weights_filename", ""
            )
            if ae_ckpt and ae_ckpt != "untrained_model":
                state = checkpointing.graft_autoencoder(ae_ckpt, state)
                state = replicate(state, mesh)
                logger.print(f"autoencoder warm-started from {ae_ckpt}")

        from playableenvironments_tpu.parallel import compile_barrier

        # Compile on every process BEFORE the first dispatch (multi-process:
        # the first step's psum creates its Gloo/ICI context under a 30 s
        # rendezvous deadline that compile skew can blow — see
        # parallel.mesh.compile_barrier).
        step_fn = compile_barrier(
            jax.jit(trainer.train_step, donate_argnums=0),
            state, example,
            jax.random.fold_in(jax.random.PRNGKey(seed), int(state.step)),
        )
        log_interval = int(cfg["training"].get("log_interval_steps", 10))
        save_freq = int(cfg["training"].get("save_freq", 30000))
        quick_save_freq = int(cfg["training"].get("quick_save_freq", 500))
        eval_freq = int(cfg["training"].get("eval_freq", 0))

        evaluator = None
        eval_batch = None
        if eval_freq:
            # Training-time qualitative evaluation (evaluation/evaluator.py):
            # render a validation batch full-frame + a novel view, log the grid.
            from playableenvironments_tpu.eval.training_evaluator import (
                TrainingEvaluator,
            )

            try:
                val_dataset = build_dataset(cfg, "val")
            except FileNotFoundError:
                val_dataset = dataset
            eval_batch = next(val_dataset.iterate_batches(1, shuffle=False))
            image_size = eval_batch.observations.shape[-3:-1]
            evaluator = TrainingEvaluator(
                model, image_size,
                patch_strides=train_cfg.patch_strides
                if model.scene.autoencoder is not None
                else None,
            )
        from playableenvironments_tpu.utils.meters import AverageMeter, TimeMeter

        meter, timer = AverageMeter(), TimeMeter()

        profile = ProfileWindow(cfg["training"], results_dir, logger.print)

        epoch = 0
        try:
            while int(state.step) < train_cfg.max_steps:
                for batch in epoch_batches(seed + epoch):
                    key = jax.random.fold_in(
                        jax.random.PRNGKey(seed), int(state.step)
                    )
                    profile.before_step(int(state.step))
                    with timer.section("step"):
                        with jax.profiler.StepTraceAnnotation(
                            "train_step", step_num=int(state.step)
                        ):
                            state, metrics = step_fn(state, batch, key)
                    profile.after_step(int(state.step), metrics)
                    step = int(state.step)
                    meter.add({k: float(v) for k, v in metrics.items()})
                    if step % log_interval == 0 and is_main:
                        logged = meter.pop_all()
                        logged["steps_per_sec"] = 1.0 / max(
                            timer.summary().get("step", 1), 1e-9
                        )
                        logger.log(logged, step)
                    if (
                        step % save_freq == 0 or step >= train_cfg.max_steps
                    ) and is_main:
                        # device_get first: the state is fully replicated so
                        # process 0 can fetch it without any collective, and
                        # the orbax write then involves no multi-host
                        # coordination (calling collective save/eval on
                        # process 0 only would deadlock >1-process runs).
                        checkpointing.save_checkpoint(
                            checkpoints_dir, jax.device_get(state)
                        )
                    elif step % quick_save_freq == 0 and is_main:
                        # Crash-bounding quick saves (reference train.py:81-86).
                        checkpointing.save_checkpoint(
                            quick_dir, jax.device_get(state), keep=2
                        )
                    if evaluator is not None and step % eval_freq == 0 and is_main:
                        with eval_context():
                            evaluator.evaluate(
                                {
                                    "params": jax.device_get(state.params),
                                    "batch_stats": jax.device_get(
                                        state.batch_stats
                                    ),
                                },
                                eval_batch, logger, step,
                            )
                    if step >= train_cfg.max_steps:
                        break
                epoch += 1
        finally:
            profile.close()
        if is_main:
            checkpointing.save_checkpoint(checkpoints_dir, jax.device_get(state))
    logger.close()
    return checkpoints_dir
