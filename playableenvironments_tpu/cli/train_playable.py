"""Phase-3 action-module training entry point
(reference train_playable_model.py).

Loads the frozen phase-2 environment checkpoint, wraps it in the playable
model, and trains the animation modules with sequence-length annealing.

Usage: python -m playableenvironments_tpu.cli.train_playable --config <yaml>
       --environment_checkpoint <path>
"""

from __future__ import annotations

import argparse


def main():
    # Multi-host (DCN) coordination, when configured; must precede any
    # backend-initializing jax call in this process.
    from playableenvironments_tpu.parallel import maybe_initialize_distributed

    maybe_initialize_distributed()
    parser = argparse.ArgumentParser(description="Phase-3 playable-model training")
    parser.add_argument("--config", required=True)
    parser.add_argument(
        "--environment_checkpoint", default=None,
        help="phase-2 checkpoint path (defaults to latest in its directory)",
    )
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import jax

    from playableenvironments_tpu.cli.common import (
        apply_debug_flags,
        build_dataset,
        build_environment_model,
        load_yaml,
        output_dirs,
        synthesis_training_config,
    )
    from playableenvironments_tpu.render.playable_model import PlayableEnvironmentModel
    from playableenvironments_tpu.train import checkpointing
    from playableenvironments_tpu.train.trainer_playable import (
        PlayableLossWeights,
        PlayableTrainer,
        PlayableTrainingConfig,
    )
    from playableenvironments_tpu.train.trainer_synthesis import SynthesisTrainer
    from playableenvironments_tpu.utils.logger import Logger
    from playableenvironments_tpu.utils.meters import AverageMeter

    import os

    cfg = load_yaml(args.config)
    apply_debug_flags(cfg)
    results_dir, checkpoints_dir = output_dirs(cfg)
    # Phase-3 checkpoints live in their own subdirectory: the reference keeps
    # phases in separate run directories (README.md:144-155); sharing one
    # run_name must not mix phase-2 and phase-3 state structures.
    checkpoints_dir = os.path.join(checkpoints_dir, "playable")
    os.makedirs(checkpoints_dir, exist_ok=True)
    logger = Logger(results_dir, cfg.get("logging", {}).get("run_name", "playable"))

    env_model = build_environment_model(cfg)

    t = cfg["playable_model_training"]
    w = t.get("loss_weights", {})
    batching = t.get("batching", {})
    train_cfg = PlayableTrainingConfig(
        learning_rate=float(t.get("learning_rate", 5e-4)),
        lr_gamma=float(t.get("lr_gamma", 0.926118)),
        lr_decay_iterations=int(t.get("lr_decay_iterations", 10000)),
        weight_decay=float(t.get("weight_decay", 0.0)),
        max_steps=args.max_steps or int(t.get("max_steps", 300000)),
        ground_truth_observations_start=int(t.get("ground_truth_observations_start", 6)),
        ground_truth_observations_end=int(t.get("ground_truth_observations_end", 6)),
        ground_truth_observations_steps=int(t.get("ground_truth_observations_steps", 16000)),
        observations_count=int(batching.get("observations_count", 9)),
        observations_count_start=int(
            batching.get("observations_count_start", batching.get("observations_count", 9))
        ),
        observations_count_steps=int(batching.get("observations_count_steps", 25000)),
        mutual_information_alpha=float(t.get("mutual_information_estimation_alpha", 0.2)),
        mutual_information_entropy_lambda=float(t.get("mutual_information_entropy_lambda", 1.0)),
        betas=tuple(float(b) for b in t.get("betas", (0.9, 0.999))),
        discriminator_learning_rate=(
            float(t["discriminator_learning_rate"])
            if "discriminator_learning_rate" in t else None
        ),
        discriminator_weight_decay=(
            float(t["discriminator_weight_decay"])
            if "discriminator_weight_decay" in t else None
        ),
        use_camera_relative_acmv=bool(t.get("use_camera_relative_acmv", False)),
        acmv_rotation_axis=t.get("acmv_rotation_axis"),
        loss_weights=PlayableLossWeights(
            rotations_rec=float(w.get("rotations_rec_lambda", 1.0)),
            translations_rec=float(w.get("translations_rec_lambda", 1.0)),
            style_rec=float(w.get("style_rec_lambda", 1.0)),
            deformation_rec=float(w.get("deformation_rec_lambda", 1.0)),
            entropy=float(w.get("entropy_lambda", 0.0)),
            action_directions_kl=float(w.get("action_directions_kl_lambda", 1e-4)),
            action_mutual_information=float(w.get("action_mutual_information_lambda", 0.15)),
            acmv=float(w.get("acmv_lambda", 0.0)),
            gan=float(w.get("gan_lambda", 0.0)),
        ),
    )
    use_gan = train_cfg.loss_weights.gan > 0.0
    playable = PlayableEnvironmentModel(env_model.scene, with_discriminators=use_gan)
    trainer = PlayableTrainer(env_model, playable, train_cfg)

    # Dataset with the phase-3 batching section.
    dataset = build_dataset(
        {**cfg, "training": {"batching": batching}}, "train"
    )
    batch_size = int(batching.get("batch_size", 16))
    dataset.set_observations_count(train_cfg.observations_count_at(0))
    example = next(dataset.iterate_batches(batch_size, seed=args.seed))

    # Frozen phase-2 weights.
    env_checkpoint = args.environment_checkpoint
    if env_checkpoint is None:
        raise SystemExit("--environment_checkpoint is required")
    synth_trainer = SynthesisTrainer(env_model, synthesis_training_config(cfg))
    env_state = synth_trainer.init_state(jax.random.PRNGKey(args.seed), example)
    env_params, env_batch_stats = checkpointing.restore_params(
        env_checkpoint, env_state.params, env_state.batch_stats
    )

    state = trainer.init_state(
        jax.random.PRNGKey(args.seed), example, env_params, env_batch_stats
    )

    # Resume from the newest of named and quick checkpoints.
    quick_dir = os.path.join(checkpoints_dir, "quick")
    resume_from = checkpointing.latest_checkpoint_any(checkpoints_dir, quick_dir)
    if resume_from:
        state = checkpointing.restore_checkpoint(resume_from, state)
        logger.print(f"resumed from {resume_from}")

    # The frozen encoding is deterministic (eval mode): encode every dataset
    # frame ONCE up front and train on cached state vectors — phase 3 never
    # touches images again (the reference re-encodes per step; SURVEY §3.2
    # phase 3 never renders, so the conv encoders were its entire step cost).
    from playableenvironments_tpu.parallel import create_mesh, replicate, shard_batch
    from playableenvironments_tpu.train.encoding_cache import (
        EncodingCache,
        params_fingerprint,
    )

    encode_key = jax.random.PRNGKey(args.seed)
    cache_path = os.path.join(checkpoints_dir, "encoding_cache.npz")
    fingerprint = params_fingerprint(env_params)
    cache = None
    if os.path.exists(cache_path):
        try:
            cache = EncodingCache.load(cache_path, fingerprint=fingerprint)
            logger.print(f"loaded encoding cache from {cache_path}")
        except ValueError as stale:
            logger.print(f"{stale}; rebuilding")
        except Exception as unreadable:
            # A non-main process can observe the npz MID-WRITE by process 0
            # (shared fs, process 0 saving this very run): treat it as
            # absent and reload after the barrier below. Process 0 writes
            # the file itself, so for it this is a real error.
            if jax.process_count() == 1 or jax.process_index() == 0:
                raise
            logger.print(f"cache unreadable ({unreadable}); reload after barrier")
            cache = None

    # Multi-host: only process 0 encodes (the dominant startup cost); the
    # others wait at a barrier and load the saved npz from the shared
    # checkpoints filesystem. A host that still can't see the file after
    # the barrier (non-shared fs) builds its own copy.
    def _build():
        encode_fn = jax.jit(
            lambda b, k: trainer.encode_batch(
                {"environment": {"params": env_params, "batch_stats": env_batch_stats}},
                b, k,
            )
        )
        return EncodingCache.build(
            encode_fn, dataset, encode_key,
            batch_size=int(t.get("encoding_batch_size", 32)),
            log_fn=logger.print,
        )

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        if cache is None and jax.process_index() == 0:
            cache = _build()
            cache.save(cache_path, fingerprint=fingerprint)
        # EVERY process reaches this barrier exactly once, whatever its
        # local view of the cache file was. Gating it on `cache is None`
        # diverges: a process that loads the file process 0 saved moments
        # earlier skips the barrier while the builder waits at it, and the
        # next collective pairs with the barrier — a name-mismatch abort
        # (sync_global_devices 'encoding_cache_built'), caught by
        # tests/test_multihost_cli.py::test_two_process_phase3_cli.
        multihost_utils.sync_global_devices("encoding_cache_ready")
        if cache is None:
            if os.path.exists(cache_path):
                cache = EncodingCache.load(cache_path, fingerprint=fingerprint)
            else:
                cache = _build()
    elif cache is None:
        cache = _build()
        cache.save(cache_path, fingerprint=fingerprint)

    # Data-parallel mesh (the phase-2 pattern, cli/common.py): batch axis
    # sharded, replicated state, XLA psum over ICI.
    import math

    process_index, process_count = jax.process_index(), jax.process_count()
    is_main = process_index == 0
    devices_count = len(jax.devices())
    if process_count > 1:
        if batch_size % devices_count:
            raise ValueError(
                f"batch_size {batch_size} must divide over {devices_count} devices"
            )
        mesh = create_mesh()
    else:
        mesh = create_mesh(jax.devices()[: math.gcd(batch_size, devices_count)])
    local_batch = batch_size // process_count
    state = replicate(state, mesh)

    # The fused step runs in well under a millisecond on TPU (encoding cache
    # + Pallas rollout kernels), so per-call dispatch would dominate; chain
    # `steps_per_call` optimization steps into one lax.scan executable and
    # feed it a stacked block of encoding batches.
    steps_per_call = max(int(t.get("steps_per_call", 8)), 1)

    import functools

    @functools.partial(jax.jit, donate_argnums=0)
    def multi_step(state, stacked_encodings, key):
        def body(carry, xs):
            enc, k = xs
            new_state, metrics = trainer.fused_step(carry, enc, k)
            return new_state, metrics

        keys = jax.random.split(key, steps_per_call)
        return jax.lax.scan(body, state, (stacked_encodings, keys))

    single_step = jax.jit(trainer.fused_step, donate_argnums=0)

    meter = AverageMeter()
    log_interval = int(t.get("log_interval_steps", 10))
    save_freq = int(t.get("save_freq", 10000))
    quick_save_freq = int(t.get("quick_save_freq", 500))
    eval_freq = int(t.get("eval_freq", 0))

    def crossed(before, after, freq):
        return freq > 0 and (before // freq) != (after // freq)

    evaluator = None
    if eval_freq:
        from playableenvironments_tpu.eval.playable_evaluator import (
            build_playable_evaluator,
        )

        evaluator = build_playable_evaluator(
            cfg, trainer, dataset, results_dir, seed=args.seed
        )

    import numpy as np

    def housekeeping(state, before):
        """Logging / checkpoints / eval whenever their interval was crossed."""
        step = int(state.step)
        if crossed(before, step, log_interval) and is_main:
            logger.log(meter.pop_all(), step)
        if (
            crossed(before, step, save_freq) or step >= train_cfg.max_steps
        ) and is_main:
            checkpointing.save_checkpoint(checkpoints_dir, jax.device_get(state))
        elif crossed(before, step, quick_save_freq) and is_main:
            # Crash-bounding quick saves (reference train.py:81-86).
            checkpointing.save_checkpoint(
                quick_dir, jax.device_get(state), keep=2
            )
        if evaluator is not None and crossed(before, step, eval_freq) and is_main:
            evaluator.evaluate(jax.device_get(state), logger, step)
        return step

    # Profiling, as in the phase-2 loop: captures
    # [profile_start_step, +profile_steps) — here rounded up to whole
    # multi_step blocks — into <results>/profile. ProfileWindow's one-shot
    # latch matters most in this loop: its step counter advances
    # steps_per_call at a time and stays >= profile_start forever after.
    from playableenvironments_tpu.cli.common import ProfileWindow

    profile = ProfileWindow(t, results_dir, logger.print)

    def maybe_profile(before, state, metrics):
        # Called AFTER each dispatched block; start and stop on different
        # calls (start-then-immediately-stop would capture zero blocks).
        if not profile.active:
            profile.before_step(before)
        else:
            profile.after_step(int(state.step), metrics)

    epoch = 0
    try:
        while int(state.step) < train_cfg.max_steps:
            # Sequence-length annealing is index arithmetic over the cache
            # (playable_model_trainer.py:537-561 re-indexes the dataset).
            current_length = train_cfg.observations_count_at(int(state.step))
            pending = []
            stop_epoch = False
            for encoding in cache.iterate_encoding_batches(
                local_batch, current_length, seed=args.seed + epoch,
                process_index=process_index, process_count=process_count,
            ):
                pending.append(encoding)
                if len(pending) < steps_per_call:
                    continue
                # Stack the block (leading step axis) and shard each step's
                # batch axis (axis 1) over the mesh.
                stacked = jax.tree.map(lambda *leaves: np.stack(leaves), *pending)
                pending = []
                stacked = shard_batch(stacked, mesh, leading_axes=1)
                before = int(state.step)
                key = jax.random.fold_in(jax.random.PRNGKey(args.seed), before)
                state, metrics = multi_step(state, stacked, key)
                maybe_profile(before, state, metrics)
                means = jax.tree.map(lambda v: v.mean(), metrics)
                meter.add({k: float(v) for k, v in means.items()})
                step = housekeeping(state, before)
                if step >= train_cfg.max_steps or (
                    train_cfg.observations_count_at(step) != current_length
                ):
                    stop_epoch = True
                    break
            # Epoch remainder (fewer batches than steps_per_call): single steps.
            for encoding in ([] if stop_epoch else pending):
                encoding = shard_batch(encoding, mesh)
                before = int(state.step)
                key = jax.random.fold_in(jax.random.PRNGKey(args.seed), before)
                state, metrics = single_step(state, encoding, key)
                maybe_profile(before, state, metrics)
                meter.add({k: float(v) for k, v in metrics.items()})
                step = housekeeping(state, before)
                if step >= train_cfg.max_steps:
                    break
            epoch += 1
    finally:
        profile.close()
    if is_main:
        checkpointing.save_checkpoint(checkpoints_dir, jax.device_get(state))
    logger.close()
    print(f"playable training complete; checkpoints in {checkpoints_dir}")


if __name__ == "__main__":
    main()
