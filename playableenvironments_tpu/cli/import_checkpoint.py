"""Import a reference (PyTorch) phase-2 checkpoint into this framework's
checkpoint format.

Reads the reference's `torch.save` dict (training/trainer.py:135-171 — the
model state_dict under "model"), converts every submodule through
compat.torch_import, grafts the weights onto a freshly initialized
TrainState, and writes an orbax checkpoint that every generate_*/evaluate_*/
play entry point can load directly.

Usage: python -m playableenvironments_tpu.cli.import_checkpoint
       --config <yaml> --torch_checkpoint <pth.tar> [--output <dir>]
"""

from __future__ import annotations

import argparse
import os


def load_torch_state_dict(path: str):
    """Load {name: numpy array} from a reference checkpoint file. Accepts the
    trainer's {"model": state_dict, ...} wrapper or a bare state_dict."""
    import numpy as np
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    state = payload.get("model", payload) if isinstance(payload, dict) else payload
    out = {}
    for key, value in state.items():
        if hasattr(value, "detach"):
            out[key] = value.detach().cpu().numpy()
        else:
            out[key] = np.asarray(value)
    # DataParallel checkpoints prefix every key with "module."
    if out and all(k.startswith("module.") for k in out):
        out = {k[len("module."):]: v for k, v in out.items()}
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--torch_checkpoint", required=True)
    parser.add_argument("--output", default=None,
                        help="checkpoint directory (default: the config's "
                             "checkpoints root under 'imported')")
    parser.add_argument("--step", type=int, default=0)
    parser.add_argument(
        "--phase3", action="store_true",
        help="the torch checkpoint is a phase-3 playable model (frozen "
             "environment model under environment_model.*, animation models "
             "under object_animation_models.*); writes BOTH an environment "
             "and a playable checkpoint",
    )
    args = parser.parse_args()

    import jax

    from playableenvironments_tpu.cli.common import (
        with_batching_overrides,
        build_dataset,
        build_environment_model,
        load_yaml,
        synthesis_training_config,
    )
    from playableenvironments_tpu.compat.torch_import import (
        convert_environment_model,
    )
    from playableenvironments_tpu.train import checkpointing
    from playableenvironments_tpu.train.trainer_synthesis import SynthesisTrainer

    cfg = load_yaml(args.config)
    state_dict = load_torch_state_dict(args.torch_checkpoint)

    env_model = build_environment_model(cfg)
    cameras = cfg.get("training", {}).get("batching", {}).get("allowed_cameras")
    env_state_dict = state_dict
    if args.phase3:
        from playableenvironments_tpu.compat.torch_import import split_state_dict

        env_state_dict = split_state_dict(state_dict, "environment_model")
    params, batch_stats = convert_environment_model(
        env_state_dict, env_model.scene,
        cameras_count=len(cameras) if cameras else 1,
    )

    dataset = build_dataset(
        with_batching_overrides(cfg, observations_count=1), "test"
    )
    batch = next(dataset.iterate_batches(1, shuffle=False))
    trainer = SynthesisTrainer(env_model, synthesis_training_config(cfg))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    # Structural check: the converted tree must match the init exactly.
    init_shapes = jax.tree.map(lambda x: tuple(x.shape), state.params)
    converted_shapes = jax.tree.map(lambda x: tuple(x.shape), params)
    if init_shapes != converted_shapes:
        raise SystemExit(
            "converted parameter tree does not match the configured model; "
            "check that --config describes the checkpoint's architecture"
        )
    state = state.replace(params=params, batch_stats=batch_stats)

    output = args.output
    if output is None:
        from playableenvironments_tpu.cli.common import output_dirs

        _, checkpoints_dir = output_dirs(cfg)
        output = os.path.join(checkpoints_dir, "imported")

    if not args.phase3:
        path = checkpointing.save_checkpoint(output, state, step=args.step)
        print(f"imported checkpoint written to {path}")
        return

    # Phase 3: additionally graft the animation modules + centroids onto a
    # fresh playable TrainState over the (already converted) frozen
    # environment model.
    from playableenvironments_tpu.compat.torch_import import (
        convert_playable_model,
    )
    from playableenvironments_tpu.render.playable_model import (
        PlayableEnvironmentModel,
    )
    from playableenvironments_tpu.train.trainer_playable import (
        PlayableTrainer,
        PlayableTrainingConfig,
    )

    env_path = checkpointing.save_checkpoint(
        os.path.join(output, "environment"), state, step=args.step
    )
    print(f"imported environment checkpoint written to {env_path}")

    playable = PlayableEnvironmentModel(env_model.scene)
    playable_trainer = PlayableTrainer(env_model, playable, PlayableTrainingConfig())
    playable_state = playable_trainer.init_state(
        jax.random.PRNGKey(0), batch, state.params, state.batch_stats
    )
    anim_params, anim_stats, centroids = convert_playable_model(
        state_dict, env_model.scene.animation_models
    )
    merged_params = dict(playable_state.params)
    merged_params.update(anim_params)
    merged_stats = dict(playable_state.batch_stats)
    for name, value in anim_stats.items():
        merged_stats[name] = value
    extra = dict(playable_state.extra)
    extra["centroids"] = {str(i): c for i, c in enumerate(centroids)}
    playable_state = playable_state.replace(
        params=merged_params, batch_stats=merged_stats, extra=extra
    )
    playable_path = checkpointing.save_checkpoint(
        os.path.join(output, "playable"), playable_state, step=args.step
    )
    print(f"imported playable checkpoint written to {playable_path}")


if __name__ == "__main__":
    main()
