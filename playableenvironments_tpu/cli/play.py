"""Interactive playable-environment session (reference play.py).

Drives objects with keyboard (cv2 window) or a scripted action sequence
(headless), re-rendering the full frame after every dynamics step. The jitted
`step` keeps the whole (dynamics + render [+ decode]) pipeline in one device
program — the path the ≥30 fps target measures.

Usage:
  python -m playableenvironments_tpu.cli.play --config <yaml> \
      --environment_checkpoint <ckpt> --playable_checkpoint <ckpt> \
      [--script 0,0,1,2 --output out_dir]
Keys (interactive): digits choose the action for the active object, TAB cycles
objects, q quits and saves the sequence.
"""

from __future__ import annotations

import argparse
import functools
import os
from typing import List, Optional

import numpy as np


class InteractiveSession:
    """Holds scene state + dynamics carries between user actions.

    Equivalent to initialize_interactive_generation / generate_next
    (playable_environment_model.py:222-396), with the carries explicit.
    """

    def __init__(
        self,
        environment_model,
        env_variables,
        playable_model,
        playable_variables,
        centroids: List,
        image_size,
        patch_strides=None,
        mesh=None,
    ):
        import jax

        from playableenvironments_tpu.config import ObjectIds
        from playableenvironments_tpu.eval.creators import FrameRenderer

        self.playable_model = playable_model
        self.playable_variables = playable_variables
        self.centroids = centroids
        self.renderer = FrameRenderer(
            environment_model, env_variables, image_size, patch_strides,
            mesh=mesh,
        )
        self.object_ids = ObjectIds(playable_model.scene)
        self.encoding = None
        self.carries: List = []
        self.initial_style = None
        self._jax = jax

    def initialize(self, batch) -> np.ndarray:
        """Encode frame 0 of the batch and render it."""
        encoding = self.renderer.encode(batch)
        self.encoding = self._jax.tree.map(lambda x: x[:, :1], encoding)
        self.initial_style = self.encoding.object_style
        self.carries = [None] * self.object_ids.dynamic_objects_count
        frame = np.asarray(self.renderer.render(self.encoding))[0, 0, 0]
        return frame

    def step(self, actions: List[int]) -> np.ndarray:
        """One dynamics step per dynamic object, then a full re-render.

        :param actions: one action index per dynamic object.
        """
        from playableenvironments_tpu.render.interactive import (
            action_inputs,
            interactive_step,
        )

        one_hots, variations = action_inputs(self.playable_model, actions)
        self.encoding, self.carries = interactive_step(
            self.playable_model,
            self.playable_variables,
            self.encoding,
            self.initial_style,
            self.carries,
            one_hots,
            variations,
        )
        return np.asarray(self.renderer.render(self.encoding))[0, 0, 0]


def main():
    parser = argparse.ArgumentParser(description="Interactive play")
    parser.add_argument("--config", required=True)
    parser.add_argument("--environment_checkpoint", required=True)
    parser.add_argument("--playable_checkpoint", required=True)
    parser.add_argument("--script", default=None,
                        help="comma-separated action list for headless play")
    parser.add_argument("--output", default="play_output")
    parser.add_argument("--framerate", type=int, default=5)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import jax

    from playableenvironments_tpu.cli.common import (
        build_dataset,
        build_environment_model,
        load_yaml,
        synthesis_training_config,
        with_batching_overrides,
    )
    from playableenvironments_tpu.render.playable_model import PlayableEnvironmentModel
    from playableenvironments_tpu.train import checkpointing
    from playableenvironments_tpu.train.trainer_playable import (
        PlayableTrainer,
        PlayableTrainingConfig,
    )
    from playableenvironments_tpu.train.trainer_synthesis import SynthesisTrainer
    from playableenvironments_tpu.utils.video_io import save_frames, save_gif, save_video

    cfg = load_yaml(args.config)
    env_model = build_environment_model(cfg)
    playable = PlayableEnvironmentModel(env_model.scene)

    # Spread eval batching as OVERRIDES on top of training.batching: a bare
    # replacement would drop allowed_cameras / observation_stacking whenever
    # evaluation.batching omits them, and the dataset would then span every
    # camera while the model sized its camera memory from the training subset.
    eval_batching = cfg.get("evaluation", {}).get("batching", {})
    dataset = build_dataset(
        with_batching_overrides(cfg, **{**eval_batching, "observations_count": 1}),
        "test",
    )
    batch = next(dataset.iterate_batches(1, shuffle=False))

    synth_trainer = SynthesisTrainer(env_model, synthesis_training_config(cfg))
    env_state = synth_trainer.init_state(jax.random.PRNGKey(args.seed), batch)
    env_params, env_bs = checkpointing.restore_params(
        args.environment_checkpoint, env_state.params, env_state.batch_stats
    )
    env_variables = {"params": env_params, "batch_stats": env_bs}

    p_trainer = PlayableTrainer(env_model, playable, PlayableTrainingConfig())
    p_state = p_trainer.init_state(
        jax.random.PRNGKey(args.seed), batch, env_params, env_bs
    )
    p_state = checkpointing.restore_checkpoint(args.playable_checkpoint, p_state)
    playable_variables = {"params": p_state.params, "batch_stats": p_state.batch_stats}
    centroids = [
        p_state.extra["centroids"][str(i)]
        for i in range(len(env_model.scene.animation_models))
    ]

    h, w = dataset.videos[0].image_size()
    strides = None
    if env_model.scene.autoencoder is not None:
        from playableenvironments_tpu.models.autoencoder import autoencoder_strides

        strides = autoencoder_strides(env_model.scene.autoencoder)
    from playableenvironments_tpu.cli.common import build_eval_mesh

    session = InteractiveSession(
        env_model, env_variables, playable, playable_variables, centroids,
        (h, w), strides, mesh=build_eval_mesh(cfg),
    )

    frames = [session.initialize(batch)]
    actions_taken: List[int] = []

    if args.script:
        for token in args.script.split(","):
            action = int(token)
            frames.append(session.step([action] * session.object_ids.dynamic_objects_count))
            actions_taken.append(action)
    else:
        import cv2

        print("keys: 0-9 action, q quit")
        while True:
            display = cv2.cvtColor(
                (frames[-1] * 255).astype(np.uint8), cv2.COLOR_RGB2BGR
            )
            cv2.imshow("playable environment", display)
            key = cv2.waitKey(0) & 0xFF
            if key == ord("q"):
                break
            if ord("0") <= key <= ord("9"):
                action = key - ord("0")
                frames.append(
                    session.step(
                        [action] * session.object_ids.dynamic_objects_count
                    )
                )
                actions_taken.append(action)
        cv2.destroyAllWindows()

    os.makedirs(args.output, exist_ok=True)
    save_frames(frames, os.path.join(args.output, "frames"))
    try:
        save_video(frames, os.path.join(args.output, "sequence.mp4"),
                   args.framerate, actions=[None] + actions_taken)
    except RuntimeError as error:  # missing codec: frames + gif still land
        print(f"mp4 export skipped: {error}")
    save_gif(frames, os.path.join(args.output, "sequence.gif"), args.framerate)
    print(f"saved {len(frames)} frames to {args.output}")


if __name__ == "__main__":
    main()
