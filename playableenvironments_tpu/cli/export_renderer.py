"""Export a trained renderer as a serving artifact (jax.export).

The artifact carries the traced StableHLO of the full frame function
(SceneEncoding -> frames) and serves without the model code — see
`playableenvironments_tpu.serve`. No reference equivalent: the reference's
only serving surface is running the full torch codebase through play.py.

Usage: python -m playableenvironments_tpu.cli.export_renderer
       --config <yaml> --checkpoint <phase2 ckpt> --output renderer.pexp
       [--platforms tpu cpu]
"""

from __future__ import annotations

import argparse


def main():
    parser = argparse.ArgumentParser(description="Export a serving renderer")
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument(
        "--playable_checkpoint", default=None,
        help="also export the interactive bundle (step0/step artifacts) "
        "from this phase-3 checkpoint; --output becomes the path prefix",
    )
    parser.add_argument(
        "--platforms", nargs="+", default=["cpu"],
        help="lowering platforms baked into the artifact (e.g. tpu cpu)",
    )
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import jax

    from playableenvironments_tpu import serve
    from playableenvironments_tpu.cli.common import load_yaml
    from playableenvironments_tpu.cli.generate_reconstructed_dataset import (
        build_renderer,
    )

    cfg = load_yaml(args.config)
    from playableenvironments_tpu.cli.common import build_dataset, with_batching_overrides

    # Fetch the example batch once and hand it to build_renderer (it would
    # otherwise fetch its own copy — a duplicate decode + prefetch thread).
    dataset = build_dataset(
        with_batching_overrides(cfg, observations_count=1), "test"
    )
    batch = next(dataset.iterate_batches(1, shuffle=False))
    renderer, _, env_model = build_renderer(cfg, args.checkpoint, batch=batch)
    encoding = renderer.encode(batch)

    if args.playable_checkpoint:
        from playableenvironments_tpu.render.playable_model import (
            PlayableEnvironmentModel,
        )
        from playableenvironments_tpu.train import checkpointing
        from playableenvironments_tpu.train.trainer_playable import (
            PlayableTrainer,
            PlayableTrainingConfig,
        )

        playable = PlayableEnvironmentModel(env_model.scene)
        p_trainer = PlayableTrainer(env_model, playable, PlayableTrainingConfig())
        p_state = p_trainer.init_state(
            jax.random.PRNGKey(args.seed), batch,
            renderer.variables["params"], renderer.variables["batch_stats"],
        )
        p_state = checkpointing.restore_checkpoint(
            args.playable_checkpoint, p_state
        )
        paths = serve.export_interactive(
            playable,
            {"params": p_state.params, "batch_stats": p_state.batch_stats},
            renderer,
            jax.tree.map(lambda x: x[:, :1], encoding),
            args.output,
            platforms=tuple(args.platforms),
        )
        for kind, path in paths.items():
            print(f"exported {kind} -> {path}")
        return

    path = serve.export_renderer(
        renderer, encoding, args.output, platforms=tuple(args.platforms)
    )
    artifact = serve.load_artifact(path)
    print(
        f"exported {artifact.header['name']} for {artifact.header['platforms']}"
        f" -> {path}"
    )


if __name__ == "__main__":
    main()
