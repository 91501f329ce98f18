"""Phase-2 synthesis training entry point (reference train.py).

Usage: python -m playableenvironments_tpu.cli.train --config <yaml>
"""

from __future__ import annotations

import argparse


def main():
    # Multi-host (DCN) coordination, when configured; must precede any
    # backend-initializing jax call in this process.
    from playableenvironments_tpu.parallel import maybe_initialize_distributed

    maybe_initialize_distributed()
    parser = argparse.ArgumentParser(description="Phase-2 synthesis training")
    parser.add_argument("--config", required=True)
    parser.add_argument("--max_steps", type=int, default=None,
                        help="override training.max_steps (smoke runs)")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    from playableenvironments_tpu.cli.common import (
        apply_debug_flags,
        load_yaml,
        run_synthesis_training,
    )

    cfg = load_yaml(args.config)
    apply_debug_flags(cfg)
    checkpoints = run_synthesis_training(cfg, args.max_steps, args.seed)
    print(f"training complete; checkpoints in {checkpoints}")


if __name__ == "__main__":
    main()
