"""Full-pipeline CLI smoke test: synthetic data -> phase-2 training ->
reconstructed dataset -> evaluation -> phase-3 training -> scripted play.

This is the framework's end-to-end contract: every entry point runs on the
smoke config without real TPU hardware.
"""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG_SRC = os.path.join(REPO, "configs", "synthetic_smoke.yaml")


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    """A working directory with synthetic data and an adjusted config."""
    from playableenvironments_tpu.data.synthetic import make_synthetic_dataset

    root = tmp_path_factory.mktemp("cli")
    data_root = os.path.join(root, "data", "synthetic")
    make_synthetic_dataset(data_root, videos=1, frames=8, height=16, width=24)

    cfg = yaml.safe_load(open(CONFIG_SRC))
    cfg["data"]["data_root"] = data_root
    cfg["logging"]["output_root"] = os.path.join(root, "results")
    cfg["logging"]["checkpoints_root"] = os.path.join(root, "checkpoints")
    cfg["training"]["max_steps"] = 6
    cfg["training"]["save_freq"] = 6
    cfg["playable_model_training"]["max_steps"] = 4
    cfg["playable_model_training"]["save_freq"] = 4
    config_path = os.path.join(root, "smoke.yaml")
    yaml.safe_dump(cfg, open(config_path, "w"))
    return {"root": str(root), "config": config_path, "cfg": cfg}


def run_cli(module, *args):
    """Invoke a CLI main in-process (keeps the forced-CPU JAX config)."""
    import importlib

    argv = sys.argv
    sys.argv = [module] + list(args)
    try:
        importlib.import_module(module).main()
    finally:
        sys.argv = argv


def _latest_checkpoint(workdir):
    from playableenvironments_tpu.train.checkpointing import latest_checkpoint

    return latest_checkpoint(
        os.path.join(workdir["cfg"]["logging"]["checkpoints_root"], "synthetic_smoke")
    )


@pytest.fixture(scope="module")
def phase2_checkpoint(workdir):
    """Phase-2 training via the CLI; returns the resulting checkpoint path."""
    run_cli(
        "playableenvironments_tpu.cli.train", "--config", workdir["config"]
    )
    ckpt = _latest_checkpoint(workdir)
    assert ckpt is not None
    return ckpt


def test_phase2_training_cli(workdir, phase2_checkpoint):
    assert os.path.isdir(phase2_checkpoint)
    metrics = os.path.join(
        workdir["cfg"]["logging"]["output_root"], "synthetic_smoke", "metrics.jsonl"
    )
    assert os.path.getsize(metrics) > 0


def test_generate_and_evaluate_cli(workdir, phase2_checkpoint):
    ckpt = phase2_checkpoint
    out = os.path.join(workdir["root"], "reconstructed")
    run_cli(
        "playableenvironments_tpu.cli.generate_reconstructed_dataset",
        "--config", workdir["config"], "--checkpoint", ckpt, "--output", out,
        "--batch_size", "2",
    )
    assert os.path.isdir(os.path.join(out, "00000", "00000"))

    results_path = os.path.join(workdir["root"], "eval.yaml")
    run_cli(
        "playableenvironments_tpu.cli.evaluate_reconstructed_dataset",
        "--config", workdir["config"], "--generated", out,
        "--output", results_path, "--window_size", "8", "--no_fid",
    )
    results = yaml.safe_load(open(results_path))
    assert np.isfinite(results["mse"]) and np.isfinite(results["psnr"])

    fvd_path = os.path.join(workdir["root"], "fvd.yaml")
    run_cli(
        "playableenvironments_tpu.cli.evaluate_fvd_reconstructed_dataset",
        "--config", workdir["config"], "--generated", out,
        "--output", fvd_path, "--clip_length", "4",
    )
    fvd_results = yaml.safe_load(open(fvd_path))
    assert np.isfinite(fvd_results["fvd"])


def test_camera_manipulation_cli(workdir, phase2_checkpoint):
    ckpt = phase2_checkpoint
    out = os.path.join(workdir["root"], "camera_manip")
    run_cli(
        "playableenvironments_tpu.cli.generate_reconstructed_camera_manipulation_dataset",
        "--config", workdir["config"], "--checkpoint", ckpt, "--output", out,
        "--observations_count", "4",
    )
    cam_dir = os.path.join(out, "00000", "00000")
    assert len([f for f in os.listdir(cam_dir) if f.endswith(".png")]) >= 4

    results_path = os.path.join(workdir["root"], "camera_manip_eval.yaml")
    run_cli(
        "playableenvironments_tpu.cli.evaluate_reconstructed_camera_manipulation_dataset",
        "--config", workdir["config"], "--generated", out,
        "--output", results_path, "--window_size", "4", "--no_fid",
    )
    results = yaml.safe_load(open(results_path))
    assert np.isfinite(results["mse"]) and np.isfinite(results["psnr"])


@pytest.fixture(scope="module")
def phase3_checkpoint(workdir, phase2_checkpoint):
    """Phase-3 training via the CLI; returns its checkpoint path."""
    run_cli(
        "playableenvironments_tpu.cli.train_playable",
        "--config", workdir["config"],
        "--environment_checkpoint", phase2_checkpoint,
    )
    from playableenvironments_tpu.train.checkpointing import latest_checkpoint

    ckpt = latest_checkpoint(os.path.join(
        workdir["cfg"]["logging"]["checkpoints_root"], "synthetic_smoke", "playable"))
    assert ckpt is not None
    return ckpt


def test_phase3_training_and_play_cli(workdir, phase2_checkpoint, phase3_checkpoint):
    env_ckpt = phase2_checkpoint
    playable_ckpt = phase3_checkpoint

    play_out = os.path.join(workdir["root"], "play")
    run_cli(
        "playableenvironments_tpu.cli.play",
        "--config", workdir["config"],
        "--environment_checkpoint", env_ckpt,
        "--playable_checkpoint", playable_ckpt,
        "--script", "0,1,2",
        "--output", play_out,
    )
    frames = os.listdir(os.path.join(play_out, "frames"))
    assert len(frames) == 4  # initial + 3 scripted actions
    assert os.path.isfile(os.path.join(play_out, "sequence.mp4"))
    assert os.path.isfile(os.path.join(play_out, "sequence.gif"))


def test_playability_generation_and_evaluation_cli(
    workdir, phase2_checkpoint, phase3_checkpoint
):
    env_ckpt = phase2_checkpoint
    playable_ckpt = phase3_checkpoint

    out = os.path.join(workdir["root"], "playability")
    run_cli(
        "playableenvironments_tpu.cli.generate_reconstructed_playability_dataset",
        "--config", workdir["config"],
        "--environment_checkpoint", env_ckpt,
        "--playable_checkpoint", playable_ckpt,
        "--output", out, "--observations_count", "4",
    )
    assert os.path.isdir(os.path.join(out, "00000", "00000"))

    results_path = os.path.join(workdir["root"], "playability_eval.yaml")
    run_cli(
        "playableenvironments_tpu.cli.evaluate_reconstructed_playability_dataset",
        "--config", workdir["config"], "--generated", out,
        "--output", results_path,
    )
    results = yaml.safe_load(open(results_path))
    assert "mse" in results


def test_phase1_autoencoder_training_cli(workdir):
    """The AE CLI honours the dedicated `autoencoder_training:` block of the
    published configs (reference AutoencoderConfiguration has its own YAML),
    writes checkpoints, and produces the training-time evaluator grid."""
    cfg = dict(yaml.safe_load(open(workdir["config"])))
    cfg["model"] = dict(cfg["model"])
    cfg["model"]["autoencoder"] = {
        "input_features": 3,
        "bottleneck_features": 8,
        "bottleneck_blocks": 1,
        "downsampling_layers_count": [1, 1],
    }
    cfg["logging"] = dict(cfg["logging"])
    cfg["logging"]["run_name"] = "smoke_ae"
    # Deliberately phase-2-like settings under training:; the AE block must
    # win (regression: the CLI used to read training: unconditionally).
    cfg["autoencoder_training"] = {
        "learning_rate": 0.0004,
        "max_steps": 4,
        "batch_size": 2,
        "save_freq": 4,
        "log_interval_steps": 2,
        "eval_freq": 2,
        "loss_weights": {"KL_loss_lambda": 0.000005},
    }
    config_path = os.path.join(workdir["root"], "smoke_ae.yaml")
    yaml.safe_dump(cfg, open(config_path, "w"))

    run_cli(
        "playableenvironments_tpu.cli.train_autoencoder", "--config", config_path
    )
    from playableenvironments_tpu.train.checkpointing import latest_checkpoint

    ckpt = latest_checkpoint(
        os.path.join(cfg["logging"]["checkpoints_root"], "smoke_ae")
    )
    assert ckpt is not None and ckpt.endswith("_4")
    results_dir = os.path.join(cfg["logging"]["output_root"], "smoke_ae")
    images = [
        name
        for name in os.listdir(results_dir)
        if name.endswith(".png") or "grid" in name
    ] + (
        os.listdir(os.path.join(results_dir, "images"))
        if os.path.isdir(os.path.join(results_dir, "images"))
        else []
    )
    assert images, f"no evaluator grid written under {results_dir}"


def test_export_renderer_cli(workdir, phase2_checkpoint):
    """Export the trained renderer as a serving artifact and serve a frame
    from the deserialized program."""
    out = os.path.join(workdir["root"], "renderer.pexp")
    run_cli(
        "playableenvironments_tpu.cli.export_renderer",
        "--config", workdir["config"],
        "--checkpoint", phase2_checkpoint,
        "--output", out,
    )
    from playableenvironments_tpu import serve
    from playableenvironments_tpu.cli.common import build_dataset, load_yaml
    from playableenvironments_tpu.cli.generate_reconstructed_dataset import (
        build_renderer,
    )

    cfg = load_yaml(workdir["config"])
    renderer, dataset, _ = build_renderer(cfg, phase2_checkpoint)
    batch = next(dataset.iterate_batches(1, shuffle=False))
    encoding = renderer.encode(batch)
    artifact = serve.load_artifact(out)
    frames = np.asarray(artifact(encoding))
    assert np.isfinite(frames).all() and frames.shape[-3:] == (16, 24, 3)
    np.testing.assert_allclose(
        frames, np.asarray(renderer.render(encoding)), atol=1e-5
    )


def test_export_interactive_cli(workdir, phase2_checkpoint, phase3_checkpoint):
    """The interactive bundle (render + step0 + step) exports from trained
    checkpoints through the CLI."""
    prefix = os.path.join(workdir["root"], "world")
    run_cli(
        "playableenvironments_tpu.cli.export_renderer",
        "--config", workdir["config"],
        "--checkpoint", phase2_checkpoint,
        "--playable_checkpoint", phase3_checkpoint,
        "--output", prefix,
    )
    from playableenvironments_tpu import serve

    for kind in ("render", "step0", "step"):
        artifact = serve.load_artifact(f"{prefix}.{kind}.pexp")
        assert artifact.header["platforms"] == ["cpu"]
