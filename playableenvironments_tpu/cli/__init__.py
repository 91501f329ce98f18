"""Command-line entry points (`python -m playableenvironments_tpu.cli.<name>`).

Mirrors the reference's root scripts (train.py, train_autoencoder.py,
train_playable_model.py, play.py, generate_reconstructed_*.py,
evaluate_reconstructed_*.py), each taking `--config <yaml>`.
"""
