"""Playable Environments, rebuilt TPU-native on JAX/XLA/Pallas/pjit.

A compositional, style-modulated NeRF world model trained from monocular video
in three phases (variational feature renderer, per-object NeRF synthesis module,
unsupervised action module), plus the surrounding framework: dataset pipeline,
trainers, evaluators, and an interactive play loop.

This is a ground-up TPU-first design (see SURVEY.md at the repo root), not a
port of the PyTorch reference. The compute path is pure JAX (with Pallas TPU
kernels for the fused render core); the scalable axes (batch x rays x samples)
are sharded over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"
