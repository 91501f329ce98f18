"""Checkpoint save/restore via orbax.

The reference checkpoints model + optimizers + scheduler + step as torch
state_dicts (training/trainer.py:135-171); here the whole TrainState pytree
(params, batch_stats, optimizer state, step, EMA extras) round-trips through
one orbax PyTreeCheckpointer, so annealing and EMA state resume exactly.
Cross-phase transfer (phase-2 checkpoint feeding phase 3, README.md:144-155)
is `restore_params` into a fresh state.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from playableenvironments_tpu.train.state import TrainState


def _checkpointer():
    """A PyTree checkpointer whose barrier set is ONLY the calling process.

    Checkpoint IO here is process-local by design (device_get-then-write:
    payloads are host numpy, saves are CLI-gated to process 0, restores read
    the same finalized files on every process independently). Orbax's default
    Checkpointer instead runs save_start/restore barriers over ALL processes
    — a process-0-gated quick save then deadlocks the job (observed live:
    process 0 parked in sync_global_processes inside Checkpointer.save at
    step 2 of the 2-process CLI test while process 1 trained on).
    """
    pid = jax.process_index()
    return ocp.Checkpointer(
        ocp.PyTreeCheckpointHandler(),
        multiprocessing_options=ocp.options.MultiprocessingOptions(
            primary_host=pid,
            active_processes={pid},
            barrier_sync_key_prefix=f"pe_solo_{pid}",
        ),
    )


def save_checkpoint(
    directory: str,
    state: TrainState,
    step: Optional[int] = None,
    keep: Optional[int] = None,
):
    """Write `<directory>/checkpoint_<step>` (step defaults to state.step).

    :param keep: if set, prune the directory to the newest `keep` checkpoints
        after saving — used for the reference's quick crash-bounding saves
        (train.py:81-86 saves every 500 steps on top of named checkpoints).
    """
    step = int(state.step) if step is None else step
    path = os.path.join(os.path.abspath(directory), f"checkpoint_{step}")
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "extra": state.extra,
    }
    _checkpointer().save(path, payload, force=True)
    if keep:
        import shutil

        entries = []
        for name in os.listdir(directory):
            if name.startswith("checkpoint_"):
                try:
                    entries.append((int(name.split("_")[-1]), name))
                except ValueError:
                    continue
        for _, name in sorted(entries)[:-keep]:
            shutil.rmtree(os.path.join(directory, name), ignore_errors=True)
    return path


def latest_checkpoint(directory: str) -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    candidates = []
    for name in os.listdir(directory):
        if name.startswith("checkpoint_"):
            try:
                candidates.append((int(name.split("_")[-1]), name))
            except ValueError:
                continue
    if not candidates:
        return None
    # Absolute, matching save_checkpoint: orbax restore rejects relative
    # paths (a run with a relative checkpoints_root could save but not resume).
    return os.path.abspath(os.path.join(directory, max(candidates)[1]))


def checkpoint_step(path: Optional[str]) -> int:
    """The step encoded in a `checkpoint_<step>` path (-1 for None)."""
    if not path:
        return -1
    try:
        return int(path.rsplit("_", 1)[-1])
    except ValueError:
        return -1


def latest_checkpoint_any(*directories: str) -> Optional[str]:
    """The newest checkpoint (by step) across several directories — the
    resume-from-newest-of-named-and-quick rule shared by all three training
    CLIs (reference train.py:55-59 + the quick saves of train.py:81-86)."""
    candidates = [latest_checkpoint(d) for d in directories]
    best = max(candidates, key=checkpoint_step, default=None)
    return best if checkpoint_step(best) >= 0 else None


def restore_checkpoint(path: str, state: TrainState) -> TrainState:
    """Restore a TrainState saved by save_checkpoint, using `state` as the
    structure/dtype template (its tx is kept)."""
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "extra": state.extra,
    }
    restored = _checkpointer().restore(path, item=template)
    return state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
        extra=restored["extra"],
    )


def restore_params(path: str, params_template: Any, batch_stats_template: Any):
    """Load only params/batch_stats from a checkpoint (cross-phase transfer)."""
    full = _checkpointer().restore(path)
    params = jax.tree.map(lambda t, r: r, params_template, full["params"])
    batch_stats = jax.tree.map(
        lambda t, r: r, batch_stats_template, full["batch_stats"]
    )
    return params, batch_stats


def graft_autoencoder(path: str, state: TrainState) -> TrainState:
    """Warm-start the phase-2 model's autoencoder from a PHASE-1 checkpoint
    (the reference's `model.autoencoder.weights_filename`,
    environment_model_backpropagated_autoencoder.py:27-40): the phase-1
    MultiresAutoencoder params/batch_stats {encoder, decoder} drop into the
    env model's `autoencoder` submodule unchanged."""
    full = _checkpointer().restore(path)
    if "autoencoder" not in state.params:
        raise ValueError(
            "graft_autoencoder: the phase-2 model has no autoencoder "
            "submodule (model.autoencoder missing from the config?)"
        )
    params = dict(state.params)
    params["autoencoder"] = jax.tree.map(
        lambda t, r: r, state.params["autoencoder"], full["params"]
    )
    batch_stats = dict(state.batch_stats)
    if "autoencoder" in batch_stats and full.get("batch_stats"):
        batch_stats["autoencoder"] = jax.tree.map(
            lambda t, r: r, batch_stats["autoencoder"], full["batch_stats"]
        )
    return state.replace(params=params, batch_stats=batch_stats)
