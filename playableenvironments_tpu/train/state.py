"""Train state pytrees and optimizer construction.

The reference keeps separate Adam optimizers for main parameters, object
encoders, camera offsets and (backprop-AE variants) the autoencoder, each with
its own learning rate (training/trainer.py:34-39,
trainer_backpropagated_autoencoder.py:63-90). Here one optax multi_transform
partitions the parameter tree by top-level module name — one optimizer state,
same per-group dynamics, trivially shardable.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    """Model + optimizer state carried across steps (all explicit: EMA buffers
    and annealing steps live here, not in module buffers)."""

    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    # Extra mutable training-time state (e.g. MI smoothing matrices, action
    # centroids), a dict pytree; empty by default.
    extra: Dict[str, Any] = flax.struct.field(default_factory=dict)

    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False, default=None)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt_state,
            step=self.step + 1,
        )


def exponential_decay_schedule(
    learning_rate: float, gamma: float, decay_iterations: int
) -> optax.Schedule:
    """lr * gamma^(step // decay_iterations): ExponentialLR stepped every
    `lr_decay_iterations` (training/trainer.py:668-670)."""
    return optax.exponential_decay(
        init_value=learning_rate,
        transition_steps=decay_iterations,
        decay_rate=gamma,
        staircase=True,
    )


def make_optimizer(
    learning_rate: float,
    gamma: float = 1.0,
    decay_iterations: int = 10000,
    weight_decay: float = 0.0,
    group_learning_rates: Optional[Dict[str, float]] = None,
    group_fn: Optional[Callable[[str], str]] = None,
    group_freeze_steps: Optional[Dict[str, int]] = None,
    betas: tuple = (0.9, 0.999),
) -> optax.GradientTransformation:
    """Adam with staircase-exponential lr decay and optional per-group rates.

    :param group_learning_rates: map group name -> learning rate override.
    :param group_fn: maps the TOP-LEVEL parameter key to a group name;
        defaults to identity. Parameters whose group is absent from
        group_learning_rates use the main rate.
    :param group_freeze_steps: group name -> steps to hold its lr at 0 first
        (the reference's `frozen_autoencoder_steps`,
        trainer_backpropagated_autoencoder.py:118-121).
    :param betas: Adam (b1, b2) — the published phase-3 GAN configs use
        (0.5, 0.999) (playable_model_trainer.py:93, playability yamls).
    """
    group_freeze_steps = group_freeze_steps or {}

    def adam(lr, freeze_steps=0):
        base = exponential_decay_schedule(lr, gamma, decay_iterations)
        if freeze_steps:
            schedule = lambda step: jnp.where(  # noqa: E731
                step < freeze_steps, 0.0, base(step)
            )
        else:
            schedule = base
        b1, b2 = betas
        if weight_decay:
            return optax.adamw(schedule, b1=b1, b2=b2, weight_decay=weight_decay)
        return optax.adam(schedule, b1=b1, b2=b2)

    if not group_learning_rates:
        return adam(learning_rate)

    group_fn = group_fn or (lambda name: name)
    transforms = {"__main__": adam(learning_rate)}
    for group, lr in group_learning_rates.items():
        transforms[group] = adam(lr, group_freeze_steps.get(group, 0))

    def label_tree(params):
        def label_top(key):
            group = group_fn(key)
            return group if group in group_learning_rates else "__main__"

        return {k: jax.tree.map(lambda _: label_top(k), v) for k, v in params.items()}

    return optax.multi_transform(transforms, label_tree)


def create_train_state(
    params,
    batch_stats,
    tx: optax.GradientTransformation,
    extra: Optional[Dict[str, Any]] = None,
) -> TrainState:
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        extra=extra or {},
        tx=tx,
    )
