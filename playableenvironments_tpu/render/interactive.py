"""Pure interactive-generation step: the play loop's body as a function.

Factored out of the play CLI so the same code drives the cv2 window, the
headless script mode, and the serving exports (serve.export_interactive):
one dynamics step per dynamic object, then the updated frame-0 encoding.
Reference semantics: playable_environment_model.py:295-396 (`generate_next`,
including the `use_initial_style` anti-drift option).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from playableenvironments_tpu.config import ObjectIds
from playableenvironments_tpu.scene.encoding import SceneEncoding


def action_inputs(
    playable_model, actions: Sequence[int]
) -> Tuple[Tuple[jnp.ndarray, ...], Tuple[jnp.ndarray, ...]]:
    """Per-dynamic-object (one_hot, zero-variation) pairs from action ints.

    Out-of-range indices clamp to the object's last action (one_hot of an
    out-of-range index is the all-zero vector — an undefined non-action).
    """
    object_ids = ObjectIds(playable_model.scene)
    one_hots, variations = [], []
    for dynamic_idx, action in enumerate(actions):
        anim_cfg = playable_model.scene.animation_models[
            object_ids.animation_model_idx_by_dynamic_object_idx(dynamic_idx)
        ]
        action = max(0, min(int(action), anim_cfg.actions_count - 1))
        one_hots.append(jax.nn.one_hot(jnp.asarray([action]), anim_cfg.actions_count))
        variations.append(jnp.zeros((1, anim_cfg.action_space_dimension)))
    return tuple(one_hots), tuple(variations)


def interactive_step(
    playable_model,
    playable_variables,
    encoding: SceneEncoding,
    initial_style: jnp.ndarray,
    carries: Sequence,
    one_hots: Sequence[jnp.ndarray],
    variations: Sequence[jnp.ndarray],
    use_initial_style: bool = True,
) -> Tuple[SceneEncoding, List]:
    """One dynamics step per dynamic object over a (B, 1, ...) encoding.

    :param carries: per-dynamic-object LSTM carries; None entries initialize
        from the learnable initial state (the first step after reset).
    :param one_hots / variations: see `action_inputs`.
    :return: (new_encoding, new_carries).
    """
    from playableenvironments_tpu.render.playable_model import (
        PlayableEnvironmentModel,
    )

    object_ids = ObjectIds(playable_model.scene)
    static = object_ids.static_objects_count
    if len(one_hots) != object_ids.dynamic_objects_count:
        raise ValueError(
            f"interactive_step needs one action per dynamic object "
            f"({object_ids.dynamic_objects_count}), got {len(one_hots)} — "
            "a partial list would silently skip (and drop the carries of) "
            "the remaining objects"
        )
    new_rot, new_trans = encoding.object_rotations, encoding.object_translations
    new_style, new_deform = encoding.object_style, encoding.object_deformation

    new_carries: List = list(carries)
    for dynamic_idx, (one_hot, variation) in enumerate(zip(one_hots, variations)):
        object_idx = static + dynamic_idx
        (carry, (rot, trans, style, deform)), _ = playable_model.apply(
            playable_variables,
            dynamic_idx,
            carries[dynamic_idx],
            encoding.object_rotations[:, 0, object_idx],
            encoding.object_translations[:, 0, object_idx],
            encoding.object_style[:, 0, object_idx],
            encoding.object_deformation[:, 0, object_idx],
            one_hot,
            variation,
            method=PlayableEnvironmentModel.dynamics_step,
            mutable=["batch_stats"],
        )
        new_carries[dynamic_idx] = carry
        new_rot = new_rot.at[:, 0, object_idx].set(rot)
        new_trans = new_trans.at[:, 0, object_idx].set(trans)
        new_style = new_style.at[:, 0, object_idx].set(style)
        new_deform = new_deform.at[:, 0, object_idx].set(deform)

    new_encoding = encoding.replace(
        object_rotations=new_rot,
        object_translations=new_trans,
        # use_initial_style (playable_environment_model.py:295-396): keep
        # the frame-0 style to avoid drift.
        object_style=initial_style if use_initial_style else new_style,
        object_deformation=new_deform,
    )
    return new_encoding, new_carries
