"""Fused rollout kernel: forward parity with the flax DynamicsNetwork loop
and hand-derived-VJP parity with XLA autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from playableenvironments_tpu.config import (
    ActionNetworkConfig,
    AnimationModelConfig,
    DynamicsNetworkConfig,
)
from playableenvironments_tpu.models.dynamics import DynamicsNetwork
from playableenvironments_tpu.ops import fused_rollout as fr

BOX = ((-1.0, 1.0), (-1.0, 1.0), (0.0, 2.0))
BS, T, F, S, D, A, V = 3, 6, 16, 8, 4, 4, 3


def make_cfg(force_rot=True, force_z=True, axis=2):
    return AnimationModelConfig(
        actions_count=A, action_space_dimension=V,
        style_features=S, deformation_features=D,
        dynamics=DynamicsNetworkConfig(
            output_features=F, layers_count=2,
            force_rotations_zero=force_rot, force_z_translations_zero=force_z,
            rotation_axis=axis,
        ),
        action_network=ActionNetworkConfig(layers_width=16, layers_count=2),
    )


def setup(force_rot=True, force_z=True, axis=2, forced_value=0.0, seed=0):
    cfg = make_cfg(force_rot, force_z, axis)
    dyn = DynamicsNetwork(
        cfg, BOX,
        force_rotation_axis_translation=forced_value if force_z else None,
    )
    key = jax.random.PRNGKey(seed)
    keys = jax.random.split(key, 8)
    rot = jax.random.normal(keys[0], (BS, T, 3)) * 0.3
    trans = jax.random.normal(keys[1], (BS, T, 3))
    style = jax.random.normal(keys[2], (BS, T, S))
    deform = jax.random.normal(keys[3], (BS, T, D))
    actions = jax.nn.one_hot(
        jax.random.randint(keys[4], (BS, T - 1), 0, A), A
    )
    variations = jax.random.normal(keys[5], (BS, T - 1, V)) * 0.1
    variables = dyn.init(
        keys[6], None, rot[:, 0], trans[:, 0], style[:, 0], deform[:, 0],
        actions[:, 0], variations[:, 0],
    )
    rollout_cfg = fr.RolloutConfig(
        rotation_axis=axis,
        force_rotations_zero=force_rot,
        force_axis_translation=(forced_value if force_z else None),
        box_size=tuple(hi - lo for lo, hi in BOX),
    )
    packed = fr.pack_dynamics_params(variables["params"])
    return dyn, variables, rollout_cfg, packed, (rot, trans, style, deform, actions, variations)


def module_rollout(dyn, variables, inputs, gt_count):
    """The straightforward flax loop (the original reference semantics)."""
    rot, trans, style, deform, actions, variations = inputs
    rec = [(rot[:, 0], trans[:, 0], style[:, 0], deform[:, 0])]
    carry = None
    for t in range(T - 1):
        use_gt = t < gt_count
        gt = (rot[:, t], trans[:, t], style[:, t], deform[:, t])
        cur = tuple(jnp.where(use_gt, g, p) for g, p in zip(gt, rec[-1]))
        carry, state = dyn.apply(
            variables, carry, *cur, actions[:, t], variations[:, t]
        )
        rec.append(state)
    return tuple(jnp.stack([r[k] for r in rec], axis=1) for k in range(4))


@pytest.mark.parametrize("force_rot,force_z,axis,gt_count", [
    (True, True, 2, 3),
    (False, False, 1, 0),
    (False, True, 0, T - 1),
])
def test_forward_matches_module(force_rot, force_z, axis, gt_count):
    dyn, variables, rollout_cfg, packed, inputs = setup(force_rot, force_z, axis, 0.01)
    expected = module_rollout(dyn, variables, inputs, gt_count)
    got = fr.fused_rollout(
        rollout_cfg, packed, *inputs, jnp.asarray(gt_count)
    )
    for name, e, g in zip("rot trans style deform".split(), expected, got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(e), atol=2e-5, err_msg=name
        )


@pytest.mark.parametrize("force_rot,force_z,axis,gt_count", [
    (True, True, 2, 3),
    (False, False, 1, 1),
    (False, True, 0, 0),
])
def test_custom_vjp_matches_autodiff(force_rot, force_z, axis, gt_count):
    """The hand-derived backward must equal XLA autodiff of the same forward
    for every differentiable input."""
    _, _, rollout_cfg, packed, inputs = setup(force_rot, force_z, axis, 0.01, seed=3)
    rot, trans, style, deform, actions, variations = inputs
    weights = [
        jax.random.normal(jax.random.PRNGKey(10 + k), (BS, T, dim))
        for k, dim in enumerate((3, 3, S, D))
    ]

    def loss_custom(packed_p, rot, trans, style, deform, actions, variations):
        out = fr.fused_rollout(
            rollout_cfg, packed_p, rot, trans, style, deform, actions,
            variations, jnp.asarray(gt_count),
        )
        return sum(jnp.sum(w * o) for w, o in zip(weights, out))

    def loss_auto(packed_p, rot, trans, style, deform, actions, variations):
        out, _ = fr._forward_core(
            rollout_cfg, packed_p, rot, trans, style, deform, actions,
            variations, jnp.asarray(gt_count), collect_residuals=False,
        )
        return sum(jnp.sum(w * o) for w, o in zip(weights, out))

    args = (packed, rot, trans, style, deform, actions, variations)
    grads_custom = jax.grad(loss_custom, argnums=tuple(range(7)))(*args)
    grads_auto = jax.grad(loss_auto, argnums=tuple(range(7)))(*args)

    flat_c = jax.tree_util.tree_flatten_with_path(grads_custom)[0]
    flat_a = jax.tree_util.tree_flatten_with_path(grads_auto)[0]
    assert len(flat_c) == len(flat_a)
    for (path, gc), (_, ga) in zip(flat_c, flat_a):
        np.testing.assert_allclose(
            np.asarray(gc), np.asarray(ga), atol=5e-4, rtol=1e-3,
            err_msg=jax.tree_util.keystr(path),
        )


def test_values_match_custom_and_core():
    """fused_rollout (custom_vjp wrapper) and the raw core agree."""
    _, _, rollout_cfg, packed, inputs = setup()
    a = fr.fused_rollout(rollout_cfg, packed, *inputs, jnp.asarray(2))
    b, _ = fr._forward_core(
        rollout_cfg, packed, *inputs, jnp.asarray(2), collect_residuals=False
    )
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=0)


@pytest.mark.parametrize("force_rot,force_z,axis,gt_count", [
    (True, True, 2, 3),
    (False, False, 1, 1),
])
def test_pallas_kernels_match_core(force_rot, force_z, axis, gt_count):
    """The Pallas fwd/bwd kernels (interpret mode on CPU) must match the XLA
    reference path bit-for-tolerance on values and every gradient."""
    _, _, rollout_cfg, packed, inputs = setup(force_rot, force_z, axis, 0.01, seed=5)
    rot, trans, style, deform, actions, variations = inputs
    weights = [
        jax.random.normal(jax.random.PRNGKey(20 + k), (BS, T, dim))
        for k, dim in enumerate((3, 3, S, D))
    ]

    def loss(use_pallas, packed_p, *rest):
        out = fr.fused_rollout(
            rollout_cfg, packed_p, *rest, jnp.asarray(gt_count), use_pallas
        )
        return sum(jnp.sum(w * o) for w, o in zip(weights, out))

    args = (packed, rot, trans, style, deform, actions, variations)
    out_ref = fr.fused_rollout(rollout_cfg, *args, jnp.asarray(gt_count))
    out_pal = fr.fused_rollout(
        rollout_cfg, *args, jnp.asarray(gt_count), use_pallas=True
    )
    for name, a, b in zip("rot trans style deform".split(), out_ref, out_pal):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-5, err_msg=name
        )

    grads_ref = jax.grad(
        lambda *a: loss(False, *a), argnums=tuple(range(7))
    )(*args)
    grads_pal = jax.grad(
        lambda *a: loss(True, *a), argnums=tuple(range(7))
    )(*args)
    flat_r = jax.tree_util.tree_flatten_with_path(grads_ref)[0]
    flat_p = jax.tree_util.tree_flatten_with_path(grads_pal)[0]
    for (path, gr), (_, gp) in zip(flat_r, flat_p):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gr), atol=5e-4, rtol=1e-3,
            err_msg=jax.tree_util.keystr(path),
        )
