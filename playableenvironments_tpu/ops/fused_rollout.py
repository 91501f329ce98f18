"""Fused phase-3 dynamics rollout: the whole teacher-forced autoregressive
LSTM rollout (models/dynamics.py DynamicsNetwork over T steps,
object_animation_model.py:245-307) as ONE custom-VJP op, with a Pallas TPU
kernel for forward and backward.

Why: phase-3 training is op-dispatch-bound on TPU — the rollout is a serial
chain of ~50 tiny HLO ops per timestep (LSTM gates, heads, rotation
trigonometry, teacher-forcing picks), and each op execution pays a fixed
cost that dwarfs its FLOPs at (bs<=64, features 256) sizes. Collapsing the
T-step chain into a single kernel (everything resident in VMEM, python-
unrolled inside the kernel body) turns ~500 op executions into 1.

The forward math matches flax's OptimizedLSTMCell (gate order i, f, g, o;
new_c = f*c + i*g, new_h = o*tanh(new_c); input projections without bias,
hidden projections with bias) and DynamicsNetwork's heads exactly; parity
+ gradient tests against the module path are in tests/test_fused_rollout.py.

The math cores here operate on plain 2D values with only slice/concat
layout ops, so the SAME code traces both as regular XLA (CPU/reference
path) and inside the Pallas kernel bodies (fused_rollout_pallas).

All functions are single-object; loop objects at the call site (objects have
distinct parameters and may have distinct configs).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class RolloutConfig(NamedTuple):
    """Static per-object rollout configuration (hashable: used as a
    nondiff custom_vjp argument)."""

    rotation_axis: int
    force_rotations_zero: bool
    force_axis_translation: Optional[float]  # None = axis free
    box_size: Tuple[float, float, float]


class PackedParams(NamedTuple):
    """DynamicsNetwork parameters packed for the fused kernel.

    Gate packing order is (i, f, g, o), matching flax OptimizedLSTMCell's
    concat order. Biases are kept 2D (1, n) so the same arrays drop into
    the Pallas kernels unchanged.
    """

    wx: Tuple[jnp.ndarray, ...]  # per layer (in_features_l, 4F)
    wh: Tuple[jnp.ndarray, ...]  # per layer (F, 4F)
    bh: Tuple[jnp.ndarray, ...]  # per layer (1, 4F)
    h_init: Tuple[jnp.ndarray, ...]  # per layer (1, F)
    c_init: Tuple[jnp.ndarray, ...]  # per layer (1, F)
    wb: jnp.ndarray  # backbone (F, F)
    bb: jnp.ndarray  # (1, F)
    whead: jnp.ndarray  # (F, 6 + 3 + S + D) = [rotation|translation|style|deformation]
    bhead: jnp.ndarray  # (1, 6 + 3 + S + D)


GATES = ("i", "f", "g", "o")


def pack_dynamics_params(params) -> PackedParams:
    """flax DynamicsNetwork param dict -> PackedParams (a few concats; cheap
    and differentiable, so gradients flow back to the original leaves)."""
    wx, wh, bh, h_init, c_init = [], [], [], [], []
    layer = 0
    while f"lstm_{layer}" in params:
        cell = params[f"lstm_{layer}"]
        wx.append(jnp.concatenate([cell[f"i{g}"]["kernel"] for g in GATES], axis=-1))
        wh.append(jnp.concatenate([cell[f"h{g}"]["kernel"] for g in GATES], axis=-1))
        bh.append(
            jnp.concatenate([cell[f"h{g}"]["bias"] for g in GATES], axis=-1)[None]
        )
        h_init.append(params[f"initial_hidden_{layer}"][None])
        c_init.append(params[f"initial_cell_{layer}"][None])
        layer += 1
    whead = jnp.concatenate(
        [
            params["rotation_head"]["kernel"],
            params["translation_head"]["kernel"],
            params["style_head"]["kernel"],
            params["deformation_head"]["kernel"],
        ],
        axis=-1,
    )
    bhead = jnp.concatenate(
        [
            params["rotation_head"]["bias"],
            params["translation_head"]["bias"],
            params["style_head"]["bias"],
            params["deformation_head"]["bias"],
        ],
        axis=-1,
    )[None]
    return PackedParams(
        wx=tuple(wx), wh=tuple(wh), bh=tuple(bh),
        h_init=tuple(h_init), c_init=tuple(c_init),
        wb=params["backbone"]["kernel"], bb=params["backbone"]["bias"][None],
        whead=whead, bhead=bhead,
    )


def _cat(pieces):
    """Concatenate, dropping zero-width pieces (Mosaic rejects 0-size
    vectors; edge-axis slices like vec[:, :0] produce them)."""
    kept = [p for p in pieces if p.shape[-1] > 0]
    return kept[0] if len(kept) == 1 else jnp.concatenate(kept, axis=-1)


def _scale_columns(vec, scales):
    """Per-column scalar multiply with python-float constants (array-valued
    constants cannot be captured inside Pallas kernels)."""
    return jnp.concatenate(
        [vec[:, k:k + 1] * float(s) for k, s in enumerate(scales)], axis=-1
    )


def _matmul(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _encode_rotation_2d(rot):
    """(B, 3) -> (B, 6) interleaved (sin, cos) pairs, 2D ops only."""
    pieces = []
    for k in range(3):
        angle = rot[:, k:k + 1]
        pieces.append(jnp.sin(angle))
        pieces.append(jnp.cos(angle))
    return jnp.concatenate(pieces, axis=-1)


def _rotate(axis: int, cos_t, sin_t, vec):
    """R_axis(theta) @ vec, 2D ops only. cos_t/sin_t (B, 1); vec (B, 3)."""
    x, y, z = vec[:, 0:1], vec[:, 1:2], vec[:, 2:3]
    if axis == 0:
        return jnp.concatenate(
            [x, cos_t * y - sin_t * z, sin_t * y + cos_t * z], axis=-1
        )
    if axis == 1:
        return jnp.concatenate(
            [cos_t * x + sin_t * z, y, -sin_t * x + cos_t * z], axis=-1
        )
    return jnp.concatenate(
        [cos_t * x - sin_t * y, sin_t * x + cos_t * y, z], axis=-1
    )


def _rotate_dtheta(axis: int, cos_t, sin_t, vec, d_out):
    """sum(dR/dtheta @ vec * d_out) -> (B, 1)."""
    x, y, z = vec[:, 0:1], vec[:, 1:2], vec[:, 2:3]
    zeros = jnp.zeros_like(x)
    if axis == 0:
        d = jnp.concatenate(
            [zeros, -sin_t * y - cos_t * z, cos_t * y - sin_t * z], axis=-1
        )
    elif axis == 1:
        d = jnp.concatenate(
            [-sin_t * x + cos_t * z, zeros, -cos_t * x - sin_t * z], axis=-1
        )
    else:
        d = jnp.concatenate(
            [-sin_t * x - cos_t * y, cos_t * x - sin_t * y, zeros], axis=-1
        )
    return jnp.sum(d * d_out, axis=-1, keepdims=True)


def _atan2(s, c):
    """Elementwise atan2 via atan identities (Mosaic-lowerable; jnp.arctan
    is supported where arctan2 may not be). Quadrant handling:
    atan2(s, c) = atan(s/c) + pi*sign(s)*(c<0)."""
    safe_c = jnp.where(jnp.abs(c) < 1e-20, 1e-20, c)
    base = jnp.arctan(s / safe_c)
    sign_s = jnp.where(s >= 0.0, 1.0, -1.0)
    return base + jnp.where(c < 0.0, sign_s * np.pi, 0.0)


def _axis_parts(axis: int, vec):
    """Split (B, 3) into (before, axis_col, after) 2D pieces."""
    return vec[:, :axis], vec[:, axis:axis + 1], vec[:, axis + 1:]


def _set_axis(axis: int, vec, value):
    before, _, after = _axis_parts(axis, vec)
    col = jnp.full_like(vec[:, axis:axis + 1], value)
    return _cat([before, col, after])


def _zero_axis_complement(axis: int, vec):
    """Keep only the axis column (others zeroed)."""
    before, col, after = _axis_parts(axis, vec)
    return _cat([jnp.zeros_like(before), col, jnp.zeros_like(after)])


def _zero_axis(axis: int, vec):
    """Zero the axis column (others kept)."""
    before, col, after = _axis_parts(axis, vec)
    return _cat([before, jnp.zeros_like(col), after])


def _step_forward(cfg: RolloutConfig, params: PackedParams, carry, state,
                  action, variation):
    """One dynamics step on 2D values. carry = (cs, hs) tuples per layer.

    :return: (new_carry, new_state, step_residuals)."""
    cs, hs = carry
    rot, trans, style, deform = state
    inv_box = tuple(1.0 / b for b in cfg.box_size)

    x = jnp.concatenate(
        [
            _encode_rotation_2d(rot), _scale_columns(trans, inv_box),
            style, deform, action, variation,
        ],
        axis=-1,
    )
    x0 = x
    features = params.wb.shape[0]
    new_cs, new_hs, gates_all = [], [], []
    for layer in range(len(params.wx)):
        z = _matmul(x, params.wx[layer]) + _matmul(hs[layer], params.wh[layer])
        z = z + params.bh[layer]
        zi = z[:, :features]
        zf = z[:, features:2 * features]
        zg = z[:, 2 * features:3 * features]
        zo = z[:, 3 * features:]
        i = jax.nn.sigmoid(zi)
        f = jax.nn.sigmoid(zf)
        g = jnp.tanh(zg)
        o = jax.nn.sigmoid(zo)
        c_new = f * cs[layer] + i * g
        h_new = o * jnp.tanh(c_new)
        new_cs.append(c_new)
        new_hs.append(h_new)
        gates_all.append(jnp.concatenate([i, f, g, o], axis=-1))
        x = h_new

    y = jax.nn.relu(_matmul(x, params.wb) + params.bb)
    head = _matmul(y, params.whead) + params.bhead

    style_dim = style.shape[-1]
    enc_rot = head[:, :6]
    delta_trans = head[:, 6:9]
    new_style = head[:, 9:9 + style_dim]
    new_deform = head[:, 9 + style_dim:]

    if cfg.force_rotations_zero:
        new_rot = rot
    else:
        axis = cfg.rotation_axis
        s_a = enc_rot[:, 2 * axis:2 * axis + 1]
        c_a = enc_rot[:, 2 * axis + 1:2 * axis + 2]
        delta_axis = _atan2(s_a, c_a)
        new_rot = rot + _cat(
            [
                jnp.zeros_like(rot[:, :axis]),
                delta_axis,
                jnp.zeros_like(rot[:, axis + 1:]),
            ]
        )

    axis = cfg.rotation_axis
    theta = rot[:, axis:axis + 1]
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    world_delta = _rotate(axis, cos_t, sin_t, delta_trans)
    new_trans = trans + world_delta
    if cfg.force_axis_translation is not None:
        new_trans = _set_axis(axis, new_trans, cfg.force_axis_translation)

    residuals = (x0, tuple(gates_all), tuple(new_cs), tuple(new_hs), y, head)
    return (
        (tuple(new_cs), tuple(new_hs)),
        (new_rot, new_trans, new_style, new_deform),
        residuals,
    )


def _forward_core(cfg, params, rotations, translations, style, deform, actions,
                  variations, gt_count, collect_residuals: bool):
    """Full rollout on values. Shapes: rotations (B, T, 3), actions (B, T-1, A).

    :return: (rec tuple of (B, T, .), residuals dict of stacked arrays or
        None). Residual arrays have a leading T-1 step axis."""
    batch, T = rotations.shape[0], rotations.shape[1]
    features = params.wb.shape[0]
    layers = len(params.wx)
    cs = tuple(
        jnp.broadcast_to(params.c_init[l], (batch, features)) for l in range(layers)
    )
    hs = tuple(
        jnp.broadcast_to(params.h_init[l], (batch, features)) for l in range(layers)
    )

    state = (rotations[:, 0], translations[:, 0], style[:, 0], deform[:, 0])
    rec = [state]
    steps = []
    carry = (cs, hs)
    for t in range(T - 1):
        use_gt = (jnp.asarray(t) < gt_count).astype(rotations.dtype)
        gt_state = (rotations[:, t], translations[:, t], style[:, t], deform[:, t])
        current = tuple(
            use_gt * gt + (1.0 - use_gt) * prev
            for gt, prev in zip(gt_state, rec[-1])
        )
        carry, state, step_res = _step_forward(
            cfg, params, carry, current, actions[:, t], variations[:, t]
        )
        rec.append(state)
        if collect_residuals:
            steps.append((current, step_res))
    out = tuple(jnp.stack([r[k] for r in rec], axis=1) for k in range(4))

    residuals = None
    if collect_residuals:
        residuals = {
            "cur_rot": jnp.stack([s[0][0] for s in steps]),
            "cur_trans": jnp.stack([s[0][1] for s in steps]),
            "cur_style": jnp.stack([s[0][2] for s in steps]),
            "cur_deform": jnp.stack([s[0][3] for s in steps]),
            "x0": jnp.stack([s[1][0] for s in steps]),
            "y": jnp.stack([s[1][4] for s in steps]),
            "head": jnp.stack([s[1][5] for s in steps]),
        }
        for layer in range(layers):
            residuals[f"gates_{layer}"] = jnp.stack(
                [s[1][1][layer] for s in steps]
            )
            residuals[f"c_{layer}"] = jnp.stack([s[1][2][layer] for s in steps])
            residuals[f"h_{layer}"] = jnp.stack([s[1][3][layer] for s in steps])
    return out, residuals


def _step_backward(cfg: RolloutConfig, params: PackedParams, step_res: Dict,
                   d_in, d_cs, d_hs):
    """Reverse pass of one dynamics step on 2D values.

    :param step_res: this step's residual values: cur_rot, cur_trans, x0, y,
        head, gates_l / c_l / h_l per layer, and c_prev_l / h_prev_l (the
        layer carries entering the step).
    :param d_in: (d_rot, d_trans, d_style, d_deform) cotangents on the step
        OUTPUTS (chain + loss already summed).
    :param d_cs, d_hs: per-layer carry cotangents from the next step.
    :return: (param_grad_increments: PackedParams, new_d_cs, new_d_hs,
        d_current_state tuple, d_action, d_variation)."""
    features = params.wb.shape[0]
    layers = len(params.wx)
    axis = cfg.rotation_axis
    d_rot, d_trans, d_sty, d_def = d_in
    cur_rot = step_res["cur_rot"]
    x0 = step_res["x0"]
    y = step_res["y"]
    head = step_res["head"]
    batch = cur_rot.shape[0]
    inv_box = tuple(1.0 / b for b in cfg.box_size)

    # --- translations: the forced axis blocks gradient through the sum.
    d_sum = (
        _zero_axis(axis, d_trans)
        if cfg.force_axis_translation is not None
        else d_trans
    )
    d_cur_trans = d_sum
    theta = cur_rot[:, axis:axis + 1]
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    delta_trans = head[:, 6:9]
    d_delta_trans = _rotate(axis, cos_t, -sin_t, d_sum)  # R^T = R(-theta)
    d_theta = _rotate_dtheta(axis, cos_t, sin_t, delta_trans, d_sum)

    # --- rotations.
    d_cur_rot = d_rot + _cat(
        [
            jnp.zeros_like(d_rot[:, :axis]),
            d_theta,
            jnp.zeros_like(d_rot[:, axis + 1:]),
        ]
    )
    if cfg.force_rotations_zero:
        d_enc_rot = jnp.zeros_like(head[:, :6])
    else:
        d_axis_col = d_rot[:, axis:axis + 1]
        s_a = head[:, 2 * axis:2 * axis + 1]
        c_a = head[:, 2 * axis + 1:2 * axis + 2]
        denom = s_a * s_a + c_a * c_a + 1e-20
        d_s = d_axis_col * c_a / denom
        d_c = -d_axis_col * s_a / denom
        d_enc_rot = _cat(
            [
                jnp.zeros((batch, 2 * axis), d_rot.dtype),
                d_s,
                d_c,
                jnp.zeros((batch, 6 - 2 * axis - 2), d_rot.dtype),
            ]
        )

    # --- heads.
    d_head = jnp.concatenate([d_enc_rot, d_delta_trans, d_sty, d_def], axis=-1)
    g_whead = _matmul(y.T, d_head)
    g_bhead = jnp.sum(d_head, axis=0, keepdims=True)
    d_y = _matmul(d_head, params.whead.T)
    d_y_pre = d_y * (y > 0).astype(d_y.dtype)
    top_h = step_res[f"h_{layers - 1}"]
    g_wb = _matmul(top_h.T, d_y_pre)
    g_bb = jnp.sum(d_y_pre, axis=0, keepdims=True)
    d_x = _matmul(d_y_pre, params.wb.T)

    # --- LSTM layers, top down.
    g_wx = [None] * layers
    g_wh = [None] * layers
    g_bh = [None] * layers
    new_d_cs = list(d_cs)
    new_d_hs = list(d_hs)
    for layer in range(layers - 1, -1, -1):
        gates = step_res[f"gates_{layer}"]
        i = gates[:, :features]
        f = gates[:, features:2 * features]
        g = gates[:, 2 * features:3 * features]
        o = gates[:, 3 * features:]
        c_new = step_res[f"c_{layer}"]
        tanh_c = jnp.tanh(c_new)
        c_prev = step_res[f"c_prev_{layer}"]
        h_prev = step_res[f"h_prev_{layer}"]
        d_h = d_x + d_hs[layer]
        d_o = d_h * tanh_c
        d_c = d_cs[layer] + d_h * o * (1.0 - tanh_c * tanh_c)
        d_f = d_c * c_prev
        d_i = d_c * g
        d_g = d_c * i
        new_d_cs[layer] = d_c * f  # carried to step t-1
        dz = jnp.concatenate(
            [
                d_i * i * (1.0 - i),
                d_f * f * (1.0 - f),
                d_g * (1.0 - g * g),
                d_o * o * (1.0 - o),
            ],
            axis=-1,
        )
        x_in = x0 if layer == 0 else step_res[f"h_{layer - 1}"]
        g_wx[layer] = _matmul(x_in.T, dz)
        g_wh[layer] = _matmul(h_prev.T, dz)
        g_bh[layer] = jnp.sum(dz, axis=0, keepdims=True)
        new_d_hs[layer] = _matmul(dz, params.wh[layer].T)
        d_x = _matmul(dz, params.wx[layer].T)

    # --- input assembly backward.
    style_dim = d_sty.shape[-1]
    deform_dim = d_def.shape[-1]
    d_enc_in = d_x[:, :6]
    d_trans_norm = d_x[:, 6:9]
    off = 9
    d_style_in = d_x[:, off:off + style_dim]
    off += style_dim
    d_deform_in = d_x[:, off:off + deform_dim]
    off += deform_dim
    d_act_and_var = d_x[:, off:]

    enc_pieces = []
    for k in range(3):
        angle = cur_rot[:, k:k + 1]
        enc_pieces.append(
            d_enc_in[:, 2 * k:2 * k + 1] * jnp.cos(angle)
            - d_enc_in[:, 2 * k + 1:2 * k + 2] * jnp.sin(angle)
        )
    d_cur_rot = d_cur_rot + jnp.concatenate(enc_pieces, axis=-1)
    d_cur_trans = d_cur_trans + _scale_columns(d_trans_norm, inv_box)

    increments = PackedParams(
        wx=tuple(g_wx), wh=tuple(g_wh), bh=tuple(g_bh),
        h_init=tuple(jnp.zeros_like(h) for h in params.h_init),
        c_init=tuple(jnp.zeros_like(c) for c in params.c_init),
        wb=g_wb, bb=g_bb, whead=g_whead, bhead=g_bhead,
    )
    return (
        increments, new_d_cs, new_d_hs,
        (d_cur_rot, d_cur_trans, d_style_in, d_deform_in),
        d_act_and_var,
    )


def _backward_core(cfg, params, rotations, translations, style, deform, actions,
                   variations, gt_count, residuals: Dict, cotangents):
    """Hand-derived reverse pass on values. `cotangents` = d wrt the four
    (B, T, .) outputs. Returns grads for (params, rotations, translations,
    style, deform, actions, variations); the rec-state grads are stacked
    (B, T, .) like the inputs, action/variation grads (B, T-1, .)."""
    batch, T = rotations.shape[0], rotations.shape[1]
    features = params.wb.shape[0]
    layers = len(params.wx)
    style_dim = style.shape[-1]
    deform_dim = deform.shape[-1]
    actions_dim = actions.shape[-1]
    box = np.asarray(cfg.box_size, np.float32)[None]
    axis = cfg.rotation_axis
    d_rot_out, d_trans_out, d_style_out, d_deform_out = cotangents

    g_wx = [jnp.zeros_like(w) for w in params.wx]
    g_wh = [jnp.zeros_like(w) for w in params.wh]
    g_bh = [jnp.zeros_like(b) for b in params.bh]
    g_wb = jnp.zeros_like(params.wb)
    g_bb = jnp.zeros_like(params.bb)
    g_whead = jnp.zeros_like(params.whead)
    g_bhead = jnp.zeros_like(params.bhead)

    # Per-step gradient pieces for the GT inputs, stacked at the end (the
    # .at[].add() indexed form would be one scatter op per step).
    g_rot_steps = []
    g_trans_steps = []
    g_style_steps = []
    g_deform_steps = []
    g_actions_steps = []
    g_variations_steps = []

    d_cs = [jnp.zeros((batch, features), rotations.dtype) for _ in range(layers)]
    d_hs = [jnp.zeros((batch, features), rotations.dtype) for _ in range(layers)]
    d_state = (
        jnp.zeros((batch, 3), rotations.dtype),
        jnp.zeros((batch, 3), rotations.dtype),
        jnp.zeros((batch, style_dim), rotations.dtype),
        jnp.zeros((batch, deform_dim), rotations.dtype),
    )
    extra_first = None  # gradient routed to the GT frame 0 by step 0

    for t in range(T - 2, -1, -1):
        step_res = {
            "cur_rot": residuals["cur_rot"][t],
            "cur_trans": residuals["cur_trans"][t],
            "x0": residuals["x0"][t],
            "y": residuals["y"][t],
            "head": residuals["head"][t],
        }
        for layer in range(layers):
            step_res[f"gates_{layer}"] = residuals[f"gates_{layer}"][t]
            step_res[f"c_{layer}"] = residuals[f"c_{layer}"][t]
            step_res[f"h_{layer}"] = residuals[f"h_{layer}"][t]
            if t == 0:
                step_res[f"c_prev_{layer}"] = jnp.broadcast_to(
                    params.c_init[layer], (batch, features)
                )
                step_res[f"h_prev_{layer}"] = jnp.broadcast_to(
                    params.h_init[layer], (batch, features)
                )
            else:
                step_res[f"c_prev_{layer}"] = residuals[f"c_{layer}"][t - 1]
                step_res[f"h_prev_{layer}"] = residuals[f"h_{layer}"][t - 1]

        d_in = (
            d_state[0] + d_rot_out[:, t + 1],
            d_state[1] + d_trans_out[:, t + 1],
            d_state[2] + d_style_out[:, t + 1],
            d_state[3] + d_deform_out[:, t + 1],
        )
        increments, d_cs, d_hs, d_cur, d_act_var = _step_backward(
            cfg, params, step_res, d_in, d_cs, d_hs
        )
        d_cur_rot, d_cur_trans, d_cur_style, d_cur_deform = d_cur
        for layer in range(layers):
            g_wx[layer] = g_wx[layer] + increments.wx[layer]
            g_wh[layer] = g_wh[layer] + increments.wh[layer]
            g_bh[layer] = g_bh[layer] + increments.bh[layer]
        g_wb = g_wb + increments.wb
        g_bb = g_bb + increments.bb
        g_whead = g_whead + increments.whead
        g_bhead = g_bhead + increments.bhead
        g_actions_steps.append(d_act_var[:, :actions_dim])
        g_variations_steps.append(d_act_var[:, actions_dim:])

        # --- teacher-forcing pick routing.
        use_gt = (jnp.asarray(t) < gt_count).astype(rotations.dtype)
        g_rot_steps.append(use_gt * d_cur_rot)
        g_trans_steps.append(use_gt * d_cur_trans)
        g_style_steps.append(use_gt * d_cur_style)
        g_deform_steps.append(use_gt * d_cur_deform)
        if t == 0:
            # rec[0] IS the ground-truth frame: the not-use_gt branch routes
            # there too, as does the direct output cotangent at index 0.
            extra_first = (
                (1.0 - use_gt) * d_cur_rot + d_rot_out[:, 0],
                (1.0 - use_gt) * d_cur_trans + d_trans_out[:, 0],
                (1.0 - use_gt) * d_cur_style + d_style_out[:, 0],
                (1.0 - use_gt) * d_cur_deform + d_deform_out[:, 0],
            )
        else:
            not_gt = 1.0 - use_gt
            d_state = (
                not_gt * d_cur_rot, not_gt * d_cur_trans,
                not_gt * d_cur_style, not_gt * d_cur_deform,
            )

    def assemble(steps_reversed, extra0, width):
        """Per-step GT-input grads (reversed t order) -> (B, T, width). The
        GT frame 0 also receives extra0; index T-1 is never a pick input so
        its grad is zero (the loss cotangent at T-1 entered through step
        T-2's chain)."""
        per_t = list(reversed(steps_reversed))  # t = 0..T-2
        per_t[0] = per_t[0] + extra0
        pad = jnp.zeros((batch, width), rotations.dtype)
        return jnp.stack(per_t + [pad], axis=1)

    g_rotations = assemble(g_rot_steps, extra_first[0], 3)
    g_translations = assemble(g_trans_steps, extra_first[1], 3)
    g_style = assemble(g_style_steps, extra_first[2], style_dim)
    g_deform = assemble(g_deform_steps, extra_first[3], deform_dim)

    g_actions = jnp.stack(list(reversed(g_actions_steps)), axis=1)
    g_variations = jnp.stack(list(reversed(g_variations_steps)), axis=1)

    g_params = PackedParams(
        wx=tuple(g_wx), wh=tuple(g_wh), bh=tuple(g_bh),
        h_init=tuple(
            jnp.sum(d_hs[l], axis=0, keepdims=True) for l in range(layers)
        ),
        c_init=tuple(
            jnp.sum(d_cs[l], axis=0, keepdims=True) for l in range(layers)
        ),
        wb=g_wb, bb=g_bb, whead=g_whead, bhead=g_bhead,
    )
    return (g_params, g_rotations, g_translations, g_style, g_deform,
            g_actions, g_variations)


# ---------------------------------------------------------------------------
# Public entry: custom-VJP rollout (XLA reference path or Pallas kernels)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 9))
def fused_rollout(cfg: RolloutConfig, params: PackedParams, rotations,
                  translations, style, deform, actions, variations, gt_count,
                  use_pallas: bool = False):
    """Teacher-forced dynamics rollout; returns (rot, trans, style, deform)
    each (B, T, .). Equivalent to ObjectAnimationModel.rollout_dynamics."""
    out, _ = _dispatch_forward(
        cfg, params, rotations, translations, style, deform, actions,
        variations, gt_count, use_pallas, collect_residuals=False,
    )
    return out


def _dispatch_forward(cfg, params, rotations, translations, style, deform,
                      actions, variations, gt_count, use_pallas,
                      collect_residuals):
    if use_pallas:
        from playableenvironments_tpu.ops import fused_rollout_pallas

        return fused_rollout_pallas.forward(
            cfg, params, rotations, translations, style, deform, actions,
            variations, gt_count, collect_residuals,
        )
    return _forward_core(
        cfg, params, rotations, translations, style, deform, actions,
        variations, gt_count, collect_residuals,
    )


def _fused_rollout_fwd(cfg, params, rotations, translations, style, deform,
                       actions, variations, gt_count, use_pallas):
    out, residuals = _dispatch_forward(
        cfg, params, rotations, translations, style, deform, actions,
        variations, gt_count, use_pallas, collect_residuals=True,
    )
    saved = (params, rotations, translations, style, deform, actions,
             variations, gt_count, residuals)
    return out, saved


def _fused_rollout_bwd(cfg, use_pallas, saved, cotangents):
    (params, rotations, translations, style, deform, actions, variations,
     gt_count, residuals) = saved
    if use_pallas:
        from playableenvironments_tpu.ops import fused_rollout_pallas

        grads = fused_rollout_pallas.backward(
            cfg, params, rotations, translations, style, deform, actions,
            variations, gt_count, residuals, cotangents,
        )
    else:
        grads = _backward_core(
            cfg, params, rotations, translations, style, deform, actions,
            variations, gt_count, residuals, cotangents,
        )
    g_params, g_rot, g_trans, g_style, g_deform, g_actions, g_variations = grads
    g_gt_count = np.zeros(jnp.shape(gt_count), jax.dtypes.float0)
    return (g_params, g_rot, g_trans, g_style, g_deform, g_actions,
            g_variations, g_gt_count)


fused_rollout.defvjp(_fused_rollout_fwd, _fused_rollout_bwd)
