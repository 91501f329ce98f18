"""Pallas TPU kernels for the fused dynamics rollout (ops/fused_rollout).

One kernel for the whole T-step forward (optionally emitting residual
stacks) and one for the whole backward — each a single HLO op execution
instead of the ~50-ops-per-step chain, which is what phase-3 step time is
made of on an op-dispatch-bound TPU harness.

Everything (parameters ~1-4 MB, states, residuals) fits in VMEM at the
published sizes (bs<=64, features 256, T<=16). The math is delegated to the
shared 2D-value cores in fused_rollout (`_step_forward`, `_step_backward`),
so kernel and XLA reference paths cannot drift; parity tests drive both in
interpret mode (tests/test_fused_rollout.py).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from playableenvironments_tpu.ops import fused_rollout as fr


def _should_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _param_list(params: fr.PackedParams):
    layers = len(params.wx)
    arrays = []
    for l in range(layers):
        arrays.extend([params.wx[l], params.wh[l], params.bh[l],
                       params.h_init[l], params.c_init[l]])
    arrays.extend([params.wb, params.bb, params.whead, params.bhead])
    return arrays


def _params_from_refs(refs, layers: int) -> fr.PackedParams:
    vals = [r[...] for r in refs]
    wx, wh, bh, h_init, c_init = [], [], [], [], []
    for l in range(layers):
        wx.append(vals[5 * l + 0])
        wh.append(vals[5 * l + 1])
        bh.append(vals[5 * l + 2])
        h_init.append(vals[5 * l + 3])
        c_init.append(vals[5 * l + 4])
    wb, bb, whead, bhead = vals[5 * layers:]
    return fr.PackedParams(
        wx=tuple(wx), wh=tuple(wh), bh=tuple(bh),
        h_init=tuple(h_init), c_init=tuple(c_init),
        wb=wb, bb=bb, whead=whead, bhead=bhead,
    )


_RES_NAMES = ("cur_rot", "cur_trans", "cur_style", "cur_deform", "x0", "y", "head")


def _residual_shapes(batch, T, in0, features, style_dim, deform_dim, layers, dtype):
    shapes = {
        "cur_rot": (T - 1, batch, 3),
        "cur_trans": (T - 1, batch, 3),
        "cur_style": (T - 1, batch, style_dim),
        "cur_deform": (T - 1, batch, deform_dim),
        "x0": (T - 1, batch, in0),
        "y": (T - 1, batch, features),
        "head": (T - 1, batch, 6 + 3 + style_dim + deform_dim),
    }
    for l in range(layers):
        shapes[f"gates_{l}"] = (T - 1, batch, 4 * features)
        shapes[f"c_{l}"] = (T - 1, batch, features)
        shapes[f"h_{l}"] = (T - 1, batch, features)
    return {k: jax.ShapeDtypeStruct(v, dtype) for k, v in shapes.items()}


def _res_keys(layers):
    keys = list(_RES_NAMES)
    for l in range(layers):
        keys.extend([f"gates_{l}", f"c_{l}", f"h_{l}"])
    return keys


def forward(cfg: fr.RolloutConfig, params: fr.PackedParams, rotations,
            translations, style, deform, actions, variations, gt_count,
            collect_residuals: bool):
    """Single-kernel rollout forward. Returns (outputs tuple, residuals dict
    or None)."""
    batch, T = rotations.shape[0], rotations.shape[1]
    layers = len(params.wx)
    features = params.wb.shape[0]
    style_dim = style.shape[-1]
    deform_dim = deform.shape[-1]
    in0 = params.wx[0].shape[0]
    dtype = rotations.dtype

    out_shapes = [
        jax.ShapeDtypeStruct((batch, T, 3), dtype),
        jax.ShapeDtypeStruct((batch, T, 3), dtype),
        jax.ShapeDtypeStruct((batch, T, style_dim), dtype),
        jax.ShapeDtypeStruct((batch, T, deform_dim), dtype),
    ]
    res_shapes = {}
    if collect_residuals:
        res_shapes = _residual_shapes(
            batch, T, in0, features, style_dim, deform_dim, layers, dtype
        )
    res_keys = _res_keys(layers) if collect_residuals else []

    def kernel(gt_ref, *refs):
        param_refs = refs[:5 * layers + 4]
        rot_ref, trans_ref, style_ref, deform_ref, act_ref, var_ref = refs[
            5 * layers + 4:5 * layers + 10
        ]
        out_refs = refs[5 * layers + 10:5 * layers + 14]
        res_refs = dict(zip(res_keys, refs[5 * layers + 14:]))

        p = _params_from_refs(param_refs, layers)
        gt_count_val = gt_ref[0]

        cs = tuple(
            jnp.broadcast_to(p.c_init[l], (batch, features)) for l in range(layers)
        )
        hs = tuple(
            jnp.broadcast_to(p.h_init[l], (batch, features)) for l in range(layers)
        )
        state = (
            rot_ref[:, 0, :], trans_ref[:, 0, :],
            style_ref[:, 0, :], deform_ref[:, 0, :],
        )
        for k in range(4):
            out_refs[k][:, 0, :] = state[k]
        carry = (cs, hs)
        for t in range(T - 1):
            use_gt = (t < gt_count_val).astype(dtype)
            gt_state = (
                rot_ref[:, t, :], trans_ref[:, t, :],
                style_ref[:, t, :], deform_ref[:, t, :],
            )
            current = tuple(
                use_gt * gt + (1.0 - use_gt) * prev
                for gt, prev in zip(gt_state, state)
            )
            carry, state, step_res = fr._step_forward(
                cfg, p, carry, current, act_ref[:, t, :], var_ref[:, t, :]
            )
            for k in range(4):
                out_refs[k][:, t + 1, :] = state[k]
            if collect_residuals:
                x0, gates_all, new_cs, new_hs, y, head = step_res
                res_refs["cur_rot"][t] = current[0]
                res_refs["cur_trans"][t] = current[1]
                res_refs["cur_style"][t] = current[2]
                res_refs["cur_deform"][t] = current[3]
                res_refs["x0"][t] = x0
                res_refs["y"][t] = y
                res_refs["head"][t] = head
                for l in range(layers):
                    res_refs[f"gates_{l}"][t] = gates_all[l]
                    res_refs[f"c_{l}"][t] = new_cs[l]
                    res_refs[f"h_{l}"][t] = new_hs[l]

    gt_arr = jnp.asarray(gt_count, jnp.int32).reshape(1)
    inputs = (
        [gt_arr] + _param_list(params)
        + [rotations, translations, style, deform, actions, variations]
    )
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + [
        pl.BlockSpec(memory_space=pltpu.VMEM) for _ in inputs[1:]
    ]
    out_shape = out_shapes + [res_shapes[k] for k in res_keys]
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in out_shape
        ),
        interpret=_should_interpret(),
    )(*inputs)
    rec = tuple(outs[:4])
    residuals = dict(zip(res_keys, outs[4:])) if collect_residuals else None
    return rec, residuals


def backward(cfg: fr.RolloutConfig, params: fr.PackedParams, rotations,
             translations, style, deform, actions, variations, gt_count,
             residuals: Dict, cotangents):
    """Single-kernel rollout backward; mirrors fused_rollout._backward_core."""
    batch, T = rotations.shape[0], rotations.shape[1]
    layers = len(params.wx)
    features = params.wb.shape[0]
    style_dim = style.shape[-1]
    deform_dim = deform.shape[-1]
    actions_dim = actions.shape[-1]
    variations_dim = variations.shape[-1]
    dtype = rotations.dtype
    res_keys = _res_keys(layers)

    # Output order: param grads (same layout as _param_list), then GT-input
    # grads, then action/variation grads.
    param_arrays = _param_list(params)
    out_shape = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in param_arrays]
    out_shape += [
        jax.ShapeDtypeStruct((batch, T, 3), dtype),
        jax.ShapeDtypeStruct((batch, T, 3), dtype),
        jax.ShapeDtypeStruct((batch, T, style_dim), dtype),
        jax.ShapeDtypeStruct((batch, T, deform_dim), dtype),
        jax.ShapeDtypeStruct((batch, T - 1, actions_dim), dtype),
        jax.ShapeDtypeStruct((batch, T - 1, variations_dim), dtype),
    ]

    def kernel(gt_ref, *refs):
        param_refs = refs[:5 * layers + 4]
        res_refs = dict(
            zip(res_keys, refs[5 * layers + 4:5 * layers + 4 + len(res_keys)])
        )
        cot_refs = refs[
            5 * layers + 4 + len(res_keys):5 * layers + 8 + len(res_keys)
        ]
        out_refs = refs[5 * layers + 8 + len(res_keys):]
        g_param_refs = out_refs[:5 * layers + 4]
        (g_rot_ref, g_trans_ref, g_style_ref, g_deform_ref,
         g_act_ref, g_var_ref) = out_refs[5 * layers + 4:]

        p = _params_from_refs(param_refs, layers)
        gt_count_val = gt_ref[0]

        # Param grads accumulate by read-modify-write on the OUTPUT refs:
        # value accumulators would keep ~4 MB live across the whole unrolled
        # loop and blow the 16 MB scoped-VMEM stack limit.
        for ref in g_param_refs:
            ref[...] = jnp.zeros(ref.shape, ref.dtype)
        d_cs = [jnp.zeros((batch, features), dtype) for _ in range(layers)]
        d_hs = [jnp.zeros((batch, features), dtype) for _ in range(layers)]
        d_state = (
            jnp.zeros((batch, 3), dtype), jnp.zeros((batch, 3), dtype),
            jnp.zeros((batch, style_dim), dtype),
            jnp.zeros((batch, deform_dim), dtype),
        )

        for t in range(T - 2, -1, -1):
            step_res = {
                name: res_refs[name][t]
                for name in ("cur_rot", "cur_trans", "x0", "y", "head")
            }
            for l in range(layers):
                step_res[f"gates_{l}"] = res_refs[f"gates_{l}"][t]
                step_res[f"c_{l}"] = res_refs[f"c_{l}"][t]
                step_res[f"h_{l}"] = res_refs[f"h_{l}"][t]
                if t == 0:
                    step_res[f"c_prev_{l}"] = jnp.broadcast_to(
                        p.c_init[l], (batch, features)
                    )
                    step_res[f"h_prev_{l}"] = jnp.broadcast_to(
                        p.h_init[l], (batch, features)
                    )
                else:
                    step_res[f"c_prev_{l}"] = res_refs[f"c_{l}"][t - 1]
                    step_res[f"h_prev_{l}"] = res_refs[f"h_{l}"][t - 1]

            d_in = tuple(
                d_state[k] + cot_refs[k][:, t + 1, :] for k in range(4)
            )
            increments, d_cs, d_hs, d_cur, d_act_var = fr._step_backward(
                cfg, p, step_res, d_in, d_cs, d_hs
            )
            inc_list = _param_list(increments)
            for ref, inc in zip(g_param_refs, inc_list):
                ref[...] = ref[...] + inc
            g_act_ref[:, t, :] = d_act_var[:, :actions_dim]
            g_var_ref[:, t, :] = d_act_var[:, actions_dim:]

            use_gt = (t < gt_count_val).astype(dtype)
            if t == 0:
                g_rot_ref[:, 0, :] = d_cur[0] + cot_refs[0][:, 0, :]
                g_trans_ref[:, 0, :] = d_cur[1] + cot_refs[1][:, 0, :]
                g_style_ref[:, 0, :] = d_cur[2] + cot_refs[2][:, 0, :]
                g_deform_ref[:, 0, :] = d_cur[3] + cot_refs[3][:, 0, :]
            else:
                g_rot_ref[:, t, :] = use_gt * d_cur[0]
                g_trans_ref[:, t, :] = use_gt * d_cur[1]
                g_style_ref[:, t, :] = use_gt * d_cur[2]
                g_deform_ref[:, t, :] = use_gt * d_cur[3]
                not_gt = 1.0 - use_gt
                d_state = tuple(not_gt * d for d in d_cur)

        # Index T-1 is never a pick input: zero grads there.
        g_rot_ref[:, T - 1, :] = jnp.zeros((batch, 3), dtype)
        g_trans_ref[:, T - 1, :] = jnp.zeros((batch, 3), dtype)
        g_style_ref[:, T - 1, :] = jnp.zeros((batch, style_dim), dtype)
        g_deform_ref[:, T - 1, :] = jnp.zeros((batch, deform_dim), dtype)

        # Initial-carry gradients land in the h_init/c_init slots.
        for l in range(layers):
            ref_h = g_param_refs[5 * l + 3]
            ref_h[...] = ref_h[...] + jnp.sum(d_hs[l], axis=0, keepdims=True)
            ref_c = g_param_refs[5 * l + 4]
            ref_c[...] = ref_c[...] + jnp.sum(d_cs[l], axis=0, keepdims=True)

    gt_arr = jnp.asarray(gt_count, jnp.int32).reshape(1)
    inputs = (
        [gt_arr] + _param_list(params)
        + [residuals[k] for k in res_keys]
        + list(cotangents)
    )
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + [
        pl.BlockSpec(memory_space=pltpu.VMEM) for _ in inputs[1:]
    ]
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in out_shape
        ),
        interpret=_should_interpret(),
    )(*inputs)

    g_param_arrays = outs[:5 * layers + 4]
    wx, wh, bh, h_init, c_init = [], [], [], [], []
    for l in range(layers):
        wx.append(g_param_arrays[5 * l + 0])
        wh.append(g_param_arrays[5 * l + 1])
        bh.append(g_param_arrays[5 * l + 2])
        h_init.append(g_param_arrays[5 * l + 3])
        c_init.append(g_param_arrays[5 * l + 4])
    wb, bb, whead, bhead = g_param_arrays[5 * layers:]
    g_params = fr.PackedParams(
        wx=tuple(wx), wh=tuple(wh), bh=tuple(bh),
        h_init=tuple(h_init), c_init=tuple(c_init),
        wb=wb, bb=bb, whead=whead, bhead=bhead,
    )
    (g_rot, g_trans, g_style, g_deform, g_actions, g_variations) = outs[
        5 * layers + 4:
    ]
    return (g_params, g_rot, g_trans, g_style, g_deform, g_actions,
            g_variations)
