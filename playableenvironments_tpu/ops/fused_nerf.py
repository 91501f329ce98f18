"""Fused Pallas TPU kernel for the AdaIN NeRF MLP evaluation.

The hot op of the whole framework: positional encoding -> 8x256 backbone with
mid skip -> alpha head + AdaIN-modulated feature head, evaluated over
rays x samples points (SURVEY.md §3.1 hot loops). This kernel fuses the
entire per-point pipeline into one pass: weights live in VMEM for the whole
grid, activations never touch HBM, matmuls run in bf16 on the MXU with f32
accumulation.

Scope: the inference/render path (play loop, dataset creators, benchmarks).
Eval-mode AdaIN batch-norm running statistics are folded into the per-ray
modulation (fold_adain_stats), so the kernel sees a plain scale/bias. The
training path keeps the XLA composite (masked batch statistics need
cross-block reductions).

A pure-XLA reference implementation (`reference_adain_nerf`) defines the
semantics; the kernel is tested against it and against the flax module.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from playableenvironments_tpu.config import NerfMLPConfig


def fold_adain_stats(
    adain_params: Dict, batch_stats: Dict, style: jnp.ndarray, eps: float = 1e-5
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold eval-mode BN running stats into the AdaIN affine.

    AdaIN(x) = ((x - mean) * rsqrt(var + eps)) * scale(style) + bias(style)
             = x * scale' + bias'  with
      scale' = scale * rsqrt(var + eps),
      bias'  = bias - mean * scale'.

    :param adain_params: {"affine": {"kernel", "bias"}} of AffineTransformAdaIn.
    :param batch_stats: {"norm": {"mean", "var"}}.
    :param style: (..., style_features).
    :return: ((..., features) scale', (..., features) bias').
    """
    encoded = style @ adain_params["affine"]["kernel"] + adain_params["affine"]["bias"]
    scale, bias = jnp.split(encoded, 2, axis=-1)
    rs = jax.lax.rsqrt(batch_stats["norm"]["var"] + eps)
    scale_eff = scale * rs
    bias_eff = bias - batch_stats["norm"]["mean"] * scale_eff
    return scale_eff, bias_eff


def _positional_encoding(x: jnp.ndarray, octaves: int, append_original: bool):
    freqs = 2.0 ** jnp.arange(octaves, dtype=x.dtype)
    scaled = x[..., None, :] * freqs[:, None]
    enc = jnp.stack([jnp.sin(scaled), jnp.cos(scaled)], axis=-2)
    enc = enc.reshape(x.shape[:-1] + (2 * octaves * x.shape[-1],))
    if append_original:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


def pack_nerf_params(cfg: NerfMLPConfig, nerf_params: Dict) -> Dict[str, jnp.ndarray]:
    """Flatten the flax AdaInNerfMLP param tree into the kernel's weight dict."""
    packed = {}
    for i in range(cfg.backbone_layers_count):
        packed[f"w{i}"] = nerf_params[f"backbone_{i}"]["kernel"]
        packed[f"b{i}"] = nerf_params[f"backbone_{i}"]["bias"]
    packed["w_alpha"] = nerf_params["alpha_head"]["kernel"]
    packed["b_alpha"] = nerf_params["alpha_head"]["bias"]
    packed["w_f0"] = nerf_params["feat_0"]["kernel"]
    packed["w_f1"] = nerf_params["feat_1"]["kernel"]
    packed["w_out"] = nerf_params["feat_out"]["kernel"]
    packed["b_out"] = nerf_params["feat_out"]["bias"]
    return packed


def reference_adain_nerf(
    cfg: NerfMLPConfig,
    packed: Dict[str, jnp.ndarray],
    encoded: jnp.ndarray,
    scale0: jnp.ndarray,
    bias0: jnp.ndarray,
    scale1: jnp.ndarray,
    bias1: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pure-XLA semantics of the fused kernel (already PE-encoded inputs).

    :param encoded: (N, pe_size) positional encodings.
    :param scale0/bias0: (N, W) folded AdaIN modulation for the first head layer.
    :param scale1/bias1: (N, W//2) for the second.
    :return: ((N, output_features) features, (N,) raw alpha).
    """
    h = encoded
    for i in range(cfg.backbone_layers_count):
        if i == cfg.skip_layer_idx:
            h = jnp.concatenate([h, encoded], axis=-1)
        h = jax.nn.relu(h @ packed[f"w{i}"] + packed[f"b{i}"])
    alpha = (h @ packed["w_alpha"] + packed["b_alpha"])[..., 0]
    f = (h @ packed["w_f0"]) * scale0 + bias0
    f = jax.nn.relu(f)
    f = (f @ packed["w_f1"]) * scale1 + bias1
    f = jax.nn.relu(f)
    features = f @ packed["w_out"] + packed["b_out"]
    return features, alpha


def _fused_kernel(
    cfg: NerfMLPConfig,
    samples_per_ray: int,
    encoded_ref,
    scale0_ref,
    bias0_ref,
    scale1_ref,
    bias1_ref,
    *weight_and_out_refs,
):
    """One block of points through the full MLP. Weights arrive as trailing
    refs (whole bf16 arrays resident in VMEM); the last two refs are outputs.

    The encoding arrives pre-computed in bf16 (the PE is a cheap fused XLA
    producer; computing it in-kernel on (block, 3) slivers wastes the VPU's
    128 lanes). Modulation refs are PER RAY (one row per ray of the block),
    broadcast over the samples axis inside VMEM — per-point modulation in HBM
    costs ~6 KB/point otherwise."""
    n_weights = 2 * cfg.backbone_layers_count + 6
    weight_refs = weight_and_out_refs[:n_weights]
    features_out_ref, alpha_out_ref = weight_and_out_refs[n_weights:]

    widx = 0

    def next_w():
        nonlocal widx
        ref = weight_refs[widx]
        widx += 1
        return ref

    def per_point(mod):
        # (rays_block, W) -> (rays_block * samples, W), each ray's row
        # repeated consecutively (explicit broadcast+reshape: jnp.repeat /
        # pltpu.repeat tile semantics differ across lowerings).
        r, w = mod.shape
        return jnp.broadcast_to(mod[:, None, :], (r, samples_per_ray, w)).reshape(
            r * samples_per_ray, w
        )

    scale0 = per_point(scale0_ref[:])
    bias0 = per_point(bias0_ref[:])
    scale1 = per_point(scale1_ref[:])
    bias1 = per_point(bias1_ref[:])

    encoded = encoded_ref[:]
    h = encoded
    for i in range(cfg.backbone_layers_count):
        w = next_w()[:]
        b = next_w()[:]
        if i == cfg.skip_layer_idx:
            h = jnp.concatenate([h, encoded], axis=-1)
        h = jnp.dot(
            h.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
        )
        h = jnp.maximum(h + b, 0.0)

    w_alpha = next_w()[:]
    b_alpha = next_w()[:]
    alpha = (
        jnp.dot(h.astype(jnp.bfloat16), w_alpha, preferred_element_type=jnp.float32)
        + b_alpha
    )
    alpha_out_ref[:] = alpha

    w_f0 = next_w()[:]
    f = jnp.dot(h.astype(jnp.bfloat16), w_f0, preferred_element_type=jnp.float32)
    f = jnp.maximum(f * scale0 + bias0, 0.0)
    w_f1 = next_w()[:]
    f = jnp.dot(f.astype(jnp.bfloat16), w_f1, preferred_element_type=jnp.float32)
    f = jnp.maximum(f * scale1 + bias1, 0.0)
    w_out = next_w()[:]
    b_out = next_w()[:]
    features_out_ref[:] = (
        jnp.dot(f.astype(jnp.bfloat16), w_out, preferred_element_type=jnp.float32)
        + b_out
    )


def fused_adain_nerf(
    cfg: NerfMLPConfig,
    packed: Dict[str, jnp.ndarray],
    encoded: jnp.ndarray,
    scale0: jnp.ndarray,
    bias0: jnp.ndarray,
    scale1: jnp.ndarray,
    bias1: jnp.ndarray,
    samples_per_ray: int = 1,
    block_points: int = 1024,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused MLP evaluation over pre-encoded points (ray-major,
    N = rays * samples; the positional encoding is a cheap fused XLA
    producer outside — see _fused_kernel's docstring for why).

    Modulation arrays are PER RAY ((N / samples_per_ray, W)); the kernel
    broadcasts them over the samples axis in VMEM. Rays are padded to a
    multiple of the block's ray count; every weight array is resident in VMEM
    across the whole grid (published scale: ~2.3 MB << 16 MB VMEM).

    :return: ((N, output_features) features, (N,) raw alpha).
    """
    encoded = encoded.astype(jnp.bfloat16)
    packed = {
        k: (v.astype(jnp.bfloat16) if k.startswith("w") else v)
        for k, v in packed.items()
    }
    n = encoded.shape[0]
    if n % samples_per_ray:
        raise ValueError(f"point count {n} not divisible by samples {samples_per_ray}")
    rays = n // samples_per_ray
    block_rays = max(block_points // samples_per_ray, 1)
    block_points = block_rays * samples_per_ray
    padded_rays = ((rays + block_rays - 1) // block_rays) * block_rays
    if padded_rays != rays:
        pad_r = padded_rays - rays
        encoded = jnp.pad(encoded, ((0, pad_r * samples_per_ray), (0, 0)))
        scale0 = jnp.pad(scale0, ((0, pad_r), (0, 0)))
        bias0 = jnp.pad(bias0, ((0, pad_r), (0, 0)))
        scale1 = jnp.pad(scale1, ((0, pad_r), (0, 0)))
        bias1 = jnp.pad(bias1, ((0, pad_r), (0, 0)))
    padded = padded_rays * samples_per_ray

    grid = (padded // block_points,)

    def point_spec(features):
        return pl.BlockSpec(
            (block_points, features), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    def ray_spec(features):
        return pl.BlockSpec(
            (block_rays, features), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    def weight_spec(shape):
        # Whole array, same block for every program.
        return pl.BlockSpec(
            shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
        )

    weight_order = []
    for i in range(cfg.backbone_layers_count):
        weight_order += [packed[f"w{i}"], packed[f"b{i}"]]
    weight_order += [
        packed["w_alpha"], packed["b_alpha"], packed["w_f0"], packed["w_f1"],
        packed["w_out"], packed["b_out"],
    ]

    in_specs = [
        point_spec(encoded.shape[1]),
        ray_spec(scale0.shape[1]),
        ray_spec(bias0.shape[1]),
        ray_spec(scale1.shape[1]),
        ray_spec(bias1.shape[1]),
    ] + [weight_spec(w.shape) for w in weight_order]

    out_features = packed["w_out"].shape[1]
    features, alpha = pl.pallas_call(
        functools.partial(_fused_kernel, cfg, samples_per_ray),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            point_spec(out_features),
            point_spec(1),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((padded, out_features), jnp.float32),
            jax.ShapeDtypeStruct((padded, 1), jnp.float32),
        ),
        interpret=interpret,
    )(encoded, scale0, bias0, scale1, bias1, *weight_order)

    return features[:n], alpha[:n, 0]


def fused_object_field_eval(
    cfg: NerfMLPConfig,
    bounding_box,
    nerf_params: Dict,
    nerf_batch_stats: Dict,
    positions: jnp.ndarray,
    style: jnp.ndarray,
    empty_space_alpha: float,
    block_points: int = 1024,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """End-to-end eval-mode object field evaluation through the fused kernel:
    bbox mask + normalization + PE on the host graph (cheap, fused by XLA),
    the MLP in Pallas, empty-space masking after.

    Matches AdaInNerfMLP + ObjectRadianceField masking semantics in eval mode
    (use_running_average=True) for zero-bender objects.

    :param positions: (..., 3) object-frame points.
    :param style: (..., style_features) broadcastable per-point style.
    :return: ((..., output_features) features, (...) raw alphas).
    """
    from playableenvironments_tpu.core.bbox import aabb_contains, aabb_size

    box = jnp.asarray(bounding_box, positions.dtype)
    mask = aabb_contains(box, positions)

    batch_shape = positions.shape[:-1]  # (..., rays, samples)
    samples_per_ray = positions.shape[-2]
    ray_shape = batch_shape[:-1]
    flat_positions = positions.reshape(-1, 3)
    # Modulation is per RAY (the style must be constant along a ray);
    # keeping it at ray rank saves ~samples x (6 KB/point) of kernel input
    # bandwidth.
    style_rays = jnp.broadcast_to(style[..., 0, :], ray_shape + style.shape[-1:])
    flat_style = style_rays.reshape(-1, style.shape[-1])

    pe_cfg = cfg.position_encoder
    encoded = _positional_encoding(
        flat_positions / aabb_size(box), pe_cfg.octaves, pe_cfg.append_original
    )

    scale0, bias0 = fold_adain_stats(
        nerf_params["adain_0"], nerf_batch_stats["adain_0"], flat_style
    )
    scale1, bias1 = fold_adain_stats(
        nerf_params["adain_1"], nerf_batch_stats["adain_1"], flat_style
    )

    packed = pack_nerf_params(cfg, nerf_params)
    features, alpha = fused_adain_nerf(
        cfg, packed, encoded, scale0, bias0, scale1, bias1,
        samples_per_ray=samples_per_ray,
        block_points=block_points, interpret=interpret,
    )
    features = features.reshape(batch_shape + (features.shape[-1],))
    alpha = alpha.reshape(batch_shape)

    features = jnp.where(mask[..., None], features, 0.0)
    alpha = jnp.where(mask, alpha, empty_space_alpha)
    return features, alpha


# ---------------------------------------------------------------------------
# Trainable fused backbone (custom VJP)
# ---------------------------------------------------------------------------
#
# The TRAINING path's cost is dominated by the 8x256 backbone matmul chain:
# as separate XLA ops every layer round-trips its (points, 256) activations
# through HBM (~2x the MXU time at the published scale). This kernel runs the
# whole chain in VMEM, and its backward kernel rematerializes activations
# blockwise and accumulates weight gradients across the (sequential) TPU grid
# into shared output blocks. AdaIN heads stay in XLA: their train-mode batch
# statistics need cross-block reductions.


def _backbone_sizes(cfg: NerfMLPConfig, encoded_size: int):
    widths_in = []
    for i in range(cfg.backbone_layers_count):
        if i == 0:
            w_in = encoded_size
        else:
            w_in = cfg.layers_width
        if i == cfg.skip_layer_idx and i != 0:
            w_in += encoded_size
        widths_in.append(w_in)
    return widths_in


def _fwd_backbone_kernel(cfg, encoded_ref, *refs):
    layers = cfg.backbone_layers_count
    mm = jnp.dtype(cfg.compute_dtype)
    weight_refs = refs[: 2 * layers + 2]
    h_out_ref, alpha_out_ref = refs[2 * layers + 2 :]

    encoded = encoded_ref[:]
    h = encoded
    for i in range(layers):
        w = weight_refs[2 * i][:]
        b = weight_refs[2 * i + 1][:]
        if i == cfg.skip_layer_idx and i != 0:
            h = jnp.concatenate([h, encoded], axis=-1)
        h = jnp.dot(
            h.astype(mm), w.astype(mm), preferred_element_type=jnp.float32
        )
        h = jnp.maximum(h + b, 0.0)
    w_alpha = weight_refs[2 * layers][:]
    b_alpha = weight_refs[2 * layers + 1][:]
    alpha = (
        jnp.dot(
            h.astype(mm), w_alpha.astype(mm), preferred_element_type=jnp.float32
        )
        + b_alpha
    )
    h_out_ref[:] = h
    alpha_out_ref[:] = alpha


def _bwd_backbone_kernel(cfg, encoded_ref, g_h_ref, g_alpha_ref, *refs):
    layers = cfg.backbone_layers_count
    weight_refs = refs[: 2 * layers + 2]
    out_refs = refs[2 * layers + 2 :]
    d_encoded_ref = out_refs[0]
    dw_refs = out_refs[1:]

    # Zero the shared weight-gradient accumulators on the first block.
    @pl.when(pl.program_id(0) == 0)
    def _():
        for ref in dw_refs:
            ref[:] = jnp.zeros_like(ref)

    encoded = encoded_ref[:]

    mm = jnp.dtype(cfg.compute_dtype)

    def bf(x):
        return x.astype(mm)

    # Rematerialize forward activations (post-relu).
    acts = []
    h = encoded
    for i in range(layers):
        w = weight_refs[2 * i][:]
        b = weight_refs[2 * i + 1][:]
        if i == cfg.skip_layer_idx and i != 0:
            h = jnp.concatenate([h, encoded], axis=-1)
        h = jnp.dot(bf(h), bf(w), preferred_element_type=jnp.float32)
        h = jnp.maximum(h + b, 0.0)
        acts.append(h)

    g_alpha = g_alpha_ref[:]
    w_alpha = weight_refs[2 * layers][:]
    # Alpha head grads (input = final activation).
    dw_refs[2 * layers][:] += jnp.dot(
        bf(acts[-1].T), bf(g_alpha), preferred_element_type=jnp.float32
    )
    dw_refs[2 * layers + 1][:] += jnp.sum(g_alpha, axis=0, keepdims=True)

    g = g_h_ref[:] + jnp.dot(
        bf(g_alpha), bf(w_alpha.T), preferred_element_type=jnp.float32
    )
    d_encoded = jnp.zeros_like(encoded)
    for i in range(layers - 1, -1, -1):
        g = g * (acts[i] > 0.0)
        if i == 0:
            layer_in = encoded
        elif i == cfg.skip_layer_idx:
            layer_in = jnp.concatenate([acts[i - 1], encoded], axis=-1)
        else:
            layer_in = acts[i - 1]
        dw_refs[2 * i][:] += jnp.dot(
            bf(layer_in.T), bf(g), preferred_element_type=jnp.float32
        )
        dw_refs[2 * i + 1][:] += jnp.sum(g, axis=0, keepdims=True)
        w = weight_refs[2 * i][:]
        g_in = jnp.dot(bf(g), bf(w.T), preferred_element_type=jnp.float32)
        if i == 0:
            d_encoded = d_encoded + g_in
        elif i == cfg.skip_layer_idx:
            width = acts[i - 1].shape[-1]
            d_encoded = d_encoded + g_in[:, width:]
            g = g_in[:, :width]
        else:
            g = g_in
    d_encoded_ref[:] = d_encoded


def _weight_list(cfg: NerfMLPConfig, packed: Dict[str, jnp.ndarray]):
    order = []
    for i in range(cfg.backbone_layers_count):
        order += [packed[f"w{i}"], packed[f"b{i}"].reshape(1, -1)]
    order += [packed["w_alpha"], packed["b_alpha"].reshape(1, -1)]
    return order


def _pad_points(x, block):
    n = x.shape[0]
    padded = ((n + block - 1) // block) * block
    if padded != n:
        x = jnp.pad(x, ((0, padded - n), (0, 0)))
    return x, n, padded


def _run_fwd_backbone(cfg, packed, encoded, block_points, interpret):
    weights = _weight_list(cfg, packed)
    encoded_p, n, padded = _pad_points(encoded, block_points)
    grid = (padded // block_points,)

    def block_spec(feat):
        return pl.BlockSpec(
            (block_points, feat), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    def whole(shape):
        return pl.BlockSpec(
            shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
        )

    h, alpha = pl.pallas_call(
        functools.partial(_fwd_backbone_kernel, cfg),
        grid=grid,
        in_specs=[block_spec(encoded.shape[1])] + [whole(w.shape) for w in weights],
        out_specs=(block_spec(cfg.layers_width), block_spec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((padded, cfg.layers_width), jnp.float32),
            jax.ShapeDtypeStruct((padded, 1), jnp.float32),
        ),
        interpret=interpret,
    )(encoded_p, *weights)
    return h[:n], alpha[:n, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 3, 4))
def fused_backbone(
    cfg: NerfMLPConfig,
    packed: Dict[str, jnp.ndarray],
    encoded: jnp.ndarray,
    block_points: int = 512,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused backbone + alpha head over already-PE-encoded points.

    Differentiable wrt `packed` ({w0..wL-1, b0..bL-1, w_alpha, b_alpha}) and
    `encoded` ((N, E) float32). Matmuls run in bf16 with f32 accumulation in
    both directions; the backward kernel rematerializes activations per block
    and accumulates weight gradients across the sequential TPU grid.

    :return: ((N, layers_width) final activation, (N,) raw alpha).
    """
    return _run_fwd_backbone(cfg, packed, encoded, block_points, interpret)


def _fused_backbone_fwd(cfg, packed, encoded, block_points, interpret):
    out = _run_fwd_backbone(cfg, packed, encoded, block_points, interpret)
    return out, (packed, encoded)


def _fused_backbone_bwd(cfg, block_points, interpret, residuals, grads):
    packed, encoded = residuals
    g_h, g_alpha = grads
    weights = _weight_list(cfg, packed)
    encoded_p, n, padded = _pad_points(encoded, block_points)
    g_h_p, _, _ = _pad_points(g_h, block_points)
    g_alpha_p, _, _ = _pad_points(g_alpha[:, None], block_points)
    grid = (padded // block_points,)

    def block_spec(feat):
        return pl.BlockSpec(
            (block_points, feat), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    def whole(shape):
        return pl.BlockSpec(
            shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
        )

    out_shapes = [jax.ShapeDtypeStruct((padded, encoded.shape[1]), jnp.float32)]
    out_specs = [block_spec(encoded.shape[1])]
    for w in weights:
        out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        out_specs.append(whole(w.shape))

    outs = pl.pallas_call(
        functools.partial(_bwd_backbone_kernel, cfg),
        grid=grid,
        in_specs=[
            block_spec(encoded.shape[1]),
            block_spec(cfg.layers_width),
            block_spec(1),
        ]
        + [whole(w.shape) for w in weights],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(encoded_p, g_h_p, g_alpha_p, *weights)

    d_encoded = outs[0][:n]
    dw = outs[1:]
    layers = cfg.backbone_layers_count
    d_packed = {}
    for i in range(layers):
        d_packed[f"w{i}"] = dw[2 * i]
        d_packed[f"b{i}"] = dw[2 * i + 1].reshape(-1)
    d_packed["w_alpha"] = dw[2 * layers]
    d_packed["b_alpha"] = dw[2 * layers + 1].reshape(-1)
    return d_packed, d_encoded


fused_backbone.defvjp(_fused_backbone_fwd, _fused_backbone_bwd)
