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
    """Fused MLP evaluation over (N, 3) NORMALIZED positions (ray-major,
    N = rays * samples); the positional encoding happens inside the kernel.

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
