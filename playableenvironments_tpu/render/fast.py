"""Fast inference render path: the SceneComposer pipeline as pure functions
with the fused Pallas NeRF kernel on the hot op.

Used by the benchmark, the play loop, and dataset creators (eval mode only:
no perturbation, BN running statistics folded into the modulation). Semantics
match SceneComposer.apply(..., perturb=False, use_running_average=True) for
scenes of AdaIN-NeRF objects; a parity test pins this. Deformable objects run
their (small) ray-bender MLP in XLA ahead of the fused NeRF evaluation.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from playableenvironments_tpu.config import ObjectIds, SceneConfig
from playableenvironments_tpu.core import bbox as bbox_lib
from playableenvironments_tpu.core import compositing, rays as rays_lib
from playableenvironments_tpu.core.transforms3d import (
    euler_translation_to_matrix,
    invert_rigid,
)
from playableenvironments_tpu.models.encoding import annealing_weights
from playableenvironments_tpu.ops import fused_nerf
from playableenvironments_tpu.render import sampling


def _bender_displacements(cfg, bender_params, positions, deformation, step):
    """Pure-XLA PositionalRayBender forward (eval; clamped into the bbox).
    Matches models.nerf.PositionalRayBender."""
    box = jnp.asarray(cfg.bounding_box, positions.dtype)
    size = box[:, 1] - box[:, 0]
    pe_cfg = cfg.bender.position_encoder
    weights = (
        annealing_weights(pe_cfg.octaves, step, pe_cfg.num_steps)
        if pe_cfg.num_steps
        else None
    )
    x = positions / size
    freqs = 2.0 ** jnp.arange(pe_cfg.octaves, dtype=x.dtype)
    scaled = x[..., None, :] * freqs[:, None]
    enc = jnp.stack([jnp.sin(scaled), jnp.cos(scaled)], axis=-2)
    if weights is not None:
        enc = enc * weights[:, None, None]
    enc = enc.reshape(x.shape[:-1] + (2 * pe_cfg.octaves * 3,))
    if pe_cfg.append_original:
        enc = jnp.concatenate([x, enc], axis=-1)

    deformation = jnp.broadcast_to(
        deformation, positions.shape[:-1] + deformation.shape[-1:]
    )
    inputs = jnp.concatenate([enc, deformation], axis=-1)
    h = inputs
    for i in range(cfg.bender.layers_count):
        if i == cfg.bender.skip_layer_idx:
            h = jnp.concatenate([h, inputs], axis=-1)
        layer = bender_params[f"backbone_{i}"]
        h = jax.nn.relu(h @ layer["kernel"] + layer["bias"])
    displacements = (h @ bender_params["output_head"]["kernel"]) * size
    min_disp = box[:, 0] - positions
    max_disp = box[:, 1] - positions
    return jnp.clip(displacements, min_disp, max_disp)


def _compact_eval(
    cfg,
    field_params,
    field_stats,
    positions: jnp.ndarray,
    hit: jnp.ndarray,
    obj_style: jnp.ndarray,
    obj_deformation: jnp.ndarray,
    step,
    block_points: int,
    interpret: bool,
):
    """Evaluate the object field on a STATIC-size compacted ray subset.

    Most rays miss a small object's AABB entirely (players intersect <1% of
    frame rays) yet dense masked evaluation pays the full MLP for them. This
    gathers rays with `hit` (argsort puts hits first — static shapes, no
    boolean indexing), runs the bender + fused NeRF on `budget` rays only,
    and scatters results back; non-evaluated rays get empty_space_alpha.
    The TPU-native equivalent of the reference's boolean bbox filtering
    (ray_bending_style_nerf_model.py:180-198) at a fixed compute budget.

    :param positions: (..., rays, S, 3) object-frame sample positions.
    :param hit: (..., rays) bool, ray intersects the AABB.
    :return: ((..., rays, S, F) features, (..., rays, S) raw alphas).
    """
    box = jnp.asarray(cfg.bounding_box, positions.dtype)
    lead = positions.shape[:-3]
    rays = positions.shape[-3]
    samples = positions.shape[-2]
    budget = max(int(rays * cfg.ray_compaction), 1)

    flat_positions = positions.reshape((-1, rays, samples, 3))
    flat_hit = hit.reshape((-1, rays))
    l = flat_positions.shape[0]

    # Hits first (stable argsort of the miss flag), truncate to the budget.
    order = jnp.argsort(~flat_hit, axis=-1)[:, :budget]  # (L, budget)
    batch_idx = jnp.arange(l)[:, None]
    sel_positions = flat_positions[batch_idx, order]  # (L, budget, S, 3)

    style_b = jnp.broadcast_to(
        obj_style.reshape((-1, obj_style.shape[-1]))[:, None],
        (l, budget, obj_style.shape[-1]),
    )

    if cfg.bender.kind == "positional":
        deformation_b = jnp.broadcast_to(
            obj_deformation.reshape((-1, obj_deformation.shape[-1]))[
                :, None, None
            ],
            (l, budget, 1, obj_deformation.shape[-1]),
        )
        displacements = _bender_displacements(
            cfg, field_params["ray_bender"], sel_positions, deformation_b, step
        )
        mask = bbox_lib.aabb_contains(box, sel_positions)
        eval_positions = sel_positions + jnp.where(
            mask[..., None], displacements, 0.0
        )
        sel_disp = displacements
    else:
        eval_positions = sel_positions
        sel_disp = jnp.zeros_like(sel_positions)

    feats, alpha = fused_nerf.fused_object_field_eval(
        cfg.nerf,
        cfg.bounding_box,
        field_params["nerf"],
        field_stats["nerf"],
        eval_positions,
        style_b[..., None, :],
        cfg.empty_space_alpha,
        block_points=block_points,
        interpret=interpret,
    )
    mask = bbox_lib.aabb_contains(box, sel_positions)
    feats = jnp.where(mask[..., None], feats, 0.0)
    alpha = jnp.where(mask, alpha, cfg.empty_space_alpha)

    # Scatter back to the full ray set.
    full_feats = jnp.zeros(
        (l, rays, samples, feats.shape[-1]), feats.dtype
    ).at[batch_idx, order].set(feats)
    full_alpha = jnp.full(
        (l, rays, samples), cfg.empty_space_alpha, alpha.dtype
    ).at[batch_idx, order].set(alpha)
    full_disp = jnp.zeros((l, rays, samples, 3), positions.dtype).at[
        batch_idx, order
    ].set(sel_disp)
    return (
        full_feats.reshape(lead + (rays, samples, feats.shape[-1])),
        full_alpha.reshape(lead + (rays, samples)),
        full_disp.reshape(lead + (rays, samples, 3)),
    )


def render_rays_fast(
    scene: SceneConfig,
    variables: Dict,
    ray_origins: jnp.ndarray,
    ray_directions: jnp.ndarray,
    focal_normals: jnp.ndarray,
    w2o_matrices: jnp.ndarray,
    style: jnp.ndarray,
    deformation: jnp.ndarray,
    object_in_scene: jnp.ndarray,
    step: jnp.ndarray = 0,
    block_points: int = 1024,
    interpret: bool = False,
) -> Dict:
    """Eval-mode composed render (SceneComposer.__call__ signature, minus the
    training-only knobs). `variables` is the EnvironmentModel variables dict;
    composer parameters are read from variables[...]["composer"].

    :return: {"coarse": {"global": integrate dict}} (per-object integration
        available under object_i keys).
    """
    object_ids = ObjectIds(scene)
    params = variables["params"]["composer"]
    batch_stats = variables.get("batch_stats", {}).get("composer", {})

    per_object = []
    for object_idx in range(object_ids.objects_count):
        model_idx = object_ids.model_idx_by_object_idx(object_idx)
        cfg = scene.object_models[model_idx]
        field_params = params[f"object_model_{model_idx}"]
        field_stats = batch_stats.get(f"object_model_{model_idx}", {})

        o_origins, o_directions, _ = rays_lib.transform_rays(
            ray_origins, ray_directions, focal_normals,
            w2o_matrices[..., object_idx, :, :],
        )
        box = jnp.asarray(cfg.bounding_box, ray_origins.dtype)
        z_near, z_far = bbox_lib.ray_aabb_bounds(
            o_origins, o_directions, box, object_in_scene[..., object_idx]
        )
        hit = z_far > z_near
        z_near = jnp.clip(z_near, cfg.z_near_min, cfg.z_far_max)
        z_far = jnp.clip(z_far, cfg.z_near_min, cfg.z_far_max)
        positions, t = rays_lib.stratified_ray_positions(
            o_origins, o_directions, z_near, z_far,
            cfg.positions_count_coarse, perturb=False,
        )

        obj_style = style[..., object_idx, :]
        obj_deformation = deformation[..., object_idx, :]

        if cfg.ray_compaction < 1.0 and cfg.nerf.kind != "skybox":
            features, raw_alpha, displacements = _compact_eval(
                cfg, field_params, field_stats, positions, hit,
                obj_style, obj_deformation, step, block_points, interpret,
            )
            raw_alpha = jnp.where(
                object_in_scene[..., object_idx][..., None, None],
                raw_alpha, cfg.empty_space_alpha,
            )
            if scene.apply_activation:
                features = jax.nn.sigmoid(features)
            per_object.append(
                {
                    "features": features,
                    "raw_alphas": raw_alpha,
                    "t": t,
                    "positions": positions,
                    "displacements": displacements,
                    "divergences": jnp.zeros_like(t),
                }
            )
            continue

        if cfg.bender.kind == "positional":
            displacements = _bender_displacements(
                cfg, field_params["ray_bender"], positions,
                obj_deformation[..., None, None, :], step,
            )
            mask = bbox_lib.aabb_contains(box, positions)
            displacements = jnp.where(mask[..., None], displacements, 0.0)
            eval_positions = positions + displacements
        else:
            displacements = jnp.zeros_like(positions)
            eval_positions = positions

        if cfg.nerf.kind == "skybox":
            # Per-ray skybox through the plain XLA path (cheap; constant
            # along the ray) — reuse the flax module for exactness.
            from playableenvironments_tpu.models.nerf import SkyboxNerfMLP

            net = SkyboxNerfMLP(cfg.nerf, cfg.style_features, cfg.bounding_box)
            sky_vars = {"params": field_params["nerf"]}
            if field_stats.get("nerf"):
                sky_vars["batch_stats"] = field_stats["nerf"]
            ray_mask = jnp.any(bbox_lib.aabb_contains(box, positions), axis=-1)
            feats_ray, alpha_ray = net.apply(
                sky_vars, o_origins, o_directions, obj_style[..., None, :],
                ray_mask, True,
            )
            positions_count = positions.shape[-2]
            features = jnp.repeat(feats_ray[..., None, :], positions_count, axis=-2)
            raw_alpha = jnp.repeat(alpha_ray[..., None], positions_count, axis=-1)
            mask = bbox_lib.aabb_contains(box, positions)
            features = jnp.where(mask[..., None], features, 0.0)
            raw_alpha = jnp.where(mask, raw_alpha, cfg.empty_space_alpha)
        else:
            features, raw_alpha = fused_nerf.fused_object_field_eval(
                cfg.nerf,
                cfg.bounding_box,
                field_params["nerf"],
                field_stats["nerf"],
                eval_positions,
                obj_style[..., None, None, :],
                cfg.empty_space_alpha,
                block_points=block_points,
                interpret=interpret,
            )
            # The wrapper masks on the ORIGINAL (unbent) positions too
            # (ray_bending_style_nerf_model.py:180-202).
            mask = bbox_lib.aabb_contains(box, positions)
            features = jnp.where(mask[..., None], features, 0.0)
            raw_alpha = jnp.where(mask, raw_alpha, cfg.empty_space_alpha)

        raw_alpha = jnp.where(
            object_in_scene[..., object_idx][..., None, None],
            raw_alpha, cfg.empty_space_alpha,
        )
        if scene.apply_activation:
            features = jax.nn.sigmoid(features)

        per_object.append(
            {
                "features": features,
                "raw_alphas": raw_alpha,
                "t": t,
                "positions": positions,
                "displacements": displacements,
                "divergences": jnp.zeros_like(t),
            }
        )

    results = {"coarse": {}}
    for object_idx, obj in enumerate(per_object):
        results["coarse"][f"object_{object_idx}"] = compositing.integrate(
            obj["features"], obj["raw_alphas"], ray_directions, obj["t"],
            obj["displacements"], obj["divergences"], perturb=False,
        )

    all_t = [o["t"] for o in per_object]
    all_alphas = [o["raw_alphas"] for o in per_object]
    all_positions = [o["positions"] for o in per_object]
    all_displacements = [o["displacements"] for o in per_object]
    all_divergences = [o["divergences"] for o in per_object]
    if scene.fix_object_overlaps:
        static_count = object_ids.static_objects_count
        origins_b = ray_origins[..., None, :]
        for s in range(static_count):
            mask = jnp.zeros_like(all_t[s], dtype=bool)
            for d in range(static_count, object_ids.objects_count):
                mask = jnp.logical_or(
                    mask, compositing.overlap_fix_mask(all_t[s], all_t[d])
                )
            (all_alphas[s], all_t[s], all_positions[s], all_displacements[s],
             all_divergences[s]) = compositing.apply_overlap_fix(
                all_alphas[s], all_t[s], all_positions[s], all_displacements[s],
                all_divergences[s], origins_b, mask,
            )

    # Sort-free cross-object integration: kills the argsort + payload gathers
    # that dominate the render wall-clock (see compose_integrate_sortfree).
    results["coarse"]["global"] = compositing.compose_integrate_sortfree(
        [o["features"] for o in per_object],
        all_alphas,
        all_t,
        ray_directions,
        all_displacements,
        all_divergences,
        perturb=False,
    )
    return results


def render_frame_fast(
    scene: SceneConfig,
    variables: Dict,
    encoding,
    image_size,
    patch_strides=None,
    focal_length_multiplier: float = 1.0,
    step: jnp.ndarray = 0,
    block_points: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full-frame eval render on the fused path: functional twin of
    EnvironmentModel.render_frame_from_scene_encoding +
    decode_rendered_grids (train=False), with the composer replaced by
    render_rays_fast (fused Pallas MLP + sort-free compose).

    :param variables: the EnvironmentModel variables dict (params.composer,
        params.autoencoder, batch_stats...).
    :param encoding: SceneEncoding.
    :return: (B, T, C, H, W, 3-or-F) frames in [0, 1].
    """
    height, width = image_size
    rescaled_focals = encoding.focals * focal_length_multiplier
    ray_directions, _, _ = rays_lib.camera_rays(height, width, rescaled_focals)

    if patch_strides:
        sampled_directions, _, _ = sampling.sample_all_rays_strided_grid(
            ray_directions, jnp.zeros(ray_directions.shape), list(patch_strides)
        )
    else:
        n = height * width
        sampled_directions = ray_directions.reshape(
            ray_directions.shape[:-3] + (n, 3)
        )

    # Camera-frame -> world (EnvironmentModel.render_sampled_rays).
    c2w = euler_translation_to_matrix(
        encoding.camera_rotations, encoding.camera_translations
    )
    origins = jnp.zeros(encoding.camera_rotations.shape)
    normals = jnp.zeros_like(origins).at[..., 2].set(-1.0)
    origins, directions, normals = rays_lib.transform_rays(
        origins, sampled_directions, normals, c2w
    )

    o2w = euler_translation_to_matrix(
        encoding.object_rotations, encoding.object_translations
    )
    w2o = invert_rigid(o2w)

    cameras = sampled_directions.shape[2]

    def with_cameras(x):
        return jnp.broadcast_to(
            x[:, :, None], x.shape[:2] + (cameras,) + x.shape[2:]
        )

    results = render_rays_fast(
        scene,
        variables,
        origins,
        directions,
        normals,
        with_cameras(w2o),
        with_cameras(encoding.object_style),
        with_cameras(encoding.object_deformation),
        with_cameras(encoding.object_in_scene),
        step=step,
        block_points=block_points,
        interpret=interpret,
    )
    features = results["coarse"]["global"]["integrated_features"]

    if scene.autoencoder is not None and patch_strides:
        from playableenvironments_tpu.models.autoencoder import (
            MultiresAutoencoder,
            autoencoder_strides,
            features_count_by_layer,
        )

        strides = autoencoder_strides(scene.autoencoder)
        counts = features_count_by_layer(scene.autoencoder)
        level_features, begin = [], 0
        for count in counts:
            level_features.append(features[..., begin : begin + count])
            begin += count
        grids = [
            sampling.split_strided_grid_samples(feats, strides, image_size)[i]
            for i, feats in enumerate(level_features)
        ]
        lead = grids[0].shape[:-3]
        flat_grids = [g.reshape((-1,) + g.shape[-3:]) for g in grids]

        ae = MultiresAutoencoder(scene.autoencoder)
        ae_vars = {"params": variables["params"]["autoencoder"]}
        ae_stats = variables.get("batch_stats", {}).get("autoencoder")
        if ae_stats:
            ae_vars["batch_stats"] = ae_stats
        decoded = ae.apply(
            ae_vars, flat_grids, False, method=MultiresAutoencoder.decode
        )
        frames = decoded.reshape(lead + decoded.shape[1:])
    elif patch_strides:
        folded = sampling.split_strided_grid_samples(
            features, list(patch_strides), image_size
        )[0]
        lead = folded.shape[:3]
        frames = jax.image.resize(
            folded,
            lead + (height, width, folded.shape[-1]),
            method="bilinear",
        )
    else:
        frames = features.reshape(
            features.shape[:-2] + (height, width, features.shape[-1])
        )
    return jnp.clip(frames, 0.0, 1.0)
