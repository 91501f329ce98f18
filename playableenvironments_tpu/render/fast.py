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
from playableenvironments_tpu.models.encoding import annealing_weights
from playableenvironments_tpu.ops import fused_nerf


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
        z_near = jnp.clip(z_near, cfg.z_near_min, cfg.z_far_max)
        z_far = jnp.clip(z_far, cfg.z_near_min, cfg.z_far_max)
        positions, t = rays_lib.stratified_ray_positions(
            o_origins, o_directions, z_near, z_far,
            cfg.positions_count_coarse, perturb=False,
        )

        obj_style = style[..., object_idx, :]
        obj_deformation = deformation[..., object_idx, :]

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
