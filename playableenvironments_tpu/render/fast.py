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
    training-only knobs), computed ENTIRELY in per-object compacted ray
    domains.

    For each object, rays hitting its AABB are argsort-gathered into a
    static-size budget (ObjectModelConfig.ray_compaction; players intersect
    <1% of frame rays). The field MLP, the alpha/transmittance math, AND the
    feature integration all run on the compacted rays; only the per-ray
    integrals (features/opacity/depth — (rays, F) not (rays, S, F)) scatter
    back. Cross-object transmittance uses full-ray t geometry (cheap — no
    MLP) plus tiny inverse-permutation gathers into other objects' compacted
    alpha masses. Semantics match the reference's sort-merge composition
    (object_composer.py:399-447 + 724-784) with stable-sort tie order;
    parity-tested against the flax SceneComposer.

    `variables` is the EnvironmentModel variables dict; composer parameters
    are read from variables["params"]["composer"].

    :return: {"coarse": {"global": integrate-style dict,
              "object_i": per-object integrate dicts}} ("weights" omitted —
              per-sample weights never materialize densely here).
    """
    object_ids = ObjectIds(scene)
    if any(om.use_fine for om in scene.object_models):
        # The compacted fast path is coarse-only (published configs all run
        # use_fine=False; the hierarchical path lives in SceneComposer and
        # is reference-oracle-pinned by tests/test_reference_parity.py).
        # Fail loudly rather than silently dropping the fine pass.
        raise NotImplementedError(
            "render.fast is coarse-only; use SceneComposer for use_fine "
            "objects (or set use_fine=False for interactive rendering)"
        )
    params = variables["params"]["composer"]
    batch_stats = variables.get("batch_stats", {}).get("composer", {})

    lead = ray_directions.shape[:-2]
    rays = ray_directions.shape[-2]
    l = 1
    for d in lead:
        l *= d

    dirs = ray_directions.reshape((l, rays, 3))
    dir_norm = jnp.linalg.norm(dirs, axis=-1)  # (L, R)
    origins_f = jnp.broadcast_to(ray_origins, lead + (3,)).reshape((l, 3))
    normals_f = jnp.broadcast_to(focal_normals, lead + (3,)).reshape((l, 3))
    objects = object_ids.objects_count
    w2o_f = jnp.broadcast_to(
        w2o_matrices, lead + (objects, 4, 4)
    ).reshape((l, objects, 4, 4))
    style_f = jnp.broadcast_to(
        style, lead + style.shape[-2:]
    ).reshape((l,) + style.shape[-2:])
    deform_f = jnp.broadcast_to(
        deformation, lead + deformation.shape[-2:]
    ).reshape((l,) + deformation.shape[-2:])
    in_scene_f = jnp.broadcast_to(object_in_scene, lead + (objects,)).reshape(
        (l, objects)
    )

    batch_idx = jnp.arange(l)[:, None]
    big = jnp.asarray(3.0e38, dirs.dtype)

    # ---- Phase 1: per-object geometry, compaction, field evaluation ------
    per = []
    for object_idx in range(objects):
        model_idx = object_ids.model_idx_by_object_idx(object_idx)
        cfg = scene.object_models[model_idx]
        field_params = params[f"object_model_{model_idx}"]
        field_stats = batch_stats.get(f"object_model_{model_idx}", {})
        box = jnp.asarray(cfg.bounding_box, dirs.dtype)
        samples = cfg.positions_count_coarse

        o_origins, o_dirs, _ = rays_lib.transform_rays(
            origins_f, dirs, normals_f, w2o_f[:, object_idx]
        )
        z_near, z_far = bbox_lib.ray_aabb_bounds(
            o_origins, o_dirs, box, in_scene_f[:, object_idx]
        )
        hit = z_far > z_near
        z_near = jnp.clip(z_near, cfg.z_near_min, cfg.z_far_max)
        z_far = jnp.clip(z_far, cfg.z_near_min, cfg.z_far_max)
        # Deterministic linspace samples (eval path: perturb=False),
        # matching rays_lib.stratified_ray_positions.
        fractions = jnp.linspace(0.0, 1.0, samples, dtype=dirs.dtype)
        t_full = (
            z_near[..., None] + (z_far - z_near)[..., None] * fractions
        )  # (L, R, S)

        compact = cfg.ray_compaction < 1.0
        budget = max(int(rays * cfg.ray_compaction), 1) if compact else rays
        if compact:
            # Stable hits-first partition via prefix sums (an argsort of the
            # miss flag, but O(n) scatter instead of a TPU bitonic sort):
            # hit rays go to slot cumsum(hit)-1, misses fill the tail.
            hit_i = hit.astype(jnp.int32)
            hits_total = jnp.sum(hit_i, axis=-1, keepdims=True)
            slot = jnp.where(
                hit,
                jnp.cumsum(hit_i, axis=-1) - 1,
                hits_total + jnp.cumsum(1 - hit_i, axis=-1) - 1,
            )  # (L, R) destination of each ray in the partition
            order_full = jnp.zeros((l, rays), jnp.int32).at[
                batch_idx, slot
            ].set(jnp.broadcast_to(jnp.arange(rays), (l, rays)))
            order = order_full[:, :budget]  # (L, B)
        else:
            order = jnp.broadcast_to(jnp.arange(rays), (l, rays))
        inv = jnp.full((l, rays), budget, jnp.int32)
        inv = inv.at[batch_idx, order].set(
            jnp.broadcast_to(jnp.arange(budget), (l, budget))
        )

        # Object-frame origins are per-image constants (camera center in the
        # object frame): broadcast, never gather.
        o_origins_c = jnp.broadcast_to(o_origins[:, None], (l, budget, 3))
        if compact:
            # One wide gather for every per-ray payload indexed by `order`
            # (t samples + direction + direction norm): each take_along_axis
            # lowers to its own gather custom-fusion on TPU, and the fixed
            # per-gather cost dominates at these widths.
            packed = jnp.concatenate(
                [t_full, o_dirs, dir_norm[..., None]], axis=-1
            )  # (L, R, S+4)
            packed_c = packed[batch_idx, order]
            t_c = packed_c[..., :samples]
            o_dirs_c = packed_c[..., samples : samples + 3]
            dirn_c = packed_c[..., samples + 3]
        else:
            t_c = t_full
            o_dirs_c = o_dirs
            dirn_c = dir_norm
        positions_c = (
            o_origins_c[..., None, :] + t_c[..., None] * o_dirs_c[..., None, :]
        )  # (L, B, S, 3)

        obj_style = style_f[:, object_idx]  # (L, Fs)
        obj_deform = deform_f[:, object_idx]

        if cfg.bender.kind == "positional":
            deform_b = jnp.broadcast_to(
                obj_deform[:, None, None],
                (l, budget, 1, obj_deform.shape[-1]),
            )
            disp_c = _bender_displacements(
                cfg, field_params["ray_bender"], positions_c, deform_b, step
            )
            in_box = bbox_lib.aabb_contains(box, positions_c)
            disp_c = jnp.where(in_box[..., None], disp_c, 0.0)
            eval_positions = positions_c + disp_c
        else:
            disp_c = jnp.zeros_like(positions_c)
            eval_positions = positions_c

        if cfg.nerf.kind == "skybox":
            from playableenvironments_tpu.models.nerf import SkyboxNerfMLP

            net = SkyboxNerfMLP(cfg.nerf, cfg.style_features, cfg.bounding_box)
            sky_vars = {"params": field_params["nerf"]}
            if field_stats.get("nerf"):
                sky_vars["batch_stats"] = field_stats["nerf"]
            in_box = bbox_lib.aabb_contains(box, positions_c)
            ray_mask = jnp.any(in_box, axis=-1)
            feats_ray, alpha_ray = net.apply(
                sky_vars, o_origins_c, o_dirs_c, obj_style[:, None],
                ray_mask, True,
            )
            feats_c = jnp.repeat(feats_ray[..., None, :], samples, axis=-2)
            alpha_c = jnp.repeat(alpha_ray[..., None], samples, axis=-1)
        else:
            style_points = jnp.broadcast_to(
                obj_style[:, None, None],
                (l, budget, 1, obj_style.shape[-1]),
            )
            feats_c, alpha_c = fused_nerf.fused_object_field_eval(
                cfg.nerf,
                cfg.bounding_box,
                field_params["nerf"],
                field_stats["nerf"],
                eval_positions,
                style_points,
                cfg.empty_space_alpha,
                block_points=block_points,
                interpret=interpret,
            )
            in_box = bbox_lib.aabb_contains(box, positions_c)

        # Empty-space masking on the ORIGINAL (unbent) positions
        # (ray_bending_style_nerf_model.py:180-202) + absent objects.
        feats_c = jnp.where(in_box[..., None], feats_c, 0.0)
        alpha_c = jnp.where(in_box, alpha_c, cfg.empty_space_alpha)
        alpha_c = jnp.where(
            in_scene_f[:, object_idx][:, None, None],
            alpha_c, cfg.empty_space_alpha,
        )
        if scene.apply_activation:
            feats_c = jax.nn.sigmoid(feats_c)

        per.append({
            "cfg": cfg, "order": order, "inv": inv, "budget": budget,
            "compact": compact, "t_full": t_full, "t_c": t_c,
            "raw_alpha_c": alpha_c, "feats_c": feats_c, "disp_c": disp_c,
            "o_origins_c": o_origins_c,
            "dirn_c": dirn_c,
        })

    # ---- Overlap fix (Minecraft): full-domain static objects only --------
    # NOTE: the fix zeroes masked samples' t MID-ARRAY (matching the
    # reference, which then re-sorts in its cat+sort compose). This path is
    # sort-free, so overlap-fixed objects lose the "t ascending" invariant
    # and are marked `unsorted`: their own-successor/own-distance lookups
    # below switch from t[i+1] to an order-robust masked min.
    for entry in per:
        entry["unsorted"] = False
    if scene.fix_object_overlaps:
        static_count = object_ids.static_objects_count
        for s in range(static_count):
            if per[s]["compact"]:
                raise ValueError(
                    "fix_object_overlaps requires ray_compaction=1.0 on "
                    "static objects (their samples are masked by dynamic "
                    "objects' intervals over the full ray set)"
                )
            mask = jnp.zeros_like(per[s]["t_c"], dtype=bool)
            for d in range(static_count, objects):
                mask = jnp.logical_or(
                    mask,
                    compositing.overlap_fix_mask(
                        per[s]["t_c"], per[d]["t_full"]
                    ),
                )
            entry = per[s]
            (entry["raw_alpha_c"], new_t, _, entry["disp_c"], _) = (
                compositing.apply_overlap_fix(
                    entry["raw_alpha_c"], entry["t_c"],
                    jnp.zeros_like(entry["disp_c"]), entry["disp_c"],
                    jnp.zeros_like(entry["t_c"]),
                    entry["o_origins_c"], mask,
                )
            )
            entry["t_c"] = new_t
            entry["t_full"] = new_t  # full domain == compacted domain here
            entry["unsorted"] = True

    # ---- Phase 2: successor distances + alphas per object ----------------
    # Total order = lexicographic (t, concat index): a stable sort of the
    # concatenation. Cross-object candidates come from full-ray t geometry
    # gathered at this object's compacted rays (masked min — no searchsorted,
    # whose binary-search lowering serializes on TPU).
    def _next_within(t_a):
        """Successor t within one object's own sample array, robust to
        unsorted t: min over samples strictly after (t, index)-lexicographic.
        Equals t[i+1] (with `big` fill) when t_a is ascending."""
        s = t_a.shape[-1]
        idx = jnp.arange(s)
        ti, tj = t_a[..., :, None], t_a[..., None, :]
        later = (tj > ti) | ((tj == ti) & (idx[None, :] > idx[:, None]))
        return jnp.min(jnp.where(later, tj, big), axis=-1)

    t_b_at_cache = {}
    for a, entry in enumerate(per):
        t_a = entry["t_c"]  # (L, B, S_a)
        if entry["unsorted"]:
            # Stashed for phase 3's per-object integration: the (L, B, S, S)
            # pairwise tensor is the largest fast-path intermediate — one
            # copy per object, not two.
            own_next = entry["own_next"] = _next_within(t_a)
        else:
            own_next = jnp.concatenate(
                [t_a[..., 1:], jnp.full_like(t_a[..., :1], big)], axis=-1
            )
        if entry["compact"]:
            # One wide gather of every OTHER object's full-domain t at this
            # object's compacted rays (same `order` indices for all of them).
            others = [b for b in range(objects) if b != a]
            t_others = jnp.concatenate(
                [per[b]["t_full"] for b in others], axis=-1
            )[batch_idx, entry["order"]]
            begin = 0
            for b in others:
                s_b = per[b]["t_full"].shape[-1]
                t_b_at_cache[(a, b)] = t_others[..., begin : begin + s_b]
                begin += s_b
        candidates = [own_next]
        for b, other in enumerate(per):
            if b == a:
                continue
            if entry["compact"]:
                t_b_at_a = t_b_at_cache[(a, b)]
            else:
                t_b_at_a = other["t_full"]
            t_b_at_cache[(a, b)] = t_b_at_a  # (L, B_a, S_b)
            ti = t_a[..., :, None]
            tj = t_b_at_a[..., None, :]
            after = (tj > ti) | ((tj == ti) & (b > a))
            candidates.append(jnp.min(jnp.where(after, tj, big), axis=-1))
        next_t = jnp.min(jnp.stack(candidates, axis=0), axis=0)
        deltas = jnp.where(next_t >= big, 1e10, next_t - t_a)
        x = jax.nn.relu(entry["raw_alpha_c"]) * (
            deltas * entry["dirn_c"][..., None]
        )
        entry["alphas_c"] = 1.0 - jnp.exp(-x)
        # log(1 - alpha + 1e-10) in log space (exact-0 cancellation under
        # XLA fusion otherwise produces -inf -> NaN).
        entry["log1m_c"] = jnp.logaddexp(-x, jnp.log(1e-10))

    # ---- Phase 3: transmittance, weights, scattered integrals ------------
    features_count = per[0]["feats_c"].shape[-1]
    total_samples = sum(e["t_c"].shape[-1] for e in per)
    # Packed global accumulator: features ++ (opacity, depth, disp_mag).
    global_packed = jnp.zeros((l, rays, features_count + 3), dirs.dtype)

    def exclusive_cumsum(values):
        cs = jnp.cumsum(values, axis=-1)
        return jnp.concatenate(
            [jnp.zeros_like(cs[..., :1]), cs[..., :-1]], axis=-1
        )

    results = {"coarse": {}}
    for a, entry in enumerate(per):
        t_a = entry["t_c"]
        transmittance_log = exclusive_cumsum(entry["log1m_c"])

        # Other objects' per-sample log mass at THIS object's rays. Packed
        # into at most two wide gathers: full-domain others share `order`
        # indices; compact others each need their own inverse-permutation
        # lookup (but the inv indices themselves pack with `order` when this
        # object is compact — they are gathered from (L, R) tables).
        log1m_b_at = {}
        full_others = [
            b for b in range(objects) if b != a and not per[b]["compact"]
        ]
        if full_others and entry["compact"]:
            packed = jnp.concatenate(
                [per[b]["log1m_c"] for b in full_others], axis=-1
            )[batch_idx, entry["order"]]
            begin = 0
            for b in full_others:
                s_b = per[b]["log1m_c"].shape[-1]
                log1m_b_at[b] = packed[..., begin : begin + s_b]
                begin += s_b
        else:
            for b in full_others:
                log1m_b_at[b] = per[b]["log1m_c"]
        for b in range(objects):
            if b == a or not per[b]["compact"]:
                continue
            other = per[b]
            idx_b = (
                other["inv"][batch_idx, entry["order"]]
                if entry["compact"]
                else other["inv"]
            )  # (L, B_a)
            valid = idx_b < other["budget"]
            gathered = jnp.take_along_axis(
                other["log1m_c"],
                jnp.clip(idx_b, 0, other["budget"] - 1)[..., None],
                axis=1,
            )
            log1m_b_at[b] = jnp.where(valid[..., None], gathered, 0.0)

        for b, other in enumerate(per):
            if b == a:
                continue
            t_b_at_a = t_b_at_cache[(a, b)]
            log1m_b_at_a = log1m_b_at[b]
            ti = t_a[..., :, None]
            tj = t_b_at_a[..., None, :]
            before = (tj < ti) | ((tj == ti) & (b < a))
            transmittance_log = transmittance_log + jnp.sum(
                jnp.where(before, log1m_b_at_a[..., None, :], 0.0), axis=-1
            )
        weights = entry["alphas_c"] * jnp.exp(transmittance_log)  # (L,B,S)

        disp_norm = jnp.linalg.norm(entry["disp_c"], axis=-1)
        contrib_features = jnp.sum(
            weights[..., None] * entry["feats_c"], axis=-2
        )
        contrib_opacity = jnp.sum(weights, axis=-1)
        contrib_depth = jnp.sum(weights * t_a, axis=-1)
        contrib_disp = jnp.sum(
            jax.lax.stop_gradient(weights) * disp_norm, axis=-1
        )
        order = entry["order"]
        # ONE packed scatter-add per object (features ++ opacity/depth/disp):
        # each .at[].add is its own scatter custom-fusion otherwise.
        packed_contrib = jnp.concatenate(
            [
                contrib_features,
                contrib_opacity[..., None],
                contrib_depth[..., None],
                contrib_disp[..., None],
            ],
            axis=-1,
        )  # (L, B, F+3)
        global_packed = global_packed.at[batch_idx, order].add(packed_contrib)

        # Per-object integration (own-sample spacing, own transmittance —
        # compositing.integrate semantics), scattered to the full ray set.
        if entry["unsorted"]:
            own_succ = entry["own_next"]  # computed once in phase 2
            own_dist = jnp.where(
                own_succ >= big, 1e10, own_succ - t_a
            ) * entry["dirn_c"][..., None]
        else:
            own_dist = jnp.concatenate(
                [
                    t_a[..., 1:] - t_a[..., :-1],
                    jnp.full_like(t_a[..., :1], 1e10),
                ],
                axis=-1,
            ) * entry["dirn_c"][..., None]
        own_alphas = 1.0 - jnp.exp(
            -jax.nn.relu(entry["raw_alpha_c"]) * own_dist
        )
        own_weights = compositing.compositing_weights(own_alphas)
        obj_features = jnp.sum(
            own_weights[..., None] * entry["feats_c"], axis=-2
        )
        obj_opacity = jnp.sum(own_weights, axis=-1)
        obj_depth = jnp.sum(own_weights * t_a, axis=-1)
        obj_disp = jnp.mean(
            jax.lax.stop_gradient(own_weights) * disp_norm, axis=-1
        )

        # ONE packed scatter per object; disparity is derived from the
        # scattered opacity/depth (unscattered rays: 0/eps -> clip -> 1e10,
        # exactly the old fill value).
        packed_obj = jnp.concatenate(
            [
                obj_features,
                obj_opacity[..., None],
                obj_depth[..., None],
                obj_disp[..., None],
            ],
            axis=-1,
        )
        scattered = (
            jnp.zeros((l, rays, features_count + 3), dirs.dtype)
            .at[batch_idx, order]
            .set(packed_obj)
        )
        s_opacity = scattered[..., features_count]
        s_depth = scattered[..., features_count + 1]
        obj_disparity = 1.0 / jnp.clip(
            s_depth / jnp.clip(s_opacity, 1e-10, None), min=1e-10
        )
        results["coarse"][f"object_{a}"] = {
            "integrated_features": scattered[..., :features_count].reshape(
                lead + (rays, features_count)
            ),
            "opacity": s_opacity.reshape(lead + (rays,)),
            "depth": s_depth.reshape(lead + (rays,)),
            "disparity": obj_disparity.reshape(lead + (rays,)),
            "integrated_displacements_magnitude": scattered[
                ..., features_count + 2
            ].reshape(lead + (rays,)),
            "integrated_divergence": jnp.zeros(lead + (rays,), dirs.dtype),
        }

    global_opacity = global_packed[..., features_count]
    global_depth = global_packed[..., features_count + 1]
    global_disparity = 1.0 / jnp.clip(
        global_depth / jnp.clip(global_opacity, 1e-10, None), min=1e-10
    )
    results["coarse"]["global"] = {
        "integrated_features": global_packed[..., :features_count].reshape(
            lead + (rays, features_count)
        ),
        "opacity": global_opacity.reshape(lead + (rays,)),
        "depth": global_depth.reshape(lead + (rays,)),
        "disparity": global_disparity.reshape(lead + (rays,)),
        "integrated_displacements_magnitude": (
            global_packed[..., features_count + 2] / total_samples
        ).reshape(lead + (rays,)),
        "integrated_divergence": jnp.zeros(lead + (rays,), dirs.dtype),
    }
    return results


def _render_rays_fast_sharded(
    mesh,
    scene: SceneConfig,
    variables: Dict,
    ray_origins: jnp.ndarray,
    ray_directions: jnp.ndarray,
    focal_normals: jnp.ndarray,
    w2o_matrices: jnp.ndarray,
    style: jnp.ndarray,
    deformation: jnp.ndarray,
    object_in_scene: jnp.ndarray,
    step: jnp.ndarray,
    block_points: int,
    interpret: bool,
) -> Dict:
    """render_rays_fast under shard_map over a (data, rays) mesh: each device
    runs the fused kernel on its ray slice (rays are embarrassingly parallel
    — nothing crosses the ray axis before the per-ray integral), and the
    integrated per-ray outputs all-gather only where a consumer needs them.
    The multi-chip form of the reference's samples_per_image_batching host
    loop (environment_model.py:474-521). Pallas calls can't be partitioned by
    GSPMD, so manual sharding (shard_map), not a sharding constraint."""
    from jax.sharding import PartitionSpec as P

    from playableenvironments_tpu.parallel.mesh import DATA_AXIS, RAYS_AXIS

    axis_sizes = dict(mesh.shape)
    rays_size = axis_sizes[RAYS_AXIS]
    batch = ray_directions.shape[0]
    data_axis = (
        DATA_AXIS
        if DATA_AXIS in axis_sizes
        and axis_sizes[DATA_AXIS] > 1
        and batch % axis_sizes[DATA_AXIS] == 0
        else None
    )
    if data_axis is None and axis_sizes.get(DATA_AXIS, 1) > 1:
        # The batch can't shard over the configured data axis, so it is
        # REPLICATED on every data row — a data-size multiplier of wasted
        # compute. Say so rather than silently eating the configured axis.
        import warnings

        warnings.warn(
            f"render_rays_fast_sharded: batch {batch} does not divide the "
            f"mesh data axis ({axis_sizes[DATA_AXIS]}); the batch is "
            "replicated on every data row (wasted compute). Size the eval "
            "batch to the data axis or set evaluation.mesh data: 1.",
            stacklevel=2,
        )

    rays = ray_directions.shape[-2]
    pad = (-rays) % rays_size
    if pad:
        # Unit-z padding rays: geometrically valid (finite AABB bounds, unit
        # norm) so they produce ordinary garbage that's sliced off below.
        filler = (
            jnp.zeros(ray_directions.shape[:-2] + (pad, 3), ray_directions.dtype)
            .at[..., 2]
            .set(1.0)
        )
        ray_directions = jnp.concatenate([ray_directions, filler], axis=-2)

    def lead_spec(x):
        return P(*([data_axis] + [None] * (x.ndim - 1)))

    dirs_spec = P(
        *([data_axis] + [None] * (ray_directions.ndim - 3) + [RAYS_AXIS, None])
    )

    def local(variables, origins, directions, normals, w2o, sty, deform, in_scene, step):
        return render_rays_fast(
            scene, variables, origins, directions, normals, w2o, sty,
            deform, in_scene, step=step, block_points=block_points,
            interpret=interpret,
        )

    args = (
        variables, ray_origins, ray_directions, focal_normals, w2o_matrices,
        style, deformation, object_in_scene, jnp.asarray(step),
    )
    in_specs = (
        P(),  # prefix spec: every variables leaf replicated
        lead_spec(ray_origins), dirs_spec, lead_spec(focal_normals),
        lead_spec(w2o_matrices), lead_spec(style), lead_spec(deformation),
        lead_spec(object_in_scene), P(),
    )
    # Outputs carry the lead dims then the ray axis: features (..., rays, F),
    # per-ray scalars (..., rays).
    lead_ndim = ray_directions.ndim - 2

    def out_spec(leaf):
        return P(
            *([data_axis] + [None] * (lead_ndim - 1) + [RAYS_AXIS]
              + [None] * (leaf.ndim - lead_ndim - 1))
        )

    out_shapes = jax.eval_shape(local, *args)
    out_specs = jax.tree.map(out_spec, out_shapes)
    # check_vma=False: the Pallas kernel's ShapeDtypeStruct outputs carry no
    # varying-mesh-axes annotation, and everything here is per-ray local (no
    # collectives to validate).
    results = jax.shard_map(
        local, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )(*args)
    if pad:
        def unpad(leaf):
            if leaf.ndim == lead_ndim + 2:
                return leaf[..., :rays, :]
            return leaf[..., :rays]

        results = jax.tree.map(unpad, results)
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

    from playableenvironments_tpu.parallel.mesh import RAYS_AXIS

    ambient = jax.sharding.get_abstract_mesh()
    if RAYS_AXIS in getattr(ambient, "axis_names", ()):
        # Under a (data, rays) mesh (jax.set_mesh or FrameRenderer(mesh=...)):
        # shard the whole-frame ray axis across chips.
        results = _render_rays_fast_sharded(
            ambient,
            scene,
            variables,
            origins,
            directions,
            normals,
            with_cameras(w2o),
            with_cameras(encoding.object_style),
            with_cameras(encoding.object_deformation),
            with_cameras(encoding.object_in_scene),
            step,
            block_points,
            interpret,
        )
    else:
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
