"""Radiance-field modules: style-modulated NeRF MLPs, ray benders, and the
per-object wrapper combining them.

TPU-first redesign of `model/nerf_models/`: the reference boolean-filters
points to a dynamic-size batch before the MLP
(ray_bending_style_nerf_model.py:180-198, adain_style_nerf_model.py:172-184);
here every point is evaluated densely and out-of-bbox points are masked to
(features=0, alpha=empty_space_alpha) — static shapes the MXU can tile.
Style modulation is evaluated at the style's own rank and broadcast, so the
AdaIN affine runs once per ray rather than once per sample.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from playableenvironments_tpu.config import (
    NerfMLPConfig,
    ObjectModelConfig,
    PositionalEncoderConfig,
    RayBenderConfig,
)
from playableenvironments_tpu.core.bbox import aabb_contains, aabb_size
from playableenvironments_tpu.models.encoding import (
    annealing_weights,
    positional_encoding,
)
from playableenvironments_tpu.models.layers import AffineTransformAdaIn


class DenseParams(nn.Module):
    """Declares Dense-compatible {kernel, bias} params without the matmul —
    the fused Pallas backbone consumes the raw arrays but must share the
    param tree (names, shapes, initializers) with the nn.Dense path."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_features, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class AdaInNerfMLP(nn.Module):
    """8x256-style MLP with a mid-backbone skip and an AdaIN-modulated feature
    head. Reference: model/nerf_models/adain_style_nerf_model.py:14-199.

    Inputs are bbox-size-normalized positions (adain_style_nerf_model.py:119-124).
    """

    cfg: NerfMLPConfig
    style_features: int
    bounding_box: Tuple[Tuple[float, float], ...]

    @nn.compact
    def __call__(
        self,
        positions: jnp.ndarray,
        style: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        use_running_average: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """:param positions: (..., 3) object-frame points.
        :param style: broadcastable (..., style_features); lower-rank styles
            (e.g. per-ray) are applied via broadcasting.
        :param mask: (...) validity for BN statistics.
        :return: ((..., output_features) features, (...) raw alpha).
        """
        box = jnp.asarray(self.bounding_box, positions.dtype)
        x = positions / aabb_size(box)
        pe_cfg = self.cfg.position_encoder
        encoded = positional_encoding(x, pe_cfg.octaves, pe_cfg.append_original)
        # PE in f32 (octave frequencies need the mantissa); the MLP matmuls in
        # compute_dtype (bfloat16 = full-rate MXU); AdaIN statistics and the
        # returned features/alpha back in f32.
        dtype = jnp.dtype(self.cfg.compute_dtype)

        if self.cfg.use_fused_backbone:
            # Custom-VJP Pallas kernel over the whole chain (ops.fused_nerf).
            # Params are declared with Dense's exact names/inits so the two
            # paths share checkpoints.
            from playableenvironments_tpu.ops import fused_nerf

            packed = {}
            widths_in = fused_nerf._backbone_sizes(self.cfg, encoded.shape[-1])
            for layer_idx in range(self.cfg.backbone_layers_count):
                k, b = DenseParams(
                    self.cfg.layers_width, name=f"backbone_{layer_idx}"
                )(widths_in[layer_idx])
                packed[f"w{layer_idx}"] = k
                packed[f"b{layer_idx}"] = b
            k, b = DenseParams(1, name="alpha_head")(self.cfg.layers_width)
            packed["w_alpha"] = k
            packed["b_alpha"] = b
            flat = encoded.astype(jnp.float32).reshape(-1, encoded.shape[-1])
            h_flat, alpha_flat = fused_nerf.fused_backbone(
                self.cfg, packed, flat,
                interpret=jax.default_backend() != "tpu",
            )
            h = h_flat.reshape(encoded.shape[:-1] + (self.cfg.layers_width,))
            alpha = alpha_flat.reshape(encoded.shape[:-1])
        else:
            encoded = encoded.astype(dtype)
            h = encoded
            for layer_idx in range(self.cfg.backbone_layers_count):
                if layer_idx == self.cfg.skip_layer_idx:
                    h = jnp.concatenate([h, encoded], axis=-1)
                h = nn.Dense(
                    self.cfg.layers_width, dtype=dtype, name=f"backbone_{layer_idx}"
                )(h)
                h = nn.relu(h)

            alpha = nn.Dense(1, dtype=dtype, name="alpha_head")(h)[..., 0]
            alpha = alpha.astype(jnp.float32)

        # Feature head: Dense -> AdaIN -> ReLU -> Dense -> AdaIN -> ReLU -> Dense
        # (adain_style_nerf_model.py:57-71).
        w = self.cfg.layers_width
        f = nn.Dense(w, use_bias=False, dtype=dtype, name="feat_0")(h)
        f = AffineTransformAdaIn(w, self.style_features, name="adain_0")(
            f.astype(jnp.float32), style, mask, use_running_average
        )
        f = nn.relu(f)
        f = nn.Dense(w // 2, use_bias=False, dtype=dtype, name="feat_1")(
            f.astype(dtype)
        )
        f = AffineTransformAdaIn(w // 2, self.style_features, name="adain_1")(
            f.astype(jnp.float32), style, mask, use_running_average
        )
        f = nn.relu(f)
        features = nn.Dense(
            self.cfg.output_features, dtype=dtype, name="feat_out"
        )(f.astype(dtype))
        return features.astype(jnp.float32), alpha


class SkyboxNerfMLP(nn.Module):
    """Fully-opaque skybox: features from PE(origin, unit direction), alpha
    forced to 10. Reference: model/nerf_models/skybox_adain_style_nerf_model_v3.py.

    TPU note: the output is constant along each ray (it ignores the sample
    position), so callers should evaluate it per-ray and broadcast over the
    samples axis — the reference evaluates it per-sample redundantly.
    """

    cfg: NerfMLPConfig
    style_features: int
    bounding_box: Tuple[Tuple[float, float], ...]
    occupied_space_alpha: float = 10.0

    @nn.compact
    def __call__(
        self,
        origins: jnp.ndarray,
        directions: jnp.ndarray,
        style: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        use_running_average: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """:param origins: (..., 3); :param directions: (..., 3).
        :return: ((..., output_features) features, (...) alpha == 10).
        """
        box = jnp.asarray(self.bounding_box, origins.dtype)
        norm_origins = origins / aabb_size(box)
        unit_dirs = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
        x = jnp.concatenate([norm_origins, unit_dirs], axis=-1)
        pe_cfg = self.cfg.position_encoder
        encoded = positional_encoding(x, pe_cfg.octaves, pe_cfg.append_original)
        dtype = jnp.dtype(self.cfg.compute_dtype)
        encoded = encoded.astype(dtype)

        h = encoded
        for layer_idx in range(self.cfg.backbone_layers_count):
            if layer_idx == self.cfg.skip_layer_idx:
                h = jnp.concatenate([h, encoded], axis=-1)
            h = nn.Dense(
                self.cfg.layers_width, dtype=dtype, name=f"backbone_{layer_idx}"
            )(h)
            h = nn.relu(h)

        w = self.cfg.layers_width
        f = nn.Dense(w, use_bias=False, dtype=dtype, name="feat_0")(h)
        f = AffineTransformAdaIn(w, self.style_features, name="adain_0")(
            f.astype(jnp.float32), style, mask, use_running_average
        )
        f = nn.relu(f)
        f = nn.Dense(w // 2, use_bias=False, dtype=dtype, name="feat_1")(
            f.astype(dtype)
        )
        f = AffineTransformAdaIn(w // 2, self.style_features, name="adain_1")(
            f.astype(jnp.float32), style, mask, use_running_average
        )
        f = nn.relu(f)
        features = nn.Dense(
            self.cfg.output_features, dtype=dtype, name="feat_out"
        )(f.astype(dtype))
        features = features.astype(jnp.float32)
        alpha = jnp.full(features.shape[:-1], self.occupied_space_alpha, features.dtype)
        return features, alpha


class PositionalRayBender(nn.Module):
    """Deformation field: annealed-PE(pos) ++ deformation code -> MLP ->
    displacement, near-zero initialized and clamped into the bbox.
    Reference: model/nerf_models/positional_ray_bender_model.py:13-163.
    """

    cfg: RayBenderConfig
    deformation_features: int
    bounding_box: Tuple[Tuple[float, float], ...]

    @nn.compact
    def __call__(
        self, positions: jnp.ndarray, deformation: jnp.ndarray, step: jnp.ndarray
    ) -> jnp.ndarray:
        """:param positions: (..., 3) object-frame points.
        :param deformation: broadcastable (..., deformation_features).
        :param step: scalar training step driving PE annealing.
        :return: (..., 3) displacements, bent points guaranteed inside the box.
        """
        box = jnp.asarray(self.bounding_box, positions.dtype)
        size = aabb_size(box)
        x = positions / size
        pe_cfg = self.cfg.position_encoder
        weights = (
            annealing_weights(pe_cfg.octaves, step, pe_cfg.num_steps)
            if pe_cfg.num_steps
            else None
        )
        encoded = positional_encoding(
            x, pe_cfg.octaves, pe_cfg.append_original, weights
        )
        deformation = jnp.broadcast_to(
            deformation, positions.shape[:-1] + deformation.shape[-1:]
        )
        inputs = jnp.concatenate([encoded, deformation], axis=-1)
        dtype = jnp.dtype(self.cfg.compute_dtype)

        h = inputs.astype(dtype)
        for layer_idx in range(self.cfg.layers_count):
            if layer_idx == self.cfg.skip_layer_idx:
                h = jnp.concatenate([h, inputs.astype(dtype)], axis=-1)
            h = nn.Dense(
                self.cfg.layers_width, dtype=dtype, name=f"backbone_{layer_idx}"
            )(h)
            h = nn.relu(h)

        # Near-zero init so displacements start at ~0
        # (positional_ray_bender_model.py:66-79's intent). Output head and the
        # geometric clamp in f32 — displacements feed world-space geometry.
        displacements = nn.Dense(
            3,
            use_bias=False,
            kernel_init=nn.initializers.uniform(scale=1e-5),
            name="output_head",
        )(h.astype(jnp.float32))
        displacements = displacements * size

        # Clamp so bent points stay inside the box
        # (positional_ray_bender_model.py:116-140).
        min_disp = box[:, 0] - positions
        max_disp = box[:, 1] - positions
        return jnp.clip(displacements, min_disp, max_disp)


class ObjectRadianceField(nn.Module):
    """Per-object field: bbox masking + ray bending + style NeRF evaluation.

    Equivalent to the reference's RayBendingStyleNerfModel
    (model/nerf_models/ray_bending_style_nerf_model.py:12-219) with dense
    masked compute: every sample is evaluated; samples outside the bbox yield
    (features=0, alpha=empty_space_alpha, displacement=0).
    """

    cfg: ObjectModelConfig

    @nn.compact
    def __call__(
        self,
        ray_positions: jnp.ndarray,
        ray_origins: jnp.ndarray,
        ray_directions: jnp.ndarray,
        style: jnp.ndarray,
        deformation: jnp.ndarray,
        step: jnp.ndarray = 0,
        canonical_pose: bool = False,
        use_running_average: bool = False,
        compute_divergence: bool = False,
        divergence_key: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """:param ray_positions: (..., rays, positions, 3) object-frame points.
        :param ray_origins: (..., rays, 3) object-frame origins.
        :param ray_directions: (..., rays, 3).
        :param style: (..., style_features) per-image object style.
        :param deformation: (..., deformation_features).
        :param step: scalar step for PE annealing.
        :param canonical_pose: render with zeroed deformation
            (ray_bending_style_nerf_model.py:107-109).
        :param compute_divergence: estimate the displacement field's divergence
            via the FFJORD Hutchinson trace estimator e^T J e with random e
            (object_composer.py:582-601) — a vjp through the bender.
        :return: ((..., rays, positions, F) features, (..., rays, positions)
            raw alphas, (..., rays, positions, 3) displacements,
            (..., rays, positions) divergences).
        """
        box = jnp.asarray(self.cfg.bounding_box, ray_positions.dtype)
        mask = aabb_contains(box, ray_positions)  # (..., rays, positions)

        # Style/deformation broadcast at per-ray rank: (..., 1, 1, S).
        style_b = style[..., None, None, :]
        deformation_b = deformation[..., None, None, :]

        divergences = jnp.zeros(ray_positions.shape[:-1], ray_positions.dtype)
        if self.cfg.bender.kind == "positional":
            bender = PositionalRayBender(
                self.cfg.bender,
                self.cfg.deformation_features,
                self.cfg.bounding_box,
                name="ray_bender",
            )
            if compute_divergence and not canonical_pose:
                if divergence_key is None:
                    divergence_key = self.make_rng("divergence")

                def bend(mdl, p):
                    return mdl(p, deformation_b, step)

                displacements, vjp_fn = nn.vjp(bend, bender, ray_positions)
                e = jax.random.normal(
                    divergence_key, displacements.shape, displacements.dtype
                )
                _, e_dydx = vjp_fn(e)
                divergences = jnp.sum(e_dydx * e, axis=-1)
            else:
                displacements = bender(ray_positions, deformation_b, step)
            if canonical_pose:
                displacements = displacements * 0.0
            displacements = jnp.where(mask[..., None], displacements, 0.0)
            divergences = jnp.where(mask, divergences, 0.0)
        else:
            displacements = jnp.zeros_like(ray_positions)

        bent_positions = ray_positions + displacements

        if self.cfg.nerf.kind == "skybox":
            # Constant along the ray: evaluate per-ray, broadcast over samples.
            # Origins are per-image ((..., 3)); the skybox encodes (origin,
            # direction) pairs, so broadcast them over the rays axis.
            ray_mask = jnp.any(mask, axis=-1)  # (..., rays)
            origins_b = jnp.broadcast_to(
                ray_origins[..., None, :], ray_directions.shape
            )
            features_ray, alpha_ray = SkyboxNerfMLP(
                self.cfg.nerf,
                self.cfg.style_features,
                self.cfg.bounding_box,
                name="nerf",
            )(
                origins_b,
                ray_directions,
                style[..., None, :],
                ray_mask,
                use_running_average,
            )
            positions_count = ray_positions.shape[-2]
            features = jnp.repeat(features_ray[..., None, :], positions_count, axis=-2)
            alpha = jnp.repeat(alpha_ray[..., None], positions_count, axis=-1)
        else:
            features, alpha = AdaInNerfMLP(
                self.cfg.nerf,
                self.cfg.style_features,
                self.cfg.bounding_box,
                name="nerf",
            )(bent_positions, style_b, mask, use_running_average)

        features = jnp.where(mask[..., None], features, 0.0)
        alpha = jnp.where(mask, alpha, self.cfg.empty_space_alpha)
        return features, alpha, displacements, divergences
