"""The fused Pallas NeRF kernel must match the flax module in eval mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from playableenvironments_tpu.config import NerfMLPConfig, PositionalEncoderConfig
from playableenvironments_tpu.models.nerf import AdaInNerfMLP
from playableenvironments_tpu.ops import fused_nerf

BOX = ((-2.0, 2.0), (-2.0, 2.0), (0.0, 3.0))
CFG = NerfMLPConfig(
    layers_width=64, backbone_layers_count=4, output_features=24,
    skip_layer_idx=2, position_encoder=PositionalEncoderConfig(octaves=4),
)


@pytest.fixture(scope="module")
def module_and_params(key=jax.random.PRNGKey(0)):
    net = AdaInNerfMLP(CFG, style_features=16, bounding_box=BOX)
    positions = jax.random.uniform(key, (128, 3), minval=-1.5, maxval=2.5)
    style = jax.random.normal(key, (128, 16))
    variables = net.init(key, positions, style)
    # Give the BN running stats non-trivial values so folding is exercised.
    variables, _ = net.apply(variables, positions, style, mutable=["batch_stats"])[1], None
    variables = net.init(key, positions, style)
    mutated = net.apply(
        variables, positions, style, mutable=["batch_stats"]
    )[1]
    variables = {"params": variables["params"], "batch_stats": mutated["batch_stats"]}
    return net, variables


def test_reference_matches_flax_eval(module_and_params, key):
    net, variables = module_and_params
    positions = jax.random.uniform(key, (64, 3), minval=-1.0, maxval=2.0)
    style = jax.random.normal(key, (64, 16))

    flax_features, flax_alpha = net.apply(
        variables, positions, style, use_running_average=True
    )

    from playableenvironments_tpu.core.bbox import aabb_size

    box = jnp.asarray(BOX)
    encoded = fused_nerf._positional_encoding(
        positions / aabb_size(box), CFG.position_encoder.octaves, True
    )
    scale0, bias0 = fused_nerf.fold_adain_stats(
        variables["params"]["adain_0"], variables["batch_stats"]["adain_0"], style
    )
    scale1, bias1 = fused_nerf.fold_adain_stats(
        variables["params"]["adain_1"], variables["batch_stats"]["adain_1"], style
    )
    packed = fused_nerf.pack_nerf_params(CFG, variables["params"])
    ref_features, ref_alpha = fused_nerf.reference_adain_nerf(
        CFG, packed, encoded, scale0, bias0, scale1, bias1
    )
    np.testing.assert_allclose(
        np.asarray(ref_features), np.asarray(flax_features), atol=2e-5
    )
    np.testing.assert_allclose(np.asarray(ref_alpha), np.asarray(flax_alpha), atol=2e-5)


def test_pallas_kernel_matches_reference_interpret(module_and_params, key):
    """Kernel (interpret mode on CPU) vs the XLA reference: bf16 matmuls give
    ~1e-2 tolerance."""
    net, variables = module_and_params
    n = 100  # deliberately not a multiple of the block size (pads internally)
    positions = jax.random.uniform(key, (n, 3), minval=-1.0, maxval=2.0)
    style = jax.random.normal(key, (n, 16))

    from playableenvironments_tpu.core.bbox import aabb_size

    box = jnp.asarray(BOX)
    encoded = fused_nerf._positional_encoding(
        positions / aabb_size(box), CFG.position_encoder.octaves, True
    )
    scale0, bias0 = fused_nerf.fold_adain_stats(
        variables["params"]["adain_0"], variables["batch_stats"]["adain_0"], style
    )
    scale1, bias1 = fused_nerf.fold_adain_stats(
        variables["params"]["adain_1"], variables["batch_stats"]["adain_1"], style
    )
    packed = fused_nerf.pack_nerf_params(CFG, variables["params"])

    ref_features, ref_alpha = fused_nerf.reference_adain_nerf(
        CFG, packed, encoded, scale0, bias0, scale1, bias1
    )
    kernel_features, kernel_alpha = fused_nerf.fused_adain_nerf(
        CFG, packed, encoded, scale0, bias0, scale1, bias1,
        block_points=64, interpret=True,
    )
    assert kernel_features.shape == (n, CFG.output_features)
    np.testing.assert_allclose(
        np.asarray(kernel_features), np.asarray(ref_features), atol=5e-2, rtol=5e-2
    )
    np.testing.assert_allclose(
        np.asarray(kernel_alpha), np.asarray(ref_alpha), atol=5e-2, rtol=5e-2
    )


def test_fused_object_field_matches_module(module_and_params, key):
    """Full fused path (mask + PE + kernel + empty-space fill) vs the flax
    object-field semantics for in/out-of-box points."""
    net, variables = module_and_params
    positions = jax.random.uniform(key, (3, 40, 3), minval=-3.0, maxval=4.0)
    style = jax.random.normal(key, (3, 1, 16))

    features, alpha = fused_nerf.fused_object_field_eval(
        CFG, BOX, variables["params"], variables["batch_stats"],
        positions, style, empty_space_alpha=-3.5,
        block_points=64, interpret=True,
    )

    flax_features, flax_alpha = net.apply(
        variables, positions, jnp.broadcast_to(style, (3, 40, 16)),
        use_running_average=True,
    )
    from playableenvironments_tpu.core.bbox import aabb_contains

    mask = aabb_contains(jnp.asarray(BOX), positions)
    expected_features = jnp.where(mask[..., None], flax_features, 0.0)
    expected_alpha = jnp.where(mask, flax_alpha, -3.5)

    assert bool(mask.any()) and not bool(mask.all())  # both branches exercised
    np.testing.assert_allclose(
        np.asarray(features), np.asarray(expected_features), atol=5e-2, rtol=5e-2
    )
    np.testing.assert_allclose(
        np.asarray(alpha), np.asarray(expected_alpha), atol=5e-2, rtol=5e-2
    )


def test_fused_backbone_custom_vjp_parity():
    """use_fused_backbone routes the backbone through the custom-VJP Pallas
    kernel with an identical param tree; at float32 the forward matches the
    Dense path exactly and gradients agree to float tolerance."""
    import dataclasses

    from playableenvironments_tpu.config import (
        NerfMLPConfig,
        PositionalEncoderConfig,
    )
    from playableenvironments_tpu.models.nerf import AdaInNerfMLP

    box = ((-1.0, 1.0), (-1.0, 1.0), (-1.0, 1.0))
    cfg = NerfMLPConfig(
        layers_width=32, backbone_layers_count=4, skip_layer_idx=2,
        output_features=8, position_encoder=PositionalEncoderConfig(octaves=4),
    )
    cfg_fused = dataclasses.replace(cfg, use_fused_backbone=True)
    plain = AdaInNerfMLP(cfg, 8, box)
    fused = AdaInNerfMLP(cfg_fused, 8, box)
    positions = jax.random.uniform(
        jax.random.PRNGKey(1), (96, 3), minval=-1, maxval=1
    )
    style = jax.random.normal(jax.random.PRNGKey(2), (96, 8))
    variables = plain.init(jax.random.PRNGKey(0), positions, style)
    assert (
        jax.tree.map(jnp.shape, variables)
        == jax.tree.map(jnp.shape, fused.init(jax.random.PRNGKey(0), positions, style))
    )

    (f_plain, a_plain), _ = plain.apply(
        variables, positions, style, mutable=["batch_stats"]
    )
    (f_fused, a_fused), _ = fused.apply(
        variables, positions, style, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(np.asarray(f_fused), np.asarray(f_plain), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_fused), np.asarray(a_plain), atol=1e-5)

    def loss(module, v):
        (f, a), _ = module.apply(v, positions, style, mutable=["batch_stats"])
        return jnp.sum(f ** 2) + jnp.sum(a ** 2)

    g_plain = jax.grad(lambda v: loss(plain, v))(variables)
    g_fused = jax.grad(lambda v: loss(fused, v))(variables)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_fused)):
        scale = float(jnp.max(jnp.abs(a))) + 1e-8
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-5 * max(scale, 1.0), rtol=2e-4
        )
