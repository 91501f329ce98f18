"""Golden tests for alpha compositing, integration, and multi-object compose."""

import jax
import jax.numpy as jnp
import numpy as np

from playableenvironments_tpu.core import compositing as comp


def test_position_distances():
    t = jnp.asarray([[[1.0, 2.0, 4.0]]])
    directions = jnp.asarray([[2.0, 0.0, 0.0]])  # norm 2
    d = np.asarray(comp.position_distances(t, directions))
    np.testing.assert_allclose(d[0, 0, :2], [2.0, 4.0], atol=1e-5)
    assert d[0, 0, 2] > 1e9  # last distance is "infinite"


def test_alphas_formula():
    raw = jnp.asarray([0.0, 1.0, -5.0])
    dists = jnp.asarray([1.0, 2.0, 1.0])
    a = np.asarray(comp.alphas_from_raw(raw, dists, perturb=False))
    np.testing.assert_allclose(a, [0.0, 1 - np.exp(-2.0), 0.0], atol=1e-6)


def test_weights_exclusive_cumprod():
    alphas = jnp.asarray([0.5, 0.5, 1.0])
    w = np.asarray(comp.compositing_weights(alphas))
    np.testing.assert_allclose(w, [0.5, 0.25, 0.25], atol=1e-5)
    # Opaque sample absorbs everything that remains; weights sum to <= 1.
    assert abs(w.sum() - 1.0) < 1e-5


def test_integrate_single_opaque_surface():
    """One fully opaque sample at t=2 -> its features & depth dominate."""
    n = 5
    t = jnp.asarray([1.0, 1.5, 2.0, 2.5, 3.0])[None, None]
    raw_alphas = jnp.asarray([-10.0, -10.0, 100.0, -10.0, -10.0])[None, None]
    features = jnp.eye(n)[None, None]  # sample i has one-hot feature i
    directions = jnp.asarray([[0.0, 0.0, 1.0]])[None]
    zeros3 = jnp.zeros((1, 1, n, 3))
    zeros = jnp.zeros((1, 1, n))
    out = comp.integrate(features, raw_alphas, directions, t, zeros3, zeros, perturb=False)
    np.testing.assert_allclose(np.asarray(out["integrated_features"][0, 0]),
                               [0, 0, 1, 0, 0], atol=1e-4)
    np.testing.assert_allclose(float(out["depth"][0, 0]), 2.0, atol=1e-4)
    np.testing.assert_allclose(float(out["opacity"][0, 0]), 1.0, atol=1e-4)
    np.testing.assert_allclose(float(out["disparity"][0, 0]), 0.5, atol=1e-4)


def test_integrate_empty_ray():
    n = 4
    t = jnp.linspace(1.0, 3.0, n)[None, None]
    raw_alphas = jnp.full((1, 1, n), -10.0)
    features = jnp.ones((1, 1, n, 2))
    directions = jnp.asarray([[[0.0, 0.0, 1.0]]])
    out = comp.integrate(
        features, raw_alphas, directions, t,
        jnp.zeros((1, 1, n, 3)), jnp.zeros((1, 1, n)), perturb=False,
    )
    np.testing.assert_allclose(float(out["opacity"][0, 0]), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["integrated_features"]), 0.0, atol=1e-5)


def test_expected_positions_weighted_average():
    positions = jnp.asarray([[[0.0, 0.0, 1.0], [0.0, 0.0, 3.0]]])
    displacements = jnp.zeros((1, 2, 3))
    weights = jnp.asarray([[1.0, 3.0]])
    out = np.asarray(comp.expected_positions(positions, displacements, weights))
    np.testing.assert_allclose(out[0], [0.0, 0.0, 2.5], atol=1e-5)


def test_compose_objects_sorts_by_t():
    # Object A: 2 samples at t = 1, 5; object B: 3 samples at t = 0.5, 2, 6.
    tA = jnp.asarray([[1.0, 5.0]])
    tB = jnp.asarray([[0.5, 2.0, 6.0]])
    fA = jnp.asarray([[[1.0], [2.0]]])
    fB = jnp.asarray([[[10.0], [20.0], [30.0]]])
    aA = jnp.asarray([[0.1, 0.2]])
    aB = jnp.asarray([[0.3, 0.4, 0.5]])
    zA3, zB3 = jnp.zeros((1, 2, 3)), jnp.zeros((1, 3, 3))
    zA, zB = jnp.zeros((1, 2)), jnp.zeros((1, 3))

    features, alphas, t, positions, disp, div = comp.compose_objects(
        [fA, fB], [aA, aB], [tA, tB], [zA3, zB3], [zA3, zB3], [zA, zB]
    )
    np.testing.assert_allclose(np.asarray(t[0]), [0.5, 1.0, 2.0, 5.0, 6.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(features[0, :, 0]), [10, 1, 20, 2, 30], atol=1e-6)
    np.testing.assert_allclose(np.asarray(alphas[0]), [0.3, 0.1, 0.4, 0.2, 0.5], atol=1e-6)


def test_compose_matches_single_object_when_alone():
    """Composing a single object must be the identity given sorted t."""
    t = jnp.sort(jax.random.uniform(jax.random.PRNGKey(1), (2, 4, 8)), axis=-1)
    f = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 8, 3))
    a = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 8))
    p = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 8, 3))
    out = comp.compose_objects([f], [a], [t], [p], [p], [a])
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(t), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(f), atol=1e-6)


def test_overlap_fix_mask_interval():
    static_t = jnp.asarray([[0.0, 1.0, 2.0, 3.0, 4.0]])
    dynamic_t = jnp.asarray([[1.5, 2.0, 3.5]])
    mask = np.asarray(comp.overlap_fix_mask(static_t, dynamic_t))
    # Samples with 1.5 <= t < 3.5 suppressed: t = 2.0, 3.0.
    np.testing.assert_array_equal(mask[0], [False, False, True, True, False])


def test_apply_overlap_fix_suppresses_samples():
    n = 4
    raw_alphas = jnp.ones((1, n))
    t = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    positions = jnp.ones((1, n, 3)) * 7.0
    disp = jnp.ones((1, n, 3))
    div = jnp.ones((1, n))
    origins = jnp.zeros((1, 3))
    mask = jnp.asarray([[False, True, True, False]])
    a2, t2, p2, d2, v2 = comp.apply_overlap_fix(
        raw_alphas, t, positions, disp, div, origins, mask
    )
    np.testing.assert_allclose(np.asarray(a2[0]), [1.0, -10.0, -10.0, 1.0])
    np.testing.assert_allclose(np.asarray(t2[0]), [1.0, 0.0, 0.0, 4.0])
    np.testing.assert_allclose(np.asarray(p2[0, 1]), [0.0, 0.0, 0.0])
    np.testing.assert_allclose(np.asarray(p2[0, 0]), [7.0, 7.0, 7.0])
    np.testing.assert_allclose(np.asarray(d2[0, 2]), [0.0, 0.0, 0.0])


def test_integration_matches_nerf_oracle(rng):
    """Full pipeline vs a tiny NumPy implementation of classic NeRF compositing."""
    n = 16
    t = np.sort(rng.uniform(1.0, 5.0, size=(3, n)).astype(np.float32), axis=-1)
    raw_a = rng.normal(size=(3, n)).astype(np.float32)
    feats = rng.normal(size=(3, n, 4)).astype(np.float32)
    dirs = rng.normal(size=(3, 3)).astype(np.float32)

    out = comp.integrate(
        jnp.asarray(feats), jnp.asarray(raw_a), jnp.asarray(dirs), jnp.asarray(t),
        jnp.zeros((3, n, 3)), jnp.zeros((3, n)), perturb=False,
    )

    # NumPy oracle
    deltas = np.concatenate([t[:, 1:] - t[:, :-1], np.full((3, 1), 1e10, np.float32)], -1)
    deltas = deltas * np.linalg.norm(dirs, axis=-1, keepdims=True)
    alpha = 1.0 - np.exp(-np.maximum(raw_a, 0.0) * deltas)
    trans = np.cumprod(
        np.concatenate([np.ones((3, 1), np.float32), 1.0 - alpha[:, :-1] + 1e-10], -1), -1
    )
    w = alpha * trans
    expected_rgb = (w[..., None] * feats).sum(-2)
    np.testing.assert_allclose(np.asarray(out["integrated_features"]), expected_rgb, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["weights"]), w, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["depth"]), (w * t).sum(-1), atol=1e-4)


def test_sortfree_compose_matches_sorted(rng):
    """compose_integrate_sortfree must equal compose_objects + integrate."""
    import jax.numpy as jnp

    R = 5
    sizes = (4, 7, 3)
    all_t, all_a, all_f, all_d, all_v = [], [], [], [], []
    for k, s in enumerate(sizes):
        t = np.sort(rng.uniform(0.5, 9.0, size=(R, s)).astype(np.float32), axis=-1)
        all_t.append(jnp.asarray(t))
        all_a.append(jnp.asarray(rng.normal(size=(R, s)).astype(np.float32)))
        all_f.append(jnp.asarray(rng.normal(size=(R, s, 6)).astype(np.float32)))
        all_d.append(jnp.asarray(rng.normal(size=(R, s, 3)).astype(np.float32)))
        all_v.append(jnp.asarray(rng.normal(size=(R, s)).astype(np.float32)))
    directions = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))

    f, a, t, p, d, v = comp.compose_objects(all_f, all_a, all_t, all_d, all_d, all_v)
    expected = comp.integrate(f, a, directions, t, d, v, perturb=False)

    got = comp.compose_integrate_sortfree(
        all_f, all_a, all_t, directions, all_d, all_v, perturb=False
    )
    for field in ("integrated_features", "opacity", "depth", "disparity",
                  "integrated_divergence", "integrated_displacements_magnitude"):
        np.testing.assert_allclose(
            np.asarray(got[field]), np.asarray(expected[field]),
            atol=1e-4, rtol=1e-4, err_msg=field,
        )
    # Weight sums match even though orderings differ.
    np.testing.assert_allclose(
        np.asarray(got["weights"].sum(-1)), np.asarray(expected["weights"].sum(-1)),
        atol=1e-4,
    )


def test_sortfree_matches_sorted_on_exact_ties(rng):
    """Exact t ties (common in eval: perturb=False midpoints of objects
    sharing a z-range) must resolve like the stable concat sort."""
    import jax.numpy as jnp

    R = 4
    # Object 1's t grid exactly equals object 0's; object 2 interleaves.
    t0 = np.sort(rng.uniform(1.0, 8.0, size=(R, 5)).astype(np.float32), axis=-1)
    t1 = t0.copy()
    t2 = np.sort(rng.uniform(1.0, 8.0, size=(R, 3)).astype(np.float32), axis=-1)
    t2[:, 1] = t0[:, 2]  # partial cross-object tie too
    t2 = np.sort(t2, axis=-1)  # per-object sortedness is a precondition
    all_t = [jnp.asarray(t0), jnp.asarray(t1), jnp.asarray(t2)]
    all_a, all_f, all_d, all_v = [], [], [], []
    for t in all_t:
        s = t.shape[-1]
        all_a.append(jnp.asarray(rng.normal(size=(R, s)).astype(np.float32)))
        all_f.append(jnp.asarray(rng.normal(size=(R, s, 6)).astype(np.float32)))
        all_d.append(jnp.asarray(rng.normal(size=(R, s, 3)).astype(np.float32)))
        all_v.append(jnp.asarray(rng.normal(size=(R, s)).astype(np.float32)))
    directions = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))

    f, a, t, p, d, v = comp.compose_objects(all_f, all_a, all_t, all_d, all_d, all_v)
    expected = comp.integrate(f, a, directions, t, d, v, perturb=False)
    got = comp.compose_integrate_sortfree(
        all_f, all_a, all_t, directions, all_d, all_v, perturb=False
    )
    for field in ("integrated_features", "opacity", "depth"):
        np.testing.assert_allclose(
            np.asarray(got[field]), np.asarray(expected[field]),
            atol=1e-4, rtol=1e-4, err_msg=field,
        )


def test_sortfree_gradients_flow(rng):
    import jax
    import jax.numpy as jnp

    t1 = jnp.asarray(np.sort(rng.uniform(1, 5, (2, 4)).astype(np.float32), -1))
    t2 = jnp.asarray(np.sort(rng.uniform(1, 5, (2, 6)).astype(np.float32), -1))
    a1 = jnp.asarray(rng.normal(size=(2, 4)).astype(np.float32))
    a2 = jnp.asarray(rng.normal(size=(2, 6)).astype(np.float32))
    f1 = jnp.asarray(rng.normal(size=(2, 4, 3)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(2, 6, 3)).astype(np.float32))
    dirs = jnp.ones((2, 3))

    def loss(a1_):
        out = comp.compose_integrate_sortfree([f1, f2], [a1_, a2], [t1, t2], dirs)
        return jnp.sum(out["integrated_features"])

    g = jax.grad(loss)(a1)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
