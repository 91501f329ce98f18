"""Roofline certification of the benchmark workloads (docs/PERFORMANCE.md).

For each workload, lower + compile the exact jitted program the benchmark
times and read XLA's own cost analysis of the compiled executable
(`jit(...).lower(...).compile().cost_analysis()`): FLOPs and HBM bytes per
call, the v5e compute/bandwidth rooflines they imply, and — given the
measured time from the matching `bench.py` line — the achieved fraction of
the binding roofline. Prints one JSON line per workload.

Run on the real chip: `python scripts/roofline.py [headline phase1 phase2]`.
The measured times can be passed as `MEASURED_HEADLINE_MS` (per chain
iteration), `MEASURED_PHASE1_MS`, `MEASURED_PHASE2_MS` env vars; defaults
are the r05 canonical session record (docs/bench_r05_session_cold.log).

v5e peaks (public spec): 197 TFLOP/s bf16 (394 with int8; f32 ~49), HBM
819 GB/s.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: shared workload setups)

V5E_BF16_FLOPS = 197e12
V5E_HBM_BYTES = 819e9


def _analyze(name, lowered, calls_per_unit=1.0, measured_ms=None):
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    flops = float(cost.get("flops", 0.0)) * calls_per_unit
    hbm_bytes = float(cost.get("bytes accessed", 0.0)) * calls_per_unit
    compute_ms = flops / V5E_BF16_FLOPS * 1e3
    hbm_ms = hbm_bytes / V5E_HBM_BYTES * 1e3
    bound = "HBM" if hbm_ms >= compute_ms else "compute"
    line = {
        "workload": name,
        "flops": flops,
        "hbm_bytes": hbm_bytes,
        "arithmetic_intensity_flop_per_byte": round(flops / max(hbm_bytes, 1), 1),
        "v5e_compute_roofline_ms": round(compute_ms, 2),
        "v5e_hbm_roofline_ms": round(hbm_ms, 2),
        "binding": bound,
    }
    if measured_ms is not None:
        line["measured_ms"] = measured_ms
        line["achieved_fraction_of_binding_roofline"] = round(
            max(compute_ms, hbm_ms) / measured_ms, 3
        )
    print(json.dumps(line), flush=True)
    return line


def roofline_headline():
    """The headline composed render: fast.render_rays_fast at the published
    tennis scale (16,384 rays, 4 objects, 72 MLP samples/ray) — the exact
    program inside bench_render_headline's chain body."""
    import jax
    import jax.numpy as jnp

    from playableenvironments_tpu.core.transforms3d import (
        euler_translation_to_matrix,
        invert_rigid,
    )
    from playableenvironments_tpu.render import fast
    from playableenvironments_tpu.render.composer import SceneComposer

    scene = bench.build_scene()
    composer = SceneComposer(scene)
    rays = int(os.environ.get("BENCH_RAYS", 16384))
    n_obj = 4
    key = jax.random.PRNGKey(0)
    origins = jnp.asarray([[0.0, -30.0, 10.0]])
    directions = jax.random.normal(key, (1, rays, 3)) * jnp.asarray([0.3, 0.3, 0.05])
    directions = directions + jnp.asarray([0.0, 1.0, -0.15])
    normals = jnp.asarray([[0.0, 1.0, 0.0]])
    rotations = jnp.zeros((1, n_obj, 3))
    translations = (
        jnp.zeros((1, n_obj, 3)).at[:, 2, 1].set(-5.0).at[:, 3, 1].set(-10.0)
    )
    w2o = invert_rigid(euler_translation_to_matrix(rotations, translations))
    style = jnp.ones((1, n_obj, 64)) * 0.1
    deformation = jnp.ones((1, n_obj, 32)) * 0.1
    in_scene = jnp.ones((1, n_obj), dtype=bool)
    variables = jax.jit(composer.init)(
        key, origins, directions[:, :64], normals, w2o, style, deformation,
        in_scene,
    )
    fast_variables = {
        "params": {"composer": variables["params"]},
        "batch_stats": {"composer": variables.get("batch_stats", {})},
    }

    def render(v, dirs):
        out = fast.render_rays_fast(
            scene, v, origins, dirs, normals, w2o, style, deformation, in_scene
        )
        return out["coarse"]["global"]["integrated_features"]

    lowered = jax.jit(render).lower(fast_variables, directions)
    measured = float(os.environ.get("MEASURED_HEADLINE_MS", 5.70))
    return _analyze("headline_render_16384_rays", lowered, measured_ms=measured)


def roofline_interactive():
    """One interactive 512x288 frame (strided grids + decoder, bf16) — the
    exact render inside the fps benchmark's chain body."""
    import jax

    from playableenvironments_tpu.render import fast

    scene, variables, encoding, strides, height, width = (
        bench._interactive_setup()
    )

    def render(v, enc):
        return fast.render_frame_fast(
            scene, v, enc, (height, width), patch_strides=strides
        )

    lowered = jax.jit(render).lower(variables, encoding)
    measured = float(os.environ.get("MEASURED_INTERACTIVE_MS", 4.98))
    return _analyze("interactive_frame_512x288", lowered, measured_ms=measured)


def roofline_phase2():
    """The phase-2 train step at published scale (bs 8 / 4 obs / 144
    rays/img, full losses, Adam) — the exact step bench_train_step chains."""
    import jax

    trainer, state, batch, _ = bench._phase2_setup()
    lowered = jax.jit(trainer.train_step).lower(
        state, batch, jax.random.PRNGKey(0)
    )
    measured = float(os.environ.get("MEASURED_PHASE2_MS", 33.9))
    return _analyze("phase2_train_step", lowered, measured_ms=measured)


def roofline_phase1():
    """The phase-1 VAE step at published scale (bs 20 @ 512x288) — the
    existing PERFORMANCE.md certification, reproducible on demand."""
    import jax

    trainer, state, images = bench._phase1_setup()
    lowered = jax.jit(trainer.train_step).lower(
        state, images, jax.random.PRNGKey(0)
    )
    measured = float(os.environ.get("MEASURED_PHASE1_MS", 200.0))
    return _analyze("phase1_train_step", lowered, measured_ms=measured)


def main():
    bench._enable_compilation_cache()
    which = sys.argv[1:] or ["headline", "interactive", "phase2", "phase1"]
    for name in which:
        {"headline": roofline_headline,
         "interactive": roofline_interactive,
         "phase1": roofline_phase1,
         "phase2": roofline_phase2}[name]()


if __name__ == "__main__":
    main()
