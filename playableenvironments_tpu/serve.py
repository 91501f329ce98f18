"""Serving exports: serialized, versioned render/dynamics artifacts.

`jax.export` serializes the traced StableHLO of a jitted function together
with its input/output trees, so a deployment process can serve frames
WITHOUT the model code — only jax and this loader module (for the
SceneEncoding pytree) are needed, and the artifact is stable against
refactors of the Python model classes. This is the framework's deployment
story beyond the reference (which serves by running the full torch codebase;
play.py is its only "serving" surface).

Artifacts are single files: a 4-byte little-endian header-length prefix, a
JSON header (format version, shapes, platforms), then the serialized
exported function. Cross-platform: pass platforms=("tpu",) on a CPU machine
to lower for TPU chips (compilation happens at load time on the target).

Typical flow::

    from playableenvironments_tpu import serve
    serve.export_renderer(renderer, encoding_example, "renderer.pexp",
                          platforms=("tpu",))
    # ... on the serving host:
    render = serve.load_artifact("renderer.pexp")
    frames = render(encoding)          # (B, T, C, H, W, 3) in [0, 1]
"""

from __future__ import annotations

import json
import struct
from typing import Callable, Sequence

import jax
from jax import export as jax_export

FORMAT_VERSION = 1

# Register the library's pytree containers for export serialization (their
# treedefs ride inside the artifact). SceneEncoding is a flax.struct
# dataclass whose auxdata is the empty tuple — nothing to serialize.
from playableenvironments_tpu.scene.encoding import SceneEncoding  # noqa: E402

try:
    jax_export.register_pytree_node_serialization(
        SceneEncoding,
        serialized_name="playableenvironments_tpu.SceneEncoding",
        serialize_auxdata=lambda aux: b"",
        deserialize_auxdata=lambda data: (),
    )
except ValueError as _error:
    # Re-imports of THIS class are fine; anything else (e.g. a different
    # class under the same name) must not be silently discarded — it would
    # surface later as an opaque treedef mismatch at artifact load.
    if "Duplicate serialization registration" not in str(_error):
        raise


def _wrap(serialized: bytes, header: dict) -> bytes:
    head = json.dumps({"format_version": FORMAT_VERSION, **header}).encode()
    return struct.pack("<I", len(head)) + head + serialized


def _unwrap(blob: bytes):
    (head_len,) = struct.unpack("<I", blob[:4])
    header = json.loads(blob[4 : 4 + head_len].decode())
    if header.get("format_version") != FORMAT_VERSION:
        raise ValueError(
            f"unsupported artifact format {header.get('format_version')} "
            f"(this loader supports {FORMAT_VERSION})"
        )
    return header, blob[4 + head_len :]


def export_function(
    fn: Callable,
    example_args: Sequence,
    path: str,
    platforms: Sequence[str] = ("cpu",),
    name: str = "fn",
) -> str:
    """Serialize `jax.jit(fn)(*example_args)`'s program to `path`.

    The exported program is shape-specialized to the example arguments
    (static shapes are the TPU deployment model anyway).
    """
    exported = jax_export.export(jax.jit(fn), platforms=tuple(platforms))(
        *example_args
    )
    blob = _wrap(
        exported.serialize(),
        {
            "name": name,
            "platforms": list(platforms),
            "in_avals": [str(a) for a in exported.in_avals],
            "out_avals": [str(a) for a in exported.out_avals],
        },
    )
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_artifact(path: str) -> Callable:
    """Deserialize an artifact into a callable (compiles on first call for
    the local backend; raises if the backend is not among the artifact's
    platforms)."""
    with open(path, "rb") as f:
        header, serialized = _unwrap(f.read())
    exported = jax_export.deserialize(serialized)

    class _Artifact:
        """Callable wrapper carrying the header metadata."""

        def __init__(self):
            self.header = header
            self.exported = exported

        def __call__(self, *args):
            return exported.call(*args)

    return _Artifact()


def export_renderer(
    renderer,
    encoding_example,
    path: str,
    platforms: Sequence[str] = ("cpu",),
) -> str:
    """Export a FrameRenderer's frame function: SceneEncoding -> frames.

    :param renderer: `eval.creators.FrameRenderer` (fast or slow path).
    :param encoding_example: a SceneEncoding with the serving shapes
        (e.g. `renderer.encode(batch)` on one example batch).
    """
    image_size = renderer.image_size
    if renderer.use_fast:
        # The fused Pallas kernel's lowering is chosen per the artifact's
        # TARGET platform, never the export host's backend: interpret mode
        # (pure-XLA emulation) on CPU, the real Mosaic kernel on TPU. Since
        # that is a trace-time branch, fast-path artifacts are
        # single-platform — export once per target.
        if len(platforms) != 1:
            raise ValueError(
                "fast-path renderer artifacts are single-platform (the "
                "Pallas kernel's lowering differs per platform); export "
                "once per target, or build the FrameRenderer with "
                "use_fast=False for a multi-platform pure-XLA artifact"
            )
        from playableenvironments_tpu.render import fast

        interpret = platforms[0] == "cpu"
        model = renderer.model
        variables = renderer.variables
        patch_strides = renderer.patch_strides

        def render(encoding):
            return fast.render_frame_fast(
                model.scene,
                variables,
                encoding,
                image_size,
                patch_strides=patch_strides,
                focal_length_multiplier=model.focal_length_multiplier,
                interpret=interpret,
            )
    else:
        render = renderer._render_impl

    return export_function(
        render, (encoding_example,), path, platforms,
        name=f"render_{image_size[0]}x{image_size[1]}",
    )


def export_interactive(
    playable_model,
    playable_variables,
    renderer,
    encoding_example,
    path_prefix: str,
    platforms: Sequence[str] = ("cpu",),
) -> dict:
    """Export the FULL interactive loop as three artifacts, so a serving
    host can run playable generation with zero model code:

    - `<prefix>.render.pexp`: SceneEncoding -> frames.
    - `<prefix>.step0.pexp`: (encoding, initial_style, one_hots, variations)
      -> (new_encoding, carries) — the first step after reset (LSTM carries
      initialized from the learnable initial state).
    - `<prefix>.step.pexp`: (encoding, initial_style, carries, one_hots,
      variations) -> (new_encoding, carries) — subsequent steps.

    The serving loop is: reset = slice frame 0, render; then alternate
    step/render feeding carries back in (`action_inputs` shapes the one-hot
    action tensors; the zero-variation convention matches play.py).

    :param encoding_example: a (B, 1, ...) SceneEncoding at serving shapes.
    :return: {"render": path, "step0": path, "step": path}.
    """
    from playableenvironments_tpu.config import ObjectIds
    from playableenvironments_tpu.render.interactive import (
        action_inputs,
        interactive_step,
    )

    dynamic = ObjectIds(playable_model.scene).dynamic_objects_count
    one_hots, variations = action_inputs(playable_model, [0] * dynamic)
    initial_style = encoding_example.object_style

    def step0(encoding, initial_style, one_hots, variations):
        new_encoding, carries = interactive_step(
            playable_model, playable_variables, encoding, initial_style,
            [None] * dynamic, one_hots, variations,
        )
        return new_encoding, tuple(carries)

    def step(encoding, initial_style, carries, one_hots, variations):
        new_encoding, new_carries = interactive_step(
            playable_model, playable_variables, encoding, initial_style,
            list(carries), one_hots, variations,
        )
        return new_encoding, tuple(new_carries)

    carries_example = jax.eval_shape(
        step0, encoding_example, initial_style, one_hots, variations
    )[1]
    carries_example = jax.tree.map(
        lambda s: jax.numpy.zeros(s.shape, s.dtype), carries_example
    )

    paths = {
        "render": export_renderer(
            renderer, encoding_example, f"{path_prefix}.render.pexp", platforms
        ),
        "step0": export_function(
            step0,
            (encoding_example, initial_style, one_hots, variations),
            f"{path_prefix}.step0.pexp",
            platforms,
            name="interactive_step0",
        ),
        "step": export_function(
            step,
            (encoding_example, initial_style, carries_example, one_hots, variations),
            f"{path_prefix}.step.pexp",
            platforms,
            name="interactive_step",
        ),
    }
    return paths
