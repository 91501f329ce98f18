"""Reflect padding with a strip-wise backward.

`jnp.pad(mode="reflect")` lowers the forward as flips + concatenate, whose
autodiff transpose materializes full-tensor scatter-adds (`add_any`) — at
phase-1 scale (bs 20 @ 512x288) the pad backwards alone cost ~24 ms/step on
v5e, rivaling the convs they feed. The reflect-pad cotangent is just the
center slice plus p-row/column flipped strips added at the borders, so the
custom VJP does one slice copy and four tiny `.at[].add` strip updates.

Semantics match `jnp.pad(x, ((0,0),(p,p),(p,p),(0,0)), mode="reflect")`
(reference models pad with torch padding_mode="reflect",
model/autoencoder_models/layers/cyclegan_resnet_block.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _reflect_pad_axis(x: jnp.ndarray, pad: int, axis: int) -> jnp.ndarray:
    widths = [(0, 0)] * x.ndim
    widths[axis] = (pad, pad)
    return jnp.pad(x, widths, mode="reflect")


def _reflect_pad_axis_fwd(x, pad, axis):
    return _reflect_pad_axis(x, pad, axis), None


def _take(g, sl, axis):
    index = [slice(None)] * g.ndim
    index[axis] = sl
    return g[tuple(index)]


def _reflect_pad_axis_bwd(pad, axis, _, g):
    # Cotangent of x: the center slice of g, with the flipped pad strips
    # added to rows 1..p and -p-1..-1. Assembled as one concatenate of g
    # slices (+ two p-row adds) rather than `.at[].add`, which would lower
    # as a full-tensor copy + scatter; this form is a single fused write.
    p = pad
    h = g.shape[axis] - 2 * p
    if h < 2 * p + 2:
        # The strip decomposition needs the lo/hi strips disjoint from the
        # first/last rows and each other (h >= 2p+2). Tiny axes (test-size
        # feature maps) take a generic scatter-add over the reflect index
        # map instead — negligible at these sizes.
        idx = np.abs(np.arange(-p, h + p)) % max(2 * h - 2, 1)
        idx = np.where(idx >= h, 2 * h - 2 - idx, idx)
        gm = jnp.moveaxis(g, axis, 0)
        out = jnp.zeros((h,) + gm.shape[1:], g.dtype).at[idx].add(gm)
        return (jnp.moveaxis(out, 0, axis),)
    first = _take(g, slice(p, p + 1), axis)
    lo = _take(g, slice(p + 1, 2 * p + 1), axis) + jnp.flip(
        _take(g, slice(0, p), axis), axis=axis
    )
    mid = _take(g, slice(2 * p + 1, -2 * p - 1), axis)
    hi = _take(g, slice(-2 * p - 1, -p - 1), axis) + jnp.flip(
        _take(g, slice(-p, None), axis), axis=axis
    )
    last = _take(g, slice(-p - 1, -p), axis)
    return (jnp.concatenate([first, lo, mid, hi, last], axis=axis),)


_reflect_pad_axis.defvjp(_reflect_pad_axis_fwd, _reflect_pad_axis_bwd)


def reflect_pad_hw(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Reflect-pad the H and W axes of an (N, H, W, C) tensor by `pad`."""
    if pad == 0:
        return x
    return _reflect_pad_axis(_reflect_pad_axis(x, pad, 1), pad, 2)
