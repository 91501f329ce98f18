"""Space-to-depth convolution: stride-1 VALID conv with few output channels
restructured so the MXU sees a full lane dimension.

A direct NHWC conv with `cout` output features uses `cout` of the MXU's 128
lanes — the decoder's final 7x7x16->3 RGB conv (reference decoder_v6.py:69-73)
runs at <1% FLOP utilization and dominates the interactive frame time (1.2 ms
of a 6.7 ms frame, profiled on v5e). Folding a width-block of B output
positions into the channel dimension turns it into a (kh, 2) conv with
B*cin inputs and B*cout outputs: identical arithmetic, N = B*cout lanes.

out[n, y, B*g + dx, c]
  = sum_{ky, kx, ic} w[ky, kx, ic, c] * x[n, y+ky, B*g + dx + kx, ic]

With the input width padded to blocks of B, the receptive field of output
group g spans input groups {g, g+1} whenever B >= kw - 1, so the folded
kernel has width 2 over the group axis; the (dx + kx) -> (group, offset)
unfolding is a constant one-hot tensor contracted into the weights.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def fold_kernel(kernel: jnp.ndarray, block: int) -> jnp.ndarray:
    """Fold a (kh, kw, cin, cout) stride-1 kernel into its space-to-depth
    equivalent (kh, 2, block*cin, block*cout) for width-block `block`.

    :param kernel: (kh, kw, cin, cout) conv kernel.
    :param block: output positions folded per group; must satisfy
        block >= kw - 1 (receptive field spans at most two groups).
    """
    kh, kw, cin, cout = kernel.shape
    if block < kw - 1:
        raise ValueError(f"block {block} must be >= kw - 1 = {kw - 1}")
    # T[kx, dx, kg, ox] = 1 where (kg, ox) = divmod(dx + kx, block).
    unfold = np.zeros((kw, block, 2, block), kernel.dtype)
    for kx in range(kw):
        for dx in range(block):
            kg, ox = divmod(dx + kx, block)
            unfold[kx, dx, kg, ox] = 1.0
    folded = jnp.einsum(
        "ykic,kdgo->ygoidc", kernel, jnp.asarray(unfold)
    )  # (kh, 2, ox, cin, dx, cout)
    return folded.reshape(kh, 2, block * cin, block * cout)


def conv_s2d(
    x: jnp.ndarray, kernel: jnp.ndarray, block: int
) -> jnp.ndarray:
    """Stride-1 VALID NHWC convolution via width space-to-depth.

    Matches jax.lax.conv_general_dilated(x, kernel, (1, 1), "VALID") with
    NHWC/HWIO dimension numbers (up to float summation order).

    :param x: (n, h_in, w_in, cin).
    :param kernel: (kh, kw, cin, cout).
    :param block: width positions per folded group (>= kw - 1); pick so
        block * cout approaches 128 (the MXU lane count).
    """
    n, h_in, w_in, cin = x.shape
    kh, kw, _, cout = kernel.shape
    h_out = h_in - kh + 1
    w_out = w_in - kw + 1
    groups_out = -(-w_out // block)
    # Input groups g..g+1 for every output group: pad to groups_out + 1.
    pad_w = (groups_out + 1) * block - w_in
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, pad_w), (0, 0)))
    xs = xp.reshape(n, h_in, groups_out + 1, block * cin)
    folded = fold_kernel(kernel, block)
    y = jax.lax.conv_general_dilated(
        xs,
        folded,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (n, h_out, groups_out, block*cout); like nn.Conv, accumulation is
    # fp32 on the MXU and the stored element type follows the inputs — no
    # preferred_element_type, so the op is differentiable (the transpose
    # rule requires matching operand/cotangent dtypes).
    y = y.reshape(n, h_out, groups_out * block, cout)[:, :, :w_out]
    return y.astype(x.dtype)
