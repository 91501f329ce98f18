"""I3D (Inflated Inception-V1) video network — the FVD embedding backbone.

The reference computes FVD with a TensorFlow-1-hub I3D graph
(evaluation/metrics/fvd.py:32-34). Here the same architecture (Carreira &
Zisserman, "Quo Vadis", CVPR 2017 — the Kinetics-400 RGB stream) is a flax
module so the whole metric runs in JAX; `load_i3d_params_npz` maps a
user-supplied weight archive into the module tree (pretrained weights cannot
be fetched in a zero-egress build, so parity with published FVD numbers
requires supplying them; with random weights the metric is still a valid
relative Frechet distance).

Input: (B, T, H, W, 3) videos in [0, 1], T >= 9, H = W = 224 canonical
(any size >= 32 works). Output: (B, 400) logits — the embedding FVD uses.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class Unit3D(nn.Module):
    """Conv3D + BatchNorm(no scale) + ReLU, the I3D building block."""

    features: int
    kernel: Tuple[int, int, int] = (1, 1, 1)
    strides: Tuple[int, int, int] = (1, 1, 1)
    use_relu: bool = True
    use_bn: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # precision="highest" for device-independent FVD embeddings (the
        # TPU default single-pass-bf16 conv compounds past tolerance over
        # 57 units; see eval/inception_v3.py BasicConv).
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides, padding="SAME",
            use_bias=not self.use_bn, name="conv", precision="highest",
        )(x)
        if self.use_bn:
            # epsilon pinned to the released Kinetics graph: kinetics-i3d's
            # Unit3D normalizes with tf.contrib.layers.batch_norm, whose
            # default epsilon is 1e-3 (not flax's 1e-5) — with pretrained
            # moving variances of O(1e-2) the difference is visible in FVD.
            x = nn.BatchNorm(
                use_running_average=not train, use_scale=False,
                epsilon=1e-3, name="bn",
            )(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


class InceptionBlock3D(nn.Module):
    """Four-branch 3D inception module: 1x1 / 1x1->3x3 / 1x1->3x3 /
    maxpool->1x1 (GoogLeNet inflated to 3D)."""

    b0: int
    b1: Tuple[int, int]
    b2: Tuple[int, int]
    b3: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        branch0 = Unit3D(self.b0, name="b0")(x, train)
        branch1 = Unit3D(self.b1[0], name="b1a")(x, train)
        branch1 = Unit3D(self.b1[1], (3, 3, 3), name="b1b")(branch1, train)
        branch2 = Unit3D(self.b2[0], name="b2a")(x, train)
        branch2 = Unit3D(self.b2[1], (3, 3, 3), name="b2b")(branch2, train)
        branch3 = nn.max_pool(
            x, (3, 3, 3), strides=(1, 1, 1), padding="SAME"
        )
        branch3 = Unit3D(self.b3, name="b3")(branch3, train)
        return jnp.concatenate([branch0, branch1, branch2, branch3], axis=-1)


# (name, spec) per the I3D paper / released checkpoint.
INCEPTION_SPECS = (
    ("Mixed_3b", dict(b0=64, b1=(96, 128), b2=(16, 32), b3=32)),
    ("Mixed_3c", dict(b0=128, b1=(128, 192), b2=(32, 96), b3=64)),
    ("Mixed_4b", dict(b0=192, b1=(96, 208), b2=(16, 48), b3=64)),
    ("Mixed_4c", dict(b0=160, b1=(112, 224), b2=(24, 64), b3=64)),
    ("Mixed_4d", dict(b0=128, b1=(128, 256), b2=(24, 64), b3=64)),
    ("Mixed_4e", dict(b0=112, b1=(144, 288), b2=(32, 64), b3=64)),
    ("Mixed_4f", dict(b0=256, b1=(160, 320), b2=(32, 128), b3=128)),
    ("Mixed_5b", dict(b0=256, b1=(160, 320), b2=(32, 128), b3=128)),
    ("Mixed_5c", dict(b0=384, b1=(192, 384), b2=(48, 128), b3=128)),
)


class I3D(nn.Module):
    """The RGB I3D classifier; `__call__` returns the 400-way logits."""

    num_classes: int = 400

    @nn.compact
    def __call__(self, videos: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """:param videos: (B, T, H, W, 3) in [0, 1] (rescaled to [-1, 1]
        internally, the released checkpoint's convention)."""
        x = videos * 2.0 - 1.0
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), name="Conv3d_1a_7x7")(x, train)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        x = Unit3D(64, name="Conv3d_2b_1x1")(x, train)
        x = Unit3D(192, (3, 3, 3), name="Conv3d_2c_3x3")(x, train)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding="SAME")

        for name, spec in INCEPTION_SPECS[:2]:
            x = InceptionBlock3D(**spec, name=name)(x, train)
        x = nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2), padding="SAME")
        for name, spec in INCEPTION_SPECS[2:7]:
            x = InceptionBlock3D(**spec, name=name)(x, train)
        x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2), padding="SAME")
        for name, spec in INCEPTION_SPECS[7:]:
            x = InceptionBlock3D(**spec, name=name)(x, train)

        x = jnp.mean(x, axis=(1, 2, 3))  # global spatiotemporal average pool
        logits = nn.Dense(self.num_classes, name="logits", precision="highest")(x)
        return logits


def load_i3d_params_npz(path: str) -> Dict:
    """Load I3D parameters from an npz archive with flax-path keys:
    'Conv3d_1a_7x7/conv/kernel', 'Mixed_3b/b1a/bn/bias', 'logits/kernel', ...
    Conv kernels are (t, h, w, in, out); a (out, in, t, h, w) torch layout is
    transposed automatically. Returns a {"params": ..., "batch_stats": ...}
    variables dict for I3D.apply."""
    archive = np.load(path)
    params: Dict = {}
    batch_stats: Dict = {}

    def insert(tree, keys, value):
        node = tree
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = jnp.asarray(value)

    for full_key in archive.files:
        value = archive[full_key]
        keys = full_key.split("/")
        leaf = keys[-1]
        if leaf == "kernel" and value.ndim == 5 and value.shape[0] > value.shape[-1]:
            value = np.transpose(value, (2, 3, 4, 1, 0))  # torch -> flax
        if leaf in ("mean", "var"):
            insert(batch_stats, keys, value)
        else:
            insert(params, keys, value)
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    return variables


def i3d_video_embedder(variables: Dict, resize_to: int = 224):
    """Build an FVD EmbedFn from I3D variables (see distribution_metrics).

    :param variables: from `I3D.init` or `load_i3d_params_npz`.
    :return: videos (B, T, H, W, 3) numpy in [0,1] -> (B, 400) numpy logits.
    """
    import jax

    net = I3D()

    @jax.jit
    def forward(videos):
        b, t, h, w, c = videos.shape
        if (h, w) != (resize_to, resize_to):
            videos = jax.image.resize(
                videos, (b, t, resize_to, resize_to, c), method="bilinear"
            )
        return net.apply(variables, videos, train=False)

    def fn(videos: np.ndarray) -> np.ndarray:
        return np.asarray(forward(jnp.asarray(videos, jnp.float32)))

    return fn
