"""InceptionV3 image network — the FID embedding backbone.

The reference vendors pytorch_fid's InceptionV3 (pytorch_fid/inception.py:322)
for FID. Here the same torchvision architecture is a flax module producing
the 2048-d final-pool features FID uses. `load_inception_params_npz` maps a
user-supplied weight archive (flax-path keys, torch kernel layouts accepted)
into the module; without pretrained weights the metric remains a valid
relative Frechet distance (see eval/distribution_metrics).

Input: (B, H, W, 3) in [0, 1] (299x299 canonical; smaller works, the FID
embedder resizes). Output: (B, 2048) pooled features.

Stem convolutions use VALID padding and in-block convolutions SAME padding,
matching torchvision's geometry so converted weights line up spatially. The
two FID-specific topology patches pytorch_fid applies on top of torchvision
are replicated: in-block average pools exclude padding from the divisor
(count_include_pad=False, inception.py:222,250,283) and Mixed_7c's pool
branch max-pools (FIDInceptionE_2, inception.py:291-318). Both are verified
against an independent plain-torch twin (compat/torch_twins.py) whose
signatures are the shipped goldens.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

Kernel = Union[int, Tuple[int, int]]


class BasicConv(nn.Module):
    features: int
    kernel: Kernel = 1
    strides: int = 1
    padding: str = "SAME"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kernel = (
            (self.kernel, self.kernel)
            if isinstance(self.kernel, int)
            else tuple(self.kernel)
        )
        # precision="highest": on TPU the default f32 conv runs single-pass
        # bf16 (~5e-3 relative error per layer, measured vs a float64
        # oracle), which compounds past 1% over this network's 94 convs —
        # FID embeddings must not depend on the device they ran on.
        x = nn.Conv(
            self.features, kernel, strides=(self.strides, self.strides),
            padding=self.padding, use_bias=False, name="conv",
            precision="highest",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, epsilon=1e-3, name="bn"
        )(x)
        return nn.relu(x)


def _fid_avg_pool(x):
    """3x3/1 SAME average pool EXCLUDING padding from the divisor.

    pytorch_fid patches every in-block torchvision avg pool to
    count_include_pad=False (pytorch_fid/inception.py:222,250,283) to match
    the original TF FID network; edge pixels differ from the plain pool."""
    return nn.avg_pool(
        x, (3, 3), strides=(1, 1), padding="SAME", count_include_pad=False
    )


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x, train=False):
        b0 = BasicConv(64, name="b0")(x, train)
        b1 = BasicConv(48, name="b1a")(x, train)
        b1 = BasicConv(64, 5, name="b1b")(b1, train)
        b2 = BasicConv(64, name="b2a")(x, train)
        b2 = BasicConv(96, 3, name="b2b")(b2, train)
        b2 = BasicConv(96, 3, name="b2c")(b2, train)
        b3 = _fid_avg_pool(x)
        b3 = BasicConv(self.pool_features, name="b3")(b3, train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        b0 = BasicConv(384, 3, strides=2, padding="VALID", name="b0")(x, train)
        b1 = BasicConv(64, name="b1a")(x, train)
        b1 = BasicConv(96, 3, name="b1b")(b1, train)
        b1 = BasicConv(96, 3, strides=2, padding="VALID", name="b1c")(b1, train)
        b2 = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        return jnp.concatenate([b0, b1, b2], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x, train=False):
        c7 = self.channels_7x7
        b0 = BasicConv(192, name="b0")(x, train)
        b1 = BasicConv(c7, name="b1a")(x, train)
        b1 = BasicConv(c7, (1, 7), name="b1b")(b1, train)
        b1 = BasicConv(192, (7, 1), name="b1c")(b1, train)
        b2 = BasicConv(c7, name="b2a")(x, train)
        b2 = BasicConv(c7, (7, 1), name="b2b")(b2, train)
        b2 = BasicConv(c7, (1, 7), name="b2c")(b2, train)
        b2 = BasicConv(c7, (7, 1), name="b2d")(b2, train)
        b2 = BasicConv(192, (1, 7), name="b2e")(b2, train)
        b3 = _fid_avg_pool(x)
        b3 = BasicConv(192, name="b3")(b3, train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        b0 = BasicConv(192, name="b0a")(x, train)
        b0 = BasicConv(320, 3, strides=2, padding="VALID", name="b0b")(b0, train)
        b1 = BasicConv(192, name="b1a")(x, train)
        b1 = BasicConv(192, (1, 7), name="b1b")(b1, train)
        b1 = BasicConv(192, (7, 1), name="b1c")(b1, train)
        b1 = BasicConv(192, 3, strides=2, padding="VALID", name="b1d")(b1, train)
        b2 = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        return jnp.concatenate([b0, b1, b2], axis=-1)


class InceptionE(nn.Module):
    # The FID network's LAST E block (Mixed_7c) max-pools its pool branch
    # where every other block average-pools (pytorch_fid/inception.py:291-318
    # FIDInceptionE_2, matching the original TF graph).
    pool_max: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        b0 = BasicConv(320, name="b0")(x, train)
        b1 = BasicConv(384, name="b1a")(x, train)
        b1 = jnp.concatenate(
            [
                BasicConv(384, (1, 3), name="b1b")(b1, train),
                BasicConv(384, (3, 1), name="b1c")(b1, train),
            ],
            axis=-1,
        )
        b2 = BasicConv(448, name="b2a")(x, train)
        b2 = BasicConv(384, 3, name="b2b")(b2, train)
        b2 = jnp.concatenate(
            [
                BasicConv(384, (1, 3), name="b2c")(b2, train),
                BasicConv(384, (3, 1), name="b2d")(b2, train),
            ],
            axis=-1,
        )
        if self.pool_max:
            b3 = nn.max_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        else:
            b3 = _fid_avg_pool(x)
        b3 = BasicConv(192, name="b3")(b3, train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionV3Features(nn.Module):
    """InceptionV3 up to the 2048-d global average pool (the FID layer)."""

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = images * 2.0 - 1.0  # [0, 1] -> [-1, 1] (pytorch_fid convention)
        x = BasicConv(32, 3, strides=2, padding="VALID", name="Conv2d_1a_3x3")(x, train)
        x = BasicConv(32, 3, padding="VALID", name="Conv2d_2a_3x3")(x, train)
        x = BasicConv(64, 3, name="Conv2d_2b_3x3")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = BasicConv(80, 1, name="Conv2d_3b_1x1")(x, train)
        x = BasicConv(192, 3, padding="VALID", name="Conv2d_4a_3x3")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        x = InceptionA(32, name="Mixed_5b")(x, train)
        x = InceptionA(64, name="Mixed_5c")(x, train)
        x = InceptionA(64, name="Mixed_5d")(x, train)
        x = InceptionB(name="Mixed_6a")(x, train)
        x = InceptionC(128, name="Mixed_6b")(x, train)
        x = InceptionC(160, name="Mixed_6c")(x, train)
        x = InceptionC(160, name="Mixed_6d")(x, train)
        x = InceptionC(192, name="Mixed_6e")(x, train)
        x = InceptionD(name="Mixed_7a")(x, train)
        x = InceptionE(name="Mixed_7b")(x, train)
        x = InceptionE(pool_max=True, name="Mixed_7c")(x, train)
        return jnp.mean(x, axis=(1, 2))  # (B, 2048)


def load_inception_params_npz(path: str) -> Dict:
    """npz archive with flax-path keys ('Mixed_5b/b1a/conv/kernel', ...) ->
    variables dict. Torch (out, in, h, w) conv kernels transpose
    automatically."""
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
        if leaf == "kernel" and value.ndim == 4 and value.shape[0] > value.shape[-2]:
            value = np.transpose(value, (2, 3, 1, 0))  # torch -> flax
        if leaf in ("mean", "var"):
            insert(batch_stats, keys, value)
        else:
            insert(params, keys, value)
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    return variables


def inception_image_embedder(variables: Dict, resize_to: int = 299):
    """Build a FID EmbedFn: images (B, H, W, 3) numpy [0,1] -> (B, 2048)."""
    import jax

    net = InceptionV3Features()

    @jax.jit
    def forward(images):
        b, h, w, c = images.shape
        if (h, w) != (resize_to, resize_to):
            images = jax.image.resize(
                images, (b, resize_to, resize_to, c), method="bilinear"
            )
        return net.apply(variables, images, train=False)

    def fn(images: np.ndarray) -> np.ndarray:
        return np.asarray(forward(jnp.asarray(images, jnp.float32)))

    return fn
