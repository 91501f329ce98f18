"""Native C++ frame loader: decode parity vs PIL, batch decode, resize
semantics, and dataset integration (native path == PIL fallback path)."""

import os

import numpy as np
import pytest

from playableenvironments_tpu.data import native_loader


def _write_png(path, rng, h=20, w=30):
    from PIL import Image

    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    Image.fromarray(arr).save(path)
    return arr


@pytest.fixture(scope="module")
def native_available():
    if not native_loader.available():
        pytest.skip("native loader not buildable in this environment")
    return True


def test_png_size_and_exact_decode(tmp_path, rng, native_available):
    path = str(tmp_path / "img.png")
    arr = _write_png(path, rng)
    assert native_loader.png_size(path) == (20, 30)
    out = native_loader.decode(path)
    np.testing.assert_allclose(out, arr.astype(np.float32) / 255.0, atol=1e-7)


def test_decode_matches_pil_on_palette_and_gray(tmp_path, rng, native_available):
    from PIL import Image

    gray = rng.integers(0, 256, size=(12, 17), dtype=np.uint8)
    gpath = str(tmp_path / "gray.png")
    Image.fromarray(gray, mode="L").save(gpath)
    out = native_loader.decode(gpath)
    expected = np.repeat(gray[..., None], 3, -1).astype(np.float32) / 255.0
    np.testing.assert_allclose(out, expected, atol=1e-7)

    rgba = rng.integers(0, 256, size=(8, 9, 4), dtype=np.uint8)
    apath = str(tmp_path / "rgba.png")
    Image.fromarray(rgba, mode="RGBA").save(apath)
    out = native_loader.decode(apath)
    np.testing.assert_allclose(
        out, rgba[..., :3].astype(np.float32) / 255.0, atol=1e-7
    )


def test_batch_decode_matches_single(tmp_path, rng, native_available):
    paths = []
    for i in range(7):
        p = str(tmp_path / f"{i}.png")
        _write_png(p, rng, h=16, w=24)
        paths.append(p)
    batch = native_loader.decode_batch(paths, (16, 24), threads=4)
    assert batch.shape == (7, 16, 24, 3)
    for i, p in enumerate(paths):
        np.testing.assert_allclose(batch[i], native_loader.decode(p), atol=1e-7)


def test_resize_matches_jax_bilinear(tmp_path, rng, native_available):
    import jax
    import jax.numpy as jnp

    path = str(tmp_path / "img.png")
    arr = _write_png(path, rng, h=32, w=48)
    out = native_loader.decode(path, target_size=(16, 24))
    expected = jax.image.resize(
        jnp.asarray(arr, jnp.float32) / 255.0, (16, 24, 3), method="bilinear"
    )
    np.testing.assert_allclose(out, np.asarray(expected), atol=2e-3)


def test_missing_file_raises(native_available):
    with pytest.raises(IOError):
        native_loader.decode("/nonexistent/file.png", target_size=(4, 4))


def test_dataset_native_matches_fallback(tmp_path, rng, native_available, monkeypatch):
    from playableenvironments_tpu.data.dataset import MulticameraVideoDataset
    from playableenvironments_tpu.data.synthetic import make_synthetic_dataset

    root = make_synthetic_dataset(
        str(tmp_path), videos=1, frames=6, height=16, width=24
    )
    test_dir = os.path.join(root, "test")

    ds = MulticameraVideoDataset(test_dir, observations_count=2,
                                 observation_stacking=2)
    sample_native = ds[0]
    assert sample_native["observations"].dtype == np.float32

    monkeypatch.setattr(native_loader, "available", lambda: False)
    sample_pil = ds[0]
    np.testing.assert_allclose(
        sample_native["observations"], sample_pil["observations"], atol=1e-6
    )
    np.testing.assert_array_equal(
        sample_native["bounding_boxes"], sample_pil["bounding_boxes"]
    )


def test_dataset_native_matches_fallback_with_resize(
    tmp_path, rng, native_available, monkeypatch
):
    """Resized path: native bilinear vs PIL bilinear agree loosely (different
    filter conventions), and shapes match exactly."""
    from playableenvironments_tpu.data.dataset import MulticameraVideoDataset
    from playableenvironments_tpu.data.synthetic import make_synthetic_dataset

    root = make_synthetic_dataset(
        str(tmp_path), videos=1, frames=4, height=32, width=48
    )
    ds = MulticameraVideoDataset(
        os.path.join(root, "test"), observations_count=1, target_size=(16, 24)
    )
    native = ds[0]["observations"]
    assert native.shape[-3:-1] == (16, 24)
    monkeypatch.setattr(native_loader, "available", lambda: False)
    pil = ds[0]["observations"]
    assert np.abs(native - pil).mean() < 0.05


def test_native_encode_roundtrip(tmp_path):
    """pe_encode_png(_batch): f32 RGB -> PNG -> decode matches to 8-bit
    quantization, and PIL reads the files identically."""
    from playableenvironments_tpu.data import native_loader

    if not native_loader.available():
        pytest.skip("native library not buildable here")
    rng = np.random.default_rng(0)
    frames = rng.random((3, 10, 14, 3)).astype(np.float32)
    paths = [str(tmp_path / f"{i}.png") for i in range(3)]
    native_loader.encode_batch(paths, frames)
    back = native_loader.decode_batch(paths, (10, 14))
    assert float(np.max(np.abs(back - frames))) <= 0.5 / 255.0 + 1e-6

    from PIL import Image

    pil = np.asarray(Image.open(paths[1]).convert("RGB"), np.float32) / 255.0
    np.testing.assert_allclose(pil, back[1], atol=1e-6)

    single = str(tmp_path / "one.png")
    native_loader.encode(single, frames[0])
    np.testing.assert_allclose(
        native_loader.decode(single), back[0], atol=1e-6
    )
