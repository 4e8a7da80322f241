"""Native C++ loader tests: build, decode parity with PIL, batch decode."""

import numpy as np
import pytest
from PIL import Image

from fateavatar_tpu import native


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = {}
    rgb = (rng.random((48, 64, 3)) * 255).astype("uint8")
    Image.fromarray(rgb).save(d / "rgb.png")
    paths["rgb_png"] = (str(d / "rgb.png"), rgb)
    rgba = (rng.random((48, 64, 4)) * 255).astype("uint8")
    Image.fromarray(rgba, "RGBA").save(d / "rgba.png")
    paths["rgba_png"] = (str(d / "rgba.png"), rgba)
    # smooth gradient for the lossy-codec test (JPEG destroys noise)
    y, x = np.mgrid[0:48, 0:64]
    smooth = np.stack([x * 4, y * 5, (x + y) * 2], -1).astype("uint8")
    Image.fromarray(smooth).save(d / "img.jpg", quality=95)
    paths["jpg"] = (str(d / "img.jpg"), smooth)
    return paths


def test_library_builds():
    assert native.available(), "native loader failed to build"


def test_png_rgb_matches_pil(images):
    path, src = images["rgb_png"]
    out, c = native.decode_image(path, 64, 48)  # same size: no resampling
    assert c == 3
    np.testing.assert_allclose(
        out[:, :, :3], src.astype(np.float32) / 255.0, atol=1e-3
    )
    np.testing.assert_allclose(out[:, :, 3], 1.0)  # opaque fill


def test_png_rgba_alpha_preserved(images):
    path, src = images["rgba_png"]
    out, c = native.decode_image(path, 64, 48)
    assert c == 4
    np.testing.assert_allclose(
        out, src.astype(np.float32) / 255.0, atol=1e-3
    )


def test_jpeg_decodes(images):
    path, src = images["jpg"]
    out, c = native.decode_image(path, 64, 48)
    assert c == 3
    # lossy: loose tolerance
    assert np.abs(out[:, :, :3] - src / 255.0).mean() < 0.03


def test_resize_downscale(images):
    path, src = images["rgb_png"]
    out, _ = native.decode_image(path, 32, 24)
    assert out.shape == (24, 32, 4)
    # mean preserved under bilinear downscale
    assert abs(out[:, :, :3].mean() - src.mean() / 255.0) < 0.02


def test_batch_decode(images):
    paths = [images["rgb_png"][0], images["rgba_png"][0], images["jpg"][0]]
    out, channels = native.decode_batch(paths, 32, 32, nthreads=3)
    assert out.shape == (3, 32, 32, 4)
    assert list(channels) == [3, 4, 3]


def test_missing_file_fails_gracefully(images):
    assert native.decode_image("/nonexistent/x.png", 8, 8) is None


def test_dataset_load_rgb_uses_native(images, monkeypatch):
    from fateavatar_tpu.train import datasets

    path, src = images["rgba_png"]
    rgb, alpha = datasets.load_rgb(path, (64, 48), bg_color="black",
                                   return_alpha=True)
    assert rgb.shape == (48, 64, 3)
    assert alpha.shape == (48, 64, 1)
    expected = (src[:, :, :3] / 255.0) * (src[:, :, 3:4] / 255.0)
    np.testing.assert_allclose(rgb, expected, atol=2e-2)
