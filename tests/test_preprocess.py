"""Preprocess parity tests: host paths agree with each other and the
device normalize matches the host arithmetic exactly."""

import numpy as np
import pytest
from PIL import Image

from clipx.ops import preprocess as pp


def _photo(w, h, seed=0):
    rng = np.random.RandomState(seed)
    # smooth-ish synthetic image: random low-freq + gradient
    base = rng.randint(0, 255, (8, 8, 3), dtype=np.uint8)
    img = Image.fromarray(base).resize((w, h), Image.BILINEAR)
    return img


def test_pil_resize_crop_shape_landscape():
    out = pp.pil_resize_crop(_photo(640, 480), 224)
    assert out.shape == (224, 224, 3) and out.dtype == np.uint8


def test_pil_resize_crop_shape_portrait():
    out = pp.pil_resize_crop(_photo(300, 777), 224)
    assert out.shape == (224, 224, 3)


def test_pil_resize_crop_upscale_small_image():
    out = pp.pil_resize_crop(_photo(50, 40), 224)
    assert out.shape == (224, 224, 3)


def test_pil_handles_grayscale_and_rgba():
    g = Image.fromarray(np.random.RandomState(0).randint(
        0, 255, (100, 120), dtype=np.uint8), mode="L")
    out = pp.pil_resize_crop(g, 224)
    assert out.shape == (224, 224, 3)
    rgba = Image.fromarray(np.random.RandomState(1).randint(
        0, 255, (100, 120, 4), dtype=np.uint8), mode="RGBA")
    out = pp.pil_resize_crop(rgba, 224)
    assert out.shape == (224, 224, 3)


def test_cv2_close_to_pil():
    img = _photo(640, 427, seed=3)
    a = pp.pil_resize_crop(img, 224).astype(np.float32)
    b = pp.cv2_resize_crop(np.asarray(img.convert("RGB")), 224).astype(np.float32)
    # different antialias kernels; mean abs error stays small on smooth images
    assert np.abs(a - b).mean() < 8.0


def test_normalize_batch_matches_host():
    rng = np.random.RandomState(4)
    batch = rng.randint(0, 256, (2, 16, 16, 3), dtype=np.uint8)
    dev = np.asarray(pp.normalize_batch(batch))
    host = pp.normalize_host(batch)
    np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-5)


def test_device_resize_normalize_identity_size():
    """When the canvas is already the target size, the device path reduces
    to plain normalization."""
    rng = np.random.RandomState(5)
    batch = rng.randint(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    out = np.asarray(pp.device_resize_normalize(batch, size=32))
    np.testing.assert_allclose(out, pp.normalize_host(batch),
                               rtol=1e-4, atol=1e-4)


def test_device_resize_normalize_downscale_close_to_pil():
    img = _photo(256, 256, seed=6)
    canvas = np.asarray(img.convert("RGB"))[None]
    dev = np.asarray(pp.device_resize_normalize(canvas, size=64))[0]
    pil = pp.normalize_host(
        np.asarray(img.resize((64, 64), Image.BICUBIC), dtype=np.uint8))
    # antialiased bicubic on device vs PIL: close but not bit-equal
    assert np.abs(dev - pil).mean() < 0.12


def test_resize_shape_semantics():
    assert pp._resize_shape(640, 480, 224) == (298, 224)
    assert pp._resize_shape(480, 640, 224) == (224, 298)
    assert pp._resize_shape(224, 224, 224) == (224, 224)


def test_pil_rgb_conversion_after_resize_crop():
    """Operator order parity: the reference transform converts to RGB
    AFTER Resize + CenterCrop (clip.load's torchvision pipeline), so
    palette inputs resample in their native mode first."""
    rng = np.random.RandomState(7)
    pal = Image.fromarray(rng.randint(0, 16, (100, 130), dtype=np.uint8),
                          mode="P")
    pal.putpalette(rng.randint(0, 255, (768,), dtype=np.uint8).tolist())
    out = pp.pil_resize_crop(pal, 64)
    nw, nh = pp._resize_shape(130, 100, 64)
    ref = pal.resize((nw, nh), Image.BICUBIC)
    left = int(round((nw - 64) / 2.0))
    top = int(round((nh - 64) / 2.0))
    ref = np.asarray(ref.crop((left, top, left + 64, top + 64))
                     .convert("RGB"))
    np.testing.assert_array_equal(out, ref)
    # the two orders genuinely differ on palette inputs, so this pins
    # the reference's order rather than an arbitrary one
    alt = pal.convert("RGB").resize((nw, nh), Image.BICUBIC)
    alt = np.asarray(alt.crop((left, top, left + 64, top + 64)))
    assert np.abs(out.astype(int) - alt.astype(int)).max() > 0


def test_device_preprocess_rejects_non_square_canvas():
    """A plain resize on a non-square canvas silently distorts aspect
    ratio — the square-canvas contract is enforced at trace time."""
    from clipx.ops.preprocess import device_resize_normalize

    batch = np.zeros((2, 256, 320, 3), np.uint8)
    with pytest.raises(ValueError, match="square canvas"):
        device_resize_normalize(batch, 224)
