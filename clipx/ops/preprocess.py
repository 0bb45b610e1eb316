"""Image preprocessing: the CLIP transform, host and device variants.

The reference applies OpenAI CLIP's torchvision pipeline per image
(reference:build-index.py:47-48): ``Resize(224, BICUBIC)`` (shorter side)
-> ``CenterCrop(224)`` -> RGB -> ``ToTensor`` -> ``Normalize(mean, std)``
with the constants pinned in clipx.config (SURVEY.md section 2b D1p).

Three interchangeable stages here:

- ``pil_resize_crop``    — bit-parity host path: PIL antialiased bicubic
                           shorter-side resize + center crop, identical
                           arithmetic to torchvision's (the parity
                           reference for embedding-tolerance budgets).
- ``cv2_resize_crop``    — fast host path (SIMD C++): INTER_AREA for
                           downscale / INTER_CUBIC for upscale. Within
                           ~1% pixel error of PIL; used by the streaming
                           indexer where decode throughput matters.
- ``normalize_batch``    — the device stage: uint8 NHWC batch ->
                           mean/std-normalized float, fused by XLA into
                           the encoder's first matmul.
- ``device_resize_normalize`` — fully on-device variant for fixed-size
                           canvases: antialiased bicubic resize + center
                           crop + normalize under jit (the TPU does the
                           resample on the VPU; the host only decodes).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


# ---------------------------------------------------------------------------
# host paths
# ---------------------------------------------------------------------------

def _resize_shape(w: int, h: int, target: int) -> Tuple[int, int]:
    """torchvision Resize(int) semantics: shorter side -> target."""
    if w <= h:
        return target, max(target, int(target * h / w))
    return max(target, int(target * w / h)), target


def pil_resize_crop(img, size: int = 224) -> np.ndarray:
    """PIL path, arithmetic-identical to the reference transform.

    Accepts a PIL.Image, returns (size, size, 3) uint8 RGB. Operator
    order matches CLIP's torchvision pipeline exactly — Resize ->
    CenterCrop -> *then* convert-to-RGB — so palette/RGBA/grayscale
    inputs resample in their native mode first, as the reference does
    (reference:build-index.py:48; the transform built by clip.load).
    """
    from PIL import Image

    w, h = img.size
    nw, nh = _resize_shape(w, h, size)
    img = img.resize((nw, nh), Image.BICUBIC)  # PIL bicubic is antialiased
    left = int(round((nw - size) / 2.0))
    top = int(round((nh - size) / 2.0))
    img = img.crop((left, top, left + size, top + size))
    if img.mode != "RGB":
        img = img.convert("RGB")
    return np.asarray(img, dtype=np.uint8)


def cv2_resize_crop(rgb: np.ndarray, size: int = 224) -> np.ndarray:
    """Fast host path over an RGB uint8 HWC array (e.g. from cv2.imdecode)."""
    import cv2

    h, w = rgb.shape[:2]
    nw, nh = _resize_shape(w, h, size)
    interp = cv2.INTER_AREA if (nw < w or nh < h) else cv2.INTER_CUBIC
    rgb = cv2.resize(rgb, (nw, nh), interpolation=interp)
    left = int(round((nw - size) / 2.0))
    top = int(round((nh - size) / 2.0))
    return rgb[top: top + size, left: left + size]


# ---------------------------------------------------------------------------
# device paths
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("dtype",))
def normalize_batch(batch_uint8: jax.Array, dtype=jnp.float32) -> jax.Array:
    """(B, S, S, 3) uint8 -> normalized float NHWC. XLA fuses the whole
    elementwise chain into the consumer (the patch-embed matmul)."""
    mean = jnp.asarray(CLIP_MEAN, jnp.float32) * 255.0
    # fold /255 and /std into one multiplier: (x - 255 mean) * 1/(255 std)
    inv = 1.0 / (jnp.asarray(CLIP_STD, jnp.float32) * 255.0)
    x = batch_uint8.astype(jnp.float32)
    return ((x - mean) * inv).astype(dtype)


@functools.partial(jax.jit, static_argnames=("size", "dtype"))
def device_resize_normalize(batch_uint8: jax.Array, size: int = 224,
                            dtype=jnp.float32) -> jax.Array:
    """Fixed-canvas device preprocessing: (B, H, W, 3) uint8 with H == W
    -> antialiased bicubic resize to (size, size) -> normalize.

    For square canvases shorter-side-resize + center-crop degenerates to a
    plain resize, so the host can decode to any square canvas (e.g.
    256x256) and leave the resample to the TPU.
    """
    b, h, w, c = batch_uint8.shape
    if h != w:
        # a plain resize on a non-square canvas would silently distort
        # aspect ratio; the shorter-side+center-crop contract only
        # degenerates to resize for squares (caught at trace time)
        raise ValueError(f"device preprocess requires a square canvas, "
                         f"got {h}x{w}")
    x = batch_uint8.astype(jnp.float32)
    x = jax.image.resize(x, (b, size, size, c), method="bicubic",
                         antialias=True)
    x = jnp.clip(x, 0.0, 255.0)
    mean = jnp.asarray(CLIP_MEAN, jnp.float32) * 255.0
    inv = 1.0 / (jnp.asarray(CLIP_STD, jnp.float32) * 255.0)
    return ((x - mean) * inv).astype(dtype)


def normalize_host(images_uint8: np.ndarray) -> np.ndarray:
    """Host-side normalize for tests/golden comparisons."""
    x = images_uint8.astype(np.float32) / 255.0
    return ((x - np.asarray(CLIP_MEAN, np.float32))
            / np.asarray(CLIP_STD, np.float32)).astype(np.float32)
