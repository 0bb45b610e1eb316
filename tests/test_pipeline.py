"""Streaming decode pipeline unit tests (SURVEY.md section 4 item 4)."""

import os

import numpy as np
import pytest
from PIL import Image

from clipx.data import pipeline


@pytest.fixture()
def folder(tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.RandomState(0)
    for i in range(10):
        Image.fromarray(rng.randint(0, 255, (40 + i, 60, 3), dtype=np.uint8)
                        ).save(d / f"img{i:02d}.jpg")
    (d / "bad.jpg").write_bytes(b"junk")
    (d / "skip.gif").write_bytes(b"GIF89a")
    (d / "noext").write_bytes(b"x")
    return str(d) + os.sep


def test_scan_folder_filter_and_concat(folder):
    paths = pipeline.scan_folder(folder)
    assert len(paths) == 11  # 10 good + bad.jpg; .gif and noext excluded
    assert all(p.startswith(folder) for p in paths)
    assert not any(p.endswith((".gif",)) for p in paths)


def test_iter_decoded_complete(folder):
    paths = sorted(pipeline.scan_folder(folder))
    out = list(pipeline.iter_decoded(paths, size=32, workers=3, prefetch=4))
    # default mode is out-of-order completion; every path arrives once
    assert sorted(o.path for o in out) == paths


def test_iter_decoded_ordered_mode(folder):
    paths = sorted(pipeline.scan_folder(folder))
    out = list(pipeline.iter_decoded(paths, size=32, workers=3, prefetch=4,
                                     ordered=True))
    assert [o.path for o in out] == paths


def test_iter_decoded_no_head_of_line_blocking(folder, monkeypatch):
    """One pathological file must not stall finished decodes behind it
    (the reference's loop is fully serial; our window yields
    out-of-order completions)."""
    import threading

    paths = [p for p in sorted(pipeline.scan_folder(folder))
             if not p.endswith("bad.jpg")]
    slow = paths[0]
    gate = threading.Event()
    real = pipeline._decode_one

    def gated(path, size, backend, fast=False):
        if path == slow:
            gate.wait(30)
        return real(path, size, backend, fast)

    monkeypatch.setattr(pipeline, "_decode_one", gated)
    it = pipeline.iter_decoded(paths, size=32, workers=2, prefetch=4)
    got = [next(it).path for _ in range(len(paths) - 1)]
    # all other decodes arrived while the slow one is still blocked
    assert slow not in got
    gate.set()
    assert next(it).path == slow


def test_decode_failure_attribution(folder):
    paths = sorted(pipeline.scan_folder(folder))
    out = list(pipeline.iter_decoded(paths, size=32))
    bad = [o for o in out if o.array is None]
    good = [o for o in out if o.array is not None]
    assert len(bad) == 1 and bad[0].path.endswith("bad.jpg")
    assert bad[0].error
    assert all(o.array.shape == (32, 32, 3) for o in good)


def test_pil_backend(folder):
    paths = [p for p in sorted(pipeline.scan_folder(folder))
             if not p.endswith("bad.jpg")][:3]
    out = list(pipeline.iter_decoded(paths, size=32, backend="pil"))
    assert all(o.array is not None for o in out)


def test_batched_groups_and_passes_failures_through(folder):
    paths = sorted(pipeline.scan_folder(folder))
    stream = pipeline.iter_decoded(paths, size=32)
    batches = list(pipeline.batched(stream, batch_size=4))
    flat = [it for b in batches for it in b]
    assert sorted(it.path for it in flat) == paths
    for b in batches:
        if any(it.array is None for it in b):
            assert len(b) == 1  # failures travel alone
        else:
            assert len(b) <= 4


def test_prefetch_smaller_than_input(folder):
    paths = sorted(pipeline.scan_folder(folder))
    out = list(pipeline.iter_decoded(paths, size=32, prefetch=2, workers=2))
    assert len(out) == len(paths)


def test_fast_decode_close_and_png_exact(tmp_path):
    """--fast-decode: DCT-domain reduced JPEG decode (measured ~3.5x
    decode throughput on full-size photos) stays close to the full
    decode; non-JPEG formats are bit-identical (no reduced path)."""
    from PIL import Image

    rng = np.random.RandomState(0)
    base = rng.randint(0, 255, (12, 18, 3), dtype=np.uint8)
    big = Image.fromarray(base).resize((1620, 1080), Image.BICUBIC)
    jpg = str(tmp_path / "photo.jpg")
    png = str(tmp_path / "photo.png")
    big.save(jpg, quality=88)
    big.resize((400, 300)).save(png)

    for backend in ("cv2", "pil"):
        full = next(iter(pipeline.iter_decoded([jpg], 224, backend=backend,
                                      fast=False))).array
        fast = next(iter(pipeline.iter_decoded([jpg], 224, backend=backend,
                                      fast=True))).array
        assert fast.shape == (224, 224, 3)
        diff = np.abs(full.astype(np.float32) - fast.astype(np.float32))
        assert diff.mean() < 2.0, (backend, diff.mean())

        p_full = next(iter(pipeline.iter_decoded([png], 224, backend=backend,
                                        fast=False))).array
        p_fast = next(iter(pipeline.iter_decoded([png], 224, backend=backend,
                                        fast=True))).array
        np.testing.assert_array_equal(p_full, p_fast)


def test_fast_decode_small_jpeg_is_full_decode(tmp_path):
    """Images near the target size never take the reduced path (it
    would upscale); fast and full decode agree exactly."""
    from PIL import Image

    rng = np.random.RandomState(1)
    small = str(tmp_path / "small.jpg")
    Image.fromarray(rng.randint(0, 255, (240, 260, 3), dtype=np.uint8)
                    ).save(small, quality=90)
    full = next(iter(pipeline.iter_decoded([small], 224, fast=False))).array
    fast = next(iter(pipeline.iter_decoded([small], 224, fast=True))).array
    np.testing.assert_array_equal(full, fast)


def test_fast_decode_corrupt_file_still_attributed(tmp_path):
    bad = str(tmp_path / "bad.jpg")
    with open(bad, "wb") as f:
        f.write(b"not a jpeg")
    item = next(iter(pipeline.iter_decoded([bad], 224, fast=True)))
    assert item.array is None and item.error
