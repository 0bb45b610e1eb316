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


def test_iter_decoded_preserves_order(folder):
    paths = sorted(pipeline.scan_folder(folder))
    out = list(pipeline.iter_decoded(paths, size=32, workers=3, prefetch=4))
    assert [o.path for o in out] == paths


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
    assert [it.path for it in flat] == paths
    for b in batches:
        if any(it.array is None for it in b):
            assert len(b) == 1  # failures travel alone
        else:
            assert len(b) <= 4


def test_prefetch_smaller_than_input(folder):
    paths = sorted(pipeline.scan_folder(folder))
    out = list(pipeline.iter_decoded(paths, size=32, prefetch=2, workers=2))
    assert len(out) == len(paths)
