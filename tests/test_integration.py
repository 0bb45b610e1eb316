"""Streaming indexing integration test (SURVEY.md section 4 item 4):
a few hundred images through the full build pipeline, resumability, and
end-to-end query consistency between stored vectors and the index."""

import os

import numpy as np
import pytest
from PIL import Image

from clipx.cli import build_index as bi
from clipx.cli.common import FN_DB, IDX_DB
from clipx.search.engine import read_index
from clipx.store.kv import open_env

N_IMAGES = 300


def _progress_dots(out: str) -> int:
    """Count '.' progress marks, excluding banner lines (which contain
    '...' of their own)."""
    return sum(line.count(".") for line in out.splitlines()
               if set(line) <= {".", "#"})


@pytest.fixture(scope="module")
def big_folder(tmp_path_factory):
    d = tmp_path_factory.mktemp("many")
    rng = np.random.RandomState(7)
    for i in range(N_IMAGES):
        arr = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"im{i:04d}.jpg", quality=80)
    return str(d) + os.sep


def test_streaming_build_300_images(big_folder, tmp_path, monkeypatch,
                                    capsys):
    work = tmp_path / "w"
    work.mkdir()
    monkeypatch.chdir(work)
    rc = bi.main(["--model", "tiny-test", "--batch-size", "32", big_folder])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count(".") >= N_IMAGES
    env = open_env("vectors.lmdb")
    fn_db, idx_db = env.open_db(FN_DB), env.open_db(IDX_DB)
    with env.begin(db=fn_db) as txn:
        assert txn.stat()["entries"] == N_IMAGES
    with env.begin(db=idx_db) as txn:
        assert txn.stat()["entries"] == N_IMAGES

    # index rows must equal the stored fn_db vectors, in sorted-path order
    index = read_index("images.index")
    assert index.ntotal == N_IMAGES
    with env.begin(db=fn_db) as txn:
        items = list(txn.cursor())
    for row in (0, 1, 150, N_IMAGES - 1):
        stored = np.frombuffer(items[row][1], dtype=np.float32)
        np.testing.assert_allclose(index.reconstruct(row), stored,
                                   rtol=1e-6)

    # searching with a stored vector must hit its own id at rank 0
    q = np.frombuffer(items[42][1], dtype=np.float32)[None]
    D, I = index.search(q, k=3)
    assert I[0, 0] == 42
    np.testing.assert_allclose(D[0, 0], 1.0, atol=1e-3)
    env.close()


def test_resume_after_partial_build(big_folder, tmp_path, monkeypatch,
                                    capsys):
    """Interrupt mid-stream (simulated by an encoder that dies after a
    few batches); the rerun must only encode what's missing and produce
    a complete, consistent index."""
    work = tmp_path / "w2"
    work.mkdir()
    monkeypatch.chdir(work)

    from clipx.runtime.encoder import Encoder

    real_create = Encoder.create
    calls = {"n": 0}

    class DyingEncoder:
        def __init__(self, enc):
            self._enc = enc
            self.image_size = enc.image_size
            self.finalize = enc.finalize

        def encode_images_async(self, arrays):
            calls["n"] += 1
            if calls["n"] > 3:
                raise KeyboardInterrupt
            return self._enc.encode_images_async(arrays)

    monkeypatch.setattr(
        Encoder, "create",
        classmethod(lambda cls, *a, **kw: DyingEncoder(real_create(*a, **kw))))
    rc = bi.main(["--model", "tiny-test", "--batch-size", "32", big_folder])
    assert rc == 0
    assert "Interrupted!" in capsys.readouterr().out

    env = open_env("vectors.lmdb")
    fn_db = env.open_db(FN_DB)
    with env.begin(db=fn_db) as txn:
        partial = txn.stat()["entries"]
    env.close()
    assert 0 < partial < N_IMAGES  # partial progress committed

    # resume with a healthy encoder
    monkeypatch.setattr(Encoder, "create", real_create)
    rc = bi.main(["--model", "tiny-test", "--batch-size", "32", big_folder])
    assert rc == 0
    out = capsys.readouterr().out
    assert _progress_dots(out) == N_IMAGES - partial  # only the missing ones
    env = open_env("vectors.lmdb")
    fn_db = env.open_db(FN_DB)
    with env.begin(db=fn_db) as txn:
        assert txn.stat()["entries"] == N_IMAGES
    env.close()
    assert read_index("images.index").ntotal == N_IMAGES


def test_sharded_indexing_matches_single_device(tmp_path, monkeypatch,
                                                capsys):
    """--sharded on (dp encode over the 8-device mesh) must write the
    exact same embeddings to fn_db as --sharded off."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    folder = tmp_path / "photos"
    folder.mkdir()
    rng = np.random.RandomState(11)
    for i in range(25):
        Image.fromarray(rng.randint(0, 255, (40, 48, 3), dtype=np.uint8)
                        ).save(folder / f"p{i:02d}.png")
    src = str(folder) + os.sep

    results = {}
    for mode in ("off", "on"):
        work = tmp_path / f"w_{mode}"
        work.mkdir()
        monkeypatch.chdir(work)
        rc = bi.main(["--model", "tiny-test", "--batch-size", "8",
                      "--sharded", mode, src])
        assert rc == 0
        env = open_env("vectors.lmdb")
        with env.begin(db=env.open_db(FN_DB)) as txn:
            results[mode] = {k: v for k, v in txn.cursor()}
        env.close()
    capsys.readouterr()
    assert results["off"].keys() == results["on"].keys()
    assert len(results["on"]) == 25
    for key in results["off"]:
        a = np.frombuffer(results["off"][key], np.float32)
        b = np.frombuffer(results["on"][key], np.float32)
        np.testing.assert_array_equal(a, b)
