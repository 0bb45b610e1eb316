"""Coded-index persistence (clipx/search/codes_io.py).

The faiss write_index/read_index lifecycle for the capacity tiers
(reference:build-index.py:109, reference:query-index.py:29): a coded
--corpus-dtype start writes ``<index>.codes`` once, and later starts
load codes directly — no f32 read, quantization, or PQ training.
Pinned here:

- codes loaded from the file are byte-identical to codes a fresh build
  would place, and searches agree exactly (the canonical-encoder
  contract of codes_io.encode_corpus);
- staleness: any sidecar change (append, rewrite) invalidates the
  file; so do tier, rotation-knob, and format mismatches;
- the CLI load path (cli.common.load_index) actually uses the file —
  the second start never touches the f32 rows;
- IVF composition: the v2 .ivf cache + codes file reconstruct the
  clustered index (faiss IVFPQ read_index analog) with identical
  results.
"""

import argparse
import os
import struct

import jax.numpy as jnp
import numpy as np
import pytest

from clipx.cli import common
from clipx.search import codes_io
from clipx.search.engine import (IndexWriter, VectorIndex,
                                 read_index_vectors)

DIM = 64
N = 3000
TIERS = [("int8", jnp.int8), ("int4", jnp.int4), ("pq", "pq")]


def _corpus(n=N, d=DIM, seed=0):
    rng = np.random.RandomState(seed)
    # anisotropic, CLIP-like: a few directions carry most energy
    spec = (np.arange(1, d + 1, dtype=np.float32) ** -0.75)
    v = rng.randn(n, d).astype(np.float32) * spec
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v


def _write_sidecar(path, vectors):
    w = IndexWriter(path, vectors.shape[0], vectors.shape[1])
    w.write(vectors)
    w.close()
    return w.content_hash


def _args(index, dtype_name, search_mode="auto", sharded="off"):
    return argparse.Namespace(index=index, corpus_dtype=dtype_name,
                              search_mode=search_mode, sharded=sharded)


@pytest.fixture
def sidecar(tmp_path):
    path = str(tmp_path / "images.index")
    v = _corpus()
    ch = _write_sidecar(path, v)
    return path, v, ch


@pytest.mark.parametrize("tier,dtype", TIERS)
def test_roundtrip_matches_fresh_build(sidecar, tier, dtype):
    path, v, ch = sidecar
    from clipx.search.engine import corpus_rotation

    codes_io.write_codes_file(path, v, tier,
                              rot=corpus_rotation(DIM), content_hash=ch)
    payload = codes_io.load_codes(path, tier, rotated=True)
    assert payload is not None
    assert payload["ntotal"] == N and payload["dim"] == DIM
    assert payload["content_hash"] == ch
    loaded = VectorIndex.from_codes(payload)
    fresh = VectorIndex.from_vectors(v, dtype=dtype)
    # byte-identical codes (canonical encoder on both paths); the pq
    # lane-pairing is a pure reshape, so the flat view recovers rows
    np.testing.assert_array_equal(
        np.asarray(payload["codes"]),
        np.asarray(fresh._codes).reshape(-1, payload["code_dim"])[:N])
    q = _corpus(8, DIM, seed=1)
    d1, i1 = loaded.search(q, 20)
    d2, i2 = fresh.search(q, 20)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(d1, d2)


def test_reconstruct_from_codes(sidecar):
    path, v, ch = sidecar
    from clipx.search.engine import corpus_rotation

    codes_io.write_codes_file(path, v, "int8",
                              rot=corpus_rotation(DIM), content_hash=ch)
    payload = codes_io.load_codes(path, "int8", rotated=True)
    loaded = VectorIndex.from_codes(payload)
    fresh = VectorIndex.from_vectors(v, dtype=jnp.int8)
    np.testing.assert_array_equal(loaded.reconstruct(17),
                                  fresh.reconstruct(17))


def test_stale_after_sidecar_change(sidecar):
    path, v, ch = sidecar
    codes_io.write_codes_file(path, v, "int8", rot=None, content_hash=ch)
    assert codes_io.load_codes(path, "int8", rotated=False) is not None
    # append one row (a rebuild rewrites the file; ntotal changes)
    _write_sidecar(path, np.concatenate([v, v[:1]]))
    assert codes_io.load_codes(path, "int8", rotated=False) is None
    # same ntotal, different content
    v2 = v.copy()
    v2[0] *= -1.0
    _write_sidecar(path, v2)
    assert codes_io.load_codes(path, "int8", rotated=False) is None


def test_mismatches_invalidate(sidecar):
    path, v, ch = sidecar
    codes_io.write_codes_file(path, v, "int4", rot=None, content_hash=ch)
    assert codes_io.load_codes(path, "int8", rotated=False) is None
    assert codes_io.load_codes(path, "int4", rotated=True) is None
    assert codes_io.load_codes(path, "int4", rotated=False) is not None


def test_corrupt_and_truncated_files(sidecar, tmp_path):
    path, v, ch = sidecar
    codes_io.write_codes_file(path, v, "int8", rot=None, content_hash=ch)
    cpath = codes_io.codes_path(path)
    raw = open(cpath, "rb").read()
    with open(cpath, "wb") as f:  # truncate mid-codes
        f.write(raw[: len(raw) // 2])
    assert codes_io.load_codes(path, "int8", rotated=False) is None
    with open(cpath, "wb") as f:  # bad magic
        f.write(b"NOTCODES!\n" + raw[10:])
    assert codes_io.load_codes(path, "int8", rotated=False) is None


def test_verify_modes(sidecar, monkeypatch):
    path, v, ch = sidecar
    # shrink the sample so the corpus has unsampled interior rows
    # (production sample is 65536 rows — larger than this test corpus)
    monkeypatch.setattr(codes_io, "_FP_SAMPLE_ROWS", 64)
    codes_io.write_codes_file(path, v, "int8", rot=None, content_hash=ch)
    # full verification passes on a fresh file
    monkeypatch.setenv("CLIPX_CODES_VERIFY", "full")
    assert codes_io.load_codes(path, "int8", rotated=False) is not None
    # a mid-file edit that preserves head/tail/ntotal evades the sample
    # fingerprint but not the full hash
    off = 10 + 16 + (N // 2) * DIM * 4
    with open(path, "r+b") as f:
        f.seek(off)
        row = np.frombuffer(f.read(DIM * 4), np.float32) * -1.0
        f.seek(off)
        f.write(row.tobytes())
    assert codes_io.load_codes(path, "int8", rotated=False) is None
    monkeypatch.setenv("CLIPX_CODES_VERIFY", "sample")
    assert codes_io.load_codes(path, "int8", rotated=False) is not None
    monkeypatch.setenv("CLIPX_CODES_VERIFY", "off")
    assert codes_io.load_codes(path, "int8", rotated=False) is not None


@pytest.mark.parametrize("dtype_name", ["int8", "pq"])
def test_load_index_writes_then_uses_codes(sidecar, monkeypatch,
                                           dtype_name):
    path, v, ch = sidecar
    args = _args(path, dtype_name)
    idx1 = common.load_index(args)
    assert os.path.exists(codes_io.codes_path(path))
    # second start must not touch the f32 rows
    import clipx.search.engine as engine_mod

    def _boom(*a, **k):
        raise AssertionError("f32 sidecar read on a fresh-codes start")

    monkeypatch.setattr(engine_mod, "read_index_vectors", _boom)
    monkeypatch.setattr(common, "build_index_from_vectors", _boom)
    idx2 = common.load_index(args)
    q = _corpus(4, DIM, seed=2)
    d1, i1 = idx1.search(q, 15)
    d2, i2 = idx2.search(q, 15)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(d1, d2)


def test_codes_off_keeps_f32_path(sidecar, monkeypatch):
    path, v, ch = sidecar
    monkeypatch.setenv("CLIPX_CODES", "off")
    idx = common.load_index(_args(path, "int8"))
    assert not os.path.exists(codes_io.codes_path(path))
    assert idx.ntotal == N


def test_refresh_rewrites(sidecar, monkeypatch):
    path, v, ch = sidecar
    common.load_index(_args(path, "int8"))
    cpath = codes_io.codes_path(path)
    t0 = os.path.getmtime(cpath)
    monkeypatch.setenv("CLIPX_CODES", "refresh")
    os.utime(cpath, (t0 - 10, t0 - 10))
    common.load_index(_args(path, "int8"))
    assert os.path.getmtime(cpath) > t0 - 10


@pytest.mark.parametrize("dtype_name", ["int8", "pq"])
def test_ivf_from_codes(sidecar, monkeypatch, dtype_name):
    path, v, ch = sidecar
    args = _args(path, dtype_name, search_mode="ivf")
    # first start: codes written, cache missing -> f32 fallback trains
    # k-means and saves the v2 cache
    idx1 = common.load_index(args)
    assert os.path.exists(path + ".ivf")
    assert os.path.exists(codes_io.codes_path(path))
    # second start: codes + cache only
    import clipx.search.engine as engine_mod

    def _boom(*a, **k):
        raise AssertionError("f32 sidecar read on a fresh-codes start")

    monkeypatch.setattr(engine_mod, "read_index_vectors", _boom)
    monkeypatch.setattr(common, "build_index_from_vectors", _boom)
    idx2 = common.load_index(args)
    assert type(idx2) is type(idx1)
    q = _corpus(4, DIM, seed=3)
    for nprobe in (8, 100):
        d1, i1 = idx1.search(q, 15, nprobe=nprobe)
        d2, i2 = idx2.search(q, 15, nprobe=nprobe)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_array_equal(d1, d2)


def test_sharded_from_codes(sidecar, monkeypatch):
    path, v, ch = sidecar
    args = _args(path, "int8", sharded="on")
    idx1 = common.load_index(args)
    from clipx.parallel.mips import ShardedVectorIndex

    assert isinstance(idx1, ShardedVectorIndex)
    import clipx.search.engine as engine_mod

    def _boom(*a, **k):
        raise AssertionError("f32 sidecar read on a fresh-codes start")

    monkeypatch.setattr(engine_mod, "read_index_vectors", _boom)
    idx2 = common.load_index(args)
    assert isinstance(idx2, ShardedVectorIndex)
    q = _corpus(4, DIM, seed=4)
    d1, i1 = idx1.search(q, 15)
    d2, i2 = idx2.search(q, 15)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(d1, d2)


def test_sharded_ivf_from_codes(sidecar, monkeypatch):
    path, v, ch = sidecar
    args = _args(path, "pq", search_mode="ivf", sharded="on")
    idx1 = common.load_index(args)
    from clipx.search.ivf import ShardedIVFIndex

    assert isinstance(idx1, ShardedIVFIndex)
    import clipx.search.engine as engine_mod

    def _boom(*a, **k):
        raise AssertionError("f32 sidecar read on a fresh-codes start")

    monkeypatch.setattr(engine_mod, "read_index_vectors", _boom)
    idx2 = common.load_index(args)
    assert isinstance(idx2, ShardedIVFIndex)
    q = _corpus(4, DIM, seed=5)
    d1, i1 = idx1.search(q, 15, nprobe=100)
    d2, i2 = idx2.search(q, 15, nprobe=100)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(d1, d2)


def test_build_cli_writes_codes(tmp_path, monkeypatch):
    """build-index.py --corpus-dtype int8 persists codes at build time
    (the faiss write_index point, reference:build-index.py:109)."""
    from clipx.cli.build_index import _write_codes_phase

    path = str(tmp_path / "images.index")
    v = _corpus(500)
    ch = _write_sidecar(path, v)
    args = _args(path, "int8")
    _write_codes_phase(args, ch)
    payload = codes_io.load_codes(path, "int8", rotated=True)
    assert payload is not None
    assert payload["content_hash"] == ch


def test_streaming_writer_equals_oneshot(tmp_path):
    """CodesWriter chunk-streamed bytes == one-shot encode (the build
    CLI streams; the query fallback path encodes whole)."""
    path = str(tmp_path / "images.index")
    v = _corpus(1000)
    ch = _write_sidecar(path, v)
    from clipx.search.engine import corpus_rotation

    rot = corpus_rotation(DIM)
    codes_io.write_codes_file(path, v, "int8", rot=rot, content_hash=ch)
    payload = codes_io.load_codes(path, "int8", rotated=True)
    ref = codes_io.encode_corpus(v, "int8", rot=rot)
    np.testing.assert_array_equal(np.asarray(payload["codes"]),
                                  ref["codes"])
    np.testing.assert_array_equal(np.asarray(payload["scales"]),
                                  ref["scales"])


def test_mmap_read_matches_ram(sidecar):
    path, v, ch = sidecar
    mm = read_index_vectors(path, mmap=True)
    np.testing.assert_array_equal(np.asarray(mm), v)


def test_residual_codes_roundtrip_and_flat_refusal(sidecar, monkeypatch):
    """Residual-pq codes (faiss by_residual, the IVF default) persist
    and reload exactly; a FLAT request can't serve them and falls back
    to re-encoding (overwriting the file with flat codes)."""
    path, v, ch = sidecar
    monkeypatch.setenv("CLIPX_PQ_RESIDUAL", "on")
    args = _args(path, "pq", search_mode="ivf")
    idx1 = common.load_index(args)
    assert idx1._residual is True
    payload = codes_io.load_codes(path, "pq", rotated=True)
    assert payload is not None and payload["residual"] is True
    # reload from codes: same results
    import clipx.search.engine as engine_mod

    def _boom(*a, **k):
        raise AssertionError("f32 read on a fresh-codes start")

    monkeypatch.setattr(engine_mod, "read_index_vectors", _boom)
    idx2 = common.load_index(args)
    assert idx2._residual is True
    q = _corpus(4, DIM, seed=6)
    d1, i1 = idx1.search(q, 15, nprobe=100)
    d2, i2 = idx2.search(q, 15, nprobe=100)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(d1, d2)
    # flat request: refuses the residual payload, rebuilds flat codes
    monkeypatch.undo()
    monkeypatch.setenv("CLIPX_PQ_RESIDUAL", "on")
    flat = common.load_index(_args(path, "pq"))
    assert not isinstance(flat, type(idx1))
    payload = codes_io.load_codes(path, "pq", rotated=True)
    assert payload is not None and payload["residual"] is False


def test_residual_reconstruct_and_tail(sidecar, monkeypatch):
    """Residual decode adds the segment centroid back (reconstruction
    approximates the row), and incremental adds land in an exact f32
    tail (residual codebooks don't cover raw rows)."""
    import jax.numpy as jnp

    path, v, ch = sidecar
    monkeypatch.setenv("CLIPX_PQ_RESIDUAL", "on")
    from clipx.search.ivf import IVFIndex

    idx = IVFIndex.from_vectors(v, dtype="pq")
    assert idx._residual
    r = idx.reconstruct(11)
    cos = float(r @ v[11] / max(np.linalg.norm(r), 1e-9))
    assert cos > 0.8, cos  # pq reconstruction, not exact
    vecs = idx.vectors()
    assert vecs.shape == v.shape
    cosv = np.sum(vecs * v, axis=1) / np.maximum(
        np.linalg.norm(vecs, axis=1), 1e-9)
    assert float(np.mean(cosv)) > 0.8
    idx.add(v[:5] * 0.9)
    assert idx._tail is not None
    assert idx._tail.dtype == jnp.float32
    d, i = idx.search(v[:2], 5, nprobe=100)
    assert (i >= 0).all()


def test_opq_rotation_roundtrip(sidecar, monkeypatch):
    """Trained OPQ rotation persists in the codes file and the loaded
    index queries through it (identical results to the live build)."""
    path, v, ch = sidecar
    monkeypatch.setenv("CLIPX_PQ_OPQ", "trained")
    args = _args(path, "pq")
    idx1 = common.load_index(args)
    payload = codes_io.load_codes(path, "pq", rotated=True)
    assert payload is not None
    assert payload["rot_matrix"] is not None
    # the trained rotation is orthogonal and differs from the fixed one
    r = payload["rot_matrix"]
    np.testing.assert_allclose(r @ r.T, np.eye(DIM), atol=1e-4)
    from clipx.search.engine import _rotation_matrix

    assert not np.allclose(r, _rotation_matrix(DIM))
    import clipx.search.engine as engine_mod

    def _boom(*a, **k):
        raise AssertionError("f32 read on a fresh-codes start")

    monkeypatch.setattr(engine_mod, "read_index_vectors", _boom)
    idx2 = common.load_index(args)
    np.testing.assert_array_equal(np.asarray(idx2._rot), r)
    q = _corpus(4, DIM, seed=7)
    d1, i1 = idx1.search(q, 15)
    d2, i2 = idx2.search(q, 15)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(d1, d2)


def test_flat_pq_codes_upgrade_to_residual_for_ivf(sidecar, monkeypatch):
    """A flat-built (non-residual) pq codes file must not silently
    downgrade an IVF deployment: with residual enabled (the default)
    the IVF start rebuilds residual codes once and overwrites; with it
    disabled, flat and IVF share the one non-residual file."""
    path, v, ch = sidecar
    # flat build writes non-residual codes
    common.load_index(_args(path, "pq"))
    payload = codes_io.load_codes(path, "pq", rotated=True)
    assert payload["residual"] is False
    # IVF start upgrades them
    idx = common.load_index(_args(path, "pq", search_mode="ivf"))
    assert idx._residual is True
    payload = codes_io.load_codes(path, "pq", rotated=True)
    assert payload["residual"] is True
    # with the knob off, a non-residual file is shared as-is
    monkeypatch.setenv("CLIPX_PQ_RESIDUAL", "off")
    common.load_index(_args(path, "pq"))  # rewrite non-residual (flat)
    payload = codes_io.load_codes(path, "pq", rotated=True)
    assert payload["residual"] is False
    import clipx.search.engine as engine_mod

    def _boom(*a, **k):
        raise AssertionError("f32 read despite a shareable codes file")

    monkeypatch.setattr(engine_mod, "read_index_vectors", _boom)
    idx2 = common.load_index(_args(path, "pq", search_mode="ivf"))
    assert idx2._residual is False
