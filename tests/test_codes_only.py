"""Codes-only deployment: ``<index>.codes`` stands alone.

faiss's ``images.index`` is the whole search state — ``read_index``
needs nothing else (reference:query-index.py:29). Round 5 restores
that property for the coded tiers: with the f32 sidecar deleted
(tools/kv_tool.py drop-f32), query/serve boot from the codes file
alone, verified against its self-integrity footer. Pinned here:

- flat + IVF + residual-IVF boots with the sidecar absent return
  identical results to the sidecar-present boot;
- the self-integrity footer catches corruption (sample catches
  head/tail damage, full catches interior damage);
- missing prerequisites (.ivf cache for IVF boots, ivf mode for
  residual codes) are hard, explained errors — not silent fallbacks;
- drop-f32 refuses stale/unverifiable codes and succeeds on fresh;
- the TOCTOU close-check discards codes when the sidecar was replaced
  mid-encode (round-4 ADVICE);
- residual codes bind to the .ivf layout via the layout digest
  (round-4 ADVICE): a cache with a different layout is rejected.
"""

import argparse
import os

import numpy as np
import pytest

from clipx.cli import common
from clipx.search import codes_io
from clipx.search.engine import IndexWriter

DIM = 64
N = 3000


def _corpus(n=N, d=DIM, seed=0):
    rng = np.random.RandomState(seed)
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


@pytest.mark.parametrize("dtype_name", ["int8", "int4", "pq"])
def test_codes_only_flat_boot_matches(sidecar, dtype_name, capsys):
    path, v, ch = sidecar
    idx1 = common.load_index(_args(path, dtype_name))
    q = _corpus(4, DIM, seed=2)
    d1, i1 = idx1.search(q, 15)
    os.remove(path)
    idx2 = common.load_index(_args(path, dtype_name))
    assert "codes-only boot" in capsys.readouterr().err
    d2, i2 = idx2.search(q, 15)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(d1, d2)


@pytest.mark.parametrize("dtype_name", ["int8", "pq"])
def test_codes_only_ivf_boot_matches(sidecar, dtype_name, capsys):
    path, v, ch = sidecar
    args = _args(path, dtype_name, search_mode="ivf")
    idx1 = common.load_index(args)          # trains + saves cache+codes
    if dtype_name == "pq":
        assert idx1._residual is True       # the shipping default
    q = _corpus(4, DIM, seed=3)
    d1, i1 = idx1.search(q, 15, nprobe=100)
    os.remove(path)
    idx2 = common.load_index(args)
    assert "codes-only boot" in capsys.readouterr().err
    assert type(idx2) is type(idx1)
    d2, i2 = idx2.search(q, 15, nprobe=100)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(d1, d2)


def test_codes_only_ivf_missing_cache_is_explained(sidecar):
    path, v, ch = sidecar
    args = _args(path, "int8", search_mode="ivf")
    common.load_index(args)
    os.remove(path)
    os.remove(path + ".ivf")
    with pytest.raises(SystemExit, match=r"\.ivf layout cache"):
        common.load_index(args)


def test_codes_only_residual_needs_ivf_mode(sidecar):
    path, v, ch = sidecar
    common.load_index(_args(path, "pq", search_mode="ivf"))
    payload = codes_io.load_codes(path, "pq", rotated=True)
    assert payload["residual"] is True
    os.remove(path)
    with pytest.raises(SystemExit, match="RESIDUAL"):
        common.load_index(_args(path, "pq"))  # flat request


def test_codes_only_missing_both_files_errors(tmp_path):
    path = str(tmp_path / "images.index")
    # neither sidecar nor codes: the f32 path's missing-file error
    with pytest.raises((OSError, ValueError)):
        common.load_index(_args(path, "int8"))


def test_self_integrity_footer_detects_damage(sidecar, monkeypatch):
    path, v, ch = sidecar
    monkeypatch.setattr(codes_io, "_FP_SAMPLE_ROWS", 64)
    codes_io.write_codes_file(path, v, "int8", rot=None, content_hash=ch)
    cpath = codes_io.codes_path(path)
    os.remove(path)
    assert codes_io.load_codes(path, "int8", rotated=False,
                               orphan=True) is not None
    parsed = codes_io._read_meta(cpath)
    data_off = parsed[3]
    # head damage: the sampled self-fp catches it
    with open(cpath, "r+b") as f:
        f.seek(data_off + 3)
        b = f.read(1)
        f.seek(data_off + 3)
        f.write(bytes([b[0] ^ 0xFF]))
    assert codes_io.load_codes(path, "int8", rotated=False,
                               orphan=True) is None
    with open(cpath, "r+b") as f:  # restore
        f.seek(data_off + 3)
        f.write(b)
    assert codes_io.load_codes(path, "int8", rotated=False,
                               orphan=True) is not None
    # interior damage (row N//2): evades the 64-row sample, caught full
    off = data_off + (N // 2) * DIM
    with open(cpath, "r+b") as f:
        f.seek(off)
        b = f.read(1)
        f.seek(off)
        f.write(bytes([b[0] ^ 0xFF]))
    assert codes_io.load_codes(path, "int8", rotated=False,
                               orphan=True) is not None  # sample mode
    monkeypatch.setenv("CLIPX_CODES_VERIFY", "full")
    assert codes_io.load_codes(path, "int8", rotated=False,
                               orphan=True) is None
    monkeypatch.setenv("CLIPX_CODES_VERIFY", "off")
    assert codes_io.load_codes(path, "int8", rotated=False,
                               orphan=True) is not None


def test_footerless_file_boots_with_warning(sidecar, capsys):
    """Pre-round-5 codes files (no footer) still boot codes-only,
    loudly unverified."""
    path, v, ch = sidecar
    codes_io.write_codes_file(path, v, "int8", rot=None, content_hash=ch)
    cpath = codes_io.codes_path(path)
    # strip the footer and the meta "self" flag to simulate an old file
    parsed = codes_io._read_meta(cpath)
    meta = dict(parsed[0])
    meta.pop("self")
    import json
    import struct

    blob = json.dumps(meta, sort_keys=True).encode()
    raw = open(cpath, "rb").read()
    old_blob_len = struct.unpack(
        "<I", raw[len(codes_io._MAGIC):len(codes_io._MAGIC) + 4])[0]
    body = raw[codes_io._HDR_FIXED + old_blob_len: -codes_io._SELF_LEN]
    with open(cpath, "wb") as f:
        f.write(codes_io._MAGIC + struct.pack("<I", len(blob))
                + raw[len(codes_io._MAGIC) + 4: codes_io._HDR_FIXED]
                + blob + body)
    os.remove(path)
    assert codes_io.load_codes(path, "int8", rotated=False,
                               orphan=True) is not None
    assert "UNVERIFIED" in capsys.readouterr().err


def test_drop_f32_tool(sidecar, capsys):
    from tools.kv_tool import drop_f32

    path, v, ch = sidecar
    # no codes file yet: refuse
    assert drop_f32(path) == 2
    common.load_index(_args(path, "pq", search_mode="ivf"))
    assert drop_f32(path) == 0
    assert not os.path.exists(path)
    out = capsys.readouterr().out
    assert "codes-only" in out
    # idempotent-ish: already absent
    assert drop_f32(path) == 0


def test_drop_f32_refuses_stale_codes(sidecar):
    from tools.kv_tool import drop_f32

    path, v, ch = sidecar
    common.load_index(_args(path, "int8"))
    v2 = v.copy()
    v2[0] *= -1.0
    _write_sidecar(path, v2)  # sidecar changed; codes now stale
    assert drop_f32(path) == 2
    assert os.path.exists(path)  # refused: sidecar kept


def test_toctou_replaced_sidecar_discards_codes(sidecar):
    """The close-time re-check (round-4 ADVICE): codes encoded from the
    old rows must not be stamped with a replaced sidecar's
    fingerprint."""
    path, v, ch = sidecar
    fp_at_open = codes_io.sidecar_sample_fp(path)
    v2 = v.copy()
    v2[0] *= -1.0
    _write_sidecar(path, v2)  # "concurrent" rebuild mid-encode
    with pytest.raises(codes_io.StaleSidecarError):
        codes_io.write_codes_file(path, v, "int8", rot=None,
                                  content_hash=ch, fp_sample=fp_at_open)
    assert not os.path.exists(codes_io.codes_path(path))
    assert not os.path.exists(codes_io.codes_path(path) + ".tmp")


def test_residual_layout_digest_rejects_foreign_cache(sidecar):
    """Residual codes decode against segment centroids: a .ivf cache
    regenerated with a DIFFERENT layout on the same corpus bytes (the
    cross-platform k-means case) must be rejected, falling back to the
    f32 rebuild instead of silently corrupting scores."""
    path, v, ch = sidecar
    args = _args(path, "pq", search_mode="ivf")
    idx1 = common.load_index(args)
    assert idx1._residual
    payload = codes_io.load_codes(path, "pq", rotated=True)
    assert payload["layout_digest"] is not None
    from clipx.search import ivf

    # the genuine cache matches
    assert ivf._load_cache_for_codes(path + ".ivf", payload) is not None
    # simulate a foreign regeneration: permute two segments' rows in
    # the cache layout (still a VALID layout — passes _layout_ok)
    with np.load(path + ".ivf") as z:
        cache = {k: z[k] for k in z.files}
    lay = cache["layout"].copy()
    w = 64
    lay[:w], lay[w:2 * w] = lay[w:2 * w].copy(), lay[:w].copy()
    cache["layout"] = lay
    np.savez(path + ".ivf.tmp", **cache)
    os.replace(path + ".ivf.tmp.npz", path + ".ivf")
    assert ivf._load_cache_for_codes(path + ".ivf", payload) is None
    # and the full boot falls back to the f32 rebuild (sidecar present)
    idx2 = common.load_index(args)
    q = _corpus(4, DIM, seed=9)
    d1, i1 = idx1.search(q, 15, nprobe=100)
    d2, i2 = idx2.search(q, 15, nprobe=100)
    np.testing.assert_array_equal(i1, i2)


def test_serve_codes_only_boot_and_reload_refusal(sidecar, monkeypatch):
    """SearchService boots codes-only and /reload degrades to an
    explained error instead of a 500."""
    path, v, ch = sidecar
    common.load_index(_args(path, "int8"))
    os.remove(path)
    from clipx import serve as serve_mod

    args = argparse.Namespace(
        index=path, corpus_dtype="int8", search_mode="auto",
        sharded="off", db=str(os.path.dirname(path)) + "/vectors.lmdb",
        model="tiny-test", checkpoint=None, compute=None)
    svc = serve_mod.SearchService(args)
    try:
        assert svc.index is not None and svc.index.ntotal == N
        with pytest.raises(ValueError, match="codes-only"):
            svc.reload()
    finally:
        svc.close()
        svc.env.close()
