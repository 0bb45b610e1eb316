"""Centered int8/int4 storage (round-5 verdict item 5).

QUALITY_r04 measured int4 recall@50 = 0.46 on real encoder embeddings
while docs advertised ~0.9 from synthetic corpora. Diagnosis: encoder
embeddings live in a tight cone (random-weight ViT corpora measured
mean pairwise cosine ~0.97+), and a per-row scale keyed to max|x| of
the RAW row spends nearly all of its 15 int4 steps re-encoding the
shared mean component — the DIFFERENTIAL part that actually ranks
rows gets almost no resolution. Centering quantizes residuals from
the canonical corpus mean instead (engine.corpus_center): ranking is
invariant to the per-query q·mean constant, which is added back
host-side, so kernels are untouched and storage grows by one f32[dim]
vector. Pinned here:

- the cone-corpus recall collapse and its repair, flat + IVF, int4
  and int8;
- returned scores stay faithful (match dequantized-dot oracle);
- reconstruct() adds the mean back;
- codes-file roundtrip carries the center (loaded == rebuilt, scores
  equal); knob-off restores round-4 uncentered bytes.
"""

import argparse
import os

import jax.numpy as jnp
import numpy as np
import pytest

from clipx.cli import common
from clipx.search import codes_io
from clipx.search.engine import IndexWriter, VectorIndex, corpus_center

DIM = 64
N = 4000


def _cone_corpus(n=N, d=DIM, cone=0.1, seed=0):
    """Encoder-like corpus: one dominant direction + small structured
    noise — mean pairwise cosine ~0.97, the QUALITY_r04 regime."""
    rng = np.random.RandomState(seed)
    spec = (np.arange(1, d + 1, dtype=np.float32) ** -0.75)
    mu = rng.randn(d).astype(np.float32)
    mu /= np.linalg.norm(mu)
    rows = mu + cone * rng.randn(n, d).astype(np.float32) * spec
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    return rows


def _recall(idx, vecs, q, k=50, **kw):
    Ie = np.argsort(-(q @ vecs.T), axis=1)[:, :k]
    _, Ip = idx.search(q, k, **kw)
    return np.mean([len(set(Ie[i]) & set(Ip[i])) / k
                    for i in range(len(q))])


@pytest.mark.parametrize("dtype,floor,lift", [(jnp.int4, 0.45, 0.15),
                                              (jnp.int8, 0.90, 0.02)])
def test_centering_repairs_cone_recall_flat(monkeypatch, dtype, floor,
                                            lift):
    vecs = _cone_corpus()
    rng = np.random.RandomState(1)
    q = vecs[rng.choice(N, 64, replace=False)]
    centered = VectorIndex.from_vectors(vecs, dtype=dtype)
    assert centered._center is not None
    r_c = _recall(centered, vecs, q)
    monkeypatch.setenv("CLIPX_CODED_CENTER", "off")
    plain = VectorIndex.from_vectors(vecs, dtype=dtype)
    assert plain._center is None
    r_p = _recall(plain, vecs, q)
    assert r_c >= floor, (r_c, r_p)
    assert r_c >= r_p + lift, (r_c, r_p)


def test_centered_scores_are_faithful_and_reconstruct_adds_mean():
    vecs = _cone_corpus(n=600)
    idx = VectorIndex.from_vectors(vecs, dtype=jnp.int8)
    rng = np.random.RandomState(2)
    q = vecs[rng.choice(600, 8, replace=False)]
    D, I = idx.search(q, 10)
    # oracle: dot with the dequantized rows (reconstruct in user space)
    deq = idx.vectors()
    want = np.take_along_axis(q @ deq.T, I, axis=1)
    np.testing.assert_allclose(D, want, atol=2e-3)
    # reconstruction approximates the row far better than uncentered
    # int8 could on a cone corpus (residual step is ~10x finer)
    r = idx.reconstruct(7)
    cos = float(r @ vecs[7] / max(np.linalg.norm(r), 1e-12))
    assert cos > 0.999, cos


@pytest.mark.parametrize("dtype_name", ["int8", "int4"])
def test_center_roundtrips_through_codes_file(tmp_path, dtype_name):
    path = str(tmp_path / "images.index")
    vecs = _cone_corpus(n=1500)
    w = IndexWriter(path, len(vecs), DIM)
    w.write(vecs)
    w.close()
    args = argparse.Namespace(index=path, corpus_dtype=dtype_name,
                              search_mode="auto", sharded="off")
    idx1 = common.load_index(args)
    payload = codes_io.load_codes(path, dtype_name, rotated=True)
    assert payload is not None and payload["center"] is not None
    from clipx.search.engine import corpus_rotation

    np.testing.assert_array_equal(
        payload["center"], corpus_center(vecs, corpus_rotation(DIM)))
    idx2 = common.load_index(args)  # loads from codes
    rng = np.random.RandomState(3)
    q = vecs[rng.choice(1500, 8, replace=False)]
    d1, i1 = idx1.search(q, 20)
    d2, i2 = idx2.search(q, 20)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(d1, d2)
    # codes-only boot keeps the center too
    os.remove(path)
    idx3 = common.load_index(args)
    d3, i3 = idx3.search(q, 20)
    np.testing.assert_array_equal(i1, i3)
    np.testing.assert_array_equal(d1, d3)


def test_center_knob_mismatch_invalidates_codes_file(tmp_path,
                                                     monkeypatch):
    path = str(tmp_path / "images.index")
    vecs = _cone_corpus(n=800)
    w = IndexWriter(path, len(vecs), DIM)
    w.write(vecs)
    w.close()
    ch = w.content_hash
    codes_io.write_codes_file(path, vecs, "int8", rot=None,
                              content_hash=ch)
    assert codes_io.load_codes(path, "int8", rotated=False) is not None
    monkeypatch.setenv("CLIPX_CODED_CENTER", "off")
    # same policy as the rotation knob: a mismatch re-encodes
    assert codes_io.load_codes(path, "int8", rotated=False) is None


def test_centering_repairs_cone_recall_ivf(monkeypatch):
    from clipx.search.ivf import IVFIndex

    vecs = _cone_corpus()
    rng = np.random.RandomState(4)
    q = vecs[rng.choice(N, 32, replace=False)]
    centered = IVFIndex.from_vectors(vecs, dtype=jnp.int4)
    assert centered._center is not None
    r_c = _recall(centered, vecs, q, nprobe=100)
    monkeypatch.setenv("CLIPX_CODED_CENTER", "off")
    plain = IVFIndex.from_vectors(vecs, dtype=jnp.int4)
    r_p = _recall(plain, vecs, q, nprobe=100)
    assert r_c >= r_p + 0.15, (r_c, r_p)
    # incremental adds land in a tail whose scores stay comparable
    centered.add(vecs[:3] * 0.999)
    d, i = centered.search(vecs[:1], 5, nprobe=100)
    assert (i >= 0).all()


def test_centering_matches_across_flat_and_sharded(monkeypatch):
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device test mesh")
    from clipx.parallel.mips import ShardedVectorIndex

    vecs = _cone_corpus(n=1000)
    rng = np.random.RandomState(5)
    q = vecs[rng.choice(1000, 8, replace=False)]
    flat = VectorIndex.from_vectors(vecs, dtype=jnp.int8)
    shard = ShardedVectorIndex(vecs, dtype=jnp.int8)
    assert shard._center is not None
    d1, i1 = flat.search(q, 15)
    d2, i2 = shard.search(q, 15)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, atol=1e-5)
