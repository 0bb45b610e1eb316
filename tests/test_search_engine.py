"""Flat MIPS engine vs numpy oracle (SURVEY.md section 4 item 2)."""

import os

import numpy as np
import pytest

from clipx.search import VectorIndex, read_index, write_index


def _normed(rng, n, d=64):
    v = rng.randn(n, d).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def test_topk_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    corpus = _normed(rng, 500)
    queries = _normed(rng, 3)
    idx = VectorIndex.from_vectors(corpus)
    D, I = idx.search(queries, k=10)
    assert D.shape == (3, 10) and I.shape == (3, 10)
    ref_scores = queries @ corpus.T
    for q in range(3):
        ref_order = np.argsort(-ref_scores[q])[:10]
        np.testing.assert_array_equal(I[q], ref_order)
        np.testing.assert_allclose(D[q], ref_scores[q][ref_order], rtol=1e-5)


def test_exact_topk_seg_matches_lax_topk():
    """The two-level segment-max top-k (the round-3 fast path for large
    rows) must be exact: same values and, without ties, same indices as
    lax.top_k. Exercises the masked -inf tail and a k above/below the
    segment width."""
    import jax
    import jax.numpy as jnp

    from clipx.search.engine import _CHUNK_W, _exact_topk_seg

    rng = np.random.RandomState(7)
    n = 4 * _CHUNK_W
    scores = rng.randn(3, n).astype(np.float32)
    scores[:, -5000:] = -np.inf  # padded-rows mask
    for k in (1, 16, 64, 256):
        d, i = _exact_topk_seg(jnp.asarray(scores), k)
        dr, ir = jax.lax.top_k(jnp.asarray(scores), k)
        np.testing.assert_array_equal(np.asarray(d), np.asarray(dr))
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ir))


def test_exact_topk_seg_with_ties_returns_true_values():
    """With duplicated values the selected indices may tie-break
    differently from lax.top_k, but the returned values must still be
    the true top-k and each index must point at its value."""
    import jax.numpy as jnp

    from clipx.search.engine import _CHUNK_W, _exact_topk_seg

    rng = np.random.RandomState(8)
    n = 2 * _CHUNK_W
    scores = np.repeat(rng.randn(1, n // 8).astype(np.float32), 8, axis=1)
    d, i = _exact_topk_seg(jnp.asarray(scores), 32)
    d, i = np.asarray(d), np.asarray(i)
    ref = np.sort(scores[0])[::-1][:32]
    np.testing.assert_array_equal(d[0], ref)
    np.testing.assert_array_equal(scores[0][i[0]], d[0])


def test_scores_descending():
    rng = np.random.RandomState(1)
    idx = VectorIndex.from_vectors(_normed(rng, 200))
    D, _ = idx.search(_normed(rng, 1), k=50)
    assert (np.diff(D[0]) <= 1e-7).all()


def test_k_exceeding_corpus_pads_with_minus_one():
    rng = np.random.RandomState(2)
    idx = VectorIndex.from_vectors(_normed(rng, 5))
    D, I = idx.search(_normed(rng, 1), k=8)
    assert (I[0, :5] >= 0).all()
    assert (I[0, 5:] == -1).all()
    assert not np.isfinite(D[0, 5:]).any()


def test_incremental_add_ids_continue():
    rng = np.random.RandomState(3)
    a, b = _normed(rng, 10), _normed(rng, 10)
    idx = VectorIndex(dim=64)
    idx.add(a)
    idx.add(b)
    assert idx.ntotal == 20
    # query exactly equal to b[4] must hit id 14 first
    D, I = idx.search(b[4:5], k=1)
    assert I[0, 0] == 14
    np.testing.assert_allclose(D[0, 0], 1.0, rtol=1e-5)


def test_growth_across_bucket_boundary():
    rng = np.random.RandomState(4)
    idx = VectorIndex(dim=64)
    first = _normed(rng, 4000)
    second = _normed(rng, 3000)  # crosses the 4096 bucket
    idx.add(first)
    idx.add(second)
    assert idx.ntotal == 7000
    q = second[-1:]
    D, I = idx.search(q, k=1)
    assert I[0, 0] == 6999


def test_single_query_1d_shape_accepted():
    rng = np.random.RandomState(5)
    idx = VectorIndex.from_vectors(_normed(rng, 50))
    D, I = idx.search(_normed(rng, 1)[0], k=5)
    assert D.shape == (1, 5)


def test_empty_index():
    idx = VectorIndex(dim=64)
    D, I = idx.search(np.zeros((1, 64), np.float32), k=5)
    assert (I == -1).all()


def test_reconstruct():
    rng = np.random.RandomState(6)
    corpus = _normed(rng, 20)
    idx = VectorIndex.from_vectors(corpus)
    np.testing.assert_allclose(idx.reconstruct(7), corpus[7], rtol=1e-6)
    with pytest.raises(IndexError):
        idx.reconstruct(20)


def test_write_read_roundtrip(tmp_path):
    rng = np.random.RandomState(7)
    corpus = _normed(rng, 123)
    idx = VectorIndex.from_vectors(corpus)
    path = str(tmp_path / "images.index")
    write_index(idx, path)
    loaded = read_index(path)
    assert loaded.ntotal == 123 and loaded.dim == 64
    q = _normed(rng, 2)
    D1, I1 = idx.search(q, k=7)
    D2, I2 = loaded.search(q, k=7)
    np.testing.assert_array_equal(I1, I2)
    np.testing.assert_allclose(D1, D2, rtol=1e-6)


def test_read_index_rejects_garbage(tmp_path):
    path = tmp_path / "bogus.index"
    path.write_bytes(b"not an index file at all")
    with pytest.raises(ValueError):
        read_index(str(path))


def test_nprobe_is_accepted_noop():
    """The REPL 'p N' command keeps working (reference:query-index.py:48-54)
    even though exact search has nothing to probe."""
    rng = np.random.RandomState(8)
    idx = VectorIndex.from_vectors(_normed(rng, 100))
    q = _normed(rng, 1)
    D1, I1 = idx.search(q, k=5)
    idx.nprobe = 1
    D2, I2 = idx.search(q, k=5)
    np.testing.assert_array_equal(I1, I2)


def test_quantized_search_matches_exact():
    """int8 scan + f32 rescore returns the exact top-k on normalized
    CLIP-like vectors (margin makes misses vanishingly unlikely)."""
    rng = np.random.RandomState(11)
    corpus = _normed(rng, 3000)
    queries = _normed(rng, 4)
    exact = VectorIndex.from_vectors(corpus)
    quant = VectorIndex.from_vectors(corpus, quantized=True)
    De, Ie = exact.search(queries, k=20)
    Dq, Iq = quant.search(queries, k=20)
    np.testing.assert_array_equal(Iq, Ie)
    np.testing.assert_allclose(Dq, De, rtol=1e-5, atol=1e-6)


def test_quantized_incremental_add():
    rng = np.random.RandomState(12)
    a, b = _normed(rng, 100), _normed(rng, 50)
    idx = VectorIndex(dim=64, quantized=True)
    idx.add(a)
    idx.search(a[:1], k=5)      # builds codes
    idx.add(b)                  # invalidates codes
    D, I = idx.search(b[-1:], k=1)
    assert I[0, 0] == 149
    np.testing.assert_allclose(D[0, 0], 1.0, rtol=1e-5)


def test_quantize_rows_roundtrip_error_small():
    from clipx.search.engine import quantize_rows
    rng = np.random.RandomState(13)
    v = _normed(rng, 50)
    codes, scales = quantize_rows(v)
    assert codes.dtype == np.int8 and scales.shape == (50,)
    recon = codes.astype(np.float32) * scales[:, None]
    assert np.abs(recon - v).max() < 0.005


def test_large_query_batch_chunks():
    rng = np.random.RandomState(14)
    corpus = _normed(rng, 300)
    queries = _normed(rng, 20)  # > _MAX_Q, forces chunked kernel calls
    idx = VectorIndex.from_vectors(corpus)
    D, I = idx.search(queries, k=5)
    assert D.shape == (20, 5)
    ref = queries @ corpus.T
    for q in range(20):
        np.testing.assert_array_equal(I[q], np.argsort(-ref[q])[:5])


def test_absurd_k_is_clamped():
    """'c 9999999999' in the REPL must not allocate billions of result
    slots (fuzz-found: the sharded path np.pad'ed to k)."""
    rng = np.random.RandomState(15)
    idx = VectorIndex.from_vectors(_normed(rng, 10))
    D, I = idx.search(_normed(rng, 1), k=9_999_999_999)
    assert D.shape[1] <= 16384
    assert (I[0, :10] >= 0).all()


def test_large_k_small_corpus_pads_to_k():
    """k in (corpus bucket, clamp]: result must still be (Q, k) with -1
    padding, like faiss."""
    rng = np.random.RandomState(16)
    idx = VectorIndex.from_vectors(_normed(rng, 5))
    D, I = idx.search(_normed(rng, 1), k=5000)
    assert I.shape == (1, 5000)
    assert (I[0, :5] >= 0).all() and (I[0, 5:] == -1).all()


def test_read_index_rejects_truncated_and_corrupt_header(tmp_path):
    import struct as _struct

    from clipx.search.engine import _MAGIC

    # truncated data section
    p = tmp_path / "trunc.index"
    p.write_bytes(_MAGIC + _struct.pack("<qq", 100, 64) + b"\x00" * 16)
    with pytest.raises(ValueError, match="truncated"):
        read_index(str(p))
    # insane header values
    p2 = tmp_path / "corrupt.index"
    p2.write_bytes(_MAGIC + _struct.pack("<qq", -5, 10**9))
    with pytest.raises(ValueError, match="corrupt"):
        read_index(str(p2))


def test_write_read_empty_index(tmp_path):
    idx = VectorIndex(dim=64)
    path = str(tmp_path / "empty.index")
    write_index(idx, path)
    loaded = read_index(path)
    assert loaded.ntotal == 0 and loaded.dim == 64
    D, I = loaded.search(np.zeros((1, 64), np.float32), k=3)
    assert (I == -1).all()


def test_bucket_q_mapping():
    from clipx.search.engine import _MAX_Q, _bucket_q

    assert [_bucket_q(n) for n in (1, 2, 3, 4, 5, 8, 9, 16)] == \
        [1, 2, 4, 4, 8, 8, 16, 16]
    assert _bucket_q(_MAX_Q) == _MAX_Q


def test_q_padding_is_transparent_and_bounds_compiles():
    """Arbitrary query-row counts must (a) return exactly the rows the
    caller sent — identical to stacked single-query searches — and (b)
    land on at most one compiled shape per power-of-two Q bucket (the
    serve coalescer emits every fill 1..16; each un-bucketed fill would
    be a fresh multi-minute XLA compile on the tunnel-attached TPU —
    SERVING_r03.json)."""
    from clipx.search.engine import _search_kernel

    rng = np.random.RandomState(11)
    corpus = _normed(rng, 300)
    queries = _normed(rng, 7)
    idx = VectorIndex.from_vectors(corpus)
    _search_kernel._clear_cache()
    for q in (1, 3, 5, 6, 7):
        D, I = idx.search(queries[:q], k=5)
        assert D.shape == (q, 5) and I.shape == (q, 5)
        for row in range(q):
            D1, I1 = idx.search(queries[row: row + 1], k=5)
            np.testing.assert_array_equal(I[row], I1[0])
            np.testing.assert_allclose(D[row], D1[0], rtol=1e-6)
    # fills {1,3,5,6,7} -> buckets {1,4,8}: three compiles, not five
    assert _search_kernel._cache_size() == 3


def test_q_padding_quantized_path():
    """The int8 scan pads query rows too; padded zero rows must not
    perturb real rows' candidates (per-query scale has a 1e-12 floor)."""
    rng = np.random.RandomState(12)
    corpus = _normed(rng, 400)
    queries = _normed(rng, 3)
    idx = VectorIndex.from_vectors(corpus, quantized=True)
    D3, I3 = idx.search(queries, k=8)          # pads 3 -> 4
    for row in range(3):
        D1, I1 = idx.search(queries[row: row + 1], k=8)
        np.testing.assert_array_equal(I3[row], I1[0])
        np.testing.assert_allclose(D3[row], D1[0], rtol=1e-5, atol=1e-6)


def test_index_writer_streams_identical_sidecar(tmp_path):
    """IndexWriter (the indexer's device-free streaming sidecar path)
    must produce byte-identical files to write_index, validate row
    shape, and refuse to finalize an incomplete index."""
    from clipx.search.engine import IndexWriter

    rng = np.random.RandomState(42)
    data = rng.randn(1000, 32).astype(np.float32)
    ref_path = str(tmp_path / "ref.index")
    write_index(VectorIndex.from_vectors(data), ref_path)

    stream_path = str(tmp_path / "stream.index")
    w = IndexWriter(stream_path, 1000, 32)
    for i in range(0, 1000, 300):
        w.write(data[i: i + 300])
    w.close()
    with open(ref_path, "rb") as a, open(stream_path, "rb") as b:
        assert a.read() == b.read()

    # wrong dim rejected
    w = IndexWriter(str(tmp_path / "x.index"), 10, 32)
    with pytest.raises(ValueError):
        w.write(data[:5, :16])
    # overflow rejected
    with pytest.raises(ValueError):
        w.write(data[:11])
    # incomplete close rejected, tmp removed, no index file left behind
    with pytest.raises(ValueError):
        w.close()
    assert not os.path.exists(str(tmp_path / "x.index"))
    assert not os.path.exists(str(tmp_path / "x.index.tmp"))


def test_query_dim_mismatch_raises_cleanly():
    """A wrong-dim query (typically --model not matching the built
    index) must raise a clear ValueError, not a shape error from deep
    inside a kernel (found driving a 512-d index with a 32-d model)."""
    import pytest

    v = np.random.RandomState(0).randn(100, 64).astype(np.float32)
    idx = VectorIndex.from_vectors(v)
    with pytest.raises(ValueError, match="query dim 32 != index dim 64"):
        idx.search(np.zeros((1, 32), np.float32), 5)
    from clipx.search.ivf import IVFIndex

    ivf = IVFIndex.from_vectors(v)
    with pytest.raises(ValueError, match="query dim"):
        ivf.search(np.zeros((1, 32), np.float32), 5)
    from clipx.parallel.mips import ShardedVectorIndex

    sh = ShardedVectorIndex(v)
    with pytest.raises(ValueError, match="query dim"):
        sh.search(np.zeros((1, 32), np.float32), 5)
