"""--corpus-dtype bf16: halved-HBM corpus storage with f32 accumulation.

The capacity knob (clipx/cli/common.py): store the device corpus in
bfloat16 so one chip serves ~2x the vectors, while every score still
accumulates in f32. Ranking drift is bounded by bf16 rounding of the
stored rows (~1e-3 cosine), so on corpora whose top-k score gaps exceed
that noise the ranking must be IDENTICAL to f32 — pinned here with a
planted corpus whose gaps are controlled. The on-disk sidecar stays f32
(reference contract: reference:build-index.py:109 equivalent).
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipx.cli import common
from clipx.search.engine import VectorIndex, write_index, read_index


def _planted(rng, n, d=64, k=16, gap=0.02):
    """Corpus + query where the true top-k is unambiguous: k planted
    rows score 0.9, 0.9-gap, 0.9-2*gap, ... against the query; the
    other rows are random with max score pushed below the planted band."""
    q = rng.randn(d).astype(np.float32)
    q /= np.linalg.norm(q)
    noise = rng.randn(n, d).astype(np.float32)
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    # strip the q component then re-add a small controlled amount so no
    # noise row can reach the planted score band
    noise -= np.outer(noise @ q, q)
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    noise = 0.95 * noise + np.outer(
        0.2 * rng.rand(n).astype(np.float32), q)
    planted = np.zeros((k, d), np.float32)
    for i in range(k):
        s = 0.9 - i * gap
        r = rng.randn(d).astype(np.float32)
        r -= (r @ q) * q
        r /= np.linalg.norm(r)
        planted[i] = s * q + np.sqrt(1 - s * s) * r
    corpus = np.concatenate([noise, planted]).astype(np.float32)
    expect = np.arange(n, n + k, dtype=np.int64)
    return corpus, q[None, :], expect


def test_exact_bf16_ranking_matches_f32():
    rng = np.random.RandomState(0)
    corpus, q, expect = _planted(rng, 2000)
    idx = VectorIndex.from_vectors(corpus, dtype=jnp.bfloat16)
    assert idx._corpus.dtype == jnp.bfloat16
    D, I = idx.search(q, k=16)
    np.testing.assert_array_equal(I[0], expect)
    ref = (q @ corpus.T)[0][expect]
    np.testing.assert_allclose(D[0], ref, atol=5e-3)


def test_quantized_bf16_ranking_matches_f32():
    rng = np.random.RandomState(1)
    corpus, q, expect = _planted(rng, 4096)
    idx = VectorIndex.from_vectors(corpus, dtype=jnp.bfloat16,
                                   quantized=True)
    D, I = idx.search(q, k=16)
    assert idx._codes is not None and idx._codes.dtype == jnp.int8
    np.testing.assert_array_equal(I[0], expect)


def test_quantize_device_exact_codes_from_bf16():
    """Code rounding must happen in f32: quantizing the bf16-rounded
    corpus must equal quantizing those same values held in f32 (a bf16
    division before rint perturbs codes by +-1)."""
    from clipx.search.engine import _quantize_device

    rng = np.random.RandomState(2)
    v32 = rng.randn(256, 64).astype(np.float32)
    vbf = jnp.asarray(v32, jnp.bfloat16)
    c_bf, s_bf = _quantize_device(vbf)
    c_32, s_32 = _quantize_device(vbf.astype(jnp.float32))
    np.testing.assert_array_equal(np.asarray(c_bf), np.asarray(c_32))
    np.testing.assert_array_equal(np.asarray(s_bf), np.asarray(s_32))
    assert s_bf.dtype == jnp.float32


def test_bf16_add_and_grow_keep_dtype():
    rng = np.random.RandomState(3)
    idx = VectorIndex.from_vectors(
        rng.randn(100, 32).astype(np.float32), dtype=jnp.bfloat16)
    for _ in range(3):
        idx.add(rng.randn(2500, 32).astype(np.float32))
    assert idx.ntotal == 7600
    assert idx._corpus.dtype == jnp.bfloat16
    D, I = idx.search(rng.randn(1, 32).astype(np.float32), k=5)
    assert np.isfinite(D).all() and (I >= 0).all()


def test_bf16_sidecar_stays_f32(tmp_path):
    rng = np.random.RandomState(4)
    corpus = rng.randn(50, 16).astype(np.float32)
    idx = VectorIndex.from_vectors(corpus, dtype=jnp.bfloat16)
    path = str(tmp_path / "images.index")
    write_index(idx, path)
    back = read_index(path)
    assert back._corpus.dtype == jnp.float32
    # rows round-tripped through bf16 storage: equal to bf16(f32 rows)
    np.testing.assert_array_equal(
        back.vectors(), np.asarray(jnp.asarray(corpus, jnp.bfloat16),
                                   np.float32))


def test_sharded_bf16_matches_single_device():
    from clipx.parallel.mips import ShardedVectorIndex

    rng = np.random.RandomState(5)
    corpus, q, expect = _planted(rng, 3000)
    sh = ShardedVectorIndex(corpus, dtype=jnp.bfloat16, quantized=True)
    assert sh._corpus.dtype == jnp.bfloat16
    D, I = sh.search(q, k=16)
    np.testing.assert_array_equal(I[0], expect)
    single = VectorIndex.from_vectors(corpus, dtype=jnp.bfloat16,
                                      quantized=True)
    Ds, Is = single.search(q, k=16)
    np.testing.assert_array_equal(I, Is)
    np.testing.assert_allclose(D, Ds, atol=1e-5)


def test_ivf_bf16_full_probe_matches_exact():
    from clipx.search.ivf import IVFIndex

    rng = np.random.RandomState(6)
    corpus, q, expect = _planted(rng, 3000)
    idx = IVFIndex.from_vectors(corpus, dtype=jnp.bfloat16)
    assert idx._corpus3.dtype == jnp.bfloat16
    D, I = idx.search(q, k=16, nprobe=100)
    np.testing.assert_array_equal(I[0], expect)
    # tail adds inherit the storage dtype
    idx.add(corpus[:10])
    assert idx._tail._corpus.dtype == jnp.bfloat16


def _args(**kw):
    ns = argparse.Namespace(sharded="off", search_mode="auto",
                            index="unused", corpus_dtype="f32")
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def test_flag_plumbs_to_every_index_type(tmp_path):
    rng = np.random.RandomState(7)
    vecs = rng.randn(300, 32).astype(np.float32)

    idx = common.build_index_from_vectors(vecs, _args(corpus_dtype="bf16"))
    assert idx._corpus.dtype == jnp.bfloat16

    idx = common.build_index_from_vectors(
        vecs, _args(corpus_dtype="bf16", sharded="on"))
    assert idx._corpus.dtype == jnp.bfloat16

    idx = common.build_index_from_vectors(
        vecs, _args(corpus_dtype="bf16", search_mode="ivf",
                    index=str(tmp_path / "i.index")))
    assert idx._corpus3.dtype == jnp.bfloat16

    idx = common.build_index_from_vectors(
        vecs, _args(corpus_dtype="bf16", search_mode="ivf", sharded="on",
                    index=str(tmp_path / "i.index")))
    assert idx._corpus3.dtype == jnp.bfloat16

    # default stays exact f32
    idx = common.build_index_from_vectors(vecs, _args())
    assert idx._corpus.dtype == jnp.float32


def test_bad_dtype_rejected():
    with pytest.raises(ValueError):
        VectorIndex.from_vectors(
            np.random.RandomState(8).randn(200000, 8).astype(np.float32)
            [:2000], dtype=jnp.float16, quantized=True).search(
                np.zeros((1, 8), np.float32), 5)


# -- int8 STORAGE (--corpus-dtype int8): the codes are the corpus ---------


def test_int8_storage_ranking_matches_f32():
    rng = np.random.RandomState(10)
    corpus, q, expect = _planted(rng, 4096)
    idx = VectorIndex.from_vectors(corpus, dtype=jnp.int8)
    assert idx.int8_storage and idx.quantized
    assert idx._corpus is None and idx._codes.dtype == jnp.int8
    D, I = idx.search(q, k=16)
    np.testing.assert_array_equal(I[0], expect)
    ref = (q @ corpus.T)[0][expect]
    np.testing.assert_allclose(D[0], ref, atol=5e-3)


def test_int8_storage_add_and_grow():
    rng = np.random.RandomState(11)
    idx = VectorIndex.from_vectors(
        rng.randn(100, 32).astype(np.float32), dtype=jnp.int8)
    for _ in range(3):
        idx.add(rng.randn(2500, 32).astype(np.float32))
    assert idx.ntotal == 7600
    assert idx._codes.dtype == jnp.int8
    D, I = idx.search(rng.randn(1, 32).astype(np.float32), k=5)
    assert np.isfinite(D).all() and (I >= 0).all()
    # ids continue: a vector added later must be findable by self-match.
    # Inner-product search: the probe must dominate every corpus row's
    # IP with itself, so give it a norm above the corpus rows' (~5.7)
    probe = rng.randn(1, 32).astype(np.float32)
    probe *= 10.0 / np.linalg.norm(probe)
    idx.add(probe)
    D, I = idx.search(probe, k=1)
    assert I[0, 0] == idx.ntotal - 1


def test_int8_storage_reconstruct_and_vectors_dequantize():
    rng = np.random.RandomState(12)
    corpus = rng.randn(60, 16).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    idx = VectorIndex.from_vectors(corpus, dtype=jnp.int8)
    rec = idx.reconstruct(7)
    cos = float(rec @ corpus[7] / np.linalg.norm(rec))
    assert cos > 0.9999
    v = idx.vectors()
    assert v.shape == corpus.shape and v.dtype == np.float32
    np.testing.assert_allclose(v, corpus, atol=2e-2)


def test_int8_storage_sharded_matches_single_device():
    from clipx.parallel.mips import ShardedVectorIndex

    rng = np.random.RandomState(13)
    corpus, q, expect = _planted(rng, 3000)
    sh = ShardedVectorIndex(corpus, dtype=jnp.int8)
    assert sh.int8_storage and sh._corpus is None
    D, I = sh.search(q, k=16)
    np.testing.assert_array_equal(I[0], expect)
    single = VectorIndex.from_vectors(corpus, dtype=jnp.int8)
    Ds, Is = single.search(q, k=16)
    np.testing.assert_array_equal(I, Is)
    np.testing.assert_allclose(D, Ds, atol=1e-5)
    # in-place sharded add (serve /reload) keeps storage + ranking sane
    sh2 = ShardedVectorIndex(corpus[:2000], dtype=jnp.int8)
    sh2.add(corpus[2000:])
    D2, I2 = sh2.search(q, k=16)
    np.testing.assert_array_equal(I2, I)


def test_int8_flag_plumbs_and_search_mode_is_fixed(tmp_path):
    rng = np.random.RandomState(14)
    vecs = rng.randn(300, 32).astype(np.float32)

    idx = common.build_index_from_vectors(vecs, _args(corpus_dtype="int8"))
    assert idx.int8_storage
    # exact mode cannot un-quantize an int8-storage index
    idx = common.build_index_from_vectors(
        vecs, _args(corpus_dtype="int8", search_mode="exact"))
    assert idx.int8_storage and idx.quantized
    idx = common.build_index_from_vectors(
        vecs, _args(corpus_dtype="int8", sharded="on"))
    assert idx.int8_storage

    # composes with IVF: codes are the corpus, probed scan + dequantized
    # rescore (clipx/search/ivf.py _ivf_kernel_int8_pure)
    idx = common.build_index_from_vectors(
        vecs, _args(corpus_dtype="int8", search_mode="ivf",
                    index=str(tmp_path / "i.index")))
    assert idx.int8_storage and idx.quantized
    assert idx._corpus3 is None and idx._codes3 is not None

    idx = common.build_index_from_vectors(
        vecs, _args(corpus_dtype="int8", search_mode="ivf", sharded="on",
                    index=str(tmp_path / "i2.index")))
    assert idx.int8_storage and idx._corpus3 is None


# -- int4 STORAGE (--corpus-dtype int4): packed codes are the corpus ------
#
# The faiss-SQ4 analog: 0.5 B/dim, ~2x the int8 tier's capacity, with
# the documented recall trade (engine's int4 section — measured 0.874
# recall@50 / exact top-1 on the adversarial random corpus, gated in
# test_quality_gate). These tests pin the mechanics: pack/unpack
# round-trips, the chunked scan, ranking on gap-separated corpora where
# quantization noise cannot reorder anything, growth, and parity of the
# sharded/IVF compositions with the flat index.


def test_int4_pack_unpack_round_trip():
    from clipx.search.engine import (_unpack_int4, pack_int4,
                                     unpack_int4_host)

    rng = np.random.RandomState(20)
    codes = rng.randint(-7, 8, size=(13, 22)).astype(np.int8)
    p = pack_int4(codes)
    assert p.shape == (13, 11) and p.dtype == np.int8
    np.testing.assert_array_equal(unpack_int4_host(p), codes)
    np.testing.assert_array_equal(
        np.asarray(_unpack_int4(jnp.asarray(p))), codes)


def test_int4_quantize_dequant_cosine():
    from clipx.search.engine import quantize_rows_int4, unpack_int4_host

    rng = np.random.RandomState(21)
    v = rng.randn(200, 512).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    packed, scales = quantize_rows_int4(v)
    assert packed.shape == (200, 256) and scales.dtype == np.float32
    deq = unpack_int4_host(packed).astype(np.float32) * scales[:, None]
    cos = (deq * v).sum(1) / np.maximum(np.linalg.norm(deq, axis=1), 1e-9)
    # 4-bit rounding of unit-norm rows: cosine stays > 0.98 (the
    # MSE-searched scale; plain max/7 measured ~0.987 min)
    assert cos.min() > 0.98


def test_int4_storage_ranking_matches_f32():
    rng = np.random.RandomState(22)
    # gap 0.1 >> the ~6e-3 rounding-noise RMS: ranking must be exact
    corpus, q, expect = _planted(rng, 4096, k=8, gap=0.08)
    idx = VectorIndex.from_vectors(corpus, dtype=jnp.int4)
    assert idx.int4_storage and idx.quantized and idx.coded_storage
    assert idx._corpus is None and idx._codes.shape[1] == 32
    D, I = idx.search(q, k=8)
    np.testing.assert_array_equal(I[0], expect)
    ref = (q @ corpus.T)[0][expect]
    # returned scores carry corpus rounding only (~6e-3 RMS at these
    # max|x| ~0.9 rows)
    np.testing.assert_allclose(D[0], ref, atol=8e-2)


def test_int4_chunked_scan_matches_single_chunk(monkeypatch):
    """The lax.map chunked unpack-scan (corpora past _INT4_CHUNK rows)
    must rank identically to the single-chunk path."""
    import clipx.search.engine as engine

    rng = np.random.RandomState(23)
    corpus, q, expect = _planted(rng, 4000, k=8, gap=0.08)
    single = VectorIndex.from_vectors(corpus, dtype=jnp.int4)
    D1, I1 = single.search(q, k=8)
    # shrink the chunk so the padded 4096-row capacity runs 8 map steps
    monkeypatch.setattr(engine, "_INT4_CHUNK", 512)
    engine._search_kernel_int4_pure.clear_cache()
    try:
        chunked = VectorIndex.from_vectors(corpus, dtype=jnp.int4)
        D2, I2 = chunked.search(q, k=8)
    finally:
        engine._search_kernel_int4_pure.clear_cache()
    np.testing.assert_array_equal(I1, I2)
    np.testing.assert_allclose(D1, D2, atol=1e-6)
    np.testing.assert_array_equal(I1[0], expect)


def test_int4_storage_add_and_grow():
    rng = np.random.RandomState(24)
    idx = VectorIndex.from_vectors(
        rng.randn(100, 32).astype(np.float32), dtype=jnp.int4)
    for _ in range(3):
        idx.add(rng.randn(2500, 32).astype(np.float32))
    assert idx.ntotal == 7600
    assert idx._codes.dtype == jnp.int8 and idx._codes.shape[1] == 16
    D, I = idx.search(rng.randn(1, 32).astype(np.float32), k=5)
    assert np.isfinite(D).all() and (I >= 0).all()
    # ids continue: self-match a dominating probe added last
    probe = rng.randn(1, 32).astype(np.float32)
    probe *= 10.0 / np.linalg.norm(probe)
    idx.add(probe)
    D, I = idx.search(probe, k=1)
    assert I[0, 0] == idx.ntotal - 1


def test_int4_reconstruct_and_vectors_dequantize():
    rng = np.random.RandomState(25)
    corpus = rng.randn(60, 16).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    idx = VectorIndex.from_vectors(corpus, dtype=jnp.int4)
    rec = idx.reconstruct(7)
    cos = float(rec @ corpus[7] / np.linalg.norm(rec))
    assert cos > 0.97
    v = idx.vectors()
    assert v.shape == corpus.shape and v.dtype == np.float32
    np.testing.assert_allclose(v, corpus, atol=0.12)


def test_int4_odd_dim_rejected():
    with pytest.raises(ValueError, match="even dim"):
        VectorIndex.from_vectors(
            np.zeros((10, 15), np.float32), dtype=jnp.int4)


def test_int4_storage_sharded_matches_single_device():
    from clipx.parallel.mips import ShardedVectorIndex

    rng = np.random.RandomState(26)
    corpus, q, expect = _planted(rng, 3000, k=8, gap=0.08)
    sh = ShardedVectorIndex(corpus, dtype=jnp.int4)
    assert sh.int4_storage and sh._corpus is None
    assert sh._codes.shape[1] == 32
    D, I = sh.search(q, k=8)
    np.testing.assert_array_equal(I[0], expect)
    single = VectorIndex.from_vectors(corpus, dtype=jnp.int4)
    Ds, Is = single.search(q, k=8)
    np.testing.assert_array_equal(I, Is)
    np.testing.assert_allclose(D, Ds, atol=1e-5)
    # in-place sharded add (serve /reload) keeps storage + ranking sane
    sh2 = ShardedVectorIndex(corpus[:2000], dtype=jnp.int4)
    sh2.add(corpus[2000:])
    D2, I2 = sh2.search(q, k=8)
    np.testing.assert_array_equal(I2, I)


def test_int4_shard_rows_chunk_multiple():
    from clipx.parallel.mips import _shard_rows
    from clipx.search.engine import _INT4_CHUNK

    assert _shard_rows(100, 8, True) == 128
    # a shard larger than one scan chunk must be a chunk MULTIPLE —
    # 9 chunks over 4 shards would otherwise give 2.25-chunk shards
    r = _shard_rows(9 * _INT4_CHUNK, 4, True)
    assert r % _INT4_CHUNK == 0 and r * 4 >= 9 * _INT4_CHUNK


def test_int4_ivf_full_probe_matches_flat():
    from clipx.search.ivf import IVFIndex

    rng = np.random.RandomState(27)
    corpus, q, expect = _planted(rng, 3000, k=8, gap=0.08)
    idx = IVFIndex.from_vectors(corpus, dtype=jnp.int4)
    assert idx.int4_storage and idx._corpus3 is None
    assert idx._codes3.shape[2] == 32
    D, I = idx.search(q, k=8, nprobe=100)
    np.testing.assert_array_equal(I[0], expect)
    # tail adds inherit the storage dtype
    idx.add(corpus[:10])
    assert idx._tail.int4_storage
    D, I = idx.search(q, k=8, nprobe=100)
    np.testing.assert_array_equal(I[0], expect)
    v = idx.vectors()
    assert v.shape == (idx.ntotal, 64)
    rec = idx.reconstruct(0)
    assert rec.shape == (64,)


def test_int4_sharded_ivf_full_probe_matches_flat():
    from clipx.search.ivf import ShardedIVFIndex

    rng = np.random.RandomState(28)
    corpus, q, expect = _planted(rng, 3000, k=8, gap=0.08)
    sh = ShardedIVFIndex.from_vectors(corpus, dtype=jnp.int4)
    assert sh.int4_storage and sh._codes3.shape[2] == 32
    D, I = sh.search(q, k=8, nprobe=100)
    np.testing.assert_array_equal(I[0], expect)
    D, I = sh.search(q, k=8, nprobe=16)
    np.testing.assert_array_equal(I[0], expect)


def test_int4_flag_plumbs_and_search_mode_is_fixed(tmp_path):
    rng = np.random.RandomState(29)
    vecs = rng.randn(300, 32).astype(np.float32)

    idx = common.build_index_from_vectors(vecs, _args(corpus_dtype="int4"))
    assert idx.int4_storage
    # exact mode cannot un-quantize an int4-storage index
    idx = common.build_index_from_vectors(
        vecs, _args(corpus_dtype="int4", search_mode="exact"))
    assert idx.int4_storage and idx.quantized
    idx = common.build_index_from_vectors(
        vecs, _args(corpus_dtype="int4", sharded="on"))
    assert idx.int4_storage

    idx = common.build_index_from_vectors(
        vecs, _args(corpus_dtype="int4", search_mode="ivf",
                    index=str(tmp_path / "i.index")))
    assert idx.int4_storage and idx.quantized
    assert idx._corpus3 is None and idx._codes3 is not None

    idx = common.build_index_from_vectors(
        vecs, _args(corpus_dtype="int4", search_mode="ivf", sharded="on",
                    index=str(tmp_path / "i2.index")))
    assert idx.int4_storage and idx._corpus3 is None


# -- coded-storage rotation (CLIPX_CORPUS_ROTATE) ------------------------------
#
# One fixed seed-derived orthogonal matrix rotates rows before
# quantization and queries before the scan: inner products are
# invariant, but row energy spreads evenly, shrinking the max|x|-keyed
# quantization step on anisotropic (CLIP-like) embeddings. Measured in
# the round-3 design experiment: int4 recall@50 0.63 -> 0.90, int8
# 0.97 -> 0.99 on a power-law-spectrum corpus; a wash on isotropic.


def _anisotropic(rng, n=4000, d=128, alpha=0.75):
    spec = (1.0 / np.arange(1, d + 1)) ** alpha
    x = rng.standard_normal((n, d)) * spec
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(np.float32)


def test_rotation_matrix_deterministic_and_orthogonal():
    from clipx.search.engine import _rotation_matrix

    r1 = _rotation_matrix(64)
    r2 = _rotation_matrix(64)
    assert r1 is r2 or np.array_equal(r1, r2)
    eye = r1 @ r1.T
    np.testing.assert_allclose(eye, np.eye(64), atol=1e-5)


def test_rotation_knob_off_disables(monkeypatch):
    from clipx.search import engine

    monkeypatch.setenv("CLIPX_CORPUS_ROTATE", "off")
    # centering (round 5) composes with rotation-off: codes are
    # unrotated residuals from the plain corpus mean
    rng = np.random.default_rng(0)
    vecs = _anisotropic(rng, n=512)
    assert engine.corpus_rotation(64) is None
    idx = VectorIndex.from_vectors(vecs, dtype=jnp.int8)
    assert idx._rot is None
    np.testing.assert_allclose(idx._center,
                               vecs.mean(axis=0), atol=1e-5)
    # both knobs off: codes equal the legacy (round-2, unrotated,
    # uncentered) quantizer output bit-for-bit
    monkeypatch.setenv("CLIPX_CODED_CENTER", "off")
    legacy = VectorIndex.from_vectors(vecs, dtype=jnp.int8)
    assert legacy._center is None
    from clipx.search.engine import quantize_rows

    codes, scales = quantize_rows(vecs)
    assert np.array_equal(np.asarray(legacy._codes[:512]), codes)


@pytest.mark.parametrize("dtype", [jnp.int8, jnp.int4])
def test_rotation_improves_anisotropic_recall(monkeypatch, dtype):
    """The design experiment as a regression gate: on a power-law
    corpus the rotated index must beat the unrotated one by a clear
    margin for int4 (where the step is coarsest) and never lose for
    int8."""
    rng = np.random.default_rng(7)
    vecs = _anisotropic(rng)
    queries = vecs[:32] + 0.05 * rng.standard_normal(
        (32, vecs.shape[1])).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    k = 20
    exact = np.argsort(-(queries @ vecs.T), axis=1)[:, :k]

    def recall(on):
        monkeypatch.setenv("CLIPX_CORPUS_ROTATE", "on" if on else "off")
        idx = VectorIndex.from_vectors(vecs, dtype=dtype)
        _, ids = idx.search(queries, k=k)
        return np.mean([len(set(exact[i]) & set(ids[i])) / k
                        for i in range(len(queries))])

    off, on = recall(False), recall(True)
    if jnp.dtype(dtype) == jnp.dtype(jnp.int4):
        assert on >= off + 0.05, (off, on)
    else:
        assert on >= off - 0.01, (off, on)


def test_rotation_reconstruct_returns_user_space():
    """reconstruct()/vectors() must unrotate: callers (serve /similar,
    find-dupes, write_index) see rows in the original embedding space
    regardless of the internal rotation."""
    rng = np.random.default_rng(3)
    vecs = _anisotropic(rng, n=256)
    for dtype, tol in ((jnp.int8, 5e-3), (jnp.int4, 8e-2)):
        idx = VectorIndex.from_vectors(vecs, dtype=dtype)
        assert idx._rot is not None
        rec = idx.reconstruct(5)
        assert np.linalg.norm(rec - vecs[5]) < tol * 10
        cos = float(rec @ vecs[5] / max(np.linalg.norm(rec), 1e-9))
        assert cos > (0.99 if jnp.dtype(dtype) == jnp.dtype(jnp.int8)
                      else 0.97), cos
        allv = idx.vectors()
        assert allv.shape == vecs.shape
        cos_all = (allv * vecs).sum(axis=1) / np.maximum(
            np.linalg.norm(allv, axis=1), 1e-9)
        assert cos_all.min() > (0.999 if jnp.dtype(dtype)
                                == jnp.dtype(jnp.int8) else 0.95)


def test_rotation_consistent_across_classes():
    """Flat, sharded, IVF and sharded-IVF must agree under rotation on
    a well-separated corpus (the same cross-class contract the
    unrotated tests pin)."""
    from clipx.parallel import mips
    from clipx.parallel.mesh import make_mesh
    from clipx.search.ivf import IVFIndex, ShardedIVFIndex

    rng = np.random.default_rng(11)
    vecs = _anisotropic(rng, n=900)
    queries = vecs[:4]
    flat = VectorIndex.from_vectors(vecs, dtype=jnp.int4)
    df, idf = flat.search(queries, k=5)
    assert (idf[np.arange(4), 0] == np.arange(4)).all()

    mesh = make_mesh({"shard": len(jax.devices())})
    sharded = mips.ShardedVectorIndex(vecs, mesh, dtype=jnp.int4)
    ds, ids = sharded.search(queries, k=5)
    assert np.array_equal(ids, idf)

    ivf = IVFIndex.from_vectors(vecs, dtype=jnp.int4)
    _, idi = ivf.search(queries, k=5, nprobe=100)
    assert np.array_equal(idi, idf)

    sivf = ShardedIVFIndex.from_vectors(vecs, mesh=mesh, dtype=jnp.int4)
    _, idsv = sivf.search(queries, k=5, nprobe=100)
    assert (idsv[np.arange(4), 0] == np.arange(4)).all()
