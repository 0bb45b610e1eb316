"""--corpus-dtype pq: 4-bit product-quantized storage, codes are the corpus.

The deepest capacity rung (clipx/search/pq.py) — the faiss IndexPQ /
fast-scan analog at 2 bits/dim (dsub=2, default) or 1 bit/dim (dsub=4).
The scan recasts faiss's SIMD-shuffle LUT lookup as one-hot x LUT
matmuls on the MXU; these tests pin the mechanics: pack/unpack round
trips, *exactness of the kernel against the PQ-decode oracle* (returned
scores are the full-precision PQ scores, so ranking must equal a brute
force over the decoded rows — independent of reconstruction quality),
chunked-scan equivalence, growth, codebook determinism, sharded parity,
and CLI plumbing. Recall-vs-exact quality is gated separately in
test_quality_gate.
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipx.cli import common
from clipx.search import pq as pq_lib
from clipx.search.engine import VectorIndex, read_index, write_index


def _unit(rng, n, d=64):
    v = rng.standard_normal((n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v


def _queries(rng, vecs, nq=4, noise=0.05):
    q = vecs[:nq] + noise * rng.standard_normal(
        (nq, vecs.shape[1])).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return q


def test_pack_unpack_round_trip():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 16, size=(13, 22)).astype(np.uint8)
    p = pq_lib.pack_codes4(codes)
    assert p.shape == (13, 11) and p.dtype == np.int8
    np.testing.assert_array_equal(pq_lib.unpack_codes4_host(p), codes)
    np.testing.assert_array_equal(
        np.asarray(pq_lib._unpack_codes4(jnp.asarray(p))), codes)


def test_codebook_train_encode_decode():
    rng = np.random.default_rng(1)
    vecs = _unit(rng, 1000, 64)
    cb = pq_lib.PQCodebook.train(vecs)
    assert cb.centroids.shape == (64 // cb.dsub, 16, cb.dsub)
    codes = cb.encode(vecs)
    assert codes.shape == (1000, cb.m // 2) and codes.dtype == np.int8
    dec = cb.decode(codes)
    cos = (dec * vecs).sum(1) / np.maximum(
        np.linalg.norm(dec, axis=1), 1e-9)
    # 2 bits/dim on unit-norm rows: reconstruction stays broadly aligned
    assert cos.mean() > 0.75 and cos.min() > 0.5


def test_codebook_deterministic():
    rng = np.random.default_rng(2)
    vecs = _unit(rng, 500, 32)
    a = pq_lib.PQCodebook.train(vecs)
    b = pq_lib.PQCodebook.train(vecs)
    np.testing.assert_array_equal(a.centroids, b.centroids)
    np.testing.assert_array_equal(a.encode(vecs), b.encode(vecs))


def test_search_matches_pq_decode_oracle():
    """The kernel's contract: returned (D, I) equal a brute-force MIPS
    over the DECODED corpus (the best any PQ index can do) — the int8
    LUT affects candidate selection only and the margin absorbs it."""
    rng = np.random.default_rng(3)
    vecs = _unit(rng, 2500, 64)
    q = _queries(rng, vecs, nq=4)
    idx = VectorIndex.from_vectors(vecs, dtype="pq")
    assert idx.pq_storage and idx.quantized and idx.coded_storage
    assert idx._corpus is None and idx._scales is None
    D, I = idx.search(q, k=20)
    oracle = q @ idx.vectors().T          # decoded rows, user space
    o_sorted = -np.sort(-oracle, axis=1)[:, :20]
    np.testing.assert_allclose(D, o_sorted, atol=1e-4)
    # each returned id's oracle score matches its returned score
    np.testing.assert_allclose(
        D, np.take_along_axis(oracle, I, axis=1), atol=1e-4)


def test_self_match_top1():
    rng = np.random.default_rng(4)
    vecs = _unit(rng, 3000, 128)
    idx = VectorIndex.from_vectors(vecs, dtype="pq")
    D, I = idx.search(vecs[100:104], k=3)
    np.testing.assert_array_equal(I[:, 0], np.arange(100, 104))


def test_chunked_scan_matches_single_chunk(monkeypatch):
    """The lax.map chunked one-hot scan (corpora past _PQ_CHUNK rows)
    must return exactly what the single-chunk path returns."""
    rng = np.random.default_rng(5)
    vecs = _unit(rng, 4000, 64)
    q = _queries(rng, vecs)
    single = VectorIndex.from_vectors(vecs, dtype="pq")
    D1, I1 = single.search(q, k=8)
    monkeypatch.setattr(pq_lib, "_PQ_CHUNK", 512)
    pq_lib._search_kernel_pq.clear_cache()
    try:
        chunked = VectorIndex.from_vectors(vecs, dtype="pq")
        D2, I2 = chunked.search(q, k=8)
    finally:
        pq_lib._search_kernel_pq.clear_cache()
    np.testing.assert_array_equal(I1, I2)
    np.testing.assert_allclose(D1, D2, atol=1e-6)


def test_add_and_grow():
    rng = np.random.default_rng(6)
    idx = VectorIndex.from_vectors(_unit(rng, 100, 32), dtype="pq")
    first_cb = idx._pq.centroids.copy()
    for _ in range(3):
        idx.add(_unit(rng, 2500, 32))
    assert idx.ntotal == 7600
    assert idx._codes.dtype == jnp.int8
    # physical layout is lane-paired (pq.pack_factor): pf logical rows
    # per 128-byte-wide physical row
    pf = pq_lib.pack_factor(idx._code_dim)
    assert idx._codes.shape[1] == idx._code_dim * pf
    assert idx._codes.shape[0] * pf >= idx.ntotal
    # codebooks froze at the first add (faiss train-once semantics)
    np.testing.assert_array_equal(idx._pq.centroids, first_cb)
    D, I = idx.search(_unit(rng, 1, 32), k=5)
    assert np.isfinite(D).all() and (I >= 0).all()
    # ids continue: a row added last self-matches at its new id
    probe = _unit(rng, 1, 32)
    idx.add(probe)
    D, I = idx.search(probe, k=1)
    assert I[0, 0] == idx.ntotal - 1


def test_reconstruct_and_vectors_user_space():
    """reconstruct()/vectors() decode through the codebooks AND
    unrotate — callers see rows in the original embedding space."""
    rng = np.random.default_rng(7)
    vecs = _unit(rng, 300, 64)
    idx = VectorIndex.from_vectors(vecs, dtype="pq")
    assert idx._rot is not None
    rec = idx.reconstruct(7)
    cos = float(rec @ vecs[7] / max(np.linalg.norm(rec), 1e-9))
    assert cos > 0.6, cos
    v = idx.vectors()
    assert v.shape == vecs.shape and v.dtype == np.float32
    cos_all = (v * vecs).sum(1) / np.maximum(
        np.linalg.norm(v, axis=1), 1e-9)
    assert cos_all.min() > 0.5


def test_sidecar_round_trip_is_decoded(tmp_path):
    """write_index from a pq index persists the DECODED rows (the tier
    is lossy; the normal flow writes the f32 sidecar from the exact
    stream in build-index.py, reference:build-index.py:109 analog)."""
    rng = np.random.default_rng(8)
    vecs = _unit(rng, 50, 32)
    idx = VectorIndex.from_vectors(vecs, dtype="pq")
    path = str(tmp_path / "images.index")
    write_index(idx, path)
    back = read_index(path)
    assert back._corpus.dtype == jnp.float32
    np.testing.assert_allclose(back.vectors(), idx.vectors(), atol=1e-6)


def test_bad_dim_rejected():
    with pytest.raises(ValueError, match="pq storage needs dim"):
        VectorIndex.from_vectors(np.zeros((10, 10), np.float32),
                                 dtype="pq")


def test_dsub_knob(monkeypatch):
    rng = np.random.default_rng(9)
    vecs = _unit(rng, 200, 64)
    idx2 = VectorIndex.from_vectors(vecs, dtype="pq")
    assert idx2._code_dim == 16 and idx2._pq.dsub == 2   # 2 bits/dim
    monkeypatch.setenv("CLIPX_PQ_DSUB", "4")
    idx4 = VectorIndex.from_vectors(vecs, dtype="pq")
    assert idx4._code_dim == 8 and idx4._pq.dsub == 4    # 1 bit/dim
    D, I = idx4.search(vecs[:2], k=3)
    np.testing.assert_array_equal(I[:, 0], [0, 1])
    monkeypatch.setenv("CLIPX_PQ_DSUB", "3")
    with pytest.raises(ValueError, match="CLIPX_PQ_DSUB"):
        VectorIndex.from_vectors(vecs, dtype="pq")


def test_sharded_matches_single_device():
    from clipx.parallel.mips import ShardedVectorIndex

    rng = np.random.default_rng(10)
    vecs = _unit(rng, 3000, 64)
    q = _queries(rng, vecs)
    sh = ShardedVectorIndex(vecs, dtype="pq")
    assert sh.pq_storage and sh._corpus is None
    D, I = sh.search(q, k=16)
    single = VectorIndex.from_vectors(vecs, dtype="pq")
    Ds, Is = single.search(q, k=16)
    np.testing.assert_array_equal(I, Is)
    np.testing.assert_allclose(D, Ds, atol=1e-5)
    # in-place sharded add (serve /reload): same codebooks (trained on
    # the same first rows), so ranking must match the fresh build
    sh2 = ShardedVectorIndex(vecs[:2000], dtype="pq")
    sh2.add(vecs[2000:])
    D2, I2 = sh2.search(q, k=16)
    single2 = VectorIndex.from_vectors(vecs[:2000], dtype="pq")
    single2.add(vecs[2000:])
    _, Ig = single2.search(q, k=16)
    np.testing.assert_array_equal(I2, Ig)


def test_shard_rows_chunk_multiple():
    from clipx.parallel.mips import _shard_rows

    assert _shard_rows(100, 8, pq=True) == 128
    r = _shard_rows(9 * pq_lib._PQ_CHUNK, 4, pq=True)
    assert r % pq_lib._PQ_CHUNK == 0 and r * 4 >= 9 * pq_lib._PQ_CHUNK


def _args(**kw):
    ns = argparse.Namespace(sharded="off", search_mode="auto",
                            index="unused", corpus_dtype="f32")
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def test_flag_plumbs_and_search_mode_is_fixed(tmp_path):
    rng = np.random.default_rng(11)
    vecs = _unit(rng, 300, 32)

    idx = common.build_index_from_vectors(vecs, _args(corpus_dtype="pq"))
    assert idx.pq_storage
    # exact mode cannot un-quantize a pq-storage index
    idx = common.build_index_from_vectors(
        vecs, _args(corpus_dtype="pq", search_mode="exact"))
    assert idx.pq_storage and idx.quantized
    idx = common.build_index_from_vectors(
        vecs, _args(corpus_dtype="pq", sharded="on"))
    assert idx.pq_storage

    # composes with IVF (faiss IndexIVFPQ semantics): probed PQ scan
    idx = common.build_index_from_vectors(
        vecs, _args(corpus_dtype="pq", search_mode="ivf",
                    index=str(tmp_path / "i.index")))
    assert idx.pq_storage and idx.quantized
    assert idx._corpus3 is None and idx._codes3 is not None
    assert idx._scales2 is None

    idx = common.build_index_from_vectors(
        vecs, _args(corpus_dtype="pq", search_mode="ivf", sharded="on",
                    index=str(tmp_path / "i2.index")))
    assert idx.pq_storage and idx._corpus3 is None


def test_ivf_full_probe_matches_flat_pq(monkeypatch):
    """nprobe=100 probes every segment, so non-residual IVF-PQ must
    return the flat pq index's ranking: identical candidate selection
    (same int8 LUTs over the same codes — codebooks train on the same
    rows with the same seed) and identical f32-LUT rescore. Residual
    mode (the IVF default) intentionally encodes differently — covered
    by test_residual_full_probe_self_consistent below."""
    from clipx.search.ivf import IVFIndex

    monkeypatch.setenv("CLIPX_PQ_RESIDUAL", "off")
    rng = np.random.default_rng(13)
    vecs = _unit(rng, 3000, 64)
    q = _queries(rng, vecs)
    ivf = IVFIndex.from_vectors(vecs, dtype="pq")
    assert not ivf._residual
    assert ivf.pq_storage and ivf._corpus3 is None
    assert ivf._scales2 is None
    D, I = ivf.search(q, k=8, nprobe=100)
    flat = VectorIndex.from_vectors(vecs, dtype="pq")
    Df, If = flat.search(q, k=8)
    np.testing.assert_array_equal(I, If)
    np.testing.assert_allclose(D, Df, atol=1e-5)
    # tail adds share the base codebooks
    ivf.add(vecs[:10])
    assert ivf._tail.pq_storage
    assert ivf._tail._pq is ivf._pq
    D, I = ivf.search(q, k=8, nprobe=100)
    assert (I[:, 0] == If[:, 0]).all()
    v = ivf.vectors()
    assert v.shape == (ivf.ntotal, 64)
    rec = ivf.reconstruct(0)
    assert rec.shape == (64,)
    cos = float(rec @ vecs[0] / max(np.linalg.norm(rec), 1e-9))
    assert cos > 0.6


def test_ivf_low_probe_self_match_pq():
    """The knob binds: probing a fraction still self-matches (the query
    row's own segment ranks first by centroid score)."""
    from clipx.search.ivf import IVFIndex

    rng = np.random.default_rng(14)
    vecs = _unit(rng, 3000, 64)
    ivf = IVFIndex.from_vectors(vecs, dtype="pq")
    D, I = ivf.search(vecs[:4], k=3, nprobe=16)
    np.testing.assert_array_equal(I[:, 0], np.arange(4))


def test_sharded_ivf_full_probe_matches_flat_pq(monkeypatch):
    from clipx.search.ivf import ShardedIVFIndex

    monkeypatch.setenv("CLIPX_PQ_RESIDUAL", "off")
    rng = np.random.default_rng(15)
    vecs = _unit(rng, 3000, 64)
    q = _queries(rng, vecs)
    sh = ShardedIVFIndex.from_vectors(vecs, dtype="pq")
    assert sh.pq_storage and sh._scales2 is None
    D, I = sh.search(q, k=8, nprobe=100)
    flat = VectorIndex.from_vectors(vecs, dtype="pq")
    _, If = flat.search(q, k=8)
    np.testing.assert_array_equal(I, If)
    D, I = sh.search(q, k=8, nprobe=16)
    np.testing.assert_array_equal(I[:, 0], If[:, 0])


def test_empty_then_add_sharded():
    from clipx.parallel.mips import ShardedVectorIndex

    rng = np.random.default_rng(12)
    sh = ShardedVectorIndex(np.zeros((0, 32), np.float32), dtype="pq")
    D, I = sh.search(np.zeros((1, 32), np.float32), k=3)
    assert (I == -1).all()
    vecs = _unit(rng, 500, 32)
    sh.add(vecs)
    D, I = sh.search(vecs[:2], k=1)
    np.testing.assert_array_equal(I[:, 0], [0, 1])


def test_probe_chunk_segs_divides_and_aligns():
    """The probe-body chunk (clipx/search/ivf.py:_probe_chunk_segs)
    must tile every bucket-form P exactly and stay Pallas-tile-aligned
    so the one-hot transient is bounded at capacity-scale nprobe."""
    from clipx.ops.pq_scan import _TILE
    from clipx.search.ivf import _bucket_probe, _probe_chunk_segs

    W = 64
    align = _TILE // W
    for raw in (1, 2, 3, 7, 48, 100, 1000, 20000, 500000, 1572864):
        P = _bucket_probe(raw)
        pc = _probe_chunk_segs(P, W)
        assert P % pc == 0
        assert pc * W <= 65536  # the one-hot bound (~32k rows, x2 pad)
        assert pc <= align or pc % align == 0


def test_ivf_pq_probe_pallas_route_matches_xla(monkeypatch):
    """Q=1 probes route through the Pallas VMEM scan on TPU; scores and
    ids must be bitwise equal to the XLA one-hot path (interpret mode
    exercises the kernel on CPU)."""
    from clipx.search.ivf import _ivf_kernel_pq
    from clipx.search.pq import PQ_K

    rng = np.random.default_rng(21)
    S, W, half, dim = 96, 64, 16, 64  # M=32, dsub=2; P=48 -> 2 chunks
    packed3 = jnp.asarray(rng.integers(-128, 128, (S, W, half)), jnp.int8)
    cent = jnp.asarray(rng.normal(size=(2 * half, PQ_K, 2)) / 8,
                       jnp.float32)
    seg_cent = jnp.asarray(rng.normal(size=(S, dim)), jnp.float32)
    valid2 = jnp.ones((S, W), bool)
    q = jnp.asarray(rng.normal(size=(1, dim)), jnp.float32)
    q /= jnp.linalg.norm(q)

    monkeypatch.setenv("CLIPX_PQ_SCAN", "xla")
    d1, i1 = _ivf_kernel_pq(packed3, cent, seg_cent, valid2, q, 48, 10)
    jax.clear_caches()
    monkeypatch.setenv("CLIPX_PQ_SCAN", "pallas")
    d2, i2 = _ivf_kernel_pq(packed3, cent, seg_cent, valid2, q, 48, 10)
    jax.clear_caches()
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_residual_full_probe_self_consistent():
    """Residual IVF-PQ (the default): full probe must self-retrieve
    every queried row at rank 0 (decoded self-score clears the field)
    and must beat or match the non-residual encoding's recall against
    the exact ranking on a clustered corpus — the faiss by_residual
    property this mode exists for."""
    import os

    from clipx.search.ivf import IVFIndex

    rng = np.random.default_rng(17)
    # clustered corpus: residual coding's favorable (and realistic) case
    cents = _unit(rng, 64, 64)
    a = rng.integers(0, 64, 3000)
    vecs = cents[a] + 0.25 * rng.standard_normal((3000, 64)).astype(
        np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    exact = VectorIndex.from_vectors(vecs)
    q = vecs[:16]
    k = 10
    _, Ie = exact.search(q, k)

    def recall(index):
        _, I = index.search(q, k, nprobe=100)
        return np.mean([len(set(Ie[i]) & set(I[i])) / k
                        for i in range(len(q))]), I

    res = IVFIndex.from_vectors(vecs, dtype="pq")
    assert res._residual
    r_res, I_res = recall(res)
    assert (I_res[:, 0] == np.arange(16)).all()  # self-match at rank 0
    os.environ["CLIPX_PQ_RESIDUAL"] = "off"
    try:
        nores = IVFIndex.from_vectors(vecs, dtype="pq")
    finally:
        os.environ.pop("CLIPX_PQ_RESIDUAL", None)
    assert not nores._residual
    r_nores, _ = recall(nores)
    assert r_res >= r_nores - 0.02, (r_res, r_nores)
