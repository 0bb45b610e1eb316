"""IVF approximate-search tests (clipx/search/ivf.py).

The contract mirrored from the reference's faiss IndexIVFFlat
(reference:build-index.py:79-81, reference:query-index.py:30,48-54):
``nprobe`` trades recall for scan fraction, nprobe=100 probes
everything. Exactness properties are asserted against the flat engine
as oracle.
"""

import numpy as np
import pytest

from clipx.search import ivf
from clipx.search.engine import VectorIndex
from clipx.search.ivf import IVFIndex


def _clustered_corpus(n, dim, n_clusters, seed=0, spread=0.05):
    """Synthetic clustered unit vectors — the regime IVF assumes."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    which = rng.randint(n_clusters, size=n)
    x = centers[which] + spread * rng.randn(n, dim).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(np.float32)


@pytest.fixture(scope="module")
def corpus():
    return _clustered_corpus(4096, 64, 24)


@pytest.fixture(scope="module")
def queries(corpus):
    rng = np.random.RandomState(7)
    q = corpus[rng.choice(corpus.shape[0], 8, replace=False)]
    q = q + 0.01 * rng.randn(*q.shape).astype(np.float32)
    return (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)


def test_full_probe_matches_exact(corpus, queries):
    """nprobe=100 probes every segment -> identical ranking to the flat
    exact engine (scores computed by the same f32 einsum)."""
    exact = VectorIndex.from_vectors(corpus)
    idx = IVFIndex.from_vectors(corpus)
    idx.nprobe = 100
    De, Ie = exact.search(queries, 10)
    Da, Ia = idx.search(queries, 10)
    np.testing.assert_array_equal(Ie, Ia)
    np.testing.assert_allclose(De, Da, rtol=1e-5, atol=1e-6)


def test_recall_at_default_nprobe(corpus, queries):
    exact = VectorIndex.from_vectors(corpus)
    idx = IVFIndex.from_vectors(corpus)  # nprobe=32 default
    assert idx.nprobe == 32
    _, Ie = exact.search(queries, 10)
    _, Ia = idx.search(queries, 10)
    hits = sum(len(set(a) & set(e)) for a, e in zip(Ia, Ie))
    assert hits / Ie.size >= 0.95


def test_nprobe_knob_monotonic_recall(corpus, queries):
    """More probes can only add candidate segments -> recall must not
    drop (measured on clustered data with a margin for ties)."""
    exact = VectorIndex.from_vectors(corpus)
    _, Ie = exact.search(queries, 10)
    idx = IVFIndex.from_vectors(corpus)
    recalls = []
    for p in (2, 25, 100):
        idx.nprobe = p
        _, Ia = idx.search(queries, 10)
        recalls.append(sum(len(set(a) & set(e))
                           for a, e in zip(Ia, Ie)) / Ie.size)
    assert recalls[-1] == 1.0
    assert recalls[0] <= recalls[1] + 1e-9 <= recalls[2] + 2e-9


def test_nprobe_clamped_like_reference():
    idx = IVFIndex(dim=8)
    idx.nprobe = 0
    assert idx.nprobe == 1
    idx.nprobe = 1000
    assert idx.nprobe == 100


def test_quantized_probe_rescores_exactly(corpus, queries):
    """int8 probed scan keeps exact f32 scores for the returned rows."""
    idx = IVFIndex.from_vectors(corpus, quantized=True)
    idx.nprobe = 100
    D, I = idx.search(queries, 5)
    for qi in range(queries.shape[0]):
        for d, i in zip(D[qi], I[qi]):
            assert i >= 0
            np.testing.assert_allclose(
                d, float(corpus[i] @ queries[qi]), rtol=1e-5, atol=1e-5)


def test_external_ids_survive_permutation(corpus):
    """Returned ids are external row ids (the byte-sorted ranks), not
    internal clustered positions: querying a corpus row at nprobe=100
    must return that row's own id first."""
    idx = IVFIndex.from_vectors(corpus)
    idx.nprobe = 100
    for ext in (0, 17, corpus.shape[0] - 1):
        D, I = idx.search(corpus[ext][None], 1)
        assert I[0, 0] == ext
        np.testing.assert_allclose(D[0, 0], float(corpus[ext] @ corpus[ext]),
                                   rtol=1e-5)


def test_add_tail_merges(corpus, queries):
    idx = IVFIndex.from_vectors(corpus)
    idx.nprobe = 100
    n0 = idx.ntotal
    rng = np.random.RandomState(3)
    extra = rng.randn(5, corpus.shape[1]).astype(np.float32)
    extra /= np.linalg.norm(extra, axis=1, keepdims=True)
    idx.add(extra)
    assert idx.ntotal == n0 + 5
    assert 0 < idx.tail_fraction < 1
    # a tail row queried against itself must surface with its new id
    D, I = idx.search(extra[2][None], 1)
    assert I[0, 0] == n0 + 2
    # reconstruction spans base + tail
    np.testing.assert_allclose(idx.reconstruct(n0 + 2), extra[2],
                               rtol=1e-6)
    np.testing.assert_allclose(idx.reconstruct(11), corpus[11], rtol=1e-6)
    # vectors() keeps external order for serve's fingerprint
    v = idx.vectors()
    assert v.shape[0] == n0 + 5
    np.testing.assert_allclose(v[:n0], corpus, rtol=1e-6)
    np.testing.assert_allclose(v[n0:], extra, rtol=1e-6)


def test_empty_and_tiny_corpora():
    idx = IVFIndex(dim=16)
    D, I = idx.search(np.zeros((2, 16), np.float32), 4)
    assert (I == -1).all() and np.isneginf(D).all()
    tiny = _clustered_corpus(10, 16, 2, seed=1)
    idx = IVFIndex.from_vectors(tiny)
    idx.nprobe = 100
    D, I = idx.search(tiny[3][None], 20)  # k > ntotal
    assert I[0, 0] == 3
    assert (I[0, 10:] == -1).all()
    assert set(I[0, :10]) == set(range(10))


def test_tiny_corpus_low_nprobe_still_fills_k():
    """Probing clamps to >= k segments: a 5-image index at the REPL's
    default nprobe=32 used to probe ceil(0.32*5)=2 single-row segments
    and pad a k=3 request with -1 rows the corpus could satisfy
    (found driving query-index.py on a 5-image folder)."""
    rng = np.random.default_rng(7)
    tiny = rng.normal(size=(5, 16)).astype(np.float32)
    tiny /= np.linalg.norm(tiny, axis=1, keepdims=True)
    for quantized in (False, True):
        idx = IVFIndex.from_vectors(tiny, quantized=quantized)
        for nprobe in (1, 32):
            idx.nprobe = nprobe
            D, I = idx.search(tiny[1][None], 3)
            assert (I[0] >= 0).all(), (quantized, nprobe, I)
            assert I[0, 0] == 1
            D, I = idx.search(tiny[1][None], 5)
            assert set(I[0]) == set(range(5)), (quantized, nprobe, I)


def test_probe_floor_dense_corpus_keeps_nprobe_contract():
    """The k-fill floor must come from measured segment occupancy: on a
    sizeable corpus only the cluster-boundary partial segments bind it,
    so a low-nprobe request keeps (most of) its contracted scan
    fraction, while a one-row-per-segment tiny corpus needs k
    segments."""
    big = _clustered_corpus(20000, 64, 32, seed=3)
    idx = IVFIndex.from_vectors(big)
    floor = idx._probe_floor(50)
    assert floor < 20 and floor < idx._segs() * 0.05
    rng = np.random.default_rng(11)
    tiny = rng.normal(size=(5, 16)).astype(np.float32)
    t = IVFIndex.from_vectors(tiny)
    assert t._probe_floor(3) == 3 and t._probe_floor(20) == 5


def test_cache_roundtrip_and_invalidation(tmp_path, corpus):
    cache = str(tmp_path / "images.index.ivf")
    idx1 = IVFIndex.from_vectors(corpus, cache_path=cache)
    assert ivf._load_cache(cache, corpus) is not None
    idx2 = IVFIndex.from_vectors(corpus, cache_path=cache)
    idx1.nprobe = idx2.nprobe = 17
    q = corpus[:3]
    np.testing.assert_array_equal(idx1.search(q, 5)[1],
                                  idx2.search(q, 5)[1])
    # content change invalidates the cache
    other = corpus.copy()
    other[0] *= -1.0
    assert ivf._load_cache(cache, other) is None
    # corrupt file degrades to retraining, not a crash
    with open(cache, "wb") as f:
        f.write(b"garbage")
    idx3 = IVFIndex.from_vectors(corpus, cache_path=cache)
    assert idx3.ntotal == corpus.shape[0]


def test_query_chunking_matches_single(corpus):
    """Q above the gather budget chunks internally with identical
    results."""
    idx = IVFIndex.from_vectors(corpus)
    idx.nprobe = 50
    rng = np.random.RandomState(9)
    q = rng.randn(37, corpus.shape[1]).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    D, I = idx.search(q, 8)
    for j in range(q.shape[0]):
        Dj, Ij = idx.search(q[j][None], 8)
        np.testing.assert_array_equal(I[j], Ij[0])


def test_cli_search_mode_ivf(tmp_path, monkeypatch):
    """common.build_index_from_vectors honors --search-mode ivf and the
    REPL 'p' command drives the live nprobe."""
    import argparse

    from clipx.cli import common

    monkeypatch.chdir(tmp_path)
    corpus = _clustered_corpus(600, 32, 6, seed=2)
    args = argparse.Namespace(search_mode="ivf", sharded="off",
                              index=str(tmp_path / "images.index"))
    idx = common.build_index_from_vectors(corpus, args)
    assert isinstance(idx, IVFIndex)
    assert not idx.quantized  # under the auto threshold
    assert (tmp_path / "images.index.ivf").exists()
    idx.nprobe = 100
    D, I = idx.search(corpus[5][None], 3)
    assert I[0, 0] == 5


def test_kmeans_layout_segments_are_cluster_pure():
    """Cluster packing pads each cluster to a segment boundary, so no
    64-row segment ever mixes two k-means clusters (locality is what
    buys recall)."""
    x = _clustered_corpus(1024, 32, 4, seed=4, spread=0.01)
    assign, cent = ivf.train_clusters(x, seed=0)
    assert assign.shape == (1024,)
    assert np.allclose(np.linalg.norm(cent, axis=1), 1.0, atol=1e-4)
    layout = ivf.cluster_layout(assign)
    assert len(layout) % 64 == 0
    live = layout[layout >= 0]
    assert sorted(live.tolist()) == list(range(1024))
    for seg in layout.reshape(-1, 64):
        members = seg[seg >= 0]
        assert len(set(assign[members])) <= 1
    # purity in vector terms: within-segment mean cosine near 1
    for seg in layout.reshape(-1, 64):
        members = seg[seg >= 0]
        if len(members) > 1:
            v = x[members]
            assert np.einsum("wd,vd->wv", v, v).mean() > 0.95


def test_apply_search_mode_preserves_ivf_quantization(corpus):
    """serve's incremental reload re-applies the search mode after
    add(); for ivf indexes that must track the auto threshold, not
    the quant/exact branches (clipx/cli/common.py)."""
    from clipx.cli import common

    idx = IVFIndex.from_vectors(corpus, quantized=True)
    common.apply_search_mode(idx, "ivf")
    assert idx.quantized == (idx.ntotal >= common.QUANT_AUTO_THRESHOLD)
    idx.quantized = True
    idx.add(corpus[:3])
    common.apply_search_mode(idx, "ivf")
    assert isinstance(idx.quantized, bool)


# ---------------------------------------------------------------------------
# corpus-sharded IVF (8 virtual devices, tests/conftest.py)
# ---------------------------------------------------------------------------

def test_sharded_full_probe_matches_single(corpus, queries):
    """nprobe=100 probes everything -> f32 sharded returns the exact
    single-device ranking bit-for-bit. The quantized variant rescores
    only the top segments by int8 segment-max — and the sharded pool
    (min(kk, P/n) per shard, unioned) is a superset of the single-device
    pool (min(kk, P) global), so only parity with the flat EXACT oracle
    is the right contract there (it subsumes single-device parity on
    corpora outside the int8 near-duplicate exception)."""
    from clipx.search.ivf import ShardedIVFIndex

    exact = VectorIndex.from_vectors(corpus)
    De, Ie = exact.search(queries, 10)
    for quant in (False, True):
        single = IVFIndex.from_vectors(corpus, quantized=quant)
        shard = ShardedIVFIndex.from_vectors(corpus, quantized=quant)
        single.nprobe = 100
        shard.nprobe = 100
        Ds, Is = single.search(queries, 10)
        Dd, Id = shard.search(queries, 10)
        if not quant:
            np.testing.assert_array_equal(Is, Id)
            np.testing.assert_allclose(Ds, Dd, rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(Ie, Id)
        np.testing.assert_allclose(De, Dd, rtol=1e-5, atol=1e-5)


def test_sharded_recall_at_default_nprobe(corpus, queries):
    """Local-top-(P/n) probing over the round-robin segment interleave
    holds recall at the default knob (the layout spreads every cluster
    across shards, so the union of local probes tracks global top-P)."""
    from clipx.search.ivf import ShardedIVFIndex

    exact = VectorIndex.from_vectors(corpus)
    idx = ShardedIVFIndex.from_vectors(corpus)
    assert idx.nprobe == 32
    _, Ie = exact.search(queries, 10)
    _, Ia = idx.search(queries, 10)
    hits = sum(len(set(a) & set(e)) for a, e in zip(Ia, Ie))
    assert hits / Ie.size >= 0.9


def test_sharded_per_request_nprobe_and_add(corpus, queries):
    from clipx.search.ivf import ShardedIVFIndex

    idx = ShardedIVFIndex.from_vectors(corpus)
    full_D, full_I = idx.search(queries, 5, nprobe=100)
    assert idx.nprobe == 32  # the global knob never moved
    n0 = idx.ntotal
    rng = np.random.RandomState(3)
    extra = rng.randn(7, corpus.shape[1]).astype(np.float32)
    extra /= np.linalg.norm(extra, axis=1, keepdims=True)
    idx.add(extra)
    assert idx.ntotal == n0 + 7
    D, I = idx.search(extra[4][None], 3, nprobe=100)
    assert I[0, 0] == n0 + 4  # tail rows win their own query
    np.testing.assert_allclose(idx.reconstruct(n0 + 4), extra[4],
                               rtol=1e-5, atol=1e-6)
    # base rows unchanged by the add
    D2, I2 = idx.search(queries, 5, nprobe=100)
    np.testing.assert_array_equal(full_I, I2)


def test_sharded_odd_sizes_and_vectors_order():
    """Segment counts not divisible by the mesh pad with fully-dead
    segments; vectors() returns external-id order regardless of the
    round-robin interleave (serve's reload fingerprint relies on it)."""
    from clipx.search.ivf import ShardedIVFIndex

    corpus = _clustered_corpus(777, 32, 5, seed=9)
    idx = ShardedIVFIndex.from_vectors(corpus)
    assert idx.ntotal == 777
    np.testing.assert_allclose(idx.vectors(), corpus, rtol=1e-6)
    q = corpus[123][None]
    D, I = idx.search(q, 4, nprobe=100)
    assert I[0, 0] == 123
    oracle = VectorIndex.from_vectors(corpus)
    Do, Io = oracle.search(q, 4)
    np.testing.assert_array_equal(Io, I)


def test_cli_loader_shards_ivf_when_asked(tmp_path, monkeypatch):
    """--sharded on (or auto with >1 device) + --search-mode ivf now
    yields the sharded IVF index instead of a single-device fallback."""
    import argparse

    from clipx.cli import common
    from clipx.search.ivf import ShardedIVFIndex

    monkeypatch.chdir(tmp_path)
    corpus = _clustered_corpus(600, 32, 6, seed=2)
    for mode in ("on", "auto"):
        args = argparse.Namespace(search_mode="ivf", sharded=mode,
                                  index=str(tmp_path / "images.index"))
        idx = common.build_index_from_vectors(corpus, args)
        assert isinstance(idx, ShardedIVFIndex)
        D, I = idx.search(corpus[5][None], 3, nprobe=100)
        assert I[0, 0] == 5


def test_qcap_budgets_the_int8_rescore_gather():
    """The int8 probe kernel materializes an extra (Q, s, W, D) float32
    rescore gather on top of the int8 probe rows; the query-chunk cap
    must budget BOTH or device transients reach ~5x the intended
    _GATHER_BUDGET at large k/nprobe."""
    from clipx.search.ivf import _GATHER_BUDGET, _SEG_W, _qcap

    P, dim = 2048, 512
    # f32 kernel: one gather of P*W*D*4 bytes per query
    assert _qcap(P, dim, quantized=False, k=10) == \
        1 << ((_GATHER_BUDGET // (P * _SEG_W * dim * 4)).bit_length() - 1)
    # quantized with k large enough that s == P: per-query bytes are
    # W*D*(P int8 + 4P f32) = 5x the int8-only estimate
    cap_big_k = _qcap(P, dim, quantized=True, k=2048)
    assert cap_big_k <= _qcap(P, dim, quantized=False, k=2048)
    expected = _GATHER_BUDGET // (_SEG_W * dim * 5 * P)
    assert cap_big_k == 1 << (expected.bit_length() - 1)
    # always at least one query per call, and a power of two
    tiny = _qcap(100_000, 1024, quantized=True, k=4096)
    assert tiny == 1


# ---------------------------------------------------------------------------
# --corpus-dtype int8 x IVF: codes-as-corpus probed search
# ---------------------------------------------------------------------------

def _planted_gap(rng, n, d=64, k=10, gap=0.02):
    """Corpus + query whose true top-k is separated by score gaps far
    above the int8 corpus-rounding noise (~5e-4), so the dequantized
    rescore must reproduce the exact oracle ranking."""
    q = rng.randn(d).astype(np.float32)
    q /= np.linalg.norm(q)
    noise = rng.randn(n, d).astype(np.float32)
    noise -= np.outer(noise @ q, q)
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    noise = 0.9 * noise + np.outer(
        0.2 * rng.rand(n).astype(np.float32), q)
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    planted = np.zeros((k, d), np.float32)
    for i in range(k):
        s = 0.9 - i * gap
        r = rng.randn(d).astype(np.float32)
        r -= (r @ q) * q
        r /= np.linalg.norm(r)
        planted[i] = s * q + np.sqrt(1.0 - s * s) * r
    corpus = np.concatenate([noise, planted]).astype(np.float32)
    expect = np.arange(n, n + k, dtype=np.int64)
    return corpus, q[None, :], expect


def test_int8_storage_full_probe_matches_oracle():
    """nprobe=100 over int8 STORAGE: the probed scan covers everything
    and the dequantized rescore carries only corpus rounding (~5e-4),
    so on a gap-separated corpus the ranking equals the exact oracle."""
    import jax.numpy as jnp

    rng = np.random.RandomState(11)
    corpus, q, expect = _planted_gap(rng, 3000)
    idx = IVFIndex.from_vectors(corpus, dtype=jnp.int8)
    assert idx.int8_storage and idx.quantized
    assert idx._corpus3 is None  # no f32/bf16 rows on device
    idx.nprobe = 100
    D, I = idx.search(q, 10)
    np.testing.assert_array_equal(I[0], expect)
    ref = (q @ corpus.T)[0][expect]
    np.testing.assert_allclose(D[0], ref, atol=5e-3)


def test_int8_storage_recall_at_default_nprobe(corpus, queries):
    import jax.numpy as jnp

    exact = VectorIndex.from_vectors(corpus)
    idx = IVFIndex.from_vectors(corpus, dtype=jnp.int8)
    assert idx.nprobe == 32
    _, Ie = exact.search(queries, 10)
    _, Ia = idx.search(queries, 10)
    hits = sum(len(set(a) & set(e)) for a, e in zip(Ia, Ie))
    assert hits / Ie.size >= 0.9


def test_int8_storage_tail_add_reconstruct_vectors(corpus):
    """add() goes to an int8-storage exact tail; reconstruct/vectors
    dequantize (corpus rounding ~max|x|/254 per element in rotated
    space; the corpus rotation redistributes that error across
    coordinates, so the per-element bound carries a small slack while
    the L2 bound stays the axis-aligned sqrt(D)/2 * step)."""
    import jax.numpy as jnp

    idx = IVFIndex.from_vectors(corpus, dtype=jnp.int8)
    idx.nprobe = 100
    n0 = idx.ntotal
    rng = np.random.RandomState(5)
    extra = rng.randn(4, corpus.shape[1]).astype(np.float32)
    extra /= np.linalg.norm(extra, axis=1, keepdims=True)
    idx.add(extra)
    assert idx.ntotal == n0 + 4
    assert idx._tail.int8_storage  # tail stays at the 1 B/dim tier
    D, I = idx.search(extra[1][None], 1)
    assert I[0, 0] == n0 + 1
    step = np.abs(corpus).max() / 127.0
    np.testing.assert_allclose(idx.reconstruct(7), corpus[7],
                               atol=2 * step)
    np.testing.assert_allclose(idx.reconstruct(n0 + 1), extra[1],
                               atol=2 * step)
    v = idx.vectors()
    assert v.shape == (n0 + 4, corpus.shape[1])
    np.testing.assert_allclose(v[:n0], corpus, atol=2 * step)
    np.testing.assert_allclose(v[n0:], extra, atol=2 * step)
    # rotation-invariant L2 bound: per-row error <= sqrt(D)/2 * step
    l2 = np.linalg.norm(v[:n0] - corpus, axis=1)
    assert l2.max() <= np.sqrt(corpus.shape[1]) / 2 * step * 1.05


def test_sharded_int8_storage_full_probe_matches_oracle():
    """Sharded codes-as-corpus probe: the per-shard pool at nprobe=100
    is a superset of the single-device pool, and per-row quantization is
    layout-independent, so the gap-separated oracle ranking holds."""
    import jax.numpy as jnp

    from clipx.search.ivf import ShardedIVFIndex

    rng = np.random.RandomState(13)
    corpus, q, expect = _planted_gap(rng, 3000)
    idx = ShardedIVFIndex.from_vectors(corpus, dtype=jnp.int8)
    assert idx.int8_storage and idx._corpus3 is None
    idx.nprobe = 100
    D, I = idx.search(q, 10)
    np.testing.assert_array_equal(I[0], expect)
    ref = (q @ corpus.T)[0][expect]
    np.testing.assert_allclose(D[0], ref, atol=5e-3)


def test_sharded_int8_storage_recall_and_add(corpus, queries):
    import jax.numpy as jnp

    from clipx.search.ivf import ShardedIVFIndex

    exact = VectorIndex.from_vectors(corpus)
    idx = ShardedIVFIndex.from_vectors(corpus, dtype=jnp.int8)
    _, Ie = exact.search(queries, 10)
    _, Ia = idx.search(queries, 10)
    hits = sum(len(set(a) & set(e)) for a, e in zip(Ia, Ie))
    assert hits / Ie.size >= 0.9
    n0 = idx.ntotal
    rng = np.random.RandomState(9)
    extra = rng.randn(3, corpus.shape[1]).astype(np.float32)
    extra /= np.linalg.norm(extra, axis=1, keepdims=True)
    idx.add(extra)
    D, I = idx.search(extra[0][None], 1, nprobe=100)
    assert I[0, 0] == n0
