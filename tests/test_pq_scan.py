"""Pallas PQ-scan kernel (clipx/ops/pq_scan.py) vs the XLA one-hot path.

The kernel's integer arithmetic is exact (0/1 one-hot and int8 LUT
values are exact in bf16; sums < 2^24 are exact in f32), so its scores
must be BITWISE equal to the XLA int8 formulation — pinned here in
interpreter mode on CPU, plus the end-to-end CLIPX_PQ_SCAN=pallas route
through VectorIndex.search.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from clipx.search import pq as pq_lib
from clipx.ops.pq_scan import pq_scan_scores


def _xla_scores(packed, luti):
    codes = pq_lib.unpack_codes4_host(packed)             # (N, M)
    onehot = np.zeros((codes.shape[0], codes.shape[1], 16), np.int32)
    np.put_along_axis(onehot, codes[..., None].astype(np.int64), 1,
                      axis=2)
    return (onehot.reshape(codes.shape[0], -1)
            @ luti.astype(np.int32).T).T                  # (Q, N)


@pytest.mark.parametrize("lut_dtype", [jnp.int8, jnp.bfloat16])
@pytest.mark.parametrize("n,dim,q", [(256, 64, 4), (8192, 32, 16),
                                     (4096, 128, 1)])
def test_kernel_matches_onehot_oracle(n, dim, q, lut_dtype):
    rng = np.random.default_rng(n + dim + q)
    half = dim // pq_lib.pq_dsub() // 2
    packed = rng.integers(-128, 128, size=(n, half)).astype(np.int8)
    luti = rng.integers(-127, 128, size=(q, half * 2 * 16)
                        ).astype(np.int8)
    got = np.asarray(pq_scan_scores(
        jnp.asarray(packed), jnp.asarray(luti.T, lut_dtype)))
    want = _xla_scores(packed, luti).astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_search_pallas_route_matches_xla(monkeypatch):
    """End-to-end: CLIPX_PQ_SCAN=pallas (interpreter on CPU) must
    return exactly what the XLA route returns."""
    from clipx.search.engine import VectorIndex

    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((4096 + 11, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    q = vecs[:4]
    monkeypatch.setenv("CLIPX_PQ_SCAN", "xla")
    ix = VectorIndex.from_vectors(vecs, dtype="pq")
    Dx, Ix = ix.search(q, k=9)
    monkeypatch.setenv("CLIPX_PQ_SCAN", "pallas")
    pq_lib._search_kernel_pq.clear_cache()
    try:
        ip = VectorIndex.from_vectors(vecs, dtype="pq")
        Dp, Ip = ip.search(q, k=9)
    finally:
        pq_lib._search_kernel_pq.clear_cache()
    np.testing.assert_array_equal(Ix, Ip)
    np.testing.assert_allclose(Dx, Dp, atol=1e-6)


def test_pallas_chunked_capacity_path_matches(monkeypatch):
    """Past _PQ_PALLAS_ONESHOT rows the Pallas branch maps over row
    chunks (bounding the (Q, N) score block at capacity scale) — the
    chunked route must return exactly the one-shot route's results."""
    from clipx.search.engine import VectorIndex

    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((8192, 32)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    q = vecs[:4]
    monkeypatch.setenv("CLIPX_PQ_SCAN", "pallas")
    pq_lib._search_kernel_pq.clear_cache()
    one = VectorIndex.from_vectors(vecs, dtype="pq")
    D1, I1 = one.search(q, k=7)
    monkeypatch.setattr(pq_lib, "_PQ_PALLAS_ONESHOT", 1024)
    monkeypatch.setattr(pq_lib, "_PQ_PALLAS_CHUNK", 2048)
    pq_lib._search_kernel_pq.clear_cache()
    try:
        two = VectorIndex.from_vectors(vecs, dtype="pq")
        D2, I2 = two.search(q, k=7)
    finally:
        pq_lib._search_kernel_pq.clear_cache()
    np.testing.assert_array_equal(I1, I2)
    np.testing.assert_allclose(D1, D2, atol=1e-6)


def test_tile_misaligned_capacity_falls_back(monkeypatch):
    """A capacity that isn't tile-aligned must route to the XLA scan
    (sharded placements align, but the guard is the contract)."""
    monkeypatch.setenv("CLIPX_PQ_SCAN", "pallas")
    assert pq_lib._use_pallas_scan(4096)
    assert not pq_lib._use_pallas_scan(4224)
    monkeypatch.setenv("CLIPX_PQ_SCAN", "xla")
    assert not pq_lib._use_pallas_scan(4096)


def test_shard_rows_pq_tile_aligned():
    from clipx.parallel.mips import _shard_rows

    r = _shard_rows(100_000, 8, pq=True)
    assert r % 4096 == 0 and r * 8 >= 100_000
    assert _shard_rows(3000, 8, pq=True) == 384  # sub-tile: single tile
