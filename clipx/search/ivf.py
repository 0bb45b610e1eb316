"""IVF-style approximate search — the functional ``nprobe`` knob.

The reference builds ``faiss.IndexIVFFlat(quantizer, 512, 100, IP)``
(reference:build-index.py:79-81): k-means into nlist=100 cells, queries
probe the ``nprobe`` closest cells (default 32, REPL ``p`` command sets
1..100, reference:query-index.py:30,48-54) and score their members
exactly. ``clipx``'s default engine is *exact* search, so ``nprobe`` is
a no-op there; this module is the opt-in approximate mode
(``--search-mode ivf``) where the knob does what it does in the
reference — trade recall for scan fraction.

TPU-native design — no ragged cell lists, no data-dependent shapes:

- **Cluster-pure segments.** Spherical k-means assigns every row to a
  cluster; rows are REORDERED so cluster members are contiguous and
  each cluster pads to a 64-row boundary, so no segment straddles two
  clusters — the corpus is viewed as (S, 64, D) segments, the same
  geometry the exact engine's top-k uses. A row→external-id map (-1 on
  the dead padding rows, <3% waste at default cluster sizes) recovers
  reference ids.
- **Segment centroids as the coarse quantizer.** Each segment's mean
  vector stands in for faiss's cell centroid, at much finer granularity
  (a 1M-row corpus has ~16k segments vs the reference's 100 cells), so
  equal scanned fraction buys strictly better recall.
- **Probe = static-shape gather.** ``nprobe``/100 of the segments (top
  by centroid·query) are gathered and scored; the probe count is
  bucketed to powers of two so turning the knob reuses compiled
  kernels. Scoring within probed segments is exact f32 (IVFFlat
  semantics); with ``quantized`` the probed segments are scanned in
  int8 and the top-k segments rescored in exact f32, mirroring the
  engine's quant mode. With ``--corpus-dtype int8`` the codes ARE the
  corpus (1 B/dim, ~5x f32 capacity) and the rescore dequantizes
  candidates in f32 — probed search over 20M+ rows on one chip.
  ``int4`` gathers PACKED segments; ``pq`` composes product-quantized
  codes with the probe (faiss IndexIVFPQ semantics — the one-hot x
  LUT matmul scan of clipx.search.pq applied to the probed fraction).
- **Exact tail for adds.** Appended rows (serve's incremental reload)
  go to a small flat exact index merged into every search; k-means is
  not retrained per add.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from clipx.search import engine
from clipx.search import pq as pq_lib
from clipx.search.engine import _SEG_W, clamp_k

# Assignment matmul row-chunk: bounds the (chunk, C) score buffer.
_ASSIGN_CHUNK = 65536
# When set (cli.common.load_coded_index, around a from_vectors build),
# coded installs keep their flat-order encode payload on the instance
# as _pending_codes_payload so the caller can persist it to the codes
# sidecar without re-encoding; common clears the attr after writing
# (the payload holds a full host copy of the codes).
_STASH_CODES = False
# Max rows sampled for k-means training (faiss subsamples similarly).
# Bounds the (rows, C) assignment-score transient inside the training
# loop to 128k x 4096 x 4 B = 2 GB.
_TRAIN_CAP = 131072
# Per-kernel-call byte budget for the probed-segment gathers; queries
# are chunked so the per-call gather transients stay under this.
_GATHER_BUDGET = 1 << 30


def _qcap(P: int, dim: int, quantized: bool, k: int,
          int8_storage: bool = False, pq_mk: int = 0) -> int:
    """Max query rows per probe-kernel call, power-of-two (so chunk
    sizes land on the engine Q buckets — one compile per bucket, not
    per fill), bounded by the gather-byte budget.

    The f32 kernel materializes one (Q, P, W, D) float32 gather. The
    int8 kernel materializes TWO: the (Q, P, W, D) int8 probe rows AND
    a (Q, s, W, D) float32 rescore gather, s = min(k-bucket, P) — at
    large k/nprobe the f32 side is up to 4x the int8 bytes, so both
    must be budgeted or device transients reach ~5x the intended cap.
    int8 STORAGE rescoring gathers int8 candidate rows and dequantizes
    them to f32 (1 + 4 bytes per element) instead of gathering stored
    f32 rows. pq STORAGE (``pq_mk`` = M*16 > 0) materializes one
    CHUNK's (Q, pc*W, M*16) int8 one-hot at a time (the probe body
    chunks probed segments — ``_probe_chunk_segs``) plus the
    (Q, 4k, M*16) f32 rescore one-hot — the one-hot expansion, not the
    tiny packed gather, is what the budget must bound."""
    if pq_mk:
        m_cand = min(pq_lib.PQ_RESCORE_MARGIN * engine._bucket_k(k),
                     P * _SEG_W)
        pc = _probe_chunk_segs(P, _SEG_W)
        per_q = pq_mk * (pc * _SEG_W + 4 * m_cand)
    elif int8_storage:
        s = min(engine._bucket_k(k), P * _SEG_W, P)
        per_q = _SEG_W * dim * (P + 5 * s)
    elif quantized:
        s = min(engine._bucket_k(k), P * _SEG_W, P)
        per_q = _SEG_W * dim * (P + 4 * s)
    else:
        per_q = P * _SEG_W * dim * 4
    qcap = max(1, _GATHER_BUDGET // max(1, per_q))
    qcap = min(qcap, engine._MAX_Q)
    return 1 << (qcap.bit_length() - 1)


def _num_clusters(n: int) -> int:
    """~256 rows (4 segments) per cluster, clamped to a sane range."""
    return int(np.clip(n // 256, 16, 4096))


@functools.partial(jax.jit, static_argnames=("C", "iters"))
def _kmeans_kernel(x: jax.Array, key: jax.Array, C: int, iters: int
                   ) -> jax.Array:
    """Spherical k-means (unit-norm centroids — CLIP embeddings are
    normalized, so cosine cells are the right geometry). Returns
    (C, D) f32 centroids."""
    n = x.shape[0]
    idx = jax.random.choice(key, n, (C,), replace=False)
    cent = x[idx]

    def norm(c):
        return c / jnp.maximum(
            jnp.linalg.norm(c, axis=1, keepdims=True), 1e-12)

    cent = norm(cent)

    def step(_, cent):
        a = jnp.argmax(jnp.dot(x, cent.T,
                               preferred_element_type=jnp.float32), axis=1)
        sums = jax.ops.segment_sum(x, a, num_segments=C)
        counts = jax.ops.segment_sum(jnp.ones((n,), jnp.float32), a,
                                     num_segments=C)
        new = sums / jnp.maximum(counts[:, None], 1.0)
        # empty cells keep their previous centroid
        new = jnp.where(counts[:, None] > 0, new, cent)
        return norm(new)

    return jax.lax.fori_loop(0, iters, step, cent)


@functools.partial(jax.jit, static_argnames=())
def _assign_chunk(x: jax.Array, cent: jax.Array) -> jax.Array:
    return jnp.argmax(jnp.dot(x, cent.T,
                              preferred_element_type=jnp.float32),
                      axis=1).astype(jnp.int32)


def train_clusters(vectors: np.ndarray, *, iters: int = 8,
                   seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """K-means the corpus. Returns (assign, centroids): per-row cluster
    ids and the (C, D) unit-norm cluster centers.

    The corpus never materializes on device whole: training samples at
    most ``_TRAIN_CAP`` rows (host fancy-index — ``vectors`` may be a
    sidecar memmap) and assignment streams ``_ASSIGN_CHUNK``-row
    slices through H2D. Through round 3 this function placed the full
    corpus on device first, which capped IVF BUILDS at the f32 HBM
    ceiling (~8M rows on a 16 GiB chip) even though the coded tiers
    can SERVE 100M+; now layout construction scales to any corpus the
    host can stream, and the v2 ``.ivf`` cache + codes sidecar make it
    one-time."""
    n = vectors.shape[0]
    C = min(_num_clusters(n), n)
    key = jax.random.PRNGKey(seed)
    if n > _TRAIN_CAP:
        # same device-derived sample indices as before (determinism:
        # cached .ivf layouts stay valid), gathered on the HOST
        sample = np.asarray(jax.random.choice(key, n, (_TRAIN_CAP,),
                                              replace=False))
        train_x = jnp.asarray(
            np.ascontiguousarray(vectors[sample], np.float32))
    else:
        train_x = jnp.asarray(np.ascontiguousarray(vectors, np.float32))
    cent = _kmeans_kernel(train_x, key, C, iters)
    parts = [np.asarray(_assign_chunk(
                jnp.asarray(np.ascontiguousarray(
                    vectors[i: i + _ASSIGN_CHUNK], np.float32)), cent))
             for i in range(0, n, _ASSIGN_CHUNK)]
    assign = np.concatenate(parts) if parts else np.zeros((0,), np.int32)
    return assign, np.asarray(cent, np.float32)


def cluster_layout(assign: np.ndarray) -> np.ndarray:
    """Pack cluster members into 64-row segments that never straddle a
    cluster boundary: each cluster's rows (sorted by external id) are
    padded to a multiple of _SEG_W with -1 slots. Returns ``row_ext``,
    the internal-row -> external-id map with -1 marking dead padding
    rows (the per-row validity mask the kernels consume). Pure segments
    are what make the segment-centroid quantizer sharp — a straddling
    segment's mean would blend two clusters and underestimate both.
    Wasted rows are < _SEG_W per cluster (~3% at the default ~256-row
    clusters)."""
    order = np.argsort(assign, kind="stable")
    sorted_assign = assign[order]
    pieces = []
    start = 0
    for end in np.append(
            np.flatnonzero(np.diff(sorted_assign)) + 1, len(order)):
        members = order[start:end]
        pad = (-len(members)) % _SEG_W
        pieces.append(members)
        if pad:
            pieces.append(np.full(pad, -1, dtype=np.int64))
        start = end
    if not pieces:
        return np.zeros((0,), np.int64)
    return np.concatenate(pieces).astype(np.int64)


# ---------------------------------------------------------------------------
# search kernels
# ---------------------------------------------------------------------------

def _sort_probe_enabled() -> bool:
    """$CLIPX_IVF_SORT_PROBE: sort each query's probed segment ids
    ascending before the gather. The probe is GATHER-bound
    (CAPACITY_r03: random-access HBM runs ~20x slower than the linear
    scan, so nprobe=2 touching 2.2% of a 24M corpus won only 2.4x);
    monotone indices give the gather engine sequential-ish row
    addresses. Ranking is order-independent (segment maxima + global
    ids), so this is purely a memory-layout experiment knob. Read at
    trace time — set it before the first search of a process."""
    return os.environ.get("CLIPX_IVF_SORT_PROBE", "off").lower() in (
        "on", "1", "true")


def _maybe_sort_probe(seg_idx: jax.Array,
                      seg_scores: Optional[jax.Array] = None):
    """Sort (seg_idx, seg_scores) by segment id per query when the
    probe-sort knob is on (one shared permutation keeps residual
    coarse scores aligned with their segments)."""
    if not _sort_probe_enabled():
        return seg_idx, seg_scores
    if seg_scores is None:
        return jnp.sort(seg_idx, axis=1), None
    order = jnp.argsort(seg_idx, axis=1)
    return (jnp.take_along_axis(seg_idx, order, axis=1),
            jnp.take_along_axis(seg_scores, order, axis=1))


@functools.partial(jax.jit, static_argnames=("P", "k"))
def _ivf_kernel_f32(corpus3: jax.Array, seg_cent: jax.Array,
                    valid2: jax.Array, queries: jax.Array,
                    P: int, k: int) -> Tuple[jax.Array, jax.Array]:
    """corpus3: (S, 64, D) cluster-packed rows; seg_cent: (S, D);
    valid2: (S, 64) bool marking live rows (clusters pad to segment
    boundaries with dead rows). Probes the top-P segments by centroid
    score and scores their rows in exact f32 (IVFFlat semantics).
    Returns (Q, k) scores and INTERNAL row ids (dead rows -> -inf)."""
    nq = queries.shape[0]
    cs = jnp.dot(queries, seg_cent.T,
                 preferred_element_type=jnp.float32)          # (Q, S)
    _, seg_idx = jax.lax.top_k(cs, P)                         # (Q, P)
    seg_idx, _ = _maybe_sort_probe(seg_idx)
    rows = corpus3[seg_idx]                                   # (Q,P,W,D)
    exact = jnp.einsum("qd,qpwd->qpw", queries, rows,
                       preferred_element_type=jnp.float32)
    gids = (seg_idx[:, :, None] * _SEG_W
            + jnp.arange(_SEG_W, dtype=jnp.int32)[None, None, :])
    exact = jnp.where(valid2[seg_idx], exact, -jnp.inf)
    kk = min(k, P * _SEG_W)
    d, sel = jax.lax.top_k(exact.reshape(nq, P * _SEG_W), kk)
    return d, jnp.take_along_axis(gids.reshape(nq, P * _SEG_W), sel,
                                  axis=1)


def _int8_probe_body(codes3: jax.Array, scales2: jax.Array,
                     valid2: jax.Array, queries: jax.Array,
                     seg_idx: jax.Array, rescore_rows, s: int, k: int,
                     seg_offset=0, scan_raw=None
                     ) -> Tuple[jax.Array, jax.Array]:
    """Shared body of every int8 probed kernel (single-device and
    sharded): quantize the queries, int8-scan the probed segments,
    keep the top-``s`` segments by per-segment max, rescore their rows
    in exact f32 (rows supplied by ``rescore_rows(chosen)`` — stored
    f32/bf16 rows in quant mode, dequantized codes in int8-storage
    mode), final top-k. ``seg_offset`` shifts segment ids to global
    (sharded callers pass ``axis_index * S_local``). ``scan_raw(si,
    q_codes)`` overrides the probe-scan score (int4 storage gathers
    PACKED segments — half the gather bytes — and scores the nibble
    views with two einsums, never materializing unpacked rows)."""
    nq = queries.shape[0]
    q_scale = jnp.maximum(jnp.abs(queries).max(axis=1, keepdims=True),
                          1e-12) / 127.0
    q_codes = jnp.clip(jnp.rint(queries / q_scale), -127, 127
                       ).astype(jnp.int8)
    if scan_raw is not None:
        raw = scan_raw(seg_idx, q_codes)                      # (Q,P,W) i32
    else:
        raw = jnp.einsum("qd,qpwd->qpw", q_codes, codes3[seg_idx],
                         preferred_element_type=jnp.int32)
    approx = raw.astype(jnp.float32) * scales2[seg_idx]
    approx = jnp.where(valid2[seg_idx], approx, -jnp.inf)
    segmax = approx.max(axis=2)                               # (Q, P)
    _, local = jax.lax.top_k(segmax, s)                       # (Q, s)
    chosen = jnp.take_along_axis(seg_idx, local, axis=1)      # (Q, s)
    rows = rescore_rows(chosen)                               # (Q,s,W,D) f32
    exact = jnp.einsum("qd,qswd->qsw", queries, rows,
                       preferred_element_type=jnp.float32)
    g2 = ((chosen + seg_offset)[:, :, None] * _SEG_W
          + jnp.arange(_SEG_W, dtype=jnp.int32)[None, None, :])
    exact = jnp.where(valid2[chosen], exact, -jnp.inf)
    kk = min(k, s * _SEG_W)
    d, sel = jax.lax.top_k(exact.reshape(nq, s * _SEG_W), kk)
    return d, jnp.take_along_axis(g2.reshape(nq, s * _SEG_W), sel, axis=1)


def _dequant_rows(codes3: jax.Array, scales2: jax.Array):
    """rescore_rows callback for int8 STORAGE: dequantize the chosen
    candidate rows in f32, so the query-side quantization error of the
    scan cancels and only corpus rounding (~5e-4 score RMS) remains —
    identical semantics to the flat engine's _search_kernel_int8_pure."""
    return lambda chosen: (codes3[chosen].astype(jnp.float32)
                           * scales2[chosen][..., None])


def _dequant_rows_int4(packed3: jax.Array, scales2: jax.Array):
    """rescore_rows callback for int4 STORAGE: gather the PACKED
    candidate segments, unpack, dequantize (corpus rounding ~1e-2 score
    RMS — the faiss-SQ4 trade, see engine's int4 section)."""
    return lambda chosen: (
        engine._unpack_int4(packed3[chosen]).astype(jnp.float32)
        * scales2[chosen][..., None])


def _scan_raw_int4(packed3: jax.Array):
    """scan_raw callback for int4 STORAGE: gather PACKED segments and
    score the two nibble views (SPLIT layout, engine.pack_int4) with
    two einsums — half the int8 tier's gather bytes and no unpacked
    (Q, P, W, D) transient."""
    def scan(seg_idx, q_codes):
        half = packed3.shape[-1]
        lo, hi = engine._nibbles(packed3[seg_idx])            # (Q,P,W,D/2)
        return (jnp.einsum("qd,qpwd->qpw", q_codes[:, :half], lo,
                           preferred_element_type=jnp.int32)
                + jnp.einsum("qd,qpwd->qpw", q_codes[:, half:], hi,
                             preferred_element_type=jnp.int32))
    return scan


@functools.partial(jax.jit, static_argnames=("P", "k"))
def _ivf_kernel_int4_pure(packed3: jax.Array, scales2: jax.Array,
                          seg_cent: jax.Array, valid2: jax.Array,
                          queries: jax.Array,
                          P: int, k: int) -> Tuple[jax.Array, jax.Array]:
    """IVF over int4 STORAGE (--corpus-dtype int4): the packed codes
    ARE the corpus. packed3: (S, 64, D/2) int8 — the probe gathers
    packed segments (half the int8 tier's gather bytes) and unpacks
    them for the int8 scan; rescore from dequantized candidates."""
    cs = jnp.dot(queries, seg_cent.T,
                 preferred_element_type=jnp.float32)
    _, seg_idx = jax.lax.top_k(cs, P)                         # (Q, P)
    seg_idx, _ = _maybe_sort_probe(seg_idx)
    return _int8_probe_body(packed3, scales2, valid2, queries, seg_idx,
                            _dequant_rows_int4(packed3, scales2),
                            min(k, P), k,
                            scan_raw=_scan_raw_int4(packed3))


def _probe_chunk_segs(P: int, W: int) -> int:
    """Probed-segment chunk size for the PQ probe body: the largest
    bucket-form divisor of ``P`` (so chunks tile the probe exactly)
    whose row count is Pallas-tile-aligned (pc*W <= _TILE or a multiple
    of it) and stays under ~32k rows — bounding the per-chunk one-hot
    transient regardless of nprobe. Unchunked, a capacity-scale probe
    one-hot reaches gigabytes (64M rows at nprobe=2 -> 1.3M probed rows
    x M*16 = 5 GiB for 512-d dsub=2)."""
    from clipx.ops.pq_scan import _TILE

    align = max(1, _TILE // W)
    target = max(align, 32768 // W)
    best, b = 1, 1
    while b <= P:
        for c in (b, b + b // 2):
            if (0 < c <= target and P % c == 0
                    and (c <= align or c % align == 0)):
                best = max(best, c)
        b *= 2
    return best


def _pq_probe_body(packed3: jax.Array, centroids: jax.Array,
                   valid2: jax.Array, queries: jax.Array,
                   seg_idx: jax.Array, k: int, seg_offset=0,
                   seg_scores: Optional[jax.Array] = None
                   ) -> Tuple[jax.Array, jax.Array]:
    """PQ probed scan (the faiss IVFPQ analog): gather the probed
    PACKED segments (M/2 bytes/row — the smallest gather on the
    ladder), score every gathered row with the one-hot x int8-LUT
    matmul, keep a per-ELEMENT 4k candidate margin, and rescore the
    candidates against the f32 LUT — returned scores are exact PQ
    scores, identical semantics to pq._pq_topk applied to the probed
    fraction. ``seg_offset`` shifts segment ids to global for sharded
    callers.

    The scan is chunked over probed segments (``_probe_chunk_segs``)
    under ``lax.map`` so the 16x one-hot expansion never exceeds one
    chunk — required at capacity scale, where nprobe=2 over tens of
    millions of rows probes millions. Single-query calls (the serve
    latency path) route each chunk through the Pallas VMEM scan
    (clipx/ops/pq_scan.py, same CLIPX_PQ_SCAN knob as the full scan),
    which skips the HBM one-hot expansion entirely; scores are bitwise
    equal between routes (integer sums, exact in f32).

    RESIDUAL mode (``seg_scores`` given — the (Q, P) exact f32 coarse
    scores of the probed segments): codes encode residuals against
    their segment centroid (faiss ``by_residual``), so every scanned
    score adds the segment's coarse score and every rescored score adds
    it back exactly — score(q, x) = q.cent + q.decode(residual). The
    int8 scan must then apply the per-query LUT scale before the sum
    (a mixed ranking is scale-sensitive; plain PQ drops it)."""
    import os

    nq = queries.shape[0]
    half = centroids.shape[0] // 2
    # segments are lane-paired (pq.pack_factor): (S, W/pf, half*pf)
    pf = packed3.shape[2] // half
    P, W = seg_idx.shape[1], packed3.shape[1] * pf
    mk = 2 * half * pq_lib.PQ_K
    lut, luti, lut_scale = pq_lib.quantized_luts(queries, centroids)
    iota16 = jnp.arange(pq_lib.PQ_K, dtype=jnp.uint8)
    rows = P * W
    kk = min(k, rows)
    m_cand = min(pq_lib.PQ_RESCORE_MARGIN * kk, rows)
    pc = _probe_chunk_segs(P, W)
    rows_c = pc * W
    n_chunks = P // pc
    m_chunk = min(m_cand, rows_c)

    use_pallas = nq == 1 and pq_lib._use_pallas_scan(rows_c)
    if use_pallas:
        from clipx.ops.pq_scan import pq_scan_scores

        ldt = (jnp.bfloat16
               if os.environ.get("CLIPX_PQ_LUT", "int8") == "bf16"
               else jnp.int8)
        lut_col = luti.T.astype(ldt)                     # (mk, 1)

    def scan_chunk(c):
        cs = jax.lax.dynamic_slice_in_dim(seg_idx, c * pc, pc, axis=1)
        g = packed3[cs]                          # (Q,pc,W/pf,half*pf)
        if pf > 1:  # chunk-local reshape back to logical row order
            g = g.reshape(nq, pc, W, half)
        vm = valid2[cs].reshape(nq, rows_c)
        if use_pallas:
            raw = pq_scan_scores(g.reshape(rows_c, half), lut_col)
        else:
            codes = pq_lib._unpack_codes4(g)           # (Q,pc,W,M) u8
            onehot = (codes[..., None] == iota16).astype(jnp.int8)
            raw = jax.lax.dot_general(
                onehot.reshape(nq, rows_c, mk), luti,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)      # (Q, rows_c)
        approx = raw.astype(jnp.float32)
        if seg_scores is not None:
            # residual: dequantize the scan (per-query LUT scale) and
            # add each probed segment's exact coarse score
            cv = jax.lax.dynamic_slice_in_dim(seg_scores, c * pc, pc,
                                              axis=1)   # (Q, pc)
            approx = (approx * lut_scale
                      + jnp.repeat(cv, W, axis=1))
        approx = jnp.where(vm, approx, -jnp.inf)
        d, li = jax.lax.top_k(approx, m_chunk)         # (Q, m_chunk)
        return d, li + c * rows_c

    if n_chunks == 1:
        d_ap, cand = scan_chunk(jnp.int32(0))          # (Q, m_cand)
    else:
        ds, lis = jax.lax.map(scan_chunk,
                              jnp.arange(n_chunks, dtype=jnp.int32))
        d_all = ds.transpose(1, 0, 2).reshape(nq, -1)
        i_all = lis.transpose(1, 0, 2).reshape(nq, -1)
        d_ap, pos = jax.lax.top_k(d_all, m_cand)
        cand = jnp.take_along_axis(i_all, pos, axis=1)  # (Q, m_cand)

    # f32-LUT rescore of the candidates (flat probed-space index ->
    # segment + row): exact PQ scores, query-side rounding cancels
    cseg, crow = cand // W, cand % W
    gseg = jnp.take_along_axis(seg_idx, cseg, axis=1)   # (Q, m)
    if pf > 1:  # candidate rows live inside lane-paired physical rows
        pairs = packed3[gseg, crow // pf]               # (Q,m,half*pf)
        pairs = pairs.reshape(nq, m_cand, pf, half)
        rows_p = jnp.take_along_axis(
            pairs, (crow % pf)[..., None, None], axis=2)[:, :, 0]
    else:
        rows_p = packed3[gseg, crow]
    cand_codes = pq_lib._unpack_codes4(rows_p)          # (Q,m,M)
    oneh = (cand_codes[..., None] == iota16).astype(jnp.float32)
    exact = jax.lax.dot_general(
        oneh.reshape(nq, m_cand, mk), lut,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)             # (Q, m)
    if seg_scores is not None:
        # add back the candidate segments' exact coarse scores:
        # score = q.cent + q.decode(residual), full-precision
        exact = exact + jnp.take_along_axis(seg_scores, cseg, axis=1)
    exact = jnp.where(valid2[gseg, crow], exact, -jnp.inf)
    gids = (gseg + seg_offset) * W + crow
    d, s2 = jax.lax.top_k(exact, kk)
    return d, jnp.take_along_axis(gids, s2, axis=1)


@functools.partial(jax.jit, static_argnames=("P", "k", "residual"))
def _ivf_kernel_pq(packed3: jax.Array, centroids: jax.Array,
                   seg_cent: jax.Array, valid2: jax.Array,
                   queries: jax.Array,
                   P: int, k: int, residual: bool = False
                   ) -> Tuple[jax.Array, jax.Array]:
    """IVF over pq STORAGE (--corpus-dtype pq + --search-mode ivf):
    probed product-quantized search — faiss IndexIVFPQ semantics with
    the LUT lookups on the MXU. packed3: (S, 64, M/2) int8. With
    ``residual`` the codes are residuals against segment centroids and
    the probe's own coarse scores complete them (faiss by_residual —
    see _pq_probe_body)."""
    cs = jnp.dot(queries, seg_cent.T,
                 preferred_element_type=jnp.float32)
    cvals, seg_idx = jax.lax.top_k(cs, P)                 # (Q, P)
    seg_idx, cvals = _maybe_sort_probe(seg_idx, cvals)
    return _pq_probe_body(packed3, centroids, valid2, queries, seg_idx,
                          k, seg_scores=cvals if residual else None)


@functools.partial(jax.jit, static_argnames=("P", "k"))
def _ivf_kernel_int8(codes3: jax.Array, scales2: jax.Array,
                     corpus3: jax.Array, seg_cent: jax.Array,
                     valid2: jax.Array, queries: jax.Array,
                     P: int, k: int) -> Tuple[jax.Array, jax.Array]:
    """int8 probed scan + exact f32 rescore of the top-k segments —
    the quant-mode composition applied only to the probed fraction.
    codes3: (S, 64, D) int8; scales2: (S, 64) per-row scales."""
    cs = jnp.dot(queries, seg_cent.T,
                 preferred_element_type=jnp.float32)
    _, seg_idx = jax.lax.top_k(cs, P)                         # (Q, P)
    seg_idx, _ = _maybe_sort_probe(seg_idx)
    return _int8_probe_body(codes3, scales2, valid2, queries, seg_idx,
                            lambda chosen: corpus3[chosen],
                            min(k, P), k)


@functools.partial(jax.jit, static_argnames=("P", "k"))
def _ivf_kernel_int8_pure(codes3: jax.Array, scales2: jax.Array,
                          seg_cent: jax.Array, valid2: jax.Array,
                          queries: jax.Array,
                          P: int, k: int) -> Tuple[jax.Array, jax.Array]:
    """IVF over int8 STORAGE (--corpus-dtype int8): the codes ARE the
    corpus — no f32/bf16 rows exist on device. Same probed scan as
    _ivf_kernel_int8; rescore from dequantized candidates."""
    cs = jnp.dot(queries, seg_cent.T,
                 preferred_element_type=jnp.float32)
    _, seg_idx = jax.lax.top_k(cs, P)                         # (Q, P)
    seg_idx, _ = _maybe_sort_probe(seg_idx)
    return _int8_probe_body(codes3, scales2, valid2, queries, seg_idx,
                            _dequant_rows(codes3, scales2),
                            min(k, P), k)


@jax.jit
def _segment_stats(corpus3: jax.Array, counts: jax.Array) -> jax.Array:
    """Per-segment mean over VALID rows (padding rows are zero and
    excluded via the per-segment count)."""
    sums = corpus3.astype(jnp.float32).sum(axis=1)
    return sums / jnp.maximum(counts[:, None], 1.0)


def _bucket_probe(p: int) -> int:
    """Probe-count bucket >= p. Steps of 2^n and 1.5*2^n: plain
    power-of-two buckets overshoot by up to 2x, and probed bytes are
    the whole cost of this kernel (measured at 1M x 512: nprobe=32 ->
    raw P=5000 -> pow2 bucket 8192 probed 52% of the corpus instead of
    32%). The mixed steps cap overshoot at ~33% while keeping the
    compiled-shape count small."""
    b = 1
    while True:
        if b >= p:
            return b
        if b + b // 2 >= p:
            return b + b // 2
        b *= 2


class IVFIndex:
    """Approximate inner-product index with a functional ``nprobe``.

    ``nprobe``/100 of the corpus segments are probed (the reference's
    nlist is 100, so ``p N`` means "scan ~N% of the corpus" there too);
    ``nprobe=100`` probes everything and returns exactly the flat
    engine's ranking. faiss-shaped API: search returns (D, I) with
    external row ids, -1 past ntotal."""

    # the probe knob actually binds here (flat indexes carry .nprobe
    # only as a faiss-compat no-op) — serve keys per-request overrides
    # off this flag
    supports_nprobe = True

    def __init__(self, dim: int, quantized: bool = False,
                 dtype=jnp.float32):
        self.dim = dim
        # storage dtype of the device-resident rows (f32 exact, or bf16
        # to halve HBM — the rescore still accumulates in f32; see
        # --corpus-dtype in clipx/cli/common.py for the trade). int8
        # STORAGE stores only the per-row-quantized codes (1 B/dim):
        # the probed scan is int8 and candidates rescore from
        # DEQUANTIZED rows in f32 (_ivf_kernel_int8_pure) — probed
        # search at the flat int8 tier's ~5x capacity.
        self.pq_storage = pq_lib.is_pq(dtype)
        self.int4_storage = (not self.pq_storage
                             and engine._is_int4(dtype))
        if not (self.pq_storage or self.int4_storage) and jnp.dtype(
                dtype) not in (
                jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16),
                jnp.dtype(jnp.int8)):
            raise ValueError("IVF corpus dtype must be f32, bf16, int8, "
                             f"int4 or pq, got {jnp.dtype(dtype).name}")
        self.int8_storage = (not (self.pq_storage or self.int4_storage)
                             and jnp.dtype(dtype) == jnp.dtype(jnp.int8))
        if self.int4_storage and dim % 2:
            raise ValueError(f"int4 storage needs an even dim, got {dim}")
        if self.pq_storage:
            pq_lib.subspaces(dim)  # validates divisibility
        # codes-as-corpus has no unquantized scan to fall back to
        self.quantized = True if (self.int8_storage or self.int4_storage
                                  or self.pq_storage) else quantized
        self.dtype = dtype
        self.ntotal = 0
        self._nprobe = 32  # reference:query-index.py:30
        self._corpus3: Optional[jax.Array] = None   # (S, 64, D) f32
        self._seg_cent: Optional[jax.Array] = None  # (S, D) f32
        self._valid2: Optional[jax.Array] = None    # (S, 64) bool
        self._row_ext: Optional[np.ndarray] = None  # (S*64,) → ext id, -1 dead
        self._codes3: Optional[jax.Array] = None
        self._scales2: Optional[jax.Array] = None
        self._pq = None  # PQCodebook (pq storage), trained at install
        # pq codes encode residuals vs segment centroids (faiss
        # by_residual; set at install per $CLIPX_PQ_RESIDUAL or the
        # codes-file payload)
        self._residual = False
        self._base_n = 0
        self._tail: Optional[engine.VectorIndex] = None
        # ascending cumulative sums of live-segment occupancies — feeds
        # the adversarial probe floor (_probe_floor)
        self._live_count_cumsum: Optional[np.ndarray] = None
        # coded storage quantizes ROTATED rows and probes rotated
        # centroids; queries rotate to match, reconstruction unrotates
        # (engine.corpus_rotation — recall on anisotropic embeddings;
        # cluster ASSIGNMENT is rotation-invariant, so the cached .ivf
        # layout composes with either knob setting)
        self._rot = (engine.corpus_rotation(dim) if self.coded_storage
                     else None)
        # centered int8/int4 storage (engine.coded_center_enabled):
        # codes are residuals from the canonical corpus mean; search
        # adds the exact q·mean term back host-side
        self._center: Optional[np.ndarray] = None

    @property
    def coded_storage(self) -> bool:
        """True when the quantized codes ARE the corpus (int8/int4/pq)."""
        return self.int8_storage or self.int4_storage or self.pq_storage

    # nprobe is clamped like the reference REPL clamps it (1..100)
    @property
    def nprobe(self) -> int:
        return self._nprobe

    @nprobe.setter
    def nprobe(self, v: int) -> None:
        self._nprobe = int(np.clip(int(v), 1, 100))

    def _tier(self) -> Optional[str]:
        return ("pq" if self.pq_storage else
                "int4" if self.int4_storage else
                "int8" if self.int8_storage else None)

    # -- construction -------------------------------------------------------
    @classmethod
    def from_vectors(cls, vectors: np.ndarray, *, quantized: bool = False,
                     cache_path: Optional[str] = None,
                     seed: int = 0, **kw) -> "IVFIndex":
        vectors = np.ascontiguousarray(vectors, dtype=np.float32)
        idx = cls(dim=vectors.shape[1], quantized=quantized, **kw)
        n = vectors.shape[0]
        if n == 0:
            return idx
        layout = None
        if cache_path and os.path.exists(cache_path):
            layout = _load_cache(cache_path, vectors)
        if layout is None:
            assign, _cent = train_clusters(vectors, seed=seed)
            layout = cluster_layout(assign)
            if cache_path:
                _save_cache(cache_path, vectors, layout)
        idx._install(vectors, layout)
        pending = getattr(idx, "_pending_codes_payload", None)
        if pending is not None and pending.get("residual"):
            # bind the stashed residual codes to the CANONICAL layout
            # they were encoded under (see layout_digest) — the codes
            # file records it, _load_cache_for_codes enforces it
            pending["layout_digest"] = layout_digest(layout)
        return idx

    @classmethod
    def from_codes(cls, payload: dict, cache_path: str, *,
                   quantized: bool = False, **kw) -> Optional["IVFIndex"]:
        """Construct a coded-storage IVF index from a loaded
        ``<index>.codes`` payload plus the v2 ``.ivf`` cache (layout +
        per-segment sums) — no f32 rows read, no k-means, no
        re-encode: the faiss IVFPQ/IVF-SQ ``read_index`` property.
        Returns None when the cache is absent, pre-v2, or keyed to a
        different corpus than the codes file (caller falls back to the
        f32 path, which re-saves a v2 cache)."""
        import jax.numpy as jnp

        tier = payload["tier"]
        dtype = {"int8": jnp.int8, "int4": jnp.int4, "pq": "pq"}[tier]
        if payload["ntotal"] == 0:
            return cls(dim=payload["dim"], quantized=quantized,
                       dtype=dtype, **kw)
        cache = _load_cache_for_codes(cache_path, payload)
        if cache is None:
            return None
        layout, sums = cache
        idx = cls(dim=payload["dim"], quantized=quantized, dtype=dtype,
                  **kw)
        idx._install(None, layout, coded=payload, seg_sums=sums)
        return idx

    def _probe_floor(self, k: int) -> int:
        """Smallest probe count that ADVERSARIALLY guarantees k valid
        rows: the s emptiest live segments must together hold >= k rows
        (the probe ranks live segments first — dead alignment segments
        score -inf — so any s probed+rescored segments hold at least
        this many). 1 on dense corpora (every segment ~full), up to k
        on a one-row-per-segment tiny corpus."""
        cs = self._live_count_cumsum
        if cs is None or not len(cs):
            return 1
        return int(min(np.searchsorted(cs, k) + 1, len(cs)))

    def _install(self, vectors: Optional[np.ndarray],
                 row_ext: np.ndarray, *, coded: Optional[dict] = None,
                 seg_sums: Optional[np.ndarray] = None) -> None:
        """row_ext: internal-row -> external-id map (-1 = dead padding
        row), length a multiple of _SEG_W (see cluster_layout).

        Coded tiers install by PERMUTING canonical flat-order codes
        (codes_io.encode_corpus — the bytes a ``<index>.codes`` file
        stores) into the cluster layout, never re-encoding permuted
        rows: one encoder, identical bytes on disk and in HBM. ``coded``
        supplies a pre-encoded payload (the codes-file load path, where
        ``vectors`` is None and ``seg_sums`` carries the cached
        per-segment sums); otherwise the canonical encoder runs here.
        Dead padding rows get zero codes / epsilon scales — every scan
        and rescore masks them via valid2 before ranking, so their code
        content is unobservable."""
        n = coded["ntotal"] if vectors is None else vectors.shape[0]
        segs = len(row_ext) // _SEG_W
        live = row_ext >= 0
        valid2 = live.reshape(segs, _SEG_W)
        counts = valid2.sum(axis=1).astype(np.float32)
        live_counts = valid2.sum(axis=1)
        self._live_count_cumsum = np.cumsum(
            np.sort(live_counts[live_counts > 0]))
        if self.coded_storage:
            from clipx.search import codes_io

            # codes ARE the corpus: encoded on the HOST so a full f32
            # copy never has to exist in HBM (the whole point of the
            # tier — a 24M x 512 f32 corpus is ~49 GiB, 3x the chip);
            # segment centroids likewise reduce host-side.
            if seg_sums is None:
                seg_sums = _segment_sums(vectors, row_ext)
            if coded is None:
                if (self.pq_storage and self._pq is None
                        and pq_lib.pq_residual_enabled()):
                    coded = _encode_residual_flat(
                        vectors, row_ext, seg_sums, counts, self._rot)
                    self._pq = coded["codebook"]
                else:
                    coded = codes_io.encode_corpus(
                        vectors, self._tier(), rot=self._rot,
                        codebook=self._pq)
                    if self.pq_storage and self._pq is None:
                        self._pq = coded["codebook"]
            elif self.pq_storage and self._pq is None:
                self._pq = pq_lib.PQCodebook(
                    np.asarray(coded["centroids"]))
            if self.pq_storage:
                self._residual = bool(coded.get("residual"))
                if coded.get("rot_matrix") is not None:
                    self._rot = coded["rot_matrix"]  # trained OPQ
            self._center = coded.get("center")  # centered int8/int4
            if _STASH_CODES:
                # the caller (cli.common) persists these flat codes to
                # the sidecar — no re-encode, no device round-trip
                self._pending_codes_payload = coded
            codes, scales = _permute_coded(coded, row_ext, live)
            self._corpus3 = None
            if self.pq_storage:
                # lane-paired physical segments (pq.pack_factor):
                # (S, W/pf, cdim*pf), byte-identical to (S, W, cdim)
                pf = pq_lib.pack_factor(codes.shape[1])
                self._codes3 = jnp.asarray(codes.reshape(
                    segs, _SEG_W // pf, codes.shape[1] * pf))
            else:
                self._codes3 = jnp.asarray(
                    codes.reshape(segs, _SEG_W, codes.shape[1]))
            self._scales2 = (None if scales is None
                             else jnp.asarray(scales.reshape(segs,
                                                             _SEG_W)))
            # centroids live in rotated space too (sum of rotated rows
            # == rotated sum — rotation is linear), so the probe scores
            # rotated queries against them unchanged
            sums = engine.rotate_rows(
                np.ascontiguousarray(seg_sums, np.float32), self._rot)
            self._seg_cent = jnp.asarray(
                sums / np.maximum(counts[:, None], 1.0), jnp.float32)
        else:
            padded = np.zeros((segs * _SEG_W, self.dim), np.float32)
            padded[live] = vectors[row_ext[live]]
            corpus3 = jnp.asarray(padded.reshape(segs, _SEG_W, self.dim),
                                  dtype=self.dtype)
            self._corpus3 = corpus3
            self._seg_cent = _segment_stats(corpus3, jnp.asarray(counts))
            self._codes3 = None
            self._scales2 = None
        self._valid2 = jnp.asarray(valid2)
        self._row_ext = row_ext.astype(np.int64)
        pos = np.flatnonzero(live)
        self._pos_of_ext = np.empty(n, np.int64)
        self._pos_of_ext[row_ext[pos]] = pos
        self._base_n = n
        self.ntotal = n + (self._tail.ntotal if self._tail else 0)

    def add(self, vectors: np.ndarray) -> None:
        """Append rows to the exact tail (ids continue from ntotal).
        The clustered base is not retrained — rebuild via from_vectors
        when the tail grows past taste (serve's full reload path)."""
        vectors = np.ascontiguousarray(vectors, dtype=np.float32)
        if vectors.ndim != 2 or vectors.shape[1] != self.dim:
            raise ValueError(f"expected (n, {self.dim}) vectors, "
                             f"got {vectors.shape}")
        if vectors.shape[0] == 0:
            return
        if self._tail is None:
            # residual-pq codebooks cover residual dynamics, not raw
            # rows — the tail (small by design: serve rebuilds when it
            # grows past taste) stores exact f32 instead
            tail_dtype = (jnp.float32 if (self.pq_storage
                                          and self._residual)
                          else self.dtype)
            self._tail = engine.VectorIndex(self.dim, dtype=tail_dtype)
            if (self.pq_storage and not self._residual
                    and self._pq is not None):
                # share the base codebooks AND rotation: a tiny tail
                # would otherwise train its own k-means on a handful of
                # rows (and encode under the fixed rotation while the
                # base may carry a trained OPQ one)
                self._tail._pq = self._pq
                self._tail._rot = self._rot
        self._tail.add(vectors)
        self.ntotal = self._base_n + self._tail.ntotal

    @property
    def tail_fraction(self) -> float:
        t = self._tail.ntotal if self._tail else 0
        return t / max(1, self.ntotal)

    def _ensure_codes(self) -> None:
        if self._codes3 is not None:
            return
        flat = self._corpus3.reshape(-1, self.dim)
        codes, scales = engine._quantize_device(flat)
        segs = self._corpus3.shape[0]
        self._codes3 = codes.reshape(segs, _SEG_W, self.dim)
        self._scales2 = scales.reshape(segs, _SEG_W)

    def _segs(self) -> int:
        """Segment count of the clustered base (0 when empty)."""
        arr = self._codes3 if self.coded_storage else self._corpus3
        return 0 if arr is None else arr.shape[0]

    def _probe(self, qj: jax.Array, P: int, kk: int
               ) -> Tuple[jax.Array, jax.Array]:
        """One probed-scan device call (Q already chunked by the
        caller). Returns (Q, kk) scores + INTERNAL row ids.
        ShardedIVFIndex overrides this with the shard_map variant."""
        if self.pq_storage:
            return _ivf_kernel_pq(
                self._codes3, self._pq.device(), self._seg_cent,
                self._valid2, qj, P, kk, residual=self._residual)
        if self.int4_storage:
            return _ivf_kernel_int4_pure(
                self._codes3, self._scales2, self._seg_cent,
                self._valid2, qj, P, kk)
        if self.int8_storage:
            return _ivf_kernel_int8_pure(
                self._codes3, self._scales2, self._seg_cent,
                self._valid2, qj, P, kk)
        if self.quantized:
            self._ensure_codes()
            return _ivf_kernel_int8(
                self._codes3, self._scales2, self._corpus3, self._seg_cent,
                self._valid2, qj, P, kk)
        return _ivf_kernel_f32(
            self._corpus3, self._seg_cent, self._valid2, qj, P, kk)

    def probe_bucket(self, k: int, nprobe: Optional[int] = None) -> int:
        """The bucketed probe count a (k, nprobe) request compiles —
        the request-dependent half of this index's kernel shape.
        ``ceil(nprobe% * segs)`` bucketed (see _bucket_probe), floored
        so the k smallest-occupancy live segments still hold k rows (on
        tiny corpora segments can be nearly empty, and the raw formula
        returned -1 rows for a k the corpus could satisfy — found
        driving the 5-image REPL; on dense corpora the floor is 1 and a
        low-nprobe request keeps its contracted scan fraction)."""
        segs = self._segs()
        if segs == 0:
            return 0
        k = clamp_k(k)
        eff = (self._nprobe if nprobe is None
               else int(np.clip(int(nprobe), 1, 100)))
        P = _bucket_probe(max(1, int(np.ceil(eff / 100.0 * segs))))
        return min(max(P, _bucket_probe(self._probe_floor(k))), segs)

    def shape_key(self, k: int, nprobe: Optional[int] = None) -> tuple:
        """Compiled-shape family of a (k, nprobe) search: (kk, P).
        Serve's post-warmup cold-shape guard keys off this — two
        requests with the same key reuse one compiled kernel; a novel
        key is a first-ever XLA compile (minutes through the remote
        compile service) that must not run inline under a live
        request."""
        k = clamp_k(k)
        P = self.probe_bucket(k, nprobe)
        if P == 0:
            return (engine._bucket_k(k), 0)
        return (min(engine._bucket_k(k), P * _SEG_W), P)

    # -- search -------------------------------------------------------------
    def search(self, queries: np.ndarray, k: int, *,
               nprobe: Optional[int] = None
               ) -> Tuple[np.ndarray, np.ndarray]:
        """``nprobe`` overrides the index-global knob for THIS call only
        (serve threads it per HTTP request, so concurrent clients with
        different recall targets never race a shared setter)."""
        k = clamp_k(k)
        queries = np.ascontiguousarray(np.atleast_2d(queries),
                                       dtype=np.float32)
        if queries.shape[1] != self.dim:
            raise ValueError(
                f"query dim {queries.shape[1]} != index dim {self.dim} "
                "(is --model the one this index was built with?)")
        nq = queries.shape[0]
        segs = self._segs()
        if self.ntotal == 0 or segs == 0:
            if self._tail is not None and self._tail.ntotal:
                return self._tail.search(queries, k)
            return (np.full((nq, k), -np.inf, np.float32),
                    np.full((nq, k), -1, np.int64))
        P = self.probe_bucket(k, nprobe)
        qcap = _qcap(P, self.dim, self.quantized, k,
                     int8_storage=self.coded_storage,
                     pq_mk=(self._pq.m * pq_lib.PQ_K
                            if self.pq_storage else 0))
        if nq > qcap:
            parts = [self.search(queries[i: i + qcap], k, nprobe=nprobe)
                     for i in range(0, nq, qcap)]
            return (np.concatenate([p[0] for p in parts]),
                    np.concatenate([p[1] for p in parts]))
        kk = min(engine._bucket_k(k), P * _SEG_W)
        # the probed scan sees ROTATED queries (codes + centroids are
        # rotated); the exact tail below rotates its own internally
        qpad, nq = engine._pad_q(engine.rotate_rows(queries, self._rot))
        d, ids = self._probe(jnp.asarray(qpad), P, kk)
        d = np.asarray(d[:nq], np.float32)
        ids = np.asarray(ids[:nq], np.int64)
        if self._center is not None:
            # centered codes scored the residual only (per-query
            # constant — probe ranking unchanged); add the exact q·mean
            # back so scores are faithful and comparable with the exact
            # f32 tail merged below (-inf slots stay -inf)
            d = d + (qpad[:nq] @ self._center)[:, None]
        # dead rows already map to -1 in row_ext; -inf slots follow suit
        ids_ext = np.where(np.isfinite(d), self._row_ext[ids], -1)
        if self._tail is not None and self._tail.ntotal:
            td, ti = self._tail.search(queries, k)
            ti = np.where(ti >= 0, ti + self._base_n, -1)
            d = np.concatenate([d, td], axis=1)
            ids_ext = np.concatenate([ids_ext, ti], axis=1)
            order = np.argsort(-d, axis=1, kind="stable")
            d = np.take_along_axis(d, order, axis=1)
            ids_ext = np.take_along_axis(ids_ext, order, axis=1)
        d = d[:, :k]
        ids_ext = ids_ext[:, :k]
        if d.shape[1] < k:
            pad = k - d.shape[1]
            d = np.pad(d, ((0, 0), (0, pad)), constant_values=-np.inf)
            ids_ext = np.pad(ids_ext, ((0, 0), (0, pad)),
                             constant_values=-1)
        return d, ids_ext

    # -- reconstruction -----------------------------------------------------
    def reconstruct(self, row: int) -> np.ndarray:
        if not (0 <= row < self.ntotal):
            raise IndexError(row)
        if row < self._base_n:
            pos = int(self._pos_of_ext[row])
            if self.pq_storage:
                # segments are lane-paired: fetch the one physical row
                # holding this position (a device-wide reshape to
                # logical rows would relayout the whole corpus)
                cdim = self._pq.m // 2
                pf = pq_lib.pack_factor(cdim)
                seg, off = pos // _SEG_W, pos % _SEG_W
                pair = np.asarray(
                    self._codes3[seg, off // pf]).reshape(pf, cdim)
                v = self._pq.decode(pair[off % pf][None, :])[0]
                if self._residual:  # decode is the residual only
                    v = v + np.asarray(self._seg_cent[seg])
                return v @ self._rot.T if self._rot is not None else v
            if self.int4_storage:
                flat_c = self._codes3.reshape(-1, self.dim // 2)
                flat_s = self._scales2.reshape(-1)
                c = engine.unpack_int4_host(
                    np.asarray(flat_c[pos])[None, :])
                v = c[0].astype(np.float32) * float(flat_s[pos])
                if self._center is not None:
                    v = v + self._center
                return v @ self._rot.T if self._rot is not None else v
            if self.int8_storage:
                flat_c = self._codes3.reshape(-1, self.dim)
                flat_s = self._scales2.reshape(-1)
                v = (np.asarray(flat_c[pos], dtype=np.float32)
                     * float(flat_s[pos]))
                if self._center is not None:
                    v = v + self._center
                return v @ self._rot.T if self._rot is not None else v
            flat = self._corpus3.reshape(-1, self.dim)
            return np.asarray(flat[pos], dtype=np.float32)
        return self._tail.reconstruct(row - self._base_n)

    def vectors(self) -> np.ndarray:
        """Rows in EXTERNAL id order (the sidecar order — serve's
        incremental-reload fingerprint depends on it). int8 storage
        returns DEQUANTIZED rows (corpus rounding applies, same as the
        flat engine's int8 tier)."""
        if self._segs() == 0:
            base = np.zeros((0, self.dim), np.float32)
        elif self.coded_storage:
            # Dequantize chunk-wise straight into the output: the
            # one-shot (rows, dim) f32 product would transiently hold
            # ~3x the full f32 corpus in host RAM at this tier's 24M-row
            # design scale (the tier exists because f32 doesn't fit).
            # host-side reshape to LOGICAL rows (for pq the device
            # array is lane-paired; bytes are row-major either way)
            code_dim = (self._pq.m // 2 if self.pq_storage
                        else self._codes3.shape[-1])
            codes = np.asarray(self._codes3).reshape(-1, code_dim)
            scales = (None if self._scales2 is None
                      else np.asarray(self._scales2,
                                      dtype=np.float32).reshape(-1))
            pos = self._pos_of_ext
            base = np.empty((len(pos), self.dim), np.float32)
            cent_host = (np.asarray(self._seg_cent, np.float32)
                         if self.pq_storage and self._residual else None)
            step = 1 << 18
            for i in range(0, len(pos), step):
                p = pos[i:i + step]
                chunk = codes[p]
                if self.pq_storage:
                    chunk = self._pq.decode(chunk)
                    if cent_host is not None:
                        chunk = chunk + cent_host[p // _SEG_W]
                else:
                    if self.int4_storage:
                        chunk = engine.unpack_int4_host(chunk)
                    chunk = chunk.astype(np.float32)
                    chunk *= scales[p][:, None]
                    if self._center is not None:
                        chunk += self._center
                if self._rot is not None:  # back to user space
                    chunk = chunk @ self._rot.T
                base[i:i + len(p)] = chunk
        else:
            flat = np.asarray(self._corpus3.reshape(-1, self.dim),
                              dtype=np.float32)
            base = flat[self._pos_of_ext]
        if self._tail is not None and self._tail.ntotal:
            return np.concatenate([base, self._tail.vectors()])
        return base


# ---------------------------------------------------------------------------
# layout helpers shared by the vector- and codes-install paths
# ---------------------------------------------------------------------------

def _segment_sums(vectors, row_ext: np.ndarray,
                  chunk_segs: int = 8192) -> np.ndarray:
    """Per-segment row sums in UNROTATED user space, (segs, D) f32 —
    the coarse-quantizer numerator (seg_cent = rotate(sums)/counts).
    Chunked over segments so a memmapped capacity-scale corpus never
    materializes a full padded f32 copy; bit-identical to summing the
    whole padded (segs, W, D) array (per-segment reductions are
    independent)."""
    segs = len(row_ext) // _SEG_W
    dim = vectors.shape[1]
    sums = np.empty((segs, dim), np.float32)
    for s0 in range(0, segs, chunk_segs):
        s1 = min(segs, s0 + chunk_segs)
        re = row_ext[s0 * _SEG_W: s1 * _SEG_W]
        lv = re >= 0
        rows = np.zeros((len(re), dim), np.float32)
        rows[lv] = vectors[re[lv]]
        sums[s0:s1] = rows.reshape(s1 - s0, _SEG_W, dim).sum(axis=1)
    return sums


def _permute_coded(coded: dict, row_ext: np.ndarray, live: np.ndarray,
                   step: int = 1 << 20
                   ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Scatter canonical flat-order codes (and scales) into the padded
    cluster layout: padded[i] = codes[row_ext[i]] for live rows, zero
    codes / epsilon scales on dead padding rows (masked by valid2 in
    every kernel). Chunked so a memmapped codes file never doubles in
    RAM."""
    codes_flat = coded["codes"]
    cdim = codes_flat.shape[1]
    rows = len(row_ext)
    pc = np.zeros((rows, cdim), np.int8)
    scales_flat = coded["scales"]
    ps = (np.full((rows,), 1e-12, np.float32)
          if scales_flat is not None else None)
    pos = np.flatnonzero(live)
    ext = row_ext[pos]
    for i in range(0, len(pos), step):
        p = pos[i: i + step]
        e = ext[i: i + step]
        pc[p] = np.asarray(codes_flat[e])
        if ps is not None:
            ps[p] = np.asarray(scales_flat[e])
    return pc, ps


def _encode_residual_flat(vectors, row_ext: np.ndarray,
                          seg_sums: np.ndarray, counts: np.ndarray,
                          rot: Optional[np.ndarray]) -> dict:
    """Residual-PQ encoding in flat EXTERNAL row order (faiss
    ``by_residual``): residual_i = rot(x_i) - cent[seg(i)], with cent
    the rotated-space segment centroids the install places as
    ``_seg_cent`` (bit-identical arithmetic: rotate(sums)/counts).
    Codebooks train on a deterministic residual sample; codes chunk
    over a possibly-memmapped ``vectors``. The flat order is what the
    codes sidecar stores — residual codes are tied to the layout, and
    the shared content hash ties both to one corpus
    (codes_io/_load_cache_for_codes)."""
    # Rotation is linear, so rotated-space residuals are rotated
    # unrotated-space residuals: rot(x) - rot(c) = (x - c) @ rot.
    # Residuals are therefore formed UNROTATED and the rotation runs
    # inside encode — which lets OPQ train ON THE RESIDUALS themselves
    # (pq.train_opq below): the learned rotation balances the residual
    # distribution, composing the two recall levers.
    counts_f = np.maximum(np.asarray(counts, np.float32), 1.0)
    cent_unrot = (np.ascontiguousarray(seg_sums, np.float32)
                  / counts_f[:, None])
    live = row_ext >= 0
    pos = np.flatnonzero(live)
    n = len(pos)
    seg_of_ext = np.empty(n, np.int64)
    seg_of_ext[row_ext[pos]] = pos // _SEG_W
    rng = np.random.default_rng(pq_lib._PQ_SEED + vectors.shape[1])
    if n > pq_lib._PQ_TRAIN_SAMPLE:
        idx = rng.choice(n, pq_lib._PQ_TRAIN_SAMPLE, replace=False)
    else:
        idx = np.arange(n)
    res = (np.ascontiguousarray(vectors[idx], np.float32)
           - cent_unrot[seg_of_ext[idx]])
    rot, cb = pq_lib.train_opq(res, rot)
    codes = np.empty((n, cb.m // 2), np.int8)
    step = 1 << 16
    for i in range(0, n, step):
        b = (np.asarray(vectors[i: i + step], np.float32)
             - cent_unrot[seg_of_ext[i: i + step]])
        codes[i: i + len(b)] = cb.encode(b, rot=rot)
    return {"codes": codes, "scales": None, "centroids": cb.centroids,
            "codebook": cb, "rot_matrix": rot, "residual": True}


def layout_digest(layout: np.ndarray) -> bytes:
    """Identity digest of a canonical cluster layout (the .ivf cache's
    int32 ``layout`` array). Residual-PQ codes are encoded against the
    segment centroids this layout induces, and k-means layouts are only
    deterministic per platform — the codes file records this digest so
    a cache regenerated by a different process (CPU-forced run, JAX
    upgrade) on the same corpus bytes cannot silently decode residual
    codes against a different clustering (round-4 ADVICE, ivf.py:1191)."""
    import hashlib

    return hashlib.blake2b(
        np.ascontiguousarray(layout, np.int32).tobytes(),
        digest_size=16).digest()


def _layout_ok(layout: np.ndarray, n: int) -> bool:
    live = layout[layout >= 0]
    return not (len(layout) % _SEG_W or len(live) != n
                or (np.sort(live) != np.arange(n)).any())


# ---------------------------------------------------------------------------
# clustering cache — avoids re-running k-means on every CLI start.
# v2 additionally stores the per-segment sums, which is what lets the
# codes-file load path (from_codes) rebuild the coarse quantizer
# without ever reading the f32 sidecar.
# ---------------------------------------------------------------------------

_CACHE_VERSION = 2


def _fingerprint(vectors: np.ndarray) -> bytes:
    return engine.content_hash(vectors)


def _save_cache(path: str, vectors: np.ndarray,
                layout: np.ndarray) -> None:
    tmp = path + ".tmp"
    np.savez(tmp, version=_CACHE_VERSION,
             fp=np.frombuffer(_fingerprint(vectors), dtype=np.uint8),
             layout=layout.astype(np.int32),
             sums=_segment_sums(vectors, layout))
    # np.savez appends .npz to the name it opens
    os.replace(tmp + ".npz", path)


def _load_cache(path: str, vectors: np.ndarray) -> Optional[np.ndarray]:
    try:
        with np.load(path) as z:
            if int(z["version"]) != _CACHE_VERSION:
                return None
            if z["fp"].tobytes() != _fingerprint(vectors):
                return None
            layout = z["layout"].astype(np.int64)
    except Exception:
        return None
    if not _layout_ok(layout, vectors.shape[0]):
        return None
    return layout


def _load_cache_for_codes(path: str, payload: dict
                          ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Validate the .ivf cache against a codes-file payload WITHOUT the
    f32 rows: the cache's fingerprint is the full content hash of the
    sidecar rows, and the codes file records the same hash — equality
    ties codes, layout, and sums to one corpus. RESIDUAL payloads must
    additionally carry a layout digest matching the cache's layout
    array: residual codes decode against segment centroids, so a cache
    regenerated on another platform (same corpus, different k-means
    layout) would silently corrupt scores (round-4 ADVICE). Returns
    (layout, sums) or None (stale / pre-v2 / hashless codes file /
    layout mismatch) — the caller falls back to the f32 rebuild."""
    ch = payload.get("content_hash")
    if not ch or not os.path.exists(path):
        return None
    try:
        with np.load(path) as z:
            if int(z["version"]) != _CACHE_VERSION:
                return None
            if z["fp"].tobytes() != ch:
                return None
            layout = z["layout"].astype(np.int64)
            sums = np.asarray(z["sums"], np.float32)
        if payload.get("residual"):
            ld = payload.get("layout_digest")
            if ld is None or ld != layout_digest(layout):
                return None
    except Exception:
        return None
    if not _layout_ok(layout, payload["ntotal"]):
        return None
    if sums.shape != (len(layout) // _SEG_W, payload["dim"]):
        return None
    return layout, sums


# ---------------------------------------------------------------------------
# corpus-sharded IVF — the probe knob at pod scale
# ---------------------------------------------------------------------------

@jax.jit
def _quantize_segments(c3: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-row int8 quantization of (S, 64, D) segments — elementwise
    per row, so GSPMD keeps the segment sharding with zero comms. The
    f32 upcast keeps code rounding exact for bf16-stored segments and
    fuses into the elementwise chain (see engine._quantize_device)."""
    c = c3.astype(jnp.float32)
    scales = jnp.maximum(jnp.abs(c).max(axis=2), 1e-12) / 127.0
    codes = jnp.clip(jnp.rint(c / scales[..., None]), -127, 127
                     ).astype(jnp.int8)
    return codes, scales


class ShardedIVFIndex(IVFIndex):
    """IVF with the segment list row-sharded over a 1D device mesh.

    Segments are dealt ROUND-ROBIN to shards (shard j holds original
    segments j, j+n, j+2n, ...). Clusters occupy contiguous segment
    runs after ``cluster_layout``, so the interleave spreads every
    cluster ~evenly across shards — which is what makes the probe rule
    sound: each shard probes its LOCAL top-ceil(P/n) segments, and
    because each shard sees ~1/n of every cluster, the union closely
    tracks the global top-P a single device would pick. At
    ``nprobe=100`` both probe everything: the f32 path is bit-identical
    to the single-device ranking, and the quantized path rescores a
    strict SUPERSET of the single-device segment pool (min(kk, P/n) per
    shard unioned vs min(kk, P) global), so it inherits quant mode's
    scoped near-duplicate exception but can only improve on the
    single-device result. One ``all_gather`` of
    (Q, k) exact candidates crosses the ICI, the same collective
    pattern as ``ShardedVectorIndex`` (SURVEY.md section 2c).

    ``add`` is inherited: appended rows go to the small single-device
    exact tail until the next full rebuild re-clusters them.
    """

    def __init__(self, dim: int, quantized: bool = False, mesh=None,
                 dtype=jnp.float32):
        from jax.sharding import Mesh

        from clipx.parallel.mips import AXIS

        super().__init__(dim, quantized=quantized, dtype=dtype)
        if mesh is None:
            mesh = Mesh(np.asarray(jax.devices()), (AXIS,))
        if AXIS not in mesh.axis_names:
            raise ValueError(f"mesh must have a {AXIS!r} axis")
        self.mesh = mesh
        self._n_shards = mesh.shape[AXIS]
        self._seg_valid = None
        self._probe_fns = {}

    def _spec(self, axes: int):
        from jax.sharding import NamedSharding, PartitionSpec

        from clipx.parallel.mips import AXIS

        return NamedSharding(self.mesh,
                             PartitionSpec(AXIS, *([None] * axes)))

    def _install(self, vectors: Optional[np.ndarray],
                 row_ext: np.ndarray, *, coded: Optional[dict] = None,
                 seg_sums: Optional[np.ndarray] = None) -> None:
        n_rows = coded["ntotal"] if vectors is None else vectors.shape[0]
        n = self._n_shards
        segs = max(1, len(row_ext) // _SEG_W)
        segs_pad = -(-segs // n) * n
        if segs_pad * _SEG_W > len(row_ext):
            row_ext = np.concatenate([
                row_ext,
                np.full(segs_pad * _SEG_W - len(row_ext), -1, np.int64)])
        # deal segments round-robin: contiguous shard block j ends up
        # holding original segments [j::n]
        perm = np.arange(segs_pad).reshape(-1, n).T.reshape(-1)
        row_ext = row_ext.reshape(segs_pad, _SEG_W)[perm].reshape(-1)
        # cached sums follow the same dealing (canonical segment order
        # in, per-shard order out); appended alignment segments are
        # all-dead -> zero sums
        if seg_sums is not None:
            s = np.zeros((segs_pad, vectors.shape[1] if vectors is not None
                          else coded["dim"]), np.float32)
            s[: seg_sums.shape[0]] = seg_sums
            seg_sums = s[perm]
        live = row_ext >= 0
        valid2 = live.reshape(segs_pad, _SEG_W)
        counts_host = valid2.sum(axis=1).astype(np.float32)
        live_counts = valid2.sum(axis=1)
        self._live_count_cumsum = np.cumsum(
            np.sort(live_counts[live_counts > 0]))
        if self.coded_storage:
            from clipx.search import codes_io

            # host encode + host centroids: no f32 copy of the corpus
            # ever reaches HBM (see the single-device _install). Codes
            # come from the CANONICAL flat-order encoder (or a loaded
            # .codes payload) and are permuted into the dealt layout;
            # residual codes are identical under dealing (a segment's
            # centroid doesn't change when segments are reordered).
            if seg_sums is None:
                seg_sums = _segment_sums(vectors, row_ext)
            if coded is None:
                if (self.pq_storage and self._pq is None
                        and pq_lib.pq_residual_enabled()):
                    coded = _encode_residual_flat(
                        vectors, row_ext, seg_sums, counts_host,
                        self._rot)
                    self._pq = coded["codebook"]
                else:
                    coded = codes_io.encode_corpus(
                        vectors, self._tier(), rot=self._rot,
                        codebook=self._pq)
                    if self.pq_storage and self._pq is None:
                        self._pq = coded["codebook"]
            elif self.pq_storage and self._pq is None:
                self._pq = pq_lib.PQCodebook(
                    np.asarray(coded["centroids"]))
            if self.pq_storage:
                self._residual = bool(coded.get("residual"))
                if coded.get("rot_matrix") is not None:
                    self._rot = coded["rot_matrix"]  # trained OPQ
            self._center = coded.get("center")  # centered int8/int4
            if _STASH_CODES:
                self._pending_codes_payload = coded
            codes, scales = _permute_coded(coded, row_ext, live)
            self._corpus3 = None
            if self.pq_storage:
                # lane-paired physical segments (pq.pack_factor)
                pf = pq_lib.pack_factor(codes.shape[1])
                self._codes3 = jax.device_put(
                    codes.reshape(segs_pad, _SEG_W // pf,
                                  codes.shape[1] * pf),
                    self._spec(2))
            else:
                self._codes3 = jax.device_put(
                    codes.reshape(segs_pad, _SEG_W, codes.shape[1]),
                    self._spec(2))
            self._scales2 = (None if scales is None
                             else jax.device_put(
                                 scales.reshape(segs_pad, _SEG_W),
                                 self._spec(1)))
            # rotated centroids to match rotated codes + queries
            sums = engine.rotate_rows(
                np.ascontiguousarray(seg_sums, np.float32), self._rot)
            self._seg_cent = jax.device_put(
                (sums / np.maximum(counts_host[:, None], 1.0)
                 ).astype(np.float32), self._spec(1))
        else:
            padded = np.zeros((segs_pad * _SEG_W, self.dim), np.float32)
            padded[live] = vectors[row_ext[live]]
            corpus3 = jax.device_put(
                padded.reshape(segs_pad, _SEG_W,
                               self.dim).astype(self.dtype),
                self._spec(2))
            counts = jax.device_put(counts_host, self._spec(0))
            self._corpus3 = corpus3
            self._seg_cent = jax.lax.with_sharding_constraint(
                _segment_stats(corpus3, counts), self._spec(1))
            self._codes3 = None
            self._scales2 = None
        self._valid2 = jax.device_put(valid2, self._spec(1))
        # fully-dead alignment segments exist here (unlike the
        # single-device layout): mask them out of the coarse scoring
        self._seg_valid = jax.device_put(valid2.any(axis=1), self._spec(0))
        self._row_ext = row_ext.astype(np.int64)
        pos = np.flatnonzero(live)
        self._pos_of_ext = np.empty(n_rows, np.int64)
        self._pos_of_ext[row_ext[pos]] = pos
        self._base_n = n_rows
        self.ntotal = n_rows + (self._tail.ntotal if self._tail else 0)

    def _ensure_codes(self) -> None:
        if self._codes3 is not None:
            return
        codes3, scales2 = _quantize_segments(self._corpus3)
        self._codes3 = jax.lax.with_sharding_constraint(
            codes3, self._spec(2))
        self._scales2 = jax.lax.with_sharding_constraint(
            scales2, self._spec(1))

    def _probe(self, qj: jax.Array, P: int, kk: int
               ) -> Tuple[jax.Array, jax.Array]:
        S = self._segs()
        S_local = S // self._n_shards
        P_local = min(_bucket_probe(-(-P // self._n_shards)), S_local)
        kk_local = min(kk, P_local * _SEG_W)
        mode = ("pq_residual" if self.pq_storage and self._residual
                else "pq_storage" if self.pq_storage
                else "int4_storage" if self.int4_storage
                else "int8_storage" if self.int8_storage
                else "quant" if self.quantized else "f32")
        key = (mode, P_local, kk_local, kk)
        fn = self._probe_fns.get(key)
        if fn is None:
            fn = self._build_probe_fn(mode, P_local, kk_local, kk)
            self._probe_fns[key] = fn
        if self.pq_storage:
            return fn(self._codes3, self._pq.device(), self._seg_cent,
                      self._valid2, self._seg_valid, qj)
        if self.coded_storage:
            return fn(self._codes3, self._scales2, self._seg_cent,
                      self._valid2, self._seg_valid, qj)
        if self.quantized:
            self._ensure_codes()
            return fn(self._codes3, self._scales2, self._corpus3,
                      self._seg_cent, self._valid2, self._seg_valid, qj)
        return fn(self._corpus3, self._seg_cent, self._valid2,
                  self._seg_valid, qj)

    def _build_probe_fn(self, mode: str, P_local: int,
                        kk_local: int, kk: int):
        from jax.sharding import PartitionSpec as PS

        from clipx.parallel.mips import AXIS, _merge_across_shards

        W = _SEG_W

        def _coarse(cent_l, sv_l, q):
            cs = jnp.dot(q, cent_l.T, preferred_element_type=jnp.float32)
            cs = jnp.where(sv_l[None, :], cs, -jnp.inf)
            vals, idx = jax.lax.top_k(cs, P_local)   # (vals, idx) (Q,P_l)
            idx, vals = _maybe_sort_probe(idx, vals)
            return vals, idx

        def _gids(seg_idx, S_local):
            base = jax.lax.axis_index(AXIS) * S_local
            return ((seg_idx + base)[:, :, None] * W
                    + jnp.arange(W, dtype=jnp.int32)[None, None, :])

        def local_f32(c3, cent_l, v2, sv_l, q):
            nq = q.shape[0]
            _, seg_idx = _coarse(cent_l, sv_l, q)
            rows = c3[seg_idx]                                # (Q,P,W,D)
            exact = jnp.einsum("qd,qpwd->qpw", q, rows,
                               preferred_element_type=jnp.float32)
            exact = jnp.where(v2[seg_idx], exact, -jnp.inf)
            gids = _gids(seg_idx, c3.shape[0])
            d, sel = jax.lax.top_k(exact.reshape(nq, P_local * W),
                                   kk_local)
            gi = jnp.take_along_axis(gids.reshape(nq, P_local * W), sel,
                                     axis=1)
            return _merge_across_shards(d, gi, kk)

        def local_int8(codes3, scales2, c3, cent_l, v2, sv_l, q):
            _, seg_idx = _coarse(cent_l, sv_l, q)
            base = jax.lax.axis_index(AXIS) * codes3.shape[0]
            d, gi = _int8_probe_body(codes3, scales2, v2, q, seg_idx,
                                     lambda chosen: c3[chosen],
                                     min(kk, P_local), kk_local,
                                     seg_offset=base)
            return _merge_across_shards(d, gi, kk)

        def local_int8_pure(codes3, scales2, cent_l, v2, sv_l, q):
            # int8 STORAGE: same probed scan as local_int8, rescore
            # from dequantized candidate rows (no stored f32/bf16 rows)
            _, seg_idx = _coarse(cent_l, sv_l, q)
            base = jax.lax.axis_index(AXIS) * codes3.shape[0]
            d, gi = _int8_probe_body(codes3, scales2, v2, q, seg_idx,
                                     _dequant_rows(codes3, scales2),
                                     min(kk, P_local), kk_local,
                                     seg_offset=base)
            return _merge_across_shards(d, gi, kk)

        def local_int4_pure(packed3, scales2, cent_l, v2, sv_l, q):
            # int4 STORAGE: packed probe gather + unpack, dequantized
            # rescore (_ivf_kernel_int4_pure, per shard)
            _, seg_idx = _coarse(cent_l, sv_l, q)
            base = jax.lax.axis_index(AXIS) * packed3.shape[0]
            d, gi = _int8_probe_body(
                packed3, scales2, v2, q, seg_idx,
                _dequant_rows_int4(packed3, scales2),
                min(kk, P_local), kk_local, seg_offset=base,
                scan_raw=_scan_raw_int4(packed3))
            return _merge_across_shards(d, gi, kk)

        def local_pq(packed3, centroids, cent_l, v2, sv_l, q):
            # pq STORAGE: probed PQ scan against the replicated
            # codebooks (_ivf_kernel_pq, per shard); residual mode
            # feeds the local coarse scores back as the exact q.cent
            # term (faiss by_residual — _pq_probe_body)
            cvals, seg_idx = _coarse(cent_l, sv_l, q)
            base = jax.lax.axis_index(AXIS) * packed3.shape[0]
            d, gi = _pq_probe_body(
                packed3, centroids, v2, q, seg_idx, kk_local,
                seg_offset=base,
                seg_scores=cvals if mode == "pq_residual" else None)
            return _merge_across_shards(d, gi, kk)

        # per-arg specs (codes3/c3 3-D, scales2/cent/v2 2-D,
        # seg_valid 1-D, queries replicated)
        if mode in ("pq_storage", "pq_residual"):
            fn = local_pq
            in_specs = (PS(AXIS, None, None), PS(None, None, None),
                        PS(AXIS, None), PS(AXIS, None),
                        PS(AXIS), PS())
        elif mode in ("int8_storage", "int4_storage"):
            fn = (local_int4_pure if mode == "int4_storage"
                  else local_int8_pure)
            in_specs = (PS(AXIS, None, None), PS(AXIS, None),
                        PS(AXIS, None), PS(AXIS, None),
                        PS(AXIS), PS())
        elif mode == "quant":
            fn = local_int8
            in_specs = (PS(AXIS, None, None), PS(AXIS, None),
                        PS(AXIS, None, None), PS(AXIS, None),
                        PS(AXIS, None), PS(AXIS), PS())
        else:
            fn = local_f32
            in_specs = (PS(AXIS, None, None), PS(AXIS, None),
                        PS(AXIS, None), PS(AXIS), PS())
        smapped = jax.shard_map(fn, mesh=self.mesh, in_specs=in_specs,
                                out_specs=(PS(None, None), PS(None, None)),
                                check_vma=False)
        return jax.jit(smapped)
