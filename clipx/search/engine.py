"""Exact maximum-inner-product search on device — the faiss replacement.

The reference builds a faiss ``IndexIVFFlat`` (approximate: k-means cells,
``nprobe`` probed lists — reference:build-index.py:80-81) and serializes
it to ``images.index`` (reference:build-index.py:109). On TPU the corpus
lives in HBM as one device array and search is a single fused
matmul + top_k: *exact* inner-product search, which strictly dominates
the reference's IVF approximation in recall, at microsecond-scale cost
for CLIP-sized corpora (1M x 512 f32 = 2 GB, one pass at HBM bandwidth).

XLA static-shape discipline (SURVEY.md section 7 "hard parts"):
- corpus rows are padded to geometric buckets so a growing index doesn't
  recompile per size; padded rows are masked to -inf before top_k;
- k is rounded up to the next power of two and the result sliced, so
  REPL pagination (k + offset + 1, reference:query-index.py:111) reuses
  the compiled kernel.

``nprobe`` exists here as a no-op compatibility knob: the ``p`` REPL
command (reference:query-index.py:48-54) tunes approximation this exact
engine doesn't have. The opt-in approximate mode where the knob IS
functional (faiss-IVF semantics, cluster-pruned scan) lives in
clipx.search.ivf (``--search-mode ivf``).

Multi-chip: see clipx.parallel.mips for the corpus-sharded variant.
"""

from __future__ import annotations

import functools
import os
import struct
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_MAGIC = b"CLIPXIDX1\n"
_MIN_BUCKET = 4096
# Queries per kernel call. Bounds rescore-gather and top-k scratch; 16
# measured best at 1M on v5e (per-call cost is corpus-scan-bound and
# ~flat 0.8-1.6 ms for Q<=16, so batching scales throughput almost
# linearly; Q=32 regressed to 4.8 ms/call — round-3 ablation log).
_MAX_Q = 16
# requested k is clamped here: nobody can use billions of result rows,
# and honoring them would allocate unbounded host memory (found by REPL
# fuzzing with 'c 9999999999')
_MAX_K = 16384


def clamp_k(k: int) -> int:
    return max(1, min(int(k), _MAX_K))


def _bucket_rows(n: int) -> int:
    """Static-shape row bucket >= n: powers of two up to 1M rows, then
    512k-row steps (pure doubling would waste gigabytes of HBM at
    multi-million-vector scale — 5M vectors would pad to 8.4M rows)."""
    b = _MIN_BUCKET
    while b < n and b < (1 << 20):
        b *= 2
    if b >= n:
        return b
    step = 1 << 19
    return -(-n // step) * step


def _bucket_k(k: int) -> int:
    b = 16
    while b < k:
        b *= 2
    return b


def _bucket_q(n: int) -> int:
    """Query-row bucket: powers of two up to ``_MAX_Q``. Serve's
    coalescer emits arbitrary batch fills 1.._MAX_Q; without bucketing
    every distinct fill is a fresh XLA compile (measured 139.7 s per
    new Q shape through the remote compile service — SERVING_r03.json).
    Per-call search cost is ~flat in Q <= _MAX_Q (the scan is
    corpus-bound), so padding rows is effectively free."""
    b = 1
    while b < n:
        b *= 2
    return min(b, _MAX_Q)


def _pad_q(queries: np.ndarray) -> Tuple[np.ndarray, int]:
    """Zero-pad query rows up to the Q bucket; returns (padded, real_nq).
    Padded rows produce garbage candidates that callers slice off; zero
    rows are safe in the int8 path too (query scale has a 1e-12 floor)."""
    nq = queries.shape[0]
    b = _bucket_q(nq)
    if b == nq:
        return queries, nq
    out = np.zeros((b, queries.shape[1]), queries.dtype)
    out[:nq] = queries
    return out, nq


# Exact top-k over large score rows. Plain lax.top_k over one (Q, N)
# row is slow on TPU for large N (2.48 ms at N=1M on v5e).
#
# Round-2 approach ("chunk"): reshape into (Q*chunks, _CHUNK_W) rows,
# per-chunk top-k, merge the Q x (chunks*k) candidates — exact (every
# true top-k element is in the top-k of its own chunk), 0.9 ms of the
# 1.56 ms int8 search budget.
#
# Round-3 default ("seg"): two-level segment-max selection. Split the
# row into width-_SEG_W segments and reduce each to its max (a cheap
# VPU pass XLA fuses with the score scaling/masking). At most k
# segments can contain elements >= the k-th largest score (each such
# segment's max IS >= it, and there are only k elements >= it), so the
# top-k segments by max are an exact candidate superset: gather those
# k*_SEG_W values and take the true top-k from them. The expensive sort
# shrinks from N elements to N/_SEG_W maxima + k*_SEG_W candidates —
# ~60x less sort work at N=1M, k=64.
_CHUNK_W = 8192
_SEG_W = 64


def _exact_topk_seg(scores: jax.Array, k: int
                    ) -> Tuple[jax.Array, jax.Array]:
    q, n = scores.shape
    segs = n // _SEG_W
    s3 = scores.reshape(q, segs, _SEG_W)
    seg_max = s3.max(axis=-1)                        # (Q, S)
    kk = min(k, segs)
    _, seg_idx = jax.lax.top_k(seg_max, kk)         # (Q, kk) segment ids
    cand = jnp.take_along_axis(s3, seg_idx[:, :, None], axis=1)
    cand = cand.reshape(q, kk * _SEG_W)
    d, ci = jax.lax.top_k(cand, k)
    seg_of = jnp.take_along_axis(seg_idx, ci // _SEG_W, axis=1)
    return d, seg_of * _SEG_W + ci % _SEG_W


def _exact_topk_chunk(scores: jax.Array, k: int
                      ) -> Tuple[jax.Array, jax.Array]:
    q, n = scores.shape
    chunks = n // _CHUNK_W
    s2 = scores.reshape(q * chunks, _CHUNK_W)
    d, i = jax.lax.top_k(s2, k)
    base = (jnp.arange(q * chunks, dtype=jnp.int32) % chunks) * _CHUNK_W
    gi = (i + base[:, None]).reshape(q, chunks * k)
    d = d.reshape(q, chunks * k)
    dd, sel = jax.lax.top_k(d, k)
    return dd, jnp.take_along_axis(gi, sel, axis=1)


def _exact_topk(scores: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    import os

    q, n = scores.shape
    if n < 2 * _CHUNK_W or n % _CHUNK_W != 0 or k > _CHUNK_W:
        return jax.lax.top_k(scores, k)
    if os.environ.get("CLIPX_TOPK", "seg") == "chunk":  # A/B knob
        return _exact_topk_chunk(scores, k)
    return _exact_topk_seg(scores, k)


@functools.partial(jax.jit, static_argnames=("k",), donate_argnums=())
def _search_kernel(corpus: jax.Array, valid: jax.Array, queries: jax.Array,
                   k: int) -> Tuple[jax.Array, jax.Array]:
    """corpus: (N_pad, D); queries: (Q, D); returns top-k (scores, ids)."""
    scores = jnp.dot(queries, corpus.T, preferred_element_type=jnp.float32)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(row_ids < valid, scores, -jnp.inf)
    return _exact_topk(scores, k)


# -- int8 scan + exact rescore ------------------------------------------------
#
# The 1M-corpus scan is HBM-bandwidth-bound (2 GB f32 per query at ~800
# GB/s on v5e). Quantizing the scanned copy to symmetric per-row int8
# cuts the read 4x; approximate int32-accumulated scores select
# candidates whose *exact* f32 rows are then gathered and rescored, so
# the returned ranking is computed in full precision.
#
# Default candidate selection is segment-granular
# (_search_kernel_int8_seg): the top-k segments by approximate maximum
# are rescored whole, a k*_SEG_W-row margin (4096 rows at k=64). A true
# top-k entry is missed only if its segment's approx max falls below
# the k-th segment max — with per-score error ~0.2% of ||q||,
# effectively never for distinct images (validated against the exact
# oracle in tests and at 1M in bench). The one scoped exception: a
# cluster of more than k*_SEG_W near-duplicates whose exact scores
# differ by less than the quantization noise (~1e-3 cosine; burst shots
# of the same scene) can swap members inside the cluster — returned
# scores stay within that noise of the true top-k (pinned in
# test_quality_gate), which is also the regime where ranking carries no
# semantic information. The round-2 per-element path (margin
# k*RESCORE_MARGIN candidates) is kept under CLIPX_INT8_SCAN=element.

RESCORE_MARGIN = 4


@jax.jit
def _quantize_device(corpus: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """On-device symmetric per-row int8 quantization of the scan copy.

    The f32 upcast keeps code rounding exact when the stored corpus is
    bf16 (its 8-bit significand would perturb ``corpus / scales`` by up
    to ~0.4% before rint); XLA fuses the convert into the elementwise
    chain, so no f32 copy of the corpus is ever materialized."""
    c = corpus.astype(jnp.float32)
    scales = jnp.maximum(jnp.abs(c).max(axis=1, keepdims=True),
                         1e-12) / 127.0
    codes = jnp.clip(jnp.rint(c / scales), -127, 127).astype(jnp.int8)
    return codes, scales[:, 0]


def quantize_rows(vectors: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-row int8 quantization: returns (int8 codes, scales)."""
    scales = np.abs(vectors).max(axis=1, keepdims=True) / 127.0
    scales = np.maximum(scales, 1e-12).astype(np.float32)
    codes = np.clip(np.rint(vectors / scales), -127, 127).astype(np.int8)
    return codes, scales[:, 0]


# -- coded-storage rotation (CLIPX_CORPUS_ROTATE) ------------------------------
#
# CLIP embeddings are ANISOTROPIC (a few directions carry most of the
# energy), and the per-row symmetric quantizers key their step size to
# max|x|: a dominant coordinate coarsens every other dimension's
# rounding. Multiplying rows and queries by one fixed orthogonal matrix
# leaves every inner product bit-unchanged in exact arithmetic (the
# scores users see are invariant) but spreads row energy evenly, which
# shrinks max|x| toward the ~sqrt(2 ln D / D) isotropic value and so
# shrinks the quantization step — the OPQ/random-rotation trick from
# the PQ literature applied to scalar quantizers. Measured on a
# power-law-spectrum corpus (alpha=0.75, the CLIP-like regime):
# int4 recall@50 0.631 -> 0.901, int8 0.969 -> 0.993; on an isotropic
# corpus it is a wash (0.859 vs 0.857). Applies to CODED storage only
# (int8/int4 --corpus-dtype): quant-mode rescoring reads exact f32
# rows, so it has nothing to gain.
#
# The matrix is derived from a FIXED seed, so every process computes
# the same rotation — nothing persists (the sidecar stays plain f32,
# and codes are rebuilt from it per process). Disable with
# CLIPX_CORPUS_ROTATE=off (must match between build and query only for
# processes sharing a device index in memory; the on-disk contract is
# unaffected).

_ROT_SEED = 0xC11B


@functools.lru_cache(maxsize=8)
def _rotation_matrix(dim: int) -> np.ndarray:
    rng = np.random.default_rng(_ROT_SEED + dim)
    q, r = np.linalg.qr(rng.standard_normal((dim, dim)))
    # sign-fix the QR so the matrix is unique (deterministic across
    # LAPACK builds up to f64 rounding)
    q *= np.sign(np.diagonal(r))
    return np.ascontiguousarray(q, dtype=np.float32)


def rotation_enabled() -> bool:
    """Whether coded storage rotates rows ($CLIPX_CORPUS_ROTATE)."""
    return os.environ.get("CLIPX_CORPUS_ROTATE", "on").lower() != "off"


def corpus_rotation(dim: int) -> Optional[np.ndarray]:
    """The (dim, dim) f32 orthogonal rotation for coded storage, or
    None when CLIPX_CORPUS_ROTATE=off."""
    if not rotation_enabled():
        return None
    return _rotation_matrix(dim)


def coded_center_enabled() -> bool:
    """$CLIPX_CODED_CENTER: 'on' (default) quantizes int8/int4 STORAGE
    rows as residuals from the corpus mean (scored as q·mean +
    q·residual, with the mean term exact f32). Real encoder embeddings
    live in a tight cone — random-weight ViT corpora measured mean
    pairwise cosine ~0.97+ (QUALITY_r04) — and a per-row scale keyed to
    max|x| of the RAW row wastes almost all of its 15 (int4) or 254
    (int8) steps re-encoding the shared mean component: recall@50 on a
    cone-0.1 corpus measured 0.145 uncentered vs 0.637 centered (int4)
    and 0.865 vs ~0.99 (int8). On mean-zero corpora the residual IS the
    row and nothing changes. The mean is one f32[dim] vector: storage-
    and kernel-neutral (ranking is invariant to the per-query constant;
    it is added back host-side so returned scores stay faithful).
    'off' restores the round-4 uncentered codes (bit-compat A/B)."""
    return os.environ.get("CLIPX_CODED_CENTER", "on").lower() != "off"


def corpus_center(vectors: np.ndarray, rot: Optional[np.ndarray],
                  chunk: int = 1 << 18) -> np.ndarray:
    """THE canonical rotated-space corpus mean for centered coded
    storage: f64 accumulation over fixed ``chunk`` boundaries from
    offset 0, so every caller — the codes-file writer, a flat index's
    first add, the IVF install — derives bit-identical centers (and
    therefore bit-identical codes) from the same rows."""
    n, dim = vectors.shape
    acc = np.zeros(dim, np.float64)
    for i in range(0, n, chunk):
        acc += np.asarray(vectors[i: i + chunk], np.float32
                          ).sum(axis=0, dtype=np.float64)
    mean = (acc / max(n, 1)).astype(np.float32)
    if rot is not None:
        mean = np.ascontiguousarray(mean @ rot)
    return mean


def rotate_rows(v: np.ndarray, rot: Optional[np.ndarray],
                chunk: int = 1 << 18) -> np.ndarray:
    """v @ rot, chunked so the matmul transient stays bounded; returns
    v unchanged when rot is None. Unrotate by passing rot.T."""
    if rot is None:
        return v
    out = np.empty((v.shape[0], rot.shape[1]), np.float32)
    for i in range(0, v.shape[0], chunk):
        np.matmul(v[i: i + chunk], rot, out=out[i: i + chunk])
    return out


def quantize_rows_rotated(vectors: np.ndarray, rot: Optional[np.ndarray],
                          int4: bool, chunk: int = 1 << 18,
                          center: Optional[np.ndarray] = None
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """Rotate-then-quantize in row chunks: peak extra host RAM is one
    chunk of f32 rows, not a second full corpus copy (the coded tiers
    exist because the corpus is huge). ``center`` (rotated-space mean,
    see corpus_center) is subtracted after rotation — residual codes,
    whose finer per-row scale is the centered-storage recall win."""
    quantizer = quantize_rows_int4 if int4 else quantize_rows
    if rot is None and center is None:
        return quantizer(vectors)
    n = vectors.shape[0]
    code_dim = vectors.shape[1] // 2 if int4 else vectors.shape[1]
    codes = np.empty((n, code_dim), np.int8)
    scales = np.empty((n,), np.float32)
    for i in range(0, n, chunk):
        r = (np.matmul(vectors[i: i + chunk], rot) if rot is not None
             else np.asarray(vectors[i: i + chunk], np.float32))
        if center is not None:
            r = r - center
        c, s = quantizer(r)
        codes[i: i + len(c)] = c
        scales[i: i + len(s)] = s
    return codes, scales


@functools.partial(jax.jit, static_argnames=("k",))
def _search_kernel_int8(codes: jax.Array, scales: jax.Array,
                        corpus_f32: jax.Array, valid: jax.Array,
                        queries: jax.Array, k: int
                        ) -> Tuple[jax.Array, jax.Array]:
    """codes: (N_pad, D) int8; scales: (N_pad,) f32; corpus_f32 the exact
    rows for rescoring; queries: (Q, D) f32."""
    q_scale = jnp.maximum(jnp.abs(queries).max(axis=1, keepdims=True),
                          1e-12) / 127.0
    q_codes = jnp.clip(jnp.rint(queries / q_scale), -127, 127
                       ).astype(jnp.int8)
    raw = jax.lax.dot_general(
        q_codes, codes, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)           # (Q, N) int32 exact
    approx = raw.astype(jnp.float32) * (q_scale * scales[None, :])
    row_ids = jax.lax.broadcasted_iota(jnp.int32, approx.shape, 1)
    approx = jnp.where(row_ids < valid, approx, -jnp.inf)

    m = min(k * RESCORE_MARGIN, approx.shape[1])
    _, cand = _exact_topk(approx, m)                # (Q, m) candidate ids
    rows = corpus_f32[cand]                         # (Q, m, D) gather
    exact = jnp.einsum("qd,qmd->qm", queries, rows,
                       preferred_element_type=jnp.float32)
    exact = jnp.where(jnp.isfinite(jnp.take_along_axis(approx, cand, 1)),
                      exact, -jnp.inf)
    d, sel = jax.lax.top_k(exact, k)
    return d, jnp.take_along_axis(cand, sel, axis=1)


def _int8_segscan(codes: jax.Array, scales: jax.Array, valid: jax.Array,
                  queries: jax.Array, k: int, rows_of, base=0
                  ) -> Tuple[jax.Array, jax.Array]:
    """Shared core of every int8 segment-scan kernel: transposed int8
    matvec -> per-segment max -> top-k segments -> f32 rescore of ALL
    their rows (the k*_SEG_W-row candidate margin discussed above).

    Structure (all measured, see docs/ARCHITECTURE.md round-3 notes):
    - the matvec runs TRANSPOSED — (N, D) codes x (D, Q) -> (N, Q) — so
      the per-segment max is a sublane-direction reduction XLA fuses
      cleanly with the dequant scale and row mask;
    - only (N/_SEG_W, Q) segment maxima survive the scan; per-element
      approximate scores are never ranked;
    - query-side quantization scale is a positive per-query scalar and
      cannot change that query's segment ranking, so it is dropped.

    ``rows_of(seg_idx)`` supplies the (Q, s, W, D) rescore rows — the
    one place the storage tiers differ: exact f32/bf16 rows
    (_search_kernel_int8_seg) or dequantized codes
    (_search_kernel_int8_pure). ``base`` offsets row ids for sharded
    callers (clipx/parallel/mips.py), whose validity mask is global.

    A Pallas kernel fusing scan+segment-max was built and measured
    SLOWER (2.35 ms at 1M; Mosaic's int8 matvec loses to XLA's, and
    per-program overheads dominate at 1280 grid steps) — rejected, see
    docs/ARCHITECTURE.md."""
    q_scale = jnp.maximum(jnp.abs(queries).max(axis=1, keepdims=True),
                          1e-12) / 127.0
    q_codes = jnp.clip(jnp.rint(queries / q_scale), -127, 127
                       ).astype(jnp.int8)
    raw = jax.lax.dot_general(codes, q_codes, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)   # (N, Q)
    approx = raw.astype(jnp.float32) * scales[:, None]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, approx.shape, 0) + base
    approx = jnp.where(row_ids < valid, approx, -jnp.inf)
    nq = queries.shape[0]
    segmax = approx.reshape(-1, _SEG_W, nq).max(axis=1)      # (segs, Q)
    segs = segmax.shape[0]
    s = min(k, segs)
    _, seg_idx = jax.lax.top_k(segmax.T, s)                  # (Q, s)
    exact = jnp.einsum("qd,qswd->qsw", queries, rows_of(seg_idx),
                       preferred_element_type=jnp.float32)
    gids = (base + seg_idx[:, :, None] * _SEG_W
            + jnp.arange(_SEG_W, dtype=jnp.int32)[None, None, :])
    exact = jnp.where(gids < valid, exact, -jnp.inf)
    d, sel = jax.lax.top_k(exact.reshape(nq, s * _SEG_W), k)
    return d, jnp.take_along_axis(gids.reshape(nq, s * _SEG_W), sel,
                                  axis=1)


def _dequant_rows_of(codes: jax.Array, scales: jax.Array):
    """rows_of for the int8-STORAGE tiers: dequantize the candidate
    rows (codes * per-row scale) in f32 — the query-side quantization
    error of the scan cancels in this rescore, so scores carry only
    the corpus rounding error (per-element step max|x|/127 -> score
    RMS ~5e-4 for unit-norm CLIP embeddings; gated in
    test_quality_gate)."""
    segs = codes.shape[0] // _SEG_W
    codes3 = codes.reshape(segs, _SEG_W, -1)
    scales2 = scales.reshape(segs, _SEG_W)

    def rows_of(seg_idx):
        return (codes3[seg_idx].astype(jnp.float32)
                * scales2[seg_idx][..., None])

    return rows_of


@functools.partial(jax.jit, static_argnames=("k",))
def _search_kernel_int8_seg(codes: jax.Array, scales: jax.Array,
                            corpus_f32: jax.Array, valid: jax.Array,
                            queries: jax.Array, k: int
                            ) -> Tuple[jax.Array, jax.Array]:
    """int8 scan with segment-granular candidate selection + exact
    whole-segment full-precision rescore — the round-3 default
    (1.56 -> 1.15 ms p50 at 1M x 512 on v5e). See _int8_segscan."""
    corpus3 = corpus_f32.reshape(codes.shape[0] // _SEG_W, _SEG_W, -1)
    return _int8_segscan(codes, scales, valid, queries, k,
                         lambda seg_idx: corpus3[seg_idx])


@functools.partial(jax.jit, static_argnames=("k",))
def _search_kernel_int8_pure(codes: jax.Array, scales: jax.Array,
                             valid: jax.Array, queries: jax.Array, k: int
                             ) -> Tuple[jax.Array, jax.Array]:
    """int8-ONLY storage (--corpus-dtype int8): the scan codes ARE the
    corpus — 1 B/dim, ~5x the f32 capacity per chip. _int8_segscan with
    the dequantized rescore (_dequant_rows_of)."""
    return _int8_segscan(codes, scales, valid, queries, k,
                         _dequant_rows_of(codes, scales))


def _int8_impl() -> str:
    """CLIPX_INT8_SCAN: 'seg' (segment-granular, default) or 'element'
    (round-2 per-element margin path, kept for A/B)."""
    import os

    v = os.environ.get("CLIPX_INT8_SCAN", "seg")
    return v if v in ("seg", "element") else "seg"


# -- int4 STORAGE (--corpus-dtype int4) ---------------------------------------
#
# The faiss-SQ4 analog of the int8 tier: symmetric per-row 4-bit codes
# packed two per byte ARE the corpus — 0.5 B/dim, ~2x the int8-storage
# capacity (~10x f32; the capacity ladder the reference delegates to
# faiss's scalar quantizers). Codes pack in SPLIT layout (byte j =
# dims j and j+D/2, ``pack_int4``), so the scan is TWO matmuls on the
# shifted nibble views of each row chunk — never materializing an
# interleaved (N, D) int8 unpack (measured 12x slower at 1M x 512).
# Chunking under ``lax.map`` bounds the shifted-view transients; each
# chunk reduces to per-segment maxima, and the top segments rescore
# from dequantized candidates in f32. As in
# the int8-pure path the query-side quantization error cancels in that
# rescore, leaving corpus rounding only; at 4 bits the rounding step is
# max|x|/7 — ~18x coarser than int8, score RMS ~1e-2 on unit-norm CLIP
# rows vs int8's ~5e-4. That is the faiss SQ4-vs-SQ8 recall trade, made
# explicit per tier in tools/eval_quality.py and test_quality_gate.
# Candidate selection compensates with a 2x segment margin
# (_INT4_SEG_MARGIN) over the int8 path's k segments.

_INT4_CHUNK = 1 << 19   # scan rows per lax.map step: 256 MB unpacked
                        # int8 transient at D=512. Every _bucket_rows
                        # capacity is either <= one chunk (pow-2 below
                        # 2^19) or a multiple of it (pow-2 above, and
                        # the 512k-row steps past 1M rows).
_INT4_SEG_MARGIN = 2


def _is_int4(dtype) -> bool:
    try:
        return jnp.dtype(dtype) == jnp.dtype(jnp.int4)
    except TypeError:
        return False


def pack_int4(codes: np.ndarray) -> np.ndarray:
    """(N, D) int8 codes in [-8, 7] -> (N, D/2) packed int8 in SPLIT
    layout: byte j holds dim j in the low nibble and dim j + D/2 in the
    high one. Split (not interleaved) so the device scan never has to
    interleave nibbles back: the two shifted views of the packed bytes
    each cover a contiguous half of the dims and feed the two-matmul
    scan in ``_int4_segscan`` directly — the interleaved layout's
    stack+reshape relayout measured 12x slower at 1M x 512 (11.4 ms vs
    0.92 ms scan, round-3 variant experiment)."""
    lo = codes[:, : codes.shape[1] // 2].astype(np.uint8) & 0x0F
    hi = (codes[:, codes.shape[1] // 2:].astype(np.uint8) & 0x0F) << 4
    return (lo | hi).view(np.int8)


def unpack_int4_host(packed: np.ndarray) -> np.ndarray:
    """numpy twin of ``_unpack_int4`` (reconstruct()/vectors())."""
    u = packed.view(np.uint8)
    lo = (u & 0x0F).astype(np.int16)
    hi = (u >> 4).astype(np.int16)
    lo = np.where(lo > 7, lo - 16, lo)
    hi = np.where(hi > 7, hi - 16, hi)
    return np.concatenate([lo, hi], axis=-1).astype(np.int8)


# Per-row scale candidates for the 4-bit quantizer, as fractions of
# max|x|/7. At 16 levels the MSE-optimal uniform quantizer CLIPS
# outliers rather than covering them (max/7 wastes half the codebook on
# the tail of a ~gaussian coordinate distribution): the cheap 4-point
# search below measured recall@50 0.843 -> 0.874 on the adversarial
# random 512-d corpus (oracle = pipeline — candidate selection loses
# nothing; corpus rounding is the whole error). An 8-point search
# added only +0.003.
_INT4_SCALE_ALPHAS = (1.0, 0.9, 0.8, 0.7)


def quantize_rows_int4(vectors: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-row 4-bit quantization, packed two codes per byte.
    Host-side like ``quantize_rows`` — the H2D upload is 0.5 B/dim.
    The per-row scale is picked by a small MSE search over clipped
    candidates (``_INT4_SCALE_ALPHAS``)."""
    if vectors.shape[1] % 2:
        raise ValueError("int4 storage needs an even dim, "
                         f"got {vectors.shape[1]}")
    v = np.ascontiguousarray(vectors, dtype=np.float32)
    base = np.maximum(np.abs(v).max(axis=1), 1e-12) / 7.0
    best_codes, best_scales, best_err = None, None, None
    for a in _INT4_SCALE_ALPHAS:
        scales = (base * a).astype(np.float32)
        codes = np.clip(np.rint(v / scales[:, None]), -7, 7
                        ).astype(np.int8)
        err = ((codes * scales[:, None] - v) ** 2).sum(axis=1)
        if best_err is None:
            best_codes, best_scales, best_err = codes, scales, err
        else:
            better = err < best_err
            best_codes[better] = codes[better]
            best_scales[better] = scales[better]
            best_err[better] = err[better]
    return pack_int4(best_codes), best_scales


def _nibbles(packed: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(..., D/2) packed int8 -> two (..., D/2) int8 views: dims
    [0, D/2) and [D/2, D) of the SPLIT layout (see ``pack_int4``).
    Sign comes free from arithmetic shifts: left-shift-4 then
    arithmetic right-shift-4 sign-extends the low nibble; the high
    nibble needs only the right shift."""
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)
    hi = jnp.right_shift(packed, 4)
    return lo, hi


def _unpack_int4(packed: jax.Array) -> jax.Array:
    """(..., D/2) packed int8 -> (..., D) int8 in [-8, 7]. A plain
    concat under the SPLIT layout — no nibble interleave. Hot scans
    should prefer two matmuls on the ``_nibbles`` views over
    materializing this."""
    lo, hi = _nibbles(packed)
    return jnp.concatenate([lo, hi], axis=-1)


def _int4_segscan(packed: jax.Array, scales: jax.Array, valid: jax.Array,
                  queries: jax.Array, k: int, base=0
                  ) -> Tuple[jax.Array, jax.Array]:
    """int4-STORAGE segment scan: _int8_segscan's structure with the
    unpack chunked under ``lax.map`` (bounds the int8 transient to
    ``_INT4_CHUNK`` rows) and a dequantized-candidate rescore. ``base``
    offsets row ids for sharded callers (clipx/parallel/mips.py)."""
    q_scale = jnp.maximum(jnp.abs(queries).max(axis=1, keepdims=True),
                          1e-12) / 127.0
    q_codes = jnp.clip(jnp.rint(queries / q_scale), -127, 127
                       ).astype(jnp.int8)
    n, nq = packed.shape[0], queries.shape[0]
    chunk = min(n, _INT4_CHUNK)
    if n % chunk:
        raise ValueError(f"int4 capacity {n} not a chunk multiple "
                         f"({chunk}) — placement must pad to "
                         "_bucket_rows")

    half = packed.shape[1]

    def seg_chunk(start):
        # two matmuls on the shifted nibble views — under the SPLIT
        # pack layout each covers a contiguous half of the dims, so
        # the scan never materializes an unpacked (chunk, D) array
        # (the interleaved unpack's stack+reshape measured 12x slower)
        p = jax.lax.dynamic_slice_in_dim(packed, start, chunk)
        s = jax.lax.dynamic_slice_in_dim(scales, start, chunk)
        lo, hi = _nibbles(p)
        raw = (jax.lax.dot_general(lo, q_codes[:, :half],
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.int32)
               + jax.lax.dot_general(hi, q_codes[:, half:],
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.int32))
        approx = raw.astype(jnp.float32) * s[:, None]       # (chunk, Q)
        rid = (jax.lax.broadcasted_iota(jnp.int32, approx.shape, 0)
               + base + start)
        approx = jnp.where(rid < valid, approx, -jnp.inf)
        return approx.reshape(-1, _SEG_W, nq).max(axis=1)

    if n == chunk:
        segmax = seg_chunk(jnp.int32(0))
    else:
        starts = jnp.arange(0, n, chunk, dtype=jnp.int32)
        segmax = jax.lax.map(seg_chunk, starts).reshape(-1, nq)
    segs = segmax.shape[0]
    s_cnt = min(_INT4_SEG_MARGIN * k, segs)
    _, seg_idx = jax.lax.top_k(segmax.T, s_cnt)             # (Q, s)
    packed3 = packed.reshape(segs, _SEG_W, -1)
    scales2 = scales.reshape(segs, _SEG_W)
    rows = (_unpack_int4(packed3[seg_idx]).astype(jnp.float32)
            * scales2[seg_idx][..., None])
    exact = jnp.einsum("qd,qswd->qsw", queries, rows,
                       preferred_element_type=jnp.float32)
    gids = (base + seg_idx[:, :, None] * _SEG_W
            + jnp.arange(_SEG_W, dtype=jnp.int32)[None, None, :])
    exact = jnp.where(gids < valid, exact, -jnp.inf)
    d, sel = jax.lax.top_k(exact.reshape(nq, s_cnt * _SEG_W), k)
    return d, jnp.take_along_axis(gids.reshape(nq, s_cnt * _SEG_W), sel,
                                  axis=1)


@functools.partial(jax.jit, static_argnames=("k",))
def _search_kernel_int4_pure(packed: jax.Array, scales: jax.Array,
                             valid: jax.Array, queries: jax.Array, k: int
                             ) -> Tuple[jax.Array, jax.Array]:
    """int4-ONLY storage (--corpus-dtype int4): the packed codes ARE
    the corpus — 0.5 B/dim, ~10x the f32 capacity per chip."""
    return _int4_segscan(packed, scales, valid, queries, k)


def _padded_append(index, vectors: np.ndarray) -> None:
    """Shared in-place append for VectorIndex and ShardedVectorIndex
    (clipx/parallel/mips.py): pad the update to a power-of-two row
    bucket so repeated small deltas reuse one compiled shape, grow
    capacity when it cannot cover the PADDED update — critical:
    ``dynamic_update_slice`` clamps out-of-range starts, which would
    silently shift the write onto valid rows — then run the jitted
    buffer-DONATING slice update (in place, no transient second corpus
    copy). ``index`` provides dim/dtype/ntotal/_corpus, ``_grow(need)``
    and ``_update_fn(pad_len)`` (where the two classes differ: the
    sharded one pins out_shardings)."""
    n_new = vectors.shape[0]
    pad_len = 128
    while pad_len < n_new:
        pad_len *= 2
    if index.ntotal + pad_len > index._corpus.shape[0]:
        index._grow(index.ntotal + pad_len)
    upd = np.zeros((pad_len, index.dim), np.float32)
    upd[:n_new] = vectors
    index._corpus = index._update_fn(pad_len)(
        index._corpus, jnp.asarray(upd, index.dtype),
        jnp.int32(index.ntotal))
    index.ntotal += n_new


def _int8_append(index, vectors: np.ndarray) -> None:
    """Shared add() for the coded-STORAGE indexes (int8 and packed int4;
    VectorIndex and clipx/parallel/mips.ShardedVectorIndex): quantize on
    the HOST so the upload is 1 (int8) or 0.5 (int4) B/dim — the H2D
    path is the expensive part here — place padded code/scale arrays on
    first add, and append in place with a donating two-array
    ``dynamic_update_slice`` afterwards. ``index`` provides
    ``_place_int8(codes, scales)``, ``_grow(need)``,
    ``_update_int8_fn(pad_len)`` (where the sharded class pins
    out_shardings) and ``_code_dim`` (dim for int8, dim/2 packed for
    int4). Padded scale slots hold the quantizer's epsilon so a
    dequantized padding row is exactly zero. Rows are rotated before
    quantization when the index carries a corpus rotation (see
    ``corpus_rotation`` — recall, not contract). The FIRST add of a
    centered index (see coded_center_enabled) derives the canonical
    corpus mean from its rows; later appends (serve's incremental
    reload) encode against that same center — the center is part of
    the index identity, like the rotation."""
    if (index._codes is None and getattr(index, "_center", None) is None
            and coded_center_enabled()):
        index._center = corpus_center(vectors,
                                      getattr(index, "_rot", None))
    codes, scales = quantize_rows_rotated(
        vectors, getattr(index, "_rot", None),
        getattr(index, "int4_storage", False),
        center=getattr(index, "_center", None))
    n_new = vectors.shape[0]
    if index._codes is None:
        index._place_int8(codes, scales)
        index.ntotal = n_new
        return
    pad_len = 128
    while pad_len < n_new:
        pad_len *= 2
    if index.ntotal + pad_len > index._codes.shape[0]:
        index._grow(index.ntotal + pad_len)
    uc = np.zeros((pad_len, index._code_dim), np.int8)
    uc[:n_new] = codes
    us = np.full((pad_len,), 1e-12, np.float32)
    us[:n_new] = scales
    index._codes, index._scales = index._update_int8_fn(pad_len)(
        index._codes, index._scales, jnp.asarray(uc), jnp.asarray(us),
        jnp.int32(index.ntotal))
    index.ntotal += n_new


class VectorIndex:
    """Flat inner-product index over device-resident vectors.

    Row i corresponds to external id i — the sorted-path rank assigned by
    the index builder (reference:build-index.py:87-88).
    """

    def __init__(self, dim: int, dtype=jnp.float32, quantized: bool = False):
        from clipx.search import pq as pq_lib

        self.dim = dim
        self.dtype = dtype
        # coded STORAGE (--corpus-dtype int8/int4/pq): the codes are the
        # corpus (1 / 0.5 / 0.25-0.125 B/dim, no full-precision rows on
        # device); the scan is always quantized and the rescore
        # dequantizes candidates in f32
        self.pq_storage = pq_lib.is_pq(dtype)
        self.int4_storage = not self.pq_storage and _is_int4(dtype)
        self.int8_storage = (not (self.pq_storage or self.int4_storage)
                             and jnp.dtype(dtype) == jnp.int8)
        if self.int4_storage and dim % 2:
            raise ValueError(f"int4 storage needs an even dim, got {dim}")
        if self.pq_storage:
            self._code_dim = pq_lib.subspaces(dim) // 2  # packed bytes
        else:
            self._code_dim = dim // 2 if self.int4_storage else dim
        self.quantized = True if self.coded_storage else quantized
        self.ntotal = 0
        self.nprobe = 32  # compatibility no-op (reference:query-index.py:30)
        self._corpus: Optional[jax.Array] = None  # (N_pad, dim) on device
        self._codes: Optional[jax.Array] = None   # int8/int4/pq codes
        self._scales: Optional[jax.Array] = None
        self._pq = None  # PQCodebook, trained on the first add
        # coded storage quantizes ROTATED rows (recall on anisotropic
        # embeddings — see corpus_rotation); queries rotate to match,
        # reconstruction unrotates, so the user-facing contract is
        # unchanged
        self._rot = corpus_rotation(dim) if self.coded_storage else None
        # int8/int4 storage additionally encodes residuals from the
        # rotated-space corpus mean (coded_center_enabled): set on the
        # first add / codes-file load; scores add q·center back
        self._center: Optional[np.ndarray] = None
        self._update_fns = {}

    @property
    def coded_storage(self) -> bool:
        """True when the quantized codes ARE the corpus (int8/int4/pq)."""
        return self.int8_storage or self.int4_storage or self.pq_storage

    # -- construction -------------------------------------------------------
    @classmethod
    def from_vectors(cls, vectors: np.ndarray, dtype=jnp.float32,
                     quantized: bool = False) -> "VectorIndex":
        vectors = np.ascontiguousarray(vectors, dtype=np.float32)
        idx = cls(dim=vectors.shape[1], dtype=dtype, quantized=quantized)
        idx.add(vectors)
        return idx

    @classmethod
    def from_codes(cls, payload: dict) -> "VectorIndex":
        """Construct a coded-storage index directly from a loaded
        ``<index>.codes`` payload (clipx.search.codes_io) — no f32
        rows are read, quantized, or trained: the faiss ``read_index``
        property (reference:query-index.py:29) for the capacity tiers.
        The payload's codes are canonical (codes_io.encode_corpus), so
        searches are bit-identical to an index rebuilt from f32."""
        from clipx.search.pq import PQCodebook

        tier = payload["tier"]
        dtype = {"int8": jnp.int8, "int4": jnp.int4, "pq": "pq"}[tier]
        idx = cls(dim=payload["dim"], dtype=dtype)
        # the file's subspace width wins over $CLIPX_PQ_DSUB — an
        # existing index keeps the width its codebooks were trained
        # with (clipx/search/pq.py)
        idx._code_dim = payload["code_dim"]
        if payload.get("rot_matrix") is not None:
            idx._rot = payload["rot_matrix"]  # trained OPQ rotation
        idx._center = payload.get("center")  # centered int8/int4 codes
        if payload["ntotal"] == 0:
            return idx
        if tier == "pq":
            idx._pq = PQCodebook(payload["centroids"])
            idx._place_pq(np.asarray(payload["codes"]))
        else:
            idx._place_int8(np.asarray(payload["codes"]),
                            np.asarray(payload["scales"]))
        idx.ntotal = payload["ntotal"]
        return idx

    def add(self, vectors: np.ndarray) -> None:
        """Append rows. Ids continue from the current ntotal.

        In-capacity appends run as a jitted, buffer-DONATING
        ``dynamic_update_slice`` (in place — no transient second corpus
        copy, which would OOM a >half-HBM corpus during serve's
        incremental reload); growth re-pads to the next row bucket
        entirely on device (no host round-trip of the existing rows).
        Donation invalidates the previous corpus array object — callers
        sharing the index across threads must not dispatch concurrently
        with add (clipx.serve holds its reader/writer guard for this).
        """
        vectors = np.ascontiguousarray(vectors, dtype=np.float32)
        if vectors.ndim != 2 or vectors.shape[1] != self.dim:
            raise ValueError(f"expected (n, {self.dim}) vectors, "
                             f"got {vectors.shape}")
        n_new = vectors.shape[0]
        if n_new == 0:
            return
        if self.pq_storage:
            from clipx.search.pq import _pq_append

            _pq_append(self, vectors)
            return
        if self.coded_storage:
            _int8_append(self, vectors)
            return
        if self._corpus is None:
            bucket = _bucket_rows(n_new)
            padded = np.zeros((bucket, self.dim), np.float32)
            padded[:n_new] = vectors
            self._corpus = jax.device_put(padded.astype(self.dtype))
            self.ntotal = n_new
            self._codes = None
            return
        _padded_append(self, vectors)
        self._codes = None  # int8 scan copy rebuilt lazily on next search

    def _update_fn(self, pad_len: int):
        if pad_len not in self._update_fns:
            self._update_fns[pad_len] = jax.jit(
                lambda c, rows, start: jax.lax.dynamic_update_slice(
                    c, rows, (start, 0)),
                donate_argnums=(0,))
        return self._update_fns[pad_len]

    def _place_int8(self, codes: np.ndarray, scales: np.ndarray) -> None:
        bucket = _bucket_rows(codes.shape[0])
        pc = np.zeros((bucket, self._code_dim), np.int8)
        pc[: codes.shape[0]] = codes
        ps = np.full((bucket,), 1e-12, np.float32)
        ps[: scales.shape[0]] = scales
        self._codes = jax.device_put(pc)
        self._scales = jax.device_put(ps)

    def _update_int8_fn(self, pad_len: int):
        key = ("int8", pad_len)
        if key not in self._update_fns:
            self._update_fns[key] = jax.jit(
                lambda c, s, uc, us, start: (
                    jax.lax.dynamic_update_slice(c, uc, (start, 0)),
                    jax.lax.dynamic_update_slice(s, us, (start,))),
                donate_argnums=(0, 1))
        return self._update_fns[key]

    def _place_pq(self, codes: np.ndarray) -> None:
        from clipx.search.pq import pair_rows_host

        bucket = _bucket_rows(codes.shape[0])
        pc = np.zeros((bucket, self._code_dim), np.int8)
        pc[: codes.shape[0]] = codes
        # lane-paired physical layout (pq.pack_factor): narrow int8
        # arrays otherwise pad to 128 lanes/row in HBM
        self._codes = jax.device_put(pair_rows_host(pc))

    def _update_pq_fn(self, pad_len: int):
        key = ("pq", pad_len)
        if key not in self._update_fns:
            self._update_fns[key] = jax.jit(
                lambda c, uc, start: jax.lax.dynamic_update_slice(
                    c, uc, (start, 0)),
                donate_argnums=(0,))
        return self._update_fns[key]

    def _grow(self, need: int) -> None:
        dim, dtype = self.dim, self.dtype
        new_cap = _bucket_rows(need)

        if self.pq_storage:
            from clipx.search.pq import pack_factor

            pf = pack_factor(self._code_dim)
            cdim_phys = self._code_dim * pf

            @jax.jit
            def regrowp(c):
                nc = jnp.zeros((new_cap // pf, cdim_phys), jnp.int8)
                return jax.lax.dynamic_update_slice(nc, c, (0, 0))

            self._codes = regrowp(self._codes)
            self._update_fns = {}
            return

        if self.coded_storage:
            cdim = self._code_dim

            @jax.jit
            def regrow8(c, s):
                nc = jnp.zeros((new_cap, cdim), jnp.int8)
                ns = jnp.full((new_cap,), 1e-12, jnp.float32)
                return (jax.lax.dynamic_update_slice(nc, c, (0, 0)),
                        jax.lax.dynamic_update_slice(ns, s, (0,)))

            self._codes, self._scales = regrow8(self._codes, self._scales)
            self._update_fns = {}
            return

        @jax.jit
        def regrow(old):
            # no donation: old (smaller) can't alias new; it frees by
            # refcount right after the call
            new = jnp.zeros((new_cap, dim), dtype)
            return jax.lax.dynamic_update_slice(new, old, (0, 0))

        self._corpus = regrow(self._corpus)
        self._update_fns = {}
        self._codes = None
        self._scales = None

    def shape_key(self, k: int, nprobe=None) -> tuple:
        """Compiled-shape family of a k-row search (serve's post-warmup
        cold-shape guard): flat scans only vary in the k bucket —
        ``nprobe`` is the faiss-compat no-op here."""
        return (_bucket_k(clamp_k(k)),)

    # -- search ---------------------------------------------------------------
    def search(self, queries: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """faiss-shaped search: returns (D, I) with D (Q, k) float32 scores
        descending and I (Q, k) int64 row ids; slots past ntotal get id -1
        (matching faiss's behavior for k > ntotal)."""
        k = clamp_k(k)
        if self.ntotal == 0:
            q = np.atleast_2d(np.asarray(queries))
            return (np.full((q.shape[0], k), -np.inf, np.float32),
                    np.full((q.shape[0], k), -1, np.int64))
        queries = np.ascontiguousarray(np.atleast_2d(queries), dtype=np.float32)
        if queries.shape[1] != self.dim:
            raise ValueError(
                f"query dim {queries.shape[1]} != index dim {self.dim} "
                "(is --model the one this index was built with?)")
        # the two-stage top-k sorts (Q*chunks, chunk) buffers; cap Q per
        # kernel call so multi-million-row corpora don't OOM at high Q
        if queries.shape[0] > _MAX_Q:
            parts = [self.search(queries[i: i + _MAX_Q], k)
                     for i in range(0, queries.shape[0], _MAX_Q)]
            return (np.concatenate([p[0] for p in parts]),
                    np.concatenate([p[1] for p in parts]))
        queries = rotate_rows(queries, self._rot)  # match rotated codes
        queries, nq = _pad_q(queries)
        cap_rows = (self._codes if self.coded_storage
                    else self._corpus).shape[0]
        if self.pq_storage:
            from clipx.search.pq import pack_factor

            cap_rows *= pack_factor(self._code_dim)  # lane-paired rows
        kk = min(_bucket_k(k), cap_rows)
        if self.pq_storage:
            from clipx.search.pq import _search_kernel_pq

            scores, ids = _search_kernel_pq(
                self._codes, self._pq.device(), jnp.int32(self.ntotal),
                jnp.asarray(queries), kk)
        elif self.int4_storage:
            scores, ids = _search_kernel_int4_pure(
                self._codes, self._scales, jnp.int32(self.ntotal),
                jnp.asarray(queries), kk)
        elif self.int8_storage:
            scores, ids = _search_kernel_int8_pure(
                self._codes, self._scales, jnp.int32(self.ntotal),
                jnp.asarray(queries), kk)
        elif self.quantized:
            self._ensure_codes()
            kernel = (_search_kernel_int8_seg if _int8_impl() == "seg"
                      else _search_kernel_int8)
            scores, ids = kernel(
                self._codes, self._scales, self._corpus,
                jnp.int32(self.ntotal), jnp.asarray(queries), kk)
        else:
            scores, ids = _search_kernel(
                self._corpus, jnp.int32(self.ntotal),
                jnp.asarray(queries, dtype=self.dtype), kk)
        scores = np.asarray(scores[:nq, :k], dtype=np.float32)
        ids = np.asarray(ids[:nq, :k], dtype=np.int64)
        if self._center is not None:
            # centered codes score the residual only — a per-query
            # CONSTANT shift, so ranking is already correct; add the
            # exact q·mean term back for faithful scores (-inf stays)
            scores = scores + (queries[:nq] @ self._center)[:, None]
        invalid = ~np.isfinite(scores)
        ids[invalid] = -1
        if scores.shape[1] < k:  # tiny corpus, huge (clamped) k
            pad = k - scores.shape[1]
            scores = np.pad(scores, ((0, 0), (0, pad)),
                            constant_values=-np.inf)
            ids = np.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
        return scores, ids

    def _ensure_codes(self) -> None:
        if self._codes is not None:
            return
        if self.coded_storage:
            raise RuntimeError("coded-storage index has no codes — "
                               "nothing was added yet")
        if self.dtype not in (jnp.float32, jnp.bfloat16):
            raise ValueError("quantized search rescoring requires a float "
                             "corpus (dtype f32 or bf16), got "
                             f"{jnp.dtype(self.dtype).name}")
        self._codes, self._scales = _quantize_device(self._corpus)

    # -- reconstruction ---------------------------------------------------------
    def reconstruct(self, row: int) -> np.ndarray:
        if not (0 <= row < self.ntotal):
            raise IndexError(row)
        if self.pq_storage:
            from clipx.search.pq import pack_factor

            pf = pack_factor(self._code_dim)
            pair = np.asarray(self._codes[row // pf]).reshape(
                pf, self._code_dim)
            v = self._pq.decode(pair[row % pf][None, :])[0]
            return v @ self._rot.T if self._rot is not None else v
        if self.int4_storage:
            c = unpack_int4_host(np.asarray(self._codes[row])[None, :])
            v = c[0].astype(np.float32) * float(self._scales[row])
            if self._center is not None:
                v = v + self._center
            return v @ self._rot.T if self._rot is not None else v
        if self.int8_storage:
            v = (np.asarray(self._codes[row], dtype=np.float32)
                 * float(self._scales[row]))
            if self._center is not None:
                v = v + self._center
            return v @ self._rot.T if self._rot is not None else v
        return np.asarray(self._corpus[row], dtype=np.float32)

    def vectors(self) -> np.ndarray:
        if self.coded_storage:
            if self._codes is None:
                return np.zeros((0, self.dim), dtype=np.float32)
            if self.pq_storage:
                from clipx.search.pq import pack_factor

                pf = pack_factor(self._code_dim)
                c = np.asarray(
                    self._codes[: -(-self.ntotal // pf)]
                ).reshape(-1, self._code_dim)[: self.ntotal]
                deq = self._pq.decode(c)
                return rotate_rows(deq, None if self._rot is None
                                   else self._rot.T)
            c = np.asarray(self._codes[: self.ntotal])
            if self.int4_storage:
                c = unpack_int4_host(c)
            deq = (c.astype(np.float32)
                   * np.asarray(self._scales[: self.ntotal])[:, None])
            if self._center is not None:
                deq += self._center
            # unrotate so callers see user-space rows (sidecar order)
            return rotate_rows(deq, None if self._rot is None
                               else self._rot.T)
        if self._corpus is None:
            return np.zeros((0, self.dim), dtype=np.float32)
        return np.asarray(self._corpus[: self.ntotal], dtype=np.float32)


# ---------------------------------------------------------------------------
# persistence — replaces faiss.write_index/read_index on 'images.index'
# (reference:build-index.py:109, reference:query-index.py:29)
# ---------------------------------------------------------------------------

def write_index(index: VectorIndex, path: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<qq", index.ntotal, index.dim))
        f.write(index.vectors().tobytes())
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


class IndexWriter:
    """Streaming sidecar writer: same on-disk format as ``write_index``
    but chunks flow host-RAM -> disk, so the index build phase needs no
    device corpus at any size (the reference loads everything into one
    faiss ``add``, reference:build-index.py:73-100; our build ceiling is
    disk). Full f32 fidelity regardless of --corpus-dtype — the lossy
    storage tiers are query-time placement only. Atomic: data lands in
    ``path + '.tmp'`` and renames into place on ``close()``; abandoning
    the writer leaves any previous index untouched."""

    def __init__(self, path: str, ntotal: int, dim: int):
        import hashlib

        if not (0 <= ntotal and 0 < dim <= 65536):
            raise ValueError(f"bad index shape ({ntotal}, {dim})")
        self._path = path
        self._tmp = path + ".tmp"
        self._dim = dim
        self._remaining = ntotal
        # running content_hash of the row bytes — free relative to the
        # encode, and it lets the build CLI stamp the codes sidecar
        # (clipx/search/codes_io.py) without a second read of the file
        self._hash = hashlib.blake2b(digest_size=16)
        self.content_hash: Optional[bytes] = None  # set on close()
        self._f = open(self._tmp, "wb")
        self._f.write(_MAGIC)
        self._f.write(struct.pack("<qq", ntotal, dim))

    def write(self, rows: np.ndarray) -> None:
        rows = np.ascontiguousarray(rows, dtype=np.float32)
        if rows.ndim != 2 or rows.shape[1] != self._dim:
            raise ValueError(f"expected (n, {self._dim}) rows, "
                             f"got {rows.shape}")
        if rows.shape[0] > self._remaining:
            raise ValueError(f"wrote past the declared ntotal "
                             f"({rows.shape[0]} rows, "
                             f"{self._remaining} remaining)")
        raw = rows.tobytes()
        self._hash.update(raw)
        self._f.write(raw)
        self._remaining -= rows.shape[0]

    def close(self) -> None:
        if self._remaining:
            self._f.close()
            os.unlink(self._tmp)
            raise ValueError(f"index incomplete: {self._remaining} of "
                             "the declared rows were never written")
        self._f.flush()
        os.fsync(self._f.fileno())
        self._f.close()
        os.replace(self._tmp, self._path)
        self.content_hash = self._hash.digest()


def read_index_vectors(path: str, mmap: bool = False) -> np.ndarray:
    """Parse the sidecar into a host (ntotal, dim) float32 array —
    callers that build a sharded (or otherwise placed) index from it
    avoid the single-device upload read_index would do. With
    ``mmap=True`` the rows come back as a read-only memmap view: the
    coded-tier encoders stream it in chunks, so a 100M-row sidecar
    (~200 GB) never materializes in host RAM."""
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            hint = ""
            if magic[:2] in (b"Iw", b"IV", b"Ix", b"IF"):
                # faiss serialization starts with an index-type fourcc
                hint = (" (this looks like a faiss index from the "
                        "reference implementation — rerun build-index.py "
                        "to regenerate it from vectors.lmdb)")
            raise ValueError(f"{path!r} is not a clipx index file{hint}")
        ntotal, dim = struct.unpack("<qq", f.read(16))
        if not (0 <= ntotal <= 1_000_000_000 and 0 < dim <= 65536):
            raise ValueError(f"{path!r} header is corrupt "
                             f"(ntotal={ntotal}, dim={dim})")
        if mmap:
            if os.path.getsize(path) < len(_MAGIC) + 16 + ntotal * dim * 4:
                raise ValueError(f"{path!r} is truncated")
            if ntotal == 0:
                return np.zeros((0, dim), np.float32)
            return np.memmap(path, np.float32, "r",
                             offset=len(_MAGIC) + 16, shape=(ntotal, dim))
        raw = f.read(ntotal * dim * 4)
        if len(raw) != ntotal * dim * 4:
            raise ValueError(f"{path!r} is truncated "
                             f"({len(raw)} of {ntotal * dim * 4} bytes)")
    return np.frombuffer(raw, dtype=np.float32).reshape(ntotal, dim)


def content_hash(vectors: np.ndarray) -> bytes:
    """Order-sensitive digest of the raw row bytes (no copy for
    contiguous float32 input). Serve compares the new sidecar's prefix
    against this to decide whether a reload can be an incremental
    ``add()`` — valid exactly when the old rows (and therefore their
    ids, the byte-sorted path ranks of reference:build-index.py:87-88)
    are unchanged."""
    import hashlib

    v = np.ascontiguousarray(vectors, dtype=np.float32)
    h = hashlib.blake2b(digest_size=16)
    h.update(memoryview(v).cast("B"))
    return h.digest()


def read_index(path: str, dtype=jnp.float32) -> VectorIndex:
    data = read_index_vectors(path)
    index = VectorIndex(dim=data.shape[1], dtype=dtype)
    if data.shape[0]:
        index.add(data)
    return index
