"""Product-quantized corpus storage (``--corpus-dtype pq``).

The deepest rung of the capacity ladder (f32 -> bf16 -> int8 -> int4 ->
pq): 4-bit product quantization — the faiss ``IndexPQ`` / fast-scan
analog (the capacity regime the reference delegates to faiss,
reference:build-index.py:80-81). Dims split into M = D/dsub subspaces;
each subspace gets a 16-entry k-means codebook, so a row is M 4-bit
codes packed two per byte in the same SPLIT layout as the int4 tier
(byte j = codes j and j + M/2). The width knob ($CLIPX_PQ_DSUB):

  dsub=2 (default)  2 bits/dim — CLIP 512-d: 128 B/row, ~2x int4 /
                    ~16x f32 capacity; recall@50 0.73 measured on the
                    adversarial anisotropic corpus (PQ256x4 analog)
  dsub=4            1 bit/dim — 64 B/row, ~4x int4 / ~32x f32;
                    recall@50 0.55 there (PQ128x4 analog)

(Both measured in tools/eval_quality.py; random corpora are PQ's worst
case — real CLIP embeddings cluster, which is what k-means codebooks
exploit and scalar quantizers cannot.)

TPU-first ADC scan
------------------
faiss scans PQ codes with per-query lookup tables: score(row) =
sum_m LUT[m, code(row, m)], a 16-entry table lookup per code that
fast-scan does with SIMD lane shuffles (pshufb). TPUs have no lane
shuffle — VPU gathers are serial — but they have an MXU, so the lookup
is recast as a matmul against one-hot code indicators:

    score = onehot(codes) . LUT    # (rows, M*16) @ (M*16, Q)

One-hot expansion is a VPU compare XLA fuses into the matmul's operand
pipeline, the LUT is int8-quantized per query (a positive per-query
scale cannot change that query's candidate ranking, so it is dropped —
the same argument as the int8 scan's q_scale), and the MXU runs the
int8 contraction at 2x bf16 rate. The scan is chunked under ``lax.map``
(``_PQ_CHUNK`` rows) to bound the one-hot transient; each chunk keeps
its top candidates, survivors rescore against the **f32** LUT (one
small one-hot matmul), so returned scores are the full-precision PQ
scores — query-side rounding cancels entirely, and the residual error
vs exact f32 search is pure PQ reconstruction error (the recall trade
measured per tier in tools/eval_quality.py and gated in
test_quality_gate).

Rows and queries are rotated by the fixed orthogonal matrix of
clipx.search.engine.corpus_rotation before training/encoding — random
rotation is the OPQ-lite trick from the PQ literature and measurably
lifts recall on anisotropic (CLIP-like) embeddings.

Physical layout: device code arrays are LANE-PAIRED (``pack_factor``):
TPU int8 tiles are 128 lanes wide, so a (N, M/2) array with M/2 < 128
allocates 128 B/row regardless of M — measured on v5e: a dsub=4
s8[201M, 64] corpus requested 25.7 GiB, silently erasing the tier's
capacity advantage over dsub=2. Codes therefore live as
(N/pf, (M/2)*pf) — pf consecutive logical rows per physical row, byte
order identical to row-major — and every consumer recovers logical
rows with chunk-local reshapes.

Training is deterministic (fixed seed) host-side k-means, vectorized
across subspaces through BLAS; codebooks are trained on the FIRST batch
added and frozen — later adds encode against them, exactly faiss's
train-once ``IndexPQ`` contract.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from clipx.search.engine import _exact_topk

PQ_K = 16             # centroids per subspace (4-bit codes)
PQ_RESCORE_MARGIN = 4  # f32-LUT-rescored candidates per requested k
_PQ_CHUNK = 1 << 16   # scan rows per lax.map step: bounds the one-hot
#                       transient to chunk * M*16 bytes (128 MB at
#                       D=512). Every engine._bucket_rows capacity is
#                       <= one chunk or a multiple of it (powers of two,
#                       then 512k-row steps).
_PQ_TRAIN_SAMPLE = 1 << 16
_PQ_ITERS = 15
_PQ_SEED = 0xC11B9


def is_pq(dtype) -> bool:
    """True for the ``--corpus-dtype pq`` sentinel (the tier has no jnp
    dtype — storage is packed uint4 code indices, not numbers)."""
    return isinstance(dtype, str) and dtype.lower() == "pq"


def pack_factor(half: int) -> int:
    """TPU lane-pairing factor for the PHYSICAL code array. int8 arrays
    tile to (8, 128)-lane tiles, so a (N, half) array with half < 128
    silently allocates 128 B/row whatever ``half`` is — measured: an
    s8[201M, 64] dsub=4 corpus requested 25.7 GiB (128 B/row), erasing
    the tier's entire capacity advantage. Codes are therefore stored
    row-paired as (N/pf, half*pf) — ``pf`` consecutive logical rows per
    physical row, byte order identical to row-major (N, half) — which
    restores byte-exact HBM cost. Consumers recover logical (rows,
    half) order with chunk-local reshapes (free on CPU, a chunk-bounded
    relayout on TPU). Placement pads row counts to multiples of ``pf``
    (every engine._bucket_rows / mips._shard_rows value already is)."""
    pf = 1
    while half * pf * 2 <= 128:
        pf *= 2
    return pf


def pair_rows_host(codes: np.ndarray) -> np.ndarray:
    """(N, half) host codes -> the (N/pf, half*pf) physical layout
    (a pure reshape — same bytes). N must be a pf multiple."""
    pf = pack_factor(codes.shape[1])
    if pf == 1:
        return codes
    if codes.shape[0] % pf:
        raise ValueError(f"row count {codes.shape[0]} not a multiple "
                         f"of the pack factor {pf}")
    return codes.reshape(codes.shape[0] // pf, codes.shape[1] * pf)


def pq_dsub() -> int:
    """Dims per subspace for NEW codebooks ($CLIPX_PQ_DSUB): 2 (default
    — 2 bits/dim, 128 B/row for CLIP, measured recall@50 0.73 on the
    adversarial anisotropic corpus) or 4 (1 bit/dim, 64 B/row max
    capacity, recall 0.55 there; real CLIP embeddings cluster far
    better than that adversarial case). An existing index keeps the
    width its codebooks were trained with."""
    import os

    v = os.environ.get("CLIPX_PQ_DSUB", "2")
    if v not in ("2", "4"):
        raise ValueError(f"CLIPX_PQ_DSUB must be 2 or 4, got {v!r}")
    return int(v)


def subspaces(dim: int, dsub: Optional[int] = None) -> int:
    dsub = pq_dsub() if dsub is None else dsub
    if dim % (2 * dsub):
        raise ValueError("pq storage needs dim % "
                         f"{2 * dsub} == 0, got {dim}")
    return dim // dsub


# -- packing (SPLIT layout, unsigned nibbles) ---------------------------------


def pack_codes4(codes: np.ndarray) -> np.ndarray:
    """(N, M) uint8 codes in [0, 16) -> (N, M/2) int8 packed, split
    layout: byte j = code j (low nibble) | code j + M/2 (high). Split so
    the device scan's two nibble views each cover a contiguous half of
    the subspaces (same reasoning as engine.pack_int4)."""
    m = codes.shape[1]
    lo = codes[:, : m // 2].astype(np.uint8)
    hi = codes[:, m // 2:].astype(np.uint8)
    return (lo | (hi << 4)).view(np.int8)


def unpack_codes4_host(packed: np.ndarray) -> np.ndarray:
    """numpy twin of the device unpack: (N, M/2) packed -> (N, M) uint8."""
    u = packed.view(np.uint8)
    return np.concatenate([u & 0x0F, u >> 4], axis=-1)


def _unpack_codes4(packed: jax.Array) -> jax.Array:
    """(..., M/2) packed int8 -> (..., M) uint8 code indices. Logical
    (not arithmetic) shifts: nibbles are unsigned centroid indices."""
    u = jax.lax.bitcast_convert_type(packed, jnp.uint8)
    return jnp.concatenate([u & 0x0F, u >> 4], axis=-1)


# -- codebooks -----------------------------------------------------------------


def _assign(x: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Nearest centroid per row: x (S, dsub), cent (K, dsub) ->
    (S,) uint8. argmin of ||c||^2 - 2 x.c (the row's own norm is
    constant across k)."""
    g = x @ cent.T
    g *= -2.0
    g += (cent ** 2).sum(-1)
    return g.argmin(1).astype(np.uint8)


class PQCodebook:
    """Per-subspace 16-entry codebooks: centroids (M, 16, dsub) f32
    in ROTATED space (see module docstring). The subspace width is
    whatever the codebook was trained with — everything downstream
    derives it from this shape, so an index built at one
    $CLIPX_PQ_DSUB keeps working if the env changes."""

    def __init__(self, centroids: np.ndarray):
        if (centroids.ndim != 3 or centroids.shape[1] != PQ_K
                or centroids.shape[2] not in (2, 4)):
            raise ValueError(f"bad codebook shape {centroids.shape}")
        self.centroids = np.ascontiguousarray(centroids, np.float32)
        self._device = None

    @property
    def m(self) -> int:
        return self.centroids.shape[0]

    @property
    def dsub(self) -> int:
        return self.centroids.shape[2]

    def device(self) -> jax.Array:
        if self._device is None:
            self._device = jnp.asarray(self.centroids)
        return self._device

    @classmethod
    def train(cls, rows: np.ndarray, sample: int = _PQ_TRAIN_SAMPLE,
              iters: int = _PQ_ITERS,
              rot: Optional[np.ndarray] = None) -> "PQCodebook":
        """Deterministic Lloyd k-means per subspace. The assignment is a
        per-subspace (S, dsub) @ (dsub, K) GEMM + argmin over the
        biased scores (||x||^2 dropped — it cannot change a row's
        argmin); the update is bincount means. A numpy *batched*
        (M, S, K) formulation measured ~10x slower (giant broadcast
        temps, unthreaded batch GEMM), hence the plain per-m loop.
        ``rot`` rotates the SAMPLE only (callers at corpus scale must
        not pre-rotate millions of rows to train on 64k of them).
        ``rows`` may be a sidecar memmap: only the sampled rows are
        ever materialized (a full ascontiguousarray of a 100M-row
        memmap would defeat the bounded-RAM load path)."""
        n, d = rows.shape
        dsub = pq_dsub()
        m = subspaces(d, dsub)
        rng = np.random.default_rng(_PQ_SEED + d)
        if n > sample:
            x = np.ascontiguousarray(
                rows[rng.choice(n, sample, replace=False)], np.float32)
        else:
            x = np.ascontiguousarray(rows, np.float32)
        if rot is not None:
            x = x @ rot
        s = x.shape[0]
        xs = np.ascontiguousarray(
            x.reshape(s, m, dsub).transpose(1, 0, 2))      # (M, S, dsub)
        k_eff = min(PQ_K, s)
        init = rng.choice(s, k_eff, replace=False)
        cent = np.ascontiguousarray(xs[:, init])           # (M, k_eff, dsub)
        if k_eff < PQ_K:  # tiny corpus: duplicate centroids are harmless
            cent = np.concatenate(
                [cent, np.repeat(cent[:, :1], PQ_K - k_eff, axis=1)],
                axis=1)
        for _ in range(iters):
            for mi in range(m):
                assign = _assign(xs[mi], cent[mi])
                counts = np.bincount(assign, minlength=PQ_K)
                nz = counts > 0
                sums = np.stack(
                    [np.bincount(assign, weights=xs[mi, :, j],
                                 minlength=PQ_K) for j in range(dsub)],
                    axis=1)
                cent[mi][nz] = (sums[nz] / counts[nz, None]).astype(
                    np.float32)  # empty clusters keep their old centroid
        return cls(cent)

    def encode(self, rows: np.ndarray, chunk: int = 1 << 16,
               rot: Optional[np.ndarray] = None) -> np.ndarray:
        """(N, D) rotated f32 rows -> (N, M/2) packed codes. Host-side
        (like the int8/int4 quantizers) so the H2D upload is 1 bit/dim —
        nearest centroid per subspace via small BLAS GEMMs. ``rot``
        rotates rows chunk-wise (bounded transient, like
        engine.quantize_rows_rotated)."""
        rows = np.ascontiguousarray(rows, np.float32)
        n, d = rows.shape
        m, dsub = self.m, self.dsub
        if d != m * dsub:
            raise ValueError(f"codebook covers {m * dsub} dims, "
                             f"rows have {d}")
        out = np.empty((n, m // 2), np.int8)
        for i in range(0, n, chunk):
            b = rows[i: i + chunk]
            if rot is not None:
                b = b @ rot
            xs = np.ascontiguousarray(
                b.reshape(len(b), m, dsub).transpose(1, 0, 2))
            codes = np.empty((m, len(b)), np.uint8)
            for mi in range(m):
                codes[mi] = _assign(xs[mi], self.centroids[mi])
            out[i: i + len(b)] = pack_codes4(codes.T)
        return out

    def decode(self, packed: np.ndarray) -> np.ndarray:
        """(N, M/2) packed codes -> (N, D) rotated-space f32 rows
        (centroid reconstruction)."""
        codes = unpack_codes4_host(np.atleast_2d(packed))
        n, m = codes.shape
        rec = self.centroids[np.arange(m)[None, :], codes]  # (N, M, dsub)
        return rec.reshape(n, m * self.dsub).astype(np.float32)


def opq_mode() -> str:
    """$CLIPX_PQ_OPQ: 'trained' (default — alternating-minimization
    OPQ rotation, the faiss OPQMatrix analog) or 'fixed' (the round-3
    seed-derived random rotation; also the fallback when the corpus
    rotation knob is off entirely)."""
    import os

    v = os.environ.get("CLIPX_PQ_OPQ", "trained").lower()
    return v if v in ("trained", "fixed") else "trained"


def pq_residual_enabled() -> bool:
    """$CLIPX_PQ_RESIDUAL (IVF + pq storage only): encode each row's
    RESIDUAL against its segment centroid instead of the raw row —
    faiss ``IndexIVFPQ``'s ``by_residual`` default. The coarse score
    q.cent is exact f32 (the probe already computes it) and the
    codebooks only have to cover the residual's much smaller dynamic
    range, which is where faiss's 4-bit tiers keep their recall on
    clustered corpora. Composes with the codes sidecar (codes are tied
    to the layout via the shared content hash) AND with trained OPQ —
    rotation is linear, so train_opq runs on the residuals themselves
    (ivf._encode_residual_flat). Measured recall table in
    docs/ARCHITECTURE.md; 'off' restores round-3 global-codebook
    encoding."""
    import os

    return os.environ.get("CLIPX_PQ_RESIDUAL", "on").lower() not in (
        "off", "0", "false")


_OPQ_ITERS = 10


def train_opq(rows: np.ndarray, rot0: Optional[np.ndarray],
              iters: int = _OPQ_ITERS
              ) -> Tuple[Optional[np.ndarray], "PQCodebook"]:
    """Trained OPQ rotation + codebooks (the faiss ``OPQMatrix``
    analog, OPQ-NP alternating minimization): starting from the fixed
    random rotation, alternate (a) k-means codebooks under the current
    rotation with (b) the orthogonal Procrustes update
    R = UV^T of X^T X_hat — each step cannot increase the PQ
    reconstruction error, and on anisotropic embeddings the learned R
    balances per-subspace variance far better than a random one.
    Deterministic: fixed sample (the codebook trainer's own rng), fixed
    iteration count (U V^T is invariant to SVD sign choices, so the
    product is stable across LAPACK builds outside degenerate equal-
    singular-value ties). Returns (R, codebook) — R is the
    FULL rotation to use in place of the fixed one (or None when
    ``rot0`` is None: rotation disabled via $CLIPX_CORPUS_ROTATE=off
    disables training too, keeping that knob's bit-compat meaning).

    Train-time cost is bounded by the sample (<= _PQ_TRAIN_SAMPLE
    rows): ~iters x (k-means + one (S, D) x (D, D) GEMM + one D x D
    SVD) — seconds at D=512, amortized to zero by the codes sidecar
    (clipx/search/codes_io.py), which persists the rotation."""
    n, d = rows.shape
    # a (D, D) rotation estimated from fewer than a few D rows
    # overfits the sample's span: reconstruction of OTHER rows gets
    # WORSE than under the random rotation (observed: a 4-row corpus
    # whose post-OPQ appends no longer self-retrieved). Tiny corpora
    # keep the fixed rotation.
    if rot0 is None or opq_mode() == "fixed" or n < 4 * d:
        return rot0, PQCodebook.train(rows, rot=rot0)
    subspaces(d)  # validates divisibility up front
    # the SAME deterministic sample the codebook trainer uses, so the
    # final codebooks see exactly the rows train() would; rows may be a
    # sidecar memmap — materialize the sample only
    rng = np.random.default_rng(_PQ_SEED + d)
    if n > _PQ_TRAIN_SAMPLE:
        x = np.ascontiguousarray(
            rows[rng.choice(n, _PQ_TRAIN_SAMPLE, replace=False)],
            np.float32)
    else:
        x = np.ascontiguousarray(rows, np.float32)
    r = np.ascontiguousarray(rot0, np.float32)
    for _ in range(iters):
        # short inner k-means per alternation (the rotation update only
        # needs a decent X_hat); the final codebooks below get the full
        # iteration budget
        cb = PQCodebook.train(x, iters=5, rot=r)
        xr = x @ r
        codes = cb.encode(xr)
        xhat = cb.decode(codes)                      # (S, D) rotated
        # Procrustes: min_R ||x R - xhat||_F over orthogonal R
        u, _, vt = np.linalg.svd(x.T @ xhat)
        r = np.ascontiguousarray((u @ vt), np.float32)
    # final codebooks under the final rotation, through the canonical
    # constructor path (full-corpus sampling identical to train())
    return r, PQCodebook.train(rows, rot=r)


def make_luts(queries: jax.Array, centroids: jax.Array) -> jax.Array:
    """Per-query ADC tables: (Q, M, 16) f32 — LUT[q, m, c] is the inner
    product of query block m with centroid c (sums over m give the exact
    PQ score of a row)."""
    nq = queries.shape[0]
    m, k, dsub = centroids.shape
    qb = queries.reshape(nq, m, dsub)
    return jnp.einsum("qmd,mkd->qmk", qb, centroids,
                      preferred_element_type=jnp.float32)


def quantized_luts(queries: jax.Array, centroids: jax.Array
                   ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(lut, luti, scale): the flat (Q, M*16) f32 ADC tables, their
    per-query int8 quantization for the scan, and the (Q, 1) f32
    quantization scale. Plain PQ ranking drops the positive per-query
    scale (it cannot change that query's candidate ranking — the
    int8-scan q_scale argument); residual IVFPQ must apply it, because
    scan scores there are SUMMED with exact f32 coarse scores and the
    mixed ranking is scale-sensitive."""
    nq = queries.shape[0]
    mk = centroids.shape[0] * PQ_K
    lut = make_luts(queries, centroids).reshape(nq, mk)
    scale = jnp.maximum(jnp.abs(lut).max(axis=1, keepdims=True),
                        1e-12) / 127.0
    luti = jnp.clip(jnp.rint(lut / scale), -127, 127).astype(jnp.int8)
    return lut, luti, scale


# Pallas-branch chunking: one kernel call up to this many rows (the
# (Q, n) f32 score block peaks at 128 MB); past it, lax.map over
# _PQ_PALLAS_CHUNK-row slices bounds score memory at capacity scale
# (a (Q, 100M) f32 block would be 6.4 GB — more than the codes).
_PQ_PALLAS_ONESHOT = 1 << 21
_PQ_PALLAS_CHUNK = 1 << 19


def _use_pallas_scan(n: int) -> bool:
    """CLIPX_PQ_SCAN: 'auto' (Pallas on TPU, XLA elsewhere — default),
    'pallas', or 'xla'. Pallas additionally needs the padded capacity
    tile-aligned — single-shot up to _PQ_PALLAS_ONESHOT rows, chunked
    past it (engine._bucket_rows always satisfies both; sharded
    placement aligns via mips._shard_rows)."""
    import os

    from clipx.ops.pq_scan import _TILE

    v = os.environ.get("CLIPX_PQ_SCAN", "auto")
    aligned = (n % min(_TILE, n) == 0 if n <= _PQ_PALLAS_ONESHOT
               else n % _PQ_PALLAS_CHUNK == 0)
    if v == "xla" or not aligned:
        return False
    if v == "pallas":
        return True
    return jax.devices()[0].platform == "tpu"


def _pq_scan_chunk_xla(p, luti, valid, m_cand, start, base, chunk,
                       iota16):
    """One XLA scan chunk (``p``: the pre-sliced (chunk, half) LOGICAL
    code rows): unpack -> one-hot int8 -> LUT matmul -> per-chunk
    top-m. The one-hot operand materializes through HBM (16x the code
    bytes) — kept as the CPU/test path and the CLIPX_PQ_SCAN=xla
    fallback; the Pallas kernel is the TPU default."""
    mk = 2 * p.shape[1] * PQ_K
    codes = _unpack_codes4(p)                           # (chunk, M) u8
    onehot = (codes[:, :, None] == iota16).astype(jnp.int8)
    raw = jax.lax.dot_general(
        onehot.reshape(chunk, mk), luti, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)               # (chunk, Q)
    approx = raw.astype(jnp.float32)
    rid = (jax.lax.broadcasted_iota(jnp.int32, approx.shape, 0)
           + base + start)
    approx = jnp.where(rid < valid, approx, -jnp.inf)
    d, li = _exact_topk(approx.T, m_cand)               # (Q, m)
    return d, li + start


def _pq_topk(packed: jax.Array, centroids: jax.Array, valid: jax.Array,
             queries: jax.Array, k: int, base=0
             ) -> Tuple[jax.Array, jax.Array]:
    """Core PQ search: int8-LUT one-hot matmul scan (chunked under
    ``lax.map``) -> per-chunk top candidates -> global merge -> f32-LUT
    rescore -> top-k. ``base`` offsets global row ids for sharded
    callers (clipx/parallel/mips.py), whose validity mask is global.

    Returned scores are the exact f32 PQ (reconstruction) scores; the
    int8 LUT rounding affects candidate selection only, and the 4x
    candidate margin absorbs it (RMS ~3.3 LUT steps over M terms vs the
    tier's inherent ~1e-2 reconstruction noise).

    ``packed`` arrives in the PHYSICAL lane-paired layout (see
    ``pack_factor``): (n/pf, half*pf), pf consecutive logical rows per
    physical row. The logical view is recovered with chunk-local
    reshapes so no full-corpus relayout transient ever exists."""
    half = centroids.shape[0] // 2
    pf = packed.shape[1] // half
    if packed.shape[1] != half * pf:
        raise ValueError(f"code width {packed.shape[1]} is not a "
                         f"multiple of M/2 = {half}")
    n = packed.shape[0] * pf
    nq = queries.shape[0]
    mk = 2 * half * PQ_K
    lut, luti, _ = quantized_luts(queries, centroids)       # (Q, M*16)
    iota16 = jnp.arange(PQ_K, dtype=jnp.uint8)

    use_pallas = _use_pallas_scan(n)
    if use_pallas:
        # Pallas scan (clipx/ops/pq_scan.py): the one-hot expansion
        # stays in VMEM, so HBM traffic is the packed codes + scores
        # instead of the 16x-expanded operand (65.8 -> 4.4 ms at 1M,
        # docs/ARCHITECTURE.md). Scores are bitwise equal to the XLA
        # path (integer sums, exact in f32).
        import os

        from clipx.ops.pq_scan import pq_scan_scores

        # CLIPX_PQ_LUT: int8 (default — 2x MXU rate, exact int32
        # accumulate) or bf16 (A/B fallback, also exact)
        ldt = (jnp.bfloat16
               if os.environ.get("CLIPX_PQ_LUT", "int8") == "bf16"
               else jnp.int8)
        lut_arg = luti.T.astype(ldt)
        chunk = n if n <= _PQ_PALLAS_ONESHOT else _PQ_PALLAS_CHUNK
    else:
        chunk = min(n, _PQ_CHUNK)
    if n % chunk:
        raise ValueError(f"pq capacity {n} not a chunk multiple "
                         f"({chunk}) — placement must pad to "
                         "engine._bucket_rows")
    m_cand = min(PQ_RESCORE_MARGIN * k, chunk)
    if chunk % pf:
        raise ValueError(f"scan chunk {chunk} not a pack-factor ({pf}) "
                         "multiple")

    def slice_logical(start):
        # physical slice + chunk-local reshape back to logical rows
        p = jax.lax.dynamic_slice_in_dim(packed, start // pf,
                                         chunk // pf)
        return p.reshape(chunk, half) if pf > 1 else p

    def scan_chunk(start):
        p = slice_logical(start)
        if use_pallas:
            approx = pq_scan_scores(p, lut_arg)             # (Q, chunk)
            rid = (jax.lax.broadcasted_iota(jnp.int32, approx.shape, 1)
                   + base + start)
            approx = jnp.where(rid < valid, approx, -jnp.inf)
            d, li = _exact_topk(approx, m_cand)
            return d, li + start
        return _pq_scan_chunk_xla(p, luti, valid, m_cand, start,
                                  base, chunk, iota16)

    if n == chunk:
        d, cand = scan_chunk(jnp.int32(0))
    else:
        starts = jnp.arange(0, n, chunk, dtype=jnp.int32)
        ds, lis = jax.lax.map(scan_chunk, starts)           # (C, Q, m)
        d_all = ds.transpose(1, 0, 2).reshape(nq, -1)
        i_all = lis.transpose(1, 0, 2).reshape(nq, -1)
        d, pos = _exact_topk(d_all, m_cand)
        cand = jnp.take_along_axis(i_all, pos, axis=1)      # (Q, m) local

    # f32-LUT rescore of the candidates: one small batched one-hot
    # matmul — exact PQ scores, query-side int8 rounding cancels
    if pf > 1:
        # candidate rows live inside lane-paired physical rows: gather
        # the pair, then pick the candidate's slot
        pairs = packed[cand // pf]                          # (Q,m,half*pf)
        pairs = pairs.reshape(nq, m_cand, pf, half)
        rows_p = jnp.take_along_axis(
            pairs, (cand % pf)[..., None, None], axis=2)[:, :, 0]
    else:
        rows_p = packed[cand]
    rows = _unpack_codes4(rows_p)                           # (Q, m, M) u8
    oneh = (rows[..., None] == iota16).astype(jnp.float32)
    exact = jax.lax.dot_general(
        oneh.reshape(nq, m_cand, mk), lut,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                 # (Q, m)
    gids = cand + base
    exact = jnp.where(gids < valid, exact, -jnp.inf)
    dd, sel = jax.lax.top_k(exact, k)
    return dd, jnp.take_along_axis(gids, sel, axis=1)


@functools.partial(jax.jit, static_argnames=("k",))
def _search_kernel_pq(packed: jax.Array, centroids: jax.Array,
                      valid: jax.Array, queries: jax.Array, k: int
                      ) -> Tuple[jax.Array, jax.Array]:
    """pq STORAGE (--corpus-dtype pq): the packed 4-bit PQ codes ARE
    the corpus — 1 bit/dim, ~32x the f32 capacity per chip."""
    return _pq_topk(packed, centroids, valid, queries, k)


def _pq_append(index, vectors: np.ndarray) -> None:
    """Shared add() for PQ-storage indexes (VectorIndex and
    clipx/parallel/mips.ShardedVectorIndex): train codebooks on the
    FIRST batch (frozen afterwards — faiss train-once semantics),
    encode on the host (upload is 1 bit/dim), then place or append in
    place via the index's donating update fn. The first batch runs
    through the CANONICAL encoder (codes_io.encode_corpus) so the
    placed codes are byte-identical to a ``<index>.codes`` file of the
    same rows. ``index`` provides ``_pq`` (codebook slot), ``_rot``,
    ``_codes``, ``_place_pq(codes)``, ``_grow(need)`` and
    ``_update_pq_fn(pad_len)``."""
    vectors = np.ascontiguousarray(vectors, np.float32)
    rot = getattr(index, "_rot", None)
    if index._pq is None:
        from clipx.search.codes_io import encode_corpus

        payload = encode_corpus(vectors, "pq", rot=rot)
        index._pq = payload["codebook"]
        if payload["rot_matrix"] is not None:
            # OPQ may have replaced the fixed rotation (train_opq);
            # queries, later adds, and reconstruction must all use the
            # rotation the codes were encoded under
            index._rot = payload["rot_matrix"]
        codes = payload["codes"]
    else:
        codes = index._pq.encode(vectors, rot=rot)
    n_new, cdim = codes.shape
    if index._codes is None:
        index._place_pq(codes)
        index.ntotal = n_new
        return
    # the device array is lane-paired (pack_factor): updates write
    # whole PHYSICAL rows, so the block starts at the pf-aligned base
    # and, when ntotal lands mid-pair, restores the already-stored
    # prefix rows from the device copy (one ~128-byte D2H)
    pf = pack_factor(cdim)
    start = index.ntotal
    base = start - start % pf
    prefix = start % pf
    pad_len = 128
    while pad_len < n_new + prefix:
        pad_len *= 2
    if base + pad_len > index._codes.shape[0] * pf:
        index._grow(base + pad_len)
    uc = np.zeros((pad_len, cdim), np.int8)
    if prefix:
        head = np.asarray(index._codes[base // pf]).reshape(pf, cdim)
        uc[:prefix] = head[:prefix]
    uc[prefix: prefix + n_new] = codes
    index._codes = index._update_pq_fn(pad_len // pf)(
        index._codes, jnp.asarray(pair_rows_host(uc)),
        jnp.int32(base // pf))
    index.ntotal += n_new
