"""Corpus-sharded distributed MIPS over the ICI mesh.

The scaling axis of this workload is corpus size (SURVEY.md section 2c):
the embedding matrix is row-sharded across chips, each shard computes a
local matmul + top_k, and the (score, global-id) candidates are
all-gathered and merged — the classic distributed exact-search pattern
(BASELINE.json config 5: 1M+ vectors on a v4-8, <10 ms p50).

Global id = shard_index * rows_per_shard + local_row, with rows padded
per shard; padded rows are masked to -inf so they can never win. Ids
remain the byte-sorted path ranks of idx_db (reference:build-index.py:87-88)
because shards are carved from the sorted corpus in row order.

Collectives: one ``all_gather`` of (Q, k) scores + ids per shard — a few
KB over ICI — then a replicated merge top_k. Implemented with
``jax.shard_map`` so the communication pattern is explicit.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from clipx.search.engine import (_INT4_CHUNK, _MAX_Q, _SEG_W, _bucket_k,
                                 _bucket_rows, _dequant_rows_of,
                                 _int4_segscan, _int8_append, _int8_segscan,
                                 _is_int4, _pad_q, _padded_append,
                                 _exact_topk, _quantize_device, clamp_k,
                                 coded_center_enabled, corpus_center,
                                 corpus_rotation, quantize_rows,
                                 quantize_rows_int4, quantize_rows_rotated,
                                 rotate_rows)
from clipx.search.pq import (_PQ_CHUNK, _PQ_PALLAS_CHUNK,
                             _PQ_PALLAS_ONESHOT, _pq_append, _pq_topk,
                             is_pq, subspaces)

AXIS = "shard"


def _shard_rows(n: int, n_shards: int, int4: bool = False,
                pq: bool = False) -> int:
    """Rows per shard for n total rows: equal static shards, lane-aligned
    to 128. int4/pq shards that exceed one scan chunk must also be a
    chunk MULTIPLE (their kernels map the scan over fixed-size chunks:
    engine._int4_segscan / pq._pq_topk) — a shard row count like 2.25
    chunks would otherwise be unsliceable."""
    rows = -(-max(n, 1) // n_shards)
    rows = max(128, -(-rows // 128) * 128)
    if pq and rows > 4096:
        # align to the Pallas scan tile (clipx/ops/pq_scan._TILE) so
        # per-shard capacities keep the kernel path, and to the
        # capacity-scale map chunk past the one-shot bound
        rows = -(-rows // 4096) * 4096
        if rows > _PQ_PALLAS_ONESHOT:
            rows = -(-rows // _PQ_PALLAS_CHUNK) * _PQ_PALLAS_CHUNK
    chunk = _INT4_CHUNK if int4 else _PQ_CHUNK if pq else None
    if chunk and rows > chunk:
        rows = -(-rows // chunk) * chunk
    return rows


def _merge_across_shards(d, gi, k):
    """all_gather (Q, k) candidates from every shard, replicated top-k."""
    all_d = jax.lax.all_gather(d, AXIS, axis=1, tiled=True)
    all_g = jax.lax.all_gather(gi, AXIS, axis=1, tiled=True)
    dd, sel = jax.lax.top_k(all_d, k)
    return dd, jnp.take_along_axis(all_g, sel, axis=1)


def _local_topk_kernel(corpus_local: jax.Array, queries: jax.Array,
                       valid_total: jax.Array, k: int, merge_k: int
                       ) -> Tuple[jax.Array, jax.Array]:
    """Runs per shard inside shard_map. corpus_local: (rows, D).

    ``k`` is the per-shard candidate count (capped at rows-per-shard);
    ``merge_k`` is the final result width, selected from the gathered
    n_shards * k pool so k > rows-per-shard still returns every valid
    row, matching the single-device contract."""
    rows = corpus_local.shape[0]
    my = jax.lax.axis_index(AXIS)
    base = my * rows
    scores = jnp.dot(queries, corpus_local.T,
                     preferred_element_type=jnp.float32)
    gids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + base
    scores = jnp.where(gids < valid_total, scores, -jnp.inf)
    d, li = _exact_topk(scores, k)                      # (Q, k) local
    gi = jnp.take_along_axis(gids, li, axis=1)
    return _merge_across_shards(d, gi, merge_k)


def _local_topk_kernel_int8(codes_local: jax.Array, scales_local: jax.Array,
                            corpus_local: jax.Array, queries: jax.Array,
                            valid_total: jax.Array, k: int, merge_k: int
                            ) -> Tuple[jax.Array, jax.Array]:
    """int8 scan + exact full-precision rescore, per shard — the
    distributed variant of engine._search_kernel_int8_seg: the shared
    segment-scan core runs with this shard's global row base, and only
    exact (score, global id) pairs cross the ICI."""
    base = jax.lax.axis_index(AXIS) * codes_local.shape[0]
    segs = codes_local.shape[0] // _SEG_W
    corpus3 = corpus_local.reshape(segs, _SEG_W, -1)
    d, gi = _int8_segscan(codes_local, scales_local, valid_total,
                          queries, k, lambda seg_idx: corpus3[seg_idx],
                          base=base)
    return _merge_across_shards(d, gi, merge_k)


def _local_topk_kernel_int8_pure(codes_local: jax.Array,
                                 scales_local: jax.Array,
                                 queries: jax.Array,
                                 valid_total: jax.Array, k: int,
                                 merge_k: int
                                 ) -> Tuple[jax.Array, jax.Array]:
    """int8-STORAGE shard kernel (--corpus-dtype int8): the codes are
    the corpus; candidates rescore from dequantized code rows in f32
    (engine._dequant_rows_of for the error analysis)."""
    base = jax.lax.axis_index(AXIS) * codes_local.shape[0]
    d, gi = _int8_segscan(codes_local, scales_local, valid_total,
                          queries, k,
                          _dequant_rows_of(codes_local, scales_local),
                          base=base)
    return _merge_across_shards(d, gi, merge_k)


def _local_topk_kernel_int4_pure(codes_local: jax.Array,
                                 scales_local: jax.Array,
                                 queries: jax.Array,
                                 valid_total: jax.Array, k: int,
                                 merge_k: int
                                 ) -> Tuple[jax.Array, jax.Array]:
    """int4-STORAGE shard kernel (--corpus-dtype int4): the packed
    codes are the corpus (0.5 B/dim per shard); the chunked
    unpack-scan + dequantized rescore of engine._int4_segscan runs with
    this shard's global row base."""
    base = jax.lax.axis_index(AXIS) * codes_local.shape[0]
    d, gi = _int4_segscan(codes_local, scales_local, valid_total,
                          queries, k, base=base)
    return _merge_across_shards(d, gi, merge_k)


def _local_topk_kernel_pq(codes_local: jax.Array, centroids: jax.Array,
                          queries: jax.Array, valid_total: jax.Array,
                          k: int, merge_k: int
                          ) -> Tuple[jax.Array, jax.Array]:
    """pq-STORAGE shard kernel (--corpus-dtype pq): packed 4-bit PQ
    codes are the corpus; the one-hot LUT-matmul scan + f32-LUT rescore
    of pq._pq_topk runs per shard against the replicated codebooks,
    with this shard's global row base. The shard array is lane-paired
    (pq.pack_factor) — its LOGICAL row count is phys_rows * pf."""
    from clipx.search.pq import pack_factor

    pf = pack_factor(centroids.shape[0] // 2)
    base = jax.lax.axis_index(AXIS) * (codes_local.shape[0] * pf)
    d, gi = _pq_topk(codes_local, centroids, valid_total, queries, k,
                     base=base)
    return _merge_across_shards(d, gi, merge_k)


class ShardedVectorIndex:
    """Flat exact MIPS with the corpus row-sharded over a 1D mesh axis."""

    def __init__(self, vectors: np.ndarray, mesh: Optional[Mesh] = None,
                 dtype=jnp.float32, quantized: bool = False):
        if mesh is None:
            mesh = Mesh(np.asarray(jax.devices()), (AXIS,))
        if AXIS not in mesh.axis_names:
            raise ValueError(f"mesh must have a {AXIS!r} axis")
        self.mesh = mesh
        self.dtype = dtype
        # coded STORAGE (--corpus-dtype int8/int4/pq): codes are the
        # corpus, scan always quantized, rescore dequantizes (engine
        # notes)
        self.pq_storage = is_pq(dtype)
        self.int4_storage = not self.pq_storage and _is_int4(dtype)
        self.int8_storage = (not (self.pq_storage or self.int4_storage)
                             and jnp.dtype(dtype) == jnp.int8)
        self.quantized = True if self.coded_storage else quantized
        self._codes = None
        self._scales = None
        self._pq = None  # PQCodebook, trained on the constructor rows
        vectors = np.ascontiguousarray(vectors, dtype=np.float32)
        self.ntotal, self.dim = vectors.shape
        if self.int4_storage and self.dim % 2:
            raise ValueError(f"int4 storage needs an even dim, "
                             f"got {self.dim}")
        if self.pq_storage:
            self._code_dim = subspaces(self.dim) // 2  # packed bytes
        else:
            self._code_dim = (self.dim // 2 if self.int4_storage
                              else self.dim)
        self._search_fns = {}
        self._update_fns = {}
        # coded storage quantizes ROTATED rows; queries rotate to match
        # (engine.corpus_rotation — recall on anisotropic embeddings)
        self._rot = (corpus_rotation(self.dim) if self.coded_storage
                     else None)
        # centered int8/int4 storage (engine.coded_center_enabled):
        # codes are residuals from the canonical corpus mean
        self._center = None
        if self.pq_storage:
            self._corpus = None
            if self.ntotal:
                _pq_append(self, vectors)
            return
        if self.coded_storage:
            self._corpus = None
            if self.ntotal and coded_center_enabled():
                self._center = corpus_center(vectors, self._rot)
            codes, scales = quantize_rows_rotated(
                vectors, self._rot, self.int4_storage,
                center=self._center)
            self._place_int8(codes, scales)
            return
        n_shards = mesh.shape[AXIS]
        # pad so every shard holds the same row count (static shapes)
        rows = _shard_rows(self.ntotal, n_shards)
        padded = np.zeros((rows * n_shards, self.dim), np.float32)
        padded[: self.ntotal] = vectors
        self._corpus = jax.device_put(
            padded.astype(dtype), self._sharding())

    @property
    def coded_storage(self) -> bool:
        """True when the quantized codes ARE the corpus (int8/int4/pq)."""
        return self.int8_storage or self.int4_storage or self.pq_storage

    @classmethod
    def from_codes(cls, payload: dict,
                   mesh: Optional[Mesh] = None) -> "ShardedVectorIndex":
        """Sharded twin of engine.VectorIndex.from_codes: place a
        loaded ``<index>.codes`` payload (clipx.search.codes_io) across
        the mesh without reading, quantizing, or training from f32 —
        the H2D upload is the coded bytes, row-sharded."""
        import jax.numpy as jnp

        from clipx.search.pq import PQCodebook

        tier = payload["tier"]
        dtype = {"int8": jnp.int8, "int4": jnp.int4, "pq": "pq"}[tier]
        idx = cls(np.zeros((0, payload["dim"]), np.float32), mesh=mesh,
                  dtype=dtype)
        idx._code_dim = payload["code_dim"]  # file width wins (engine)
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

    def _sharding(self):
        return NamedSharding(self.mesh, P(AXIS, None))

    # -- growth ---------------------------------------------------------------
    def add(self, vectors: np.ndarray) -> None:
        """Append rows in place; ids continue from ntotal (global id =
        concatenated-row order, same contract as VectorIndex.add). Serve
        uses this for cheap reloads: a +1% corpus delta uploads ~1% of
        the bytes instead of re-placing the whole corpus (the H2D path
        through the tunnel is the expensive part).

        The update is a device-side ``dynamic_update_slice`` on the
        sharded array (GSPMD routes each slice piece to its shard); the
        update length is padded to a power-of-two bucket so repeated
        small deltas reuse one compiled shape."""
        vectors = np.ascontiguousarray(vectors, dtype=np.float32)
        if vectors.ndim != 2 or vectors.shape[1] != self.dim:
            raise ValueError(f"expected (n, {self.dim}) vectors, "
                             f"got {vectors.shape}")
        n_new = vectors.shape[0]
        if n_new == 0:
            return
        if self.pq_storage:
            _pq_append(self, vectors)
            return
        if self.coded_storage:
            _int8_append(self, vectors)
            return
        _padded_append(self, vectors)
        self._codes = None  # int8 scan copy rebuilt lazily on next search
        self._scales = None

    def _update_fn(self, pad_len: int):
        if pad_len not in self._update_fns:
            self._update_fns[pad_len] = jax.jit(
                lambda c, rows, start: jax.lax.dynamic_update_slice(
                    c, rows, (start, 0)),
                donate_argnums=(0,), out_shardings=self._sharding())
        return self._update_fns[pad_len]

    def _scales_sharding(self):
        return NamedSharding(self.mesh, P(AXIS))

    def _place_int8(self, codes: np.ndarray, scales: np.ndarray) -> None:
        n_shards = self.mesh.shape[AXIS]
        n = codes.shape[0]
        rows = _shard_rows(n, n_shards, self.int4_storage)
        pc = np.zeros((rows * n_shards, self._code_dim), np.int8)
        pc[:n] = codes
        ps = np.full((rows * n_shards,), 1e-12, np.float32)
        ps[:n] = scales
        self._codes = jax.device_put(pc, self._sharding())
        self._scales = jax.device_put(ps, self._scales_sharding())

    def _update_int8_fn(self, pad_len: int):
        key = ("int8", pad_len)
        if key not in self._update_fns:
            self._update_fns[key] = jax.jit(
                lambda c, s, uc, us, start: (
                    jax.lax.dynamic_update_slice(c, uc, (start, 0)),
                    jax.lax.dynamic_update_slice(s, us, (start,))),
                donate_argnums=(0, 1),
                out_shardings=(self._sharding(),
                               self._scales_sharding()))
        return self._update_fns[key]

    def _place_pq(self, codes: np.ndarray) -> None:
        from clipx.search.pq import pair_rows_host

        n_shards = self.mesh.shape[AXIS]
        rows = _shard_rows(codes.shape[0], n_shards, pq=True)
        pc = np.zeros((rows * n_shards, self._code_dim), np.int8)
        pc[: codes.shape[0]] = codes
        # lane-paired physical layout (pq.pack_factor); per-shard rows
        # stay pf-aligned (_shard_rows is 128-multiple)
        self._codes = jax.device_put(pair_rows_host(pc),
                                     self._sharding())

    def _update_pq_fn(self, pad_len: int):
        key = ("pq", pad_len)
        if key not in self._update_fns:
            self._update_fns[key] = jax.jit(
                lambda c, uc, start: jax.lax.dynamic_update_slice(
                    c, uc, (start, 0)),
                donate_argnums=(0,), out_shardings=self._sharding())
        return self._update_fns[key]

    def _grow(self, need: int) -> None:
        """Re-pad to a geometric row bucket (like the single-device
        index) entirely on device: the old padded array is copied into
        the front of the larger one, so valid rows keep their global
        ids while GSPMD reshuffles rows across shards over ICI — no
        host round-trip of the corpus."""
        n_shards = self.mesh.shape[AXIS]
        rows = _shard_rows(_bucket_rows(need), n_shards, self.int4_storage,
                           self.pq_storage)
        new_cap = rows * n_shards
        dim, dtype, sharding = self.dim, self.dtype, self._sharding()

        if self.pq_storage:
            from clipx.search.pq import pack_factor

            pf = pack_factor(self._code_dim)
            cdim_phys = self._code_dim * pf

            @functools.partial(jax.jit, out_shardings=sharding)
            def regrowp(c):
                nc = jnp.zeros((new_cap // pf, cdim_phys), jnp.int8)
                return jax.lax.dynamic_update_slice(nc, c, (0, 0))

            self._codes = regrowp(self._codes)
            self._search_fns = {}
            self._update_fns = {}
            return

        if self.coded_storage:
            cdim = self._code_dim

            @functools.partial(
                jax.jit, out_shardings=(sharding,
                                        self._scales_sharding()))
            def regrow8(c, s):
                nc = jnp.zeros((new_cap, cdim), jnp.int8)
                ns = jnp.full((new_cap,), 1e-12, jnp.float32)
                return (jax.lax.dynamic_update_slice(nc, c, (0, 0)),
                        jax.lax.dynamic_update_slice(ns, s, (0,)))

            self._codes, self._scales = regrow8(self._codes, self._scales)
            self._search_fns = {}
            self._update_fns = {}
            return

        @functools.partial(jax.jit, out_shardings=sharding)
        def regrow(old):
            # no donation: old (smaller) can't alias new, and the old
            # buffer frees by refcount right after the call anyway
            new = jnp.zeros((new_cap, dim), dtype)
            return jax.lax.dynamic_update_slice(new, old, (0, 0))

        self._corpus = regrow(self._corpus)
        self._search_fns = {}   # per-shard row count changed
        self._update_fns = {}
        self._codes = None
        self._scales = None

    def _compiled(self, k: int, merge_k: int):
        key = (k, merge_k, self.quantized, self.int8_storage,
               self.int4_storage, self.pq_storage)
        if key not in self._search_fns:
            # outputs are replicated by construction (every shard computes
            # the same merge after the all_gather); the static vma checker
            # can't see that through axis_index, hence check_vma=False
            if self.pq_storage:
                fn = functools.partial(_local_topk_kernel_pq, k=k,
                                       merge_k=merge_k)
                in_specs = (P(AXIS, None), P(None, None, None),
                            P(None, None), P())
            elif self.coded_storage:
                fn = functools.partial(
                    (_local_topk_kernel_int4_pure if self.int4_storage
                     else _local_topk_kernel_int8_pure),
                    k=k, merge_k=merge_k)
                in_specs = (P(AXIS, None), P(AXIS), P(None, None), P())
            elif self.quantized:
                fn = functools.partial(_local_topk_kernel_int8, k=k,
                                       merge_k=merge_k)
                in_specs = (P(AXIS, None), P(AXIS), P(AXIS, None),
                            P(None, None), P())
            else:
                fn = functools.partial(_local_topk_kernel, k=k,
                                       merge_k=merge_k)
                in_specs = (P(AXIS, None), P(None, None), P())
            smapped = jax.shard_map(
                fn, mesh=self.mesh, in_specs=in_specs,
                out_specs=(P(None, None), P(None, None)),
                check_vma=False)
            self._search_fns[key] = jax.jit(smapped)
        return self._search_fns[key]

    def _ensure_codes(self):
        if self.coded_storage:
            return  # the codes ARE the corpus
        if self._codes is None:
            if self.dtype not in (jnp.float32, jnp.bfloat16):
                raise ValueError("quantized sharded search requires a "
                                 "float corpus (dtype f32 or bf16), got "
                                 f"{jnp.dtype(self.dtype).name}")
            codes, scales = _quantize_device(self._corpus)
            spec = NamedSharding(self.mesh, P(AXIS, None))
            self._codes = jax.lax.with_sharding_constraint(codes, spec)
            self._scales = jax.lax.with_sharding_constraint(
                scales, NamedSharding(self.mesh, P(AXIS)))

    def shape_key(self, k: int, nprobe=None) -> tuple:
        """Compiled-shape family of a k-row search (see
        engine.VectorIndex.shape_key — same contract, k bucket only)."""
        from clipx.search.engine import _bucket_k, clamp_k

        return (_bucket_k(clamp_k(k)),)

    def search(self, queries: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """faiss-shaped (D, I): (Q, k) scores desc + int64 global ids,
        -1 beyond ntotal — identical contract to the single-device
        VectorIndex so the CLI can swap either in."""
        queries = np.ascontiguousarray(np.atleast_2d(queries), np.float32)
        if queries.shape[1] != self.dim:
            raise ValueError(
                f"query dim {queries.shape[1]} != index dim {self.dim} "
                "(is --model the one this index was built with?)")
        k = clamp_k(k)
        if self.ntotal == 0:
            return (np.full((queries.shape[0], k), -np.inf, np.float32),
                    np.full((queries.shape[0], k), -1, np.int64))
        # the same per-call query cap as VectorIndex.search: the two-stage
        # top-k sorts (Q*chunks, chunk) scratch per shard, so unbounded Q
        # has the identical OOM failure mode, just divided by n_shards
        if queries.shape[0] > _MAX_Q:
            parts = [self.search(queries[i: i + _MAX_Q], k)
                     for i in range(0, queries.shape[0], _MAX_Q)]
            return (np.concatenate([p[0] for p in parts]),
                    np.concatenate([p[1] for p in parts]))
        queries = rotate_rows(queries, self._rot)  # match rotated codes
        queries, nq = _pad_q(queries)  # Q buckets: one compile per
        n_shards = self.mesh.shape[AXIS]  # power-of-two fill, not per N
        cap = (self._codes if self.coded_storage else self._corpus).shape[0]
        if self.pq_storage:
            from clipx.search.pq import pack_factor

            cap *= pack_factor(self._code_dim)  # lane-paired rows
        rows_per_shard = cap // n_shards
        kk = min(_bucket_k(k), rows_per_shard)
        # merge over the gathered n_shards * kk pool, not just kk: when
        # k > rows_per_shard every shard still contributes its full top
        # list, so all valid rows are returned (single-device parity)
        merge_k = min(_bucket_k(k), n_shards * kk)
        if self.pq_storage:
            d, i = self._compiled(kk, merge_k)(
                self._codes, self._pq.device(),
                jnp.asarray(queries, jnp.float32), jnp.int32(self.ntotal))
        elif self.coded_storage:
            d, i = self._compiled(kk, merge_k)(
                self._codes, self._scales,
                jnp.asarray(queries, jnp.float32), jnp.int32(self.ntotal))
        elif self.quantized:
            self._ensure_codes()
            d, i = self._compiled(kk, merge_k)(
                self._codes, self._scales, self._corpus,
                jnp.asarray(queries, jnp.float32), jnp.int32(self.ntotal))
        else:
            d, i = self._compiled(kk, merge_k)(
                self._corpus,
                jnp.asarray(queries, self.dtype),
                jnp.int32(self.ntotal))
        d = np.asarray(d[:nq, :k], np.float32)
        i = np.asarray(i[:nq, :k], np.int64)
        if self._center is not None:
            # centered codes scored the residual only (per-query
            # constant shift — ranking unchanged); add the exact
            # q·mean term for faithful scores (engine.search notes)
            d = d + (queries[:nq] @ self._center)[:, None]
        i[~np.isfinite(d)] = -1
        # pad out if k exceeded the per-shard cap
        if d.shape[1] < k:
            pad = k - d.shape[1]
            d = np.pad(d, ((0, 0), (0, pad)), constant_values=-np.inf)
            i = np.pad(i, ((0, 0), (0, pad)), constant_values=-1)
        return d, i
