"""HTTP serving layer: the query engine as a JSON API.

The reference is REPL-only; production deployments need a long-lived
process that owns the device-resident index and model and answers
queries over HTTP. Stdlib-only (http.server with a thread pool), because
the work happens on the TPU and the host side is just (de)serialization.

Endpoints (all JSON):

    GET  /healthz                          -> {"status": "ok", ...}
    GET  /metrics                          -> counters, latency, uptime
    GET  /search?q=TEXT&k=K[&offset=N]     -> ranked text-query results
    GET  /similar?id=ID&k=K[&offset=N]     -> image-similarity by stored id
    POST /encode_text   {"texts": [...]}   -> embeddings
    POST /encode_image  {"images_b64": [...]} -> embeddings (<=64/request;
                                              same decode+preprocess path
                                              as the indexer)
    POST /search_image  {"image_b64": "...", "k": K} -> search by a NEW
                                              image (the REPL's `i ID`
                                              only reaches indexed ids)
    POST /search_vector {"vector": [...], "k": K}
    POST /reload                           -> swap in the rebuilt on-disk
                                              index without a restart

Results mirror the REPL's rows: score, id, path — but rank 0 is NOT
skipped here (the REPL's rank-0 skip is a display quirk preserved in the
CLI, reference:query-index.py:114-116; an API returns the true ranking
and lets clients decide).

Concurrent single-row searches are coalesced into one batched device
call by a dispatcher thread (per-call search cost is ~flat up to Q=16,
so this multiplies throughput under load at ~zero idle cost; disable or
resize with CLIPX_SERVE_COALESCE, counters under /metrics "coalesce").

    python -m clipx.serve --port 8765 --model ViT-B/32 \
        --checkpoint vit_b32.npz
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

from clipx.cli import common
from clipx.store.kv import open_env


class _Pending:
    """One enqueued item awaiting a coalescing dispatcher."""

    __slots__ = ("item", "done", "result", "error")

    def __init__(self, item):
        self.item = item
        self.done = threading.Event()
        self.result = self.error = None


class _Coalescer:
    """Batch concurrent single-item device calls into one batched call.

    ``run_batch(items) -> [result, ...]`` does the actual device work.
    Batches are PIPELINED through a bounded pool of ``inflight`` workers:
    on a tunnel-attached chip a batch's host sync costs a full RTT, so a
    serial dispatcher measured 3x SLOWER than no coalescing at all (67
    vs 188 qps at 16 clients), while overlapped batches keep the RTT
    pipeline full AND present big batches to the device. The dispatcher
    acquires its in-flight slot BEFORE dequeuing, so while every slot
    is busy the queue accumulates and batches fill toward ``cap`` —
    load-adaptive batching for free.
    """

    def __init__(self, run_batch, cap: int, inflight: int,
                 name: str = "coalesce"):
        from concurrent.futures import ThreadPoolExecutor

        self._run = run_batch
        self.cap = cap
        self.inflight = inflight
        self._queue = []
        self._cv = threading.Condition()
        self._stop = False
        self._stats_lock = threading.Lock()
        self.batches = 0
        self.queries = 0
        self._pool = ThreadPoolExecutor(
            max_workers=inflight, thread_name_prefix=f"clipx-{name}")
        self._slots = threading.Semaphore(inflight)
        self._thread = threading.Thread(
            target=self._loop, daemon=True, name=f"clipx-{name}-dispatch")
        self._thread.start()

    def submit(self, item):
        """Enqueue one item; block until its batch lands; return its
        result (or raise the batch's error)."""
        p = _Pending(item)
        with self._cv:
            if self._stop:
                stopped = True
            else:
                self._queue.append(p)
                self._cv.notify_all()
                stopped = False
        if stopped:
            # dispatcher is gone (close() raced this submit): an enqueued
            # item would never drain, blocking the caller for the full
            # timeout — run the item inline instead
            return self._run([item])[0]
        if not p.done.wait(timeout=600.0):
            raise RuntimeError("coalesced call timed out")
        if p.error is not None:
            raise p.error
        return p.result

    def close(self) -> None:
        """Stop the dispatcher (drains queued items first)."""
        with self._cv:
            self._stop = True
            self._cv.notify_all()
        self._thread.join(timeout=10)
        self._pool.shutdown(wait=True)

    def stats(self) -> dict:
        with self._stats_lock:
            return {"batches": self.batches, "queries": self.queries,
                    "cap": self.cap, "inflight": self.inflight}

    def _loop(self) -> None:
        while True:
            with self._cv:
                while not self._queue and not self._stop:
                    self._cv.wait()
                if not self._queue:  # stop requested and drained
                    return
            # Acquire the in-flight slot BEFORE dequeuing: while every
            # slot is busy the queue keeps accumulating, so the batch
            # sliced after the acquire is as full as the backlog allows.
            # Dequeue-then-block would trap early queries in a local
            # while later ones overtake.
            self._slots.acquire()
            with self._cv:
                batch = self._queue[: self.cap]
                del self._queue[: self.cap]
            if not batch:       # raced with another drain
                self._slots.release()
                continue
            self._pool.submit(self._run_one, batch)

    def _run_one(self, batch) -> None:
        try:
            try:
                results = self._run([p.item for p in batch])
            except Exception as exc:  # noqa: BLE001 — fail the whole batch
                for p in batch:
                    p.error = exc
                    p.done.set()
                return
            with self._stats_lock:
                self.batches += 1
                self.queries += len(batch)
            for p, r in zip(batch, results):
                p.result = r
                p.done.set()
        finally:
            self._slots.release()


class ColdShapeError(RuntimeError):
    """A request needs a device shape warmup hasn't compiled yet.

    First-ever compiles of a new Q/text/image bucket take minutes
    through the remote compile service (SERVING_r03.json measured
    139.7 s per new Q shape, p99 15.7 s end-to-end while buckets were
    cold) — a client should get an immediate 503 + Retry-After and try
    again, not silently queue behind a compile."""

    def __init__(self, family: str, retry_after: int):
        super().__init__(
            f"warming up: {family} shapes are still compiling; "
            f"retry in ~{retry_after}s")
        self.family = family
        self.retry_after = retry_after


class _WarmGate:
    """Tracks compiled device shapes at two granularities.

    FAMILY phase (text / search / image): while warmup is still
    compiling a family's baseline shapes, every request in that family
    503s instead of stalling minutes behind the compile; the warmup
    thread completes each family as it finishes (and all of them on
    exit, so a failed best-effort warmup can never brick serving).

    SHAPE KEYS (``keep_armed``, the default): warmup also records each
    exact compiled shape family (text bucket, image bucket, search
    (kk, P) — index.shape_key). POST-warmup, a request mapping to a
    never-compiled key 503s + Retry-After while the service compiles it
    OFF-thread (SearchService._bg_compile), then passes. Round-4's
    guard disarmed entirely at warmup exit, so any post-warmup novel
    shape (k=17, a fresh nprobe, an odd image batch) stalled a live
    request for up to minutes (SERVING_r04 run 2: p99 11.2 s; fresh
    shapes run 25-33 min through the remote compile service).
    $CLIPX_SERVE_COLD_GUARD: 'on' (both layers), 'warmup' (round-4
    behavior — family phase only, disarm at exit), 'off' (no gate)."""

    FAMILIES = ("text", "search", "image")

    def __init__(self, retry_after: int, keep_armed: bool = True):
        self.retry_after = retry_after
        self.keep_armed = keep_armed
        self._ready = set()
        self._keys = set()
        self._lock = threading.Lock()

    def mark(self, family: str) -> None:
        with self._lock:
            self._ready.add(family)

    def mark_all(self) -> None:
        with self._lock:
            self._ready.update(self.FAMILIES)

    def ready(self, family: str) -> bool:
        with self._lock:
            return family in self._ready

    def all_ready(self) -> bool:
        with self._lock:
            return set(self.FAMILIES) <= self._ready

    def mark_key(self, key: tuple) -> None:
        with self._lock:
            self._keys.add(key)

    def key_ready(self, key: tuple) -> bool:
        with self._lock:
            return key in self._keys


class SearchService:
    """Owns env + index + (lazy) encoder; thread-safe search calls."""

    def __init__(self, args):
        from clipx.search.engine import content_hash, read_index_vectors

        self.args = args
        self.env = open_env(args.db, map_size=common.DEFAULT_MAP_SIZE,
                            max_dbs=4)
        self.idx_db = self.env.open_db(common.IDX_DB)
        self.fn_db = self.env.open_db(common.FN_DB)
        # same index selection as the query REPL: honors --sharded
        # (corpus row-sharded over every visible chip) and --search-mode.
        # Coded tiers boot from the <index>.codes sidecar when fresh
        # (no f32 read at all — the file records the full content hash,
        # which seeds the incremental-/reload fingerprint); otherwise
        # the sidecar is read here (not via load_index) so the content
        # fingerprint comes for free.
        self.index = None
        coded = common.load_coded_index(args)
        if coded is not None:
            ch = getattr(coded, "_boot_content_hash", None)
            if ch is None:
                from clipx.search import codes_io

                ch = codes_io.sidecar_full_hash(args.index)
            if ch is not None or not os.path.exists(args.index):
                # hash may be None only on a codes-only boot (sidecar
                # dropped) with a pre-round-5 hashless codes file —
                # incremental reload is unavailable there regardless
                self.index = coded
                self._sidecar_hash = ch
                self._sidecar_n = coded.ntotal
        if self.index is None:
            vectors = read_index_vectors(args.index)
            self._sidecar_hash = content_hash(vectors)
            self._sidecar_n = vectors.shape[0]
            self.index = common.build_index_from_vectors(vectors, args)
            del vectors
        self._reload_lock = threading.Lock()
        # cleared while reload mutates device state (drop-first rebuild,
        # or an in-place donated add) — see reload()
        self._index_ready = threading.Event()
        self._index_ready.set()
        # reader count: searches register so reload's in-place add never
        # donates the corpus buffer out from under a concurrent dispatch
        self._readers = 0
        self._readers_cv = threading.Condition()
        self._encoder = None
        # separate locks: the encoder build holds _enc_lock for a full
        # model load + compile (tens of seconds on a tunneled TPU) and
        # must never block counters//similar//metrics, which only need
        # the cheap _stats_lock
        self._enc_lock = threading.Lock()
        self._stats_lock = threading.Lock()
        self.counters = {"search": 0, "similar": 0, "encode_text": 0,
                         "encode_image": 0, "search_image": 0,
                         "search_vector": 0, "errors": 0, "reloads": 0}
        self._latency_sum = 0.0
        self._latency_n = 0
        self.started = time.time()
        # Coalesce concurrent single-item device calls into batched
        # ones: per-call search cost at 1M x 512 is ~flat up to Q=16
        # (the query-batching ablation, docs/ARCHITECTURE.md), and text
        # encode is bucketed, so batching concurrent HTTP requests
        # multiplies serving throughput under load at ~zero idle cost.
        # CLIPX_SERVE_COALESCE sets the batch cap (default 16, the
        # measured knee); 0/1 disables both coalescers. See _Coalescer
        # for why batches are pipelined (CLIPX_SERVE_INFLIGHT).
        cap = int(os.environ.get("CLIPX_SERVE_COALESCE", "16"))
        cap = cap if cap >= 2 else 0
        inflight = max(1, int(os.environ.get("CLIPX_SERVE_INFLIGHT", "4")))
        self._search_co = self._text_co = None
        if cap:
            self._search_co = _Coalescer(
                self._search_batch, cap, inflight, name="search")
            self._text_co = _Coalescer(
                self._encode_batch, cap, inflight, name="text")
        # attached by make_server when --warmup is on (see _WarmGate)
        self._warm_gate: Optional[_WarmGate] = None
        # off-thread novel-shape compiles (deduped by shape key)
        self._bg_lock = threading.Lock()
        self._bg_pending = set()

    def _require_warm(self, family: str, key: tuple = None,
                      spec=None) -> None:
        """Two-layer cold-shape gate (see _WarmGate): family phase
        during warmup; per-shape-key forever after. A post-warmup novel
        key starts an off-thread compile and 503s until it lands."""
        g = self._warm_gate
        if g is None:
            return
        if not g.ready(family):
            raise ColdShapeError(family, g.retry_after)
        if (key is None or not g.keep_armed or g.key_ready(key)):
            return
        self._bg_compile(family, key, spec)
        raise ColdShapeError(f"{family} shape {key}", g.retry_after)

    # -- off-thread shape compiles + the warmup manifest --------------------

    def _bg_compile(self, family: str, key: tuple, spec) -> None:
        """Compile a novel shape family off the request path. One
        thread per distinct key (deduped); on completion — success OR
        failure — the key is marked ready, so the worst case degrades
        to the documented lazy inline compile instead of 503-forever."""
        with self._bg_lock:
            if key in self._bg_pending:
                return
            self._bg_pending.add(key)
        t = threading.Thread(target=self._bg_compile_run,
                             args=(family, key, spec), daemon=True,
                             name=f"clipx-bgcompile-{family}")
        t.start()

    def _bg_compile_run(self, family: str, key: tuple, spec) -> None:
        try:
            if family == "search":
                rows, nprobe = spec
                cap = min(self._search_co.cap
                          if self._search_co is not None else 1, 16)
                self._begin_read(timeout=1200.0)
                try:
                    idx = self.current_index()
                    kw = ({"nprobe": nprobe}
                          if nprobe is not None
                          and getattr(idx, "supports_nprobe", False)
                          else {})
                    q = 1
                    while q <= cap:
                        idx.search(np.zeros((q, idx.dim), np.float32),
                                   rows, **kw)
                        q *= 2
                finally:
                    self._end_read()
            elif family == "text":
                self.encoder().encode_texts(["warmup"] * int(spec))
            else:  # image
                enc = self.encoder()
                zero = np.zeros((int(spec), enc.image_size,
                                 enc.image_size, 3), np.uint8)
                enc.encode_images(zero)
            self.count("bg_compiles")
            self._manifest_add(family, spec)
        except Exception:  # noqa: BLE001 — degrade to lazy inline
            pass
        finally:
            g = self._warm_gate
            if g is not None:
                g.mark_key(key)
            with self._bg_lock:
                self._bg_pending.discard(key)

    def _manifest_path(self) -> str:
        return self.args.index + ".warmup.json"

    def _manifest_entries(self) -> list:
        """Shape families this index/config needed in past runs —
        replayed by warmup so a restart doesn't rediscover them
        serially through live-request 503s (round-4 weakness 6)."""
        try:
            with open(self._manifest_path()) as f:
                data = json.load(f)
            ent = data.get("entries", [])
            return ent if isinstance(ent, list) else []
        except (OSError, ValueError):
            return []

    def _manifest_add(self, family: str, spec) -> None:
        if family == "search":
            entry = {"family": "search", "k": int(spec[0]),
                     "nprobe": spec[1]}
        else:
            entry = {"family": family, "n": int(spec)}
        with self._bg_lock:
            entries = self._manifest_entries()
            if entry in entries:
                return
            entries.append(entry)
            tmp = self._manifest_path() + ".tmp"
            try:
                with open(tmp, "w") as f:
                    json.dump({"model": self.args.model,
                               "entries": entries}, f, indent=1)
                os.replace(tmp, self._manifest_path())
            except OSError:
                pass  # unwritable dir: manifest is best-effort

    def close(self) -> None:
        """Stop the coalescing dispatchers (each drains its queue)."""
        for co in (self._search_co, self._text_co):
            if co is not None:
                co.close()
        self._search_co = self._text_co = None

    def _search_batch(self, items):
        """Coalescer backend: items are (features_row, rows) pairs."""
        feats = np.concatenate([f for f, _ in items], axis=0)
        rows = max(r for _, r in items)
        self._begin_read()
        try:
            D, I = self.current_index().search(feats, rows)
        finally:
            self._end_read()
        return [(D[i: i + 1], I[i: i + 1]) for i in range(len(items))]

    def _encode_batch(self, texts):
        """Coalescer backend: items are raw query strings."""
        emb = self.encoder().encode_texts(list(texts))
        return [emb[i: i + 1] for i in range(len(texts))]

    def encode_texts(self, texts) -> np.ndarray:
        """Text -> embedding rows. Single texts (every /search request)
        ride the text coalescer so concurrent requests share one bucketed
        device call; multi-text callers already amortize and go inline."""
        from clipx.runtime.encoder import _TEXT_BUCKETS, _pick_bucket

        nb = _pick_bucket(min(len(texts), _TEXT_BUCKETS[-1]),
                          _TEXT_BUCKETS)
        self._require_warm("text", key=("text", nb), spec=nb)
        if self._text_co is not None and len(texts) == 1:
            return self._text_co.submit(str(texts[0]))
        return self.encoder().encode_texts([str(t) for t in texts])

    # rows per device encode call: requests chunk to this, so the only
    # image shapes a live request can compile are the {1, _IMG_CHUNK}
    # buckets — both pre-compiled by warmup (any other bucket would pay
    # a first-ever image-tower compile, minutes to ~33 min, mid-request)
    _IMG_CHUNK = 8

    def encode_images_b64(self, images_b64) -> np.ndarray:
        """base64 image bytes -> embedding rows, through the indexer's
        decode+preprocess implementation itself
        (clipx.data.pipeline.decode_bytes_rgb), so a posted copy of an
        indexed file reproduces its stored vector — for indexes built
        with the DEFAULT decode (cv2, no --fast-decode, host
        preprocess); other build modes store vectors from different
        pixels by design, and a posted copy lands within the documented
        preprocess-drift band instead of exactly."""
        import base64

        from clipx.data.pipeline import decode_bytes_rgb

        self._require_warm("image")
        enc = self.encoder()
        if self._warm_gate is not None:
            from clipx.runtime.encoder import _pick_bucket

            n = len(images_b64)
            sizes = {min(self._IMG_CHUNK, n - i)
                     for i in range(0, max(n, 1), self._IMG_CHUNK)}
            for b in sorted({_pick_bucket(s, enc.buckets)
                             for s in sizes}):
                self._require_warm("image", key=("image", b), spec=b)
        out = []
        for i, b in enumerate(images_b64):
            try:
                raw = base64.b64decode(b, validate=True)
                out.append(decode_bytes_rgb(
                    np.frombuffer(raw, np.uint8), enc.image_size))
            except Exception as exc:
                raise ValueError(
                    f"images_b64[{i}]: {type(exc).__name__}: {exc}"
                ) from exc
        batch = np.stack(out)
        step = self._IMG_CHUNK
        return np.concatenate([enc.encode_images(batch[i: i + step])
                               for i in range(0, len(out), step)])

    # encoder is built on first text query (similar queries never need it)
    def encoder(self):
        with self._enc_lock:
            if self._encoder is None:
                self._encoder = common.make_encoder(self.args)
            return self._encoder

    def count(self, key: str) -> None:
        with self._stats_lock:
            self.counters[key] = self.counters.get(key, 0) + 1

    def current_index(self, timeout: float = 300.0):
        """The live index; blocks through a drop-first rebuild window."""
        idx = self.index
        if idx is None:
            self._index_ready.wait(timeout)
            idx = self.index
            if idx is None:
                raise RuntimeError("index is reloading")
        return idx

    def _begin_read(self, timeout: float = 300.0):
        """Register a device-dispatching reader. Readers run
        concurrently; reload excludes them only for the brief mutation
        window (donated in-place add / index swap). The ready-check and
        the count increment are atomic under the condition variable, so
        a reader can never slip in between reload clearing the gate and
        draining the count."""
        deadline = time.time() + timeout
        with self._readers_cv:
            while not self._index_ready.is_set():
                remaining = deadline - time.time()
                if remaining <= 0:
                    raise RuntimeError("index is reloading")
                self._readers_cv.wait(min(remaining, 1.0))
            self._readers += 1

    def _end_read(self):
        with self._readers_cv:
            self._readers -= 1
            self._readers_cv.notify_all()

    def _exclude_readers(self, timeout: float = 300.0):
        """Called with _index_ready cleared: wait for in-flight reader
        dispatches to finish so a donated buffer update can't invalidate
        an array a search is about to use."""
        deadline = time.time() + timeout
        with self._readers_cv:
            while self._readers > 0:
                remaining = deadline - time.time()
                if remaining <= 0:
                    raise RuntimeError("readers did not drain for reload")
                self._readers_cv.wait(remaining)

    def reload(self) -> dict:
        """Swap in the current on-disk index + fold in store updates —
        the serving answer to the reference's 'querying during a rebuild
        gives bad results until restart' (reference:README.md:46-48):
        rebuild with build-index.py, then POST /reload.

        Cheap path: when the new sidecar is the old corpus plus appended
        rows (prefix content-hash match — exactly the case where ids,
        the byte-sorted path ranks, are unchanged), only the delta is
        uploaded via ``index.add``. Otherwise a full rebuild *drops the
        old device index first*: holding both would transiently double
        HBM (~10 GiB at 5M x 512 on a 16 GiB chip); searches wait out
        the brief unavailability window instead of OOMing."""
        from clipx.search.engine import content_hash, read_index_vectors

        with self._reload_lock:
            if not os.path.exists(self.args.index):
                # codes-only deployment (f32 sidecar dropped —
                # tools/kv_tool.py drop-f32): there is nothing to diff a
                # reload against. Explicit 400 instead of a 500 from the
                # missing-file read.
                raise ValueError(
                    "reload unavailable: codes-only deployment (f32 "
                    f"sidecar {self.args.index} absent). Rebuild the "
                    "sidecar with build-index.py, or restart serve "
                    "after replacing the codes file.")
            vectors = read_index_vectors(self.args.index)
            old = self.index
            prev_ntotal = old.ntotal if old is not None else 0
            search_mode = getattr(self.args, "search_mode", "auto")
            incremental = (
                old is not None and hasattr(old, "add")
                and old.ntotal == self._sidecar_n
                and vectors.shape[0] >= self._sidecar_n
                and content_hash(vectors[: self._sidecar_n])
                == self._sidecar_hash)
            if incremental:
                delta = vectors[self._sidecar_n:]
                if delta.shape[0]:
                    # the add DONATES the corpus buffer (no transient
                    # second copy); exclude reader dispatches for the
                    # brief mutation window so none races the donation
                    self._index_ready.clear()
                    try:
                        self._exclude_readers()
                        old.add(delta)
                        # crossing the quant-auto threshold re-arms the
                        # int8 scan
                        common.apply_search_mode(old, search_mode)
                    finally:
                        self._index_ready.set()
                        with self._readers_cv:
                            self._readers_cv.notify_all()
                mode = "incremental"
            else:
                self._index_ready.clear()
                try:
                    # drain in-flight reader dispatches BEFORE dropping
                    # the old corpus: a search holding a reference would
                    # keep it alive in HBM through the new upload — the
                    # transient double-HBM window drop-first exists to
                    # avoid
                    self._exclude_readers()
                    self.index = None
                    del old  # free the device corpus before the upload
                    self.index = common.build_index_from_vectors(
                        vectors, self.args)
                finally:
                    self._index_ready.set()
                    with self._readers_cv:
                        self._readers_cv.notify_all()
                mode = "rebuild"
            self._sidecar_hash = content_hash(vectors)
            self._sidecar_n = vectors.shape[0]
            self.env.refresh()
            self.count("reloads")
            return {"ntotal": self.index.ntotal,
                    "previous_ntotal": prev_ntotal, "mode": mode}

    def _index_info(self, idx) -> Optional[dict]:
        """Operational provenance of the live index: storage tier,
        index class, and whether this process booted from the codes
        sidecar (clipx/search/codes_io.py) — the first things to check
        when capacity or start-time numbers look wrong."""
        if idx is None:
            return None
        tier = ("pq" if getattr(idx, "pq_storage", False)
                else "int4" if getattr(idx, "int4_storage", False)
                else "int8" if getattr(idx, "int8_storage", False)
                else "float")
        info = {"class": type(idx).__name__, "storage": tier,
                "booted_from_codes": getattr(idx, "_boot_content_hash",
                                             None) is not None}
        if getattr(idx, "supports_nprobe", False):
            info["nprobe_default"] = idx.nprobe
            info["residual"] = bool(getattr(idx, "_residual", False))
        return info

    def metrics(self) -> dict:
        idx = self.index  # may be None mid-rebuild; metrics never block
        with self._stats_lock:
            avg = (self._latency_sum / self._latency_n
                   if self._latency_n else None)
            return {
                "uptime_s": round(time.time() - self.started, 1),
                "index": self._index_info(idx),
                "ntotal": idx.ntotal if idx is not None else None,
                "counters": dict(self.counters),
                "search_latency_avg_s": (round(avg, 6)
                                         if avg is not None else None),
                "encoder_loaded": self._encoder is not None,
                "coalesce": (self._search_co.stats()
                             if self._search_co is not None
                             else {"batches": 0, "queries": 0,
                                   "cap": 0, "inflight": 0}),
                "text_coalesce": (self._text_co.stats()
                                  if self._text_co is not None
                                  else {"batches": 0, "queries": 0,
                                        "cap": 0, "inflight": 0}),
            }

    def lookup_path(self, i: int) -> Optional[str]:
        with self.env.begin(db=self.idx_db) as txn:
            raw = txn.get(f"{i}".encode())
        return raw.decode() if raw is not None else None

    def stored_vector(self, image_id: int) -> Optional[np.ndarray]:
        path = self.lookup_path(image_id)
        if path is None:
            return None
        with self.env.begin(db=self.fn_db) as txn:
            raw = txn.get(path.encode())
        if raw is None:
            return None
        return np.frombuffer(raw, dtype=np.float32).reshape(1, -1)

    def search(self, features: np.ndarray, k: int, offset: int = 0,
               nprobe: int = None):
        self._require_warm("search")
        if self._warm_gate is not None:
            idx = self.current_index()
            np_eff = (nprobe if getattr(idx, "supports_nprobe", False)
                      else None)
            self._require_warm(
                "search",
                key=("search",) + tuple(idx.shape_key(k + offset,
                                                      np_eff)),
                spec=(k + offset, np_eff))
        t0 = time.perf_counter()
        features = np.atleast_2d(np.asarray(features))
        # an explicit per-request nprobe only binds under
        # --search-mode ivf; otherwise it's accepted and ignored, like
        # the REPL's `p N` in exact mode (reference:query-index.py:76-79).
        # (flat indexes also HAVE a no-op .nprobe attr, so the marker is
        # an explicit class flag, not hasattr)
        ivf_override = (nprobe is not None
                        and getattr(self.current_index(),
                                    "supports_nprobe", False))
        if (self._search_co is not None and features.shape[0] == 1
                and not ivf_override):
            # single-row queries (every HTTP search) ride the coalescer;
            # multi-row callers already amortize and dispatch inline
            # (nprobe-overriding requests skip it: they can't share a
            # device call with default-probe neighbors)
            D, I = self._search_co.submit(
                (np.ascontiguousarray(features, dtype=np.float32),
                 k + offset))
        else:
            self._begin_read()
            try:
                idx = self.current_index()
                if ivf_override:
                    D, I = idx.search(features, k + offset, nprobe=nprobe)
                else:
                    D, I = idx.search(features, k + offset)
            finally:
                self._end_read()
        dt = time.perf_counter() - t0
        with self._stats_lock:
            self._latency_sum += dt
            self._latency_n += 1
        results = []
        for j in range(offset, min(k + offset, I.shape[1])):
            i = int(I[0][j])
            if i < 0:
                break
            results.append({"rank": j, "score": float(D[0][j]), "id": i,
                            "path": self.lookup_path(i)})
        return {"results": results, "search_time_s": round(dt, 6)}


# Upper bound on accepted POST bodies: the largest legitimate payload
# (a /search_vector query at dim 1024) is a few KB; 8 MB leaves room for
# encode_text batches while keeping a hostile Content-Length from
# ballooning resident memory.
MAX_POST_BYTES = 8 * 1024 * 1024


def _validated_k_offset(k, offset) -> tuple:
    k, offset = int(k), int(offset)
    if k < 1 or k > 1000 or offset < 0:
        raise ValueError("k must be 1..1000, offset >= 0")
    return k, offset


def _validated_nprobe(nprobe):
    """Optional per-request probe knob (the REPL's `p N`,
    reference:query-index.py:76-79): 1..100 or absent."""
    if nprobe is None:
        return None
    nprobe = int(nprobe)
    if nprobe < 1 or nprobe > 100:
        raise ValueError("nprobe must be 1..100")
    return nprobe


class Handler(BaseHTTPRequestHandler):
    service: SearchService = None  # injected by serve()

    # -- plumbing -----------------------------------------------------------
    def log_message(self, fmt, *fmt_args):  # quiet by default
        if os.environ.get("CLIPX_SERVE_VERBOSE"):
            super().log_message(fmt, *fmt_args)

    def _json(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _bad(self, msg: str, code: int = 400) -> None:
        self.service.count("errors")
        self._json(code, {"error": msg})

    def _cold(self, exc: "ColdShapeError") -> None:
        """503 + Retry-After while warmup compiles the needed shape
        family — not counted as an error (the client is told exactly
        when to come back)."""
        self.service.count("cold_rejects")
        body = json.dumps({"error": str(exc),
                           "warming": exc.family,
                           "retry_after_s": exc.retry_after}).encode()
        self.send_response(503)
        self.send_header("Content-Type", "application/json")
        self.send_header("Retry-After", str(exc.retry_after))
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    # -- GET ----------------------------------------------------------------
    def do_GET(self):
        url = urlparse(self.path)
        q = {k: v[0] for k, v in parse_qs(url.query).items()}
        try:
            if url.path == "/healthz":
                # never block: a full-rebuild /reload window (minutes of
                # H2D through the tunnel) must not hang LB health probes
                # into killing the process (and the chip claim with it)
                idx = self.service.index
                gate = self.service._warm_gate
                warm = gate is None or gate.all_ready()
                if idx is None:
                    self._json(503, {"status": "reloading",
                                     "ntotal": None, "dim": None,
                                     "warm": warm})
                else:
                    self._json(200, {"status": "ok",
                                     "ntotal": idx.ntotal,
                                     "dim": idx.dim,
                                     "warm": warm})
            elif url.path == "/metrics":
                self._json(200, self.service.metrics())
            elif url.path == "/search":
                text = q.get("q", "")
                if not text:
                    return self._bad("missing q parameter")
                k, offset = _validated_k_offset(q.get("k", "50"),
                                                q.get("offset", "0"))
                nprobe = _validated_nprobe(q.get("nprobe"))
                self.service.count("search")
                feats = self.service.encode_texts([text])
                self._json(200, self.service.search(feats, k, offset,
                                                    nprobe=nprobe))
            elif url.path == "/similar":
                image_id = int(q.get("id", "-1"))
                vec = self.service.stored_vector(image_id)
                if vec is None:
                    return self._bad(f"id {image_id} not found", 404)
                k, offset = _validated_k_offset(q.get("k", "50"),
                                                q.get("offset", "0"))
                nprobe = _validated_nprobe(q.get("nprobe"))
                self.service.count("similar")
                self._json(200, self.service.search(vec, k, offset,
                                                    nprobe=nprobe))
            else:
                self._bad("unknown endpoint", 404)
        except ColdShapeError as exc:
            self._cold(exc)
        except ValueError as exc:
            self._bad(f"bad parameter: {exc}")
        except Exception as exc:  # noqa: BLE001 — serve errors as JSON
            self._bad(f"{type(exc).__name__}: {exc}", 500)

    # -- POST ---------------------------------------------------------------
    def do_POST(self):
        url = urlparse(self.path)
        try:
            length = int(self.headers.get("Content-Length", "0"))
            if length < 0:
                return self._bad("bad Content-Length")
            if length > MAX_POST_BYTES:
                # don't trust Content-Length into a read(): a hostile
                # multi-GB body must never land in RAM
                return self._bad(
                    f"body exceeds {MAX_POST_BYTES} bytes", 413)
            payload = json.loads(self.rfile.read(length) or b"{}")
            if url.path == "/encode_text":
                texts = payload.get("texts")
                if not isinstance(texts, list) or not texts:
                    return self._bad("texts must be a non-empty list")
                self.service.count("encode_text")
                emb = self.service.encode_texts(texts)
                self._json(200, {"embeddings": emb.tolist()})
            elif url.path == "/search_vector":
                vec = payload.get("vector")
                k, _ = _validated_k_offset(payload.get("k", 50), 0)
                nprobe = _validated_nprobe(payload.get("nprobe"))
                arr = np.asarray(vec, dtype=np.float32).reshape(1, -1)
                dim = self.service.current_index().dim
                if arr.shape[1] != dim:
                    return self._bad(f"vector must have dim {dim}")
                self.service.count("search_vector")
                self._json(200, self.service.search(arr, k, nprobe=nprobe))
            elif url.path == "/encode_image":
                images = payload.get("images_b64")
                if (not isinstance(images, list) or not images
                        or not all(isinstance(t, str) for t in images)):
                    return self._bad("images_b64 must be a non-empty "
                                     "list of base64 strings")
                if len(images) > 64:
                    return self._bad("at most 64 images per request")
                self.service.count("encode_image")
                emb = self.service.encode_images_b64(images)
                self._json(200, {"embeddings": emb.tolist()})
            elif url.path == "/search_image":
                image = payload.get("image_b64")
                if not isinstance(image, str) or not image:
                    return self._bad("image_b64 must be a base64 string")
                k, _ = _validated_k_offset(payload.get("k", 50), 0)
                nprobe = _validated_nprobe(payload.get("nprobe"))
                self.service.count("search_image")
                feats = self.service.encode_images_b64([image])
                self._json(200, self.service.search(feats, k,
                                                    nprobe=nprobe))
            elif url.path == "/reload":
                self._json(200, self.service.reload())
            else:
                self._bad("unknown endpoint", 404)
        except ColdShapeError as exc:
            self._cold(exc)
        except (json.JSONDecodeError, TypeError, ValueError) as exc:
            self._bad(f"bad request: {exc}")
        except Exception as exc:  # noqa: BLE001
            self._bad(f"{type(exc).__name__}: {exc}", 500)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="clipx-serve")
    common.add_model_flags(p)
    common.add_sharded_flag(p, "row-shard the corpus")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8765)
    p.add_argument("--warmup", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="build the encoder and compile the single-text "
                        "shape in the background at startup, so the "
                        "first /search doesn't pay the model compile "
                        "(minutes on a cold tunnel-attached TPU)")
    return p


class _Server(ThreadingHTTPServer):
    # socketserver's default listen backlog of 5 drops connections under
    # a concurrent burst (the kernel RSTs the overflow) — exactly the
    # load the query coalescer is built for; 128 rides out bursts.
    request_queue_size = 128


def make_server(args) -> ThreadingHTTPServer:
    service = SearchService(args)
    handler = type("BoundHandler", (Handler,), {"service": service})
    server = _Server((args.host, args.port), handler)
    if getattr(args, "warmup", False):
        # background: /healthz and /similar answer immediately while the
        # model loads + the N=1 text bucket compiles
        stop_warm = threading.Event()
        # cold-shape guard: while warmup compiles a shape family,
        # requests needing it answer 503 + Retry-After instead of
        # stalling minutes behind the compile (SERVING_r03.json p99
        # 15.7 s from cold buckets). CLIPX_SERVE_COLD_GUARD=off keeps
        # the old queue-behind-compile behavior.
        guard_mode = os.environ.get("CLIPX_SERVE_COLD_GUARD",
                                    "on").lower()
        if guard_mode != "off":
            service._warm_gate = _WarmGate(
                retry_after=max(1, int(
                    os.environ.get("CLIPX_SERVE_RETRY_AFTER", "30"))),
                keep_armed=guard_mode != "warmup")

        def _mark_warm(family):
            if service._warm_gate is not None:
                service._warm_gate.mark(family)

        def _mark_key(key):
            if service._warm_gate is not None:
                service._warm_gate.mark_key(key)

        # shapes this index/config needed in PAST runs (discovered
        # post-warmup via the 503 + off-thread-compile path): replay
        # them here so a restart pre-warms them instead of serially
        # rediscovering each through a client retry loop
        manifest = service._manifest_entries()

        def _warm():
            try:
                # compile every TEXT bucket the text coalescer can emit,
                # not just N=1: fills 1..cap pad to _TEXT_BUCKETS
                # {1,4,16}, and each first-ever shape is minutes on a
                # tunnel-attached TPU — same cliff as the search Q
                # buckets below
                enc = service.encoder()
                tcap = (service._text_co.cap
                        if service._text_co is not None else 1)
                from clipx.runtime.encoder import _TEXT_BUCKETS
                tns = [n for n in _TEXT_BUCKETS if n <= tcap]
                tns += [int(e["n"]) for e in manifest
                        if e.get("family") == "text"
                        and int(e.get("n", 0)) in _TEXT_BUCKETS
                        and int(e["n"]) not in tns]
                for n in tns:
                    if stop_warm.is_set():
                        break
                    enc.encode_texts(["warmup"] * n)
                    service.count("warmup_text_shapes")
                    _mark_key(("text", n))
                _mark_warm("text")
            except Exception:  # noqa: BLE001 — warmup is best-effort
                pass
            # pre-compile every search Q bucket the coalescer can emit
            # (engine pads fills to power-of-two buckets; first compile
            # of a new shape is minutes on a tunnel-attached TPU —
            # SERVING_r03.json measured 139.7 s — so eat them all here
            # instead of inside live requests). Each k in
            # CLIPX_SERVE_WARMUP_K compiles its own k-BUCKET family
            # (k rounds up to powers of two): the default covers the
            # HTTP default k=50 (bucket 64) and the common small-k
            # bucket 16 — SERVING_r04 measured an 11.2 s p99 when a
            # k=10 burst hit a server warmed only at k=50.
            try:
                cap = min(service._search_co.cap
                          if service._search_co is not None else 1, 16)
                ks = []
                for tok in os.environ.get("CLIPX_SERVE_WARMUP_K",
                                          "50,10").split(","):
                    try:
                        ks.append(max(1, min(int(tok), 1000)))
                    except ValueError:
                        pass
                # (k, nprobe) pairs: env defaults + manifest replays
                pairs = [(k, None) for k in (ks or [50])]
                pairs += [(int(e["k"]), e.get("nprobe"))
                          for e in manifest
                          if e.get("family") == "search"
                          and (int(e["k"]), e.get("nprobe"))
                          not in pairs and 0 < int(e["k"]) <= 16384]
                q = 1
                while q <= cap and not stop_warm.is_set():
                    # register as a reader per bucket (same guard as live
                    # searches): a /reload during this minutes-long loop
                    # must not donate the corpus out from under a warmup
                    # dispatch; re-acquiring the index each round also
                    # avoids pinning a dropped corpus in HBM through a
                    # rebuild
                    service._begin_read(timeout=600.0)
                    try:
                        idx = service.current_index()
                        supports = getattr(idx, "supports_nprobe", False)
                        for k, np_ in pairs:
                            kw = ({"nprobe": np_}
                                  if np_ is not None and supports else {})
                            idx.search(np.zeros((q, idx.dim),
                                                np.float32), k, **kw)
                    finally:
                        service._end_read()
                    del idx
                    service.count("warmup_search_shapes")
                    q *= 2
                # record the exact shape keys just compiled, so the
                # armed gate passes them without a 503 round
                idx = service.current_index()
                supports = getattr(idx, "supports_nprobe", False)
                for k, np_ in pairs:
                    _mark_key(("search",) + tuple(idx.shape_key(
                        k, np_ if supports else None)))
                _mark_warm("search")
            except Exception:  # noqa: BLE001 — warmup is best-effort
                pass
            # pre-compile BOTH image buckets live requests can reach —
            # encode_images_b64 chunks to {1, _IMG_CHUNK} rows — so no
            # /encode_image / /search_image pays the image-tower compile
            # inside a live request (the expensive compile: ViT-B/16
            # measured 33 min on a never-seen shape through the remote
            # service)
            try:
                enc = service.encoder()
                from clipx.runtime.encoder import _pick_bucket
                ins = [1, SearchService._IMG_CHUNK]
                ins += [int(e["n"]) for e in manifest
                        if e.get("family") == "image"
                        and 0 < int(e.get("n", 0)) <= enc.buckets[-1]
                        and int(e["n"]) not in ins]
                for n in ins:
                    if stop_warm.is_set():
                        break
                    zero = np.zeros(
                        (n, enc.image_size, enc.image_size, 3), np.uint8)
                    enc.encode_images(zero)
                    service.count("warmup_image_shapes")
                    _mark_key(("image", _pick_bucket(n, enc.buckets)))
                _mark_warm("image")
            except Exception:  # noqa: BLE001 — warmup is best-effort
                pass
            finally:
                # disarm unconditionally on exit: a failed best-effort
                # warmup (or shutdown stop) must never leave the guard
                # returning 503 forever — past this point requests pay
                # at most the lazy compile the --no-warmup mode
                # documents
                if service._warm_gate is not None:
                    service._warm_gate.mark_all()

        t = threading.Thread(target=_warm, daemon=True,
                             name="clipx-warmup")
        t.start()
        # main()'s shutdown path stops the loop at the next shape
        # boundary and JOINS the in-flight compile/dispatch — exiting
        # underneath it would abandon a live device claim
        server._warmup_stop = stop_warm
        server._warmup_thread = t
    return server


def main(argv=None) -> int:
    args = build_parser().parse_args(argv if argv is not None
                                     else sys.argv[1:])
    if not os.path.exists(args.index):
        from clipx.search import codes_io

        # codes-only deployment (kv_tool.py drop-f32): the codes
        # sidecar alone boots coded tiers
        if not (codes_io.tier_of_name(
                    getattr(args, "corpus_dtype", "f32")) is not None
                and os.path.exists(codes_io.codes_path(args.index))):
            print(f"No index found at {args.index!r} — run "
                  "build-index.py first.")
            return 1
    server = make_server(args)
    service = server.RequestHandlerClass.service
    # `kill PID` (SIGTERM — what a supervisor sends; SIGKILL is banned
    # on this host, an abandoned claim wedges the single-tenant chip)
    # must shut down as cleanly as Ctrl-C. shutdown() has to run OFF
    # the main thread: it waits for serve_forever's loop to exit, and
    # that loop is parked underneath the signal handler's own frame.
    signal.signal(
        signal.SIGTERM,
        lambda *_: threading.Thread(target=server.shutdown,
                                    daemon=True).start())
    print(f"clipx-serve on http://{args.host}:{server.server_address[1]} "
          f"({service.index.ntotal} vectors)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    # stop warmup at its next shape boundary, then wait out any
    # in-flight compile/dispatch — exiting underneath it would abandon
    # a live device claim (wedges the single-tenant chip)
    if getattr(server, "_warmup_stop", None) is not None:
        server._warmup_stop.set()
        server._warmup_thread.join(timeout=600.0)
    service.close()      # drain coalescers: in-flight batches land
    service.env.close()  # waits out live store readers
    print("bye")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
