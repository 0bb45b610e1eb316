"""Shared CLI plumbing: flags, env names, encoder bootstrap.

The reference has no flag system — just edit-the-source constants and
bare argv (SURVEY.md section 5, config). We preserve the bare contract
(``build-index.py DIR/ ...`` and ``query-index.py`` with no args) and add
optional ``--flags`` plus environment variables that never collide with
it.
"""

from __future__ import annotations

import argparse
import os

# Same on-disk names as the reference (reference:build-index.py:22,109)
DEFAULT_DB_PATH = "vectors.lmdb"
DEFAULT_INDEX_PATH = "images.index"
# LMDB map_size in the reference (reference:build-index.py:12); accepted
# and ignored by our store, kept as the documented default.
DEFAULT_MAP_SIZE = 1024 * 1024 * 1024 * 20

FN_DB = b"fn_db"
SKIP_DB = b"skip_db"
IDX_DB = b"idx_db"


def add_model_flags(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--model",
                        default=os.environ.get("CLIPX_MODEL", "ViT-B/32"),
                        help="model preset (ViT-B/32, ViT-B/16, "
                             "ViT-L/14, ViT-L/14@336px, RN50, RN101, "
                             "RN50x4, RN50x16, RN50x64, tiny-test, "
                             "tiny-rn-test)")
    parser.add_argument("--checkpoint",
                        default=os.environ.get("CLIPX_CHECKPOINT"),
                        help="converted .npz params or torch .pt state "
                             "dict; random init when omitted")
    parser.add_argument("--compute",
                        choices=("bf16", "int8"),
                        default=os.environ.get("CLIPX_COMPUTE") or None,
                        help="encode arithmetic: bf16 (default) or int8 "
                             "W8A8 MLP GEMMs on the ViT image tower — "
                             "the MXU runs int8 at 2x the bf16 rate; "
                             "embedding drift is bounded and gated "
                             "(clipx/models/quant.py). Text encode "
                             "stays bf16 either way")
    parser.add_argument("--db", default=os.environ.get("CLIPX_DB",
                                                       DEFAULT_DB_PATH))
    parser.add_argument("--index", default=os.environ.get("CLIPX_INDEX",
                                                          DEFAULT_INDEX_PATH))
    parser.add_argument("--corpus-dtype",
                        choices=("f32", "bf16", "int8", "int4", "pq"),
                        default=os.environ.get("CLIPX_CORPUS_DTYPE", "f32"),
                        help="device storage dtype of the search corpus. "
                             "bf16 halves HBM (roughly doubles the "
                             "vectors one chip can serve) and halves "
                             "exact-scan bytes; scoring still "
                             "accumulates in f32, so ranking drift is "
                             "bounded by bf16 rounding of the stored "
                             "rows (~1e-3 cosine — the same "
                             "near-duplicate regime as the int8 scan "
                             "notes in clipx/search/engine.py). int8 "
                             "stores ONLY per-row-quantized codes "
                             "(1 B/dim, ~5x the f32 capacity); the scan "
                             "is always quantized and candidates "
                             "rescore from dequantized rows in f32 "
                             "(score error ~5e-4); composes with "
                             "--search-mode ivf for probed search at "
                             "the 1 B/dim capacity tier. int4 packs "
                             "two 4-bit codes per byte (0.5 B/dim, "
                             "~10x the f32 capacity) — the faiss-SQ4 "
                             "recall trade (score error ~1e-2, gated "
                             "in tools/eval_quality.py). pq is 4-bit "
                             "product quantization at 1 bit/dim (64 "
                             "B/row for CLIP — ~32x f32, the faiss "
                             "IndexPQ/fast-scan tier; deepest capacity "
                             "rung, largest recall trade — see "
                             "clipx/search/pq.py). The on-disk sidecar "
                             "stays f32 either way")
    parser.add_argument("--search-mode",
                        choices=("exact", "quant", "auto", "ivf"),
                        default=os.environ.get("CLIPX_SEARCH_MODE", "auto"),
                        help="quant: int8 HBM scan + exact f32 rescore "
                             "(~2x faster at 1M vectors; ranking "
                             "identical except inside near-duplicate "
                             "clusters tighter than int8 noise — see "
                             "clipx/search/engine.py); auto enables it "
                             "from 100k vectors. ivf: approximate "
                             "clustered search where the 'p' knob / "
                             "nprobe trades recall for scan fraction "
                             "like the reference's faiss IVF "
                             "(clipx/search/ivf.py)")


# corpus size from which the int8 scan + exact-rescore path wins
QUANT_AUTO_THRESHOLD = 100_000


def load_index(args):
    """Load the vector index per the CLI flags: single-device, or the
    corpus-sharded variant across every visible chip (--sharded /
    $CLIPX_SHARDED; BASELINE.json config 5), with --search-mode applied
    to whichever branch wins. Shared by the query REPL and clipx.serve.

    Coded tiers (--corpus-dtype int8/int4/pq) go through the
    ``<index>.codes`` sidecar (clipx/search/codes_io.py): a fresh codes
    file loads directly — no f32 read, quantization, or PQ training —
    and a missing/stale one is rebuilt from the (memmapped) f32 sidecar
    and persisted for the next start, the faiss write_index/read_index
    lifecycle (reference:build-index.py:109, reference:query-index.py:29)."""
    idx = load_coded_index(args)
    if idx is not None:
        return idx
    from clipx.search.engine import read_index_vectors

    # host read; placed onto devices exactly once in the builder below
    return build_index_from_vectors(read_index_vectors(args.index), args)


def load_coded_index(args):
    """The codes-sidecar load path; None -> caller uses the plain f32
    path (uncoded tier, CLIPX_CODES=off, or an unreadable sidecar).

    A fresh codes file loads directly. With the f32 sidecar ABSENT the
    codes file stands alone (codes-only deployment — the faiss
    read_index property, reference:query-index.py:29): it verifies
    against its own integrity footer and boots, saving the 15x-larger
    f32 on disk; see _load_codes_only for what is lost. Otherwise the
    index is rebuilt from f32 AND the codes persist for the next
    start: flat tiers stream-encode from the memmapped sidecar
    (bounded host RAM at any corpus size); IVF builds through
    from_vectors — the whole build chain streams from the memmap
    (sampled k-means training, chunked assignment/encode/sums; see
    ivf.train_clusters) — and persists the install's own flat-order
    encode (including residual-pq codes, which depend on the cluster
    layout), so nothing is ever encoded twice."""
    from clipx.search import codes_io
    from clipx.search.engine import (content_hash, corpus_rotation,
                                     read_index_vectors,
                                     rotation_enabled)

    dtype = corpus_dtype(args)
    tier = codes_io.tier_of(dtype)
    mode = codes_io.codes_mode()
    if tier is None or mode == "off":
        return None
    if not os.path.exists(args.index):
        if (mode == "on"
                and os.path.exists(codes_io.codes_path(args.index))):
            return _load_codes_only(args, tier)
        return None
    if mode == "on":
        payload = codes_io.load_codes(args.index, tier,
                                      rotated=rotation_enabled())
        if payload is not None:
            idx = build_index_from_codes(payload, args)
            if idx is not None:
                import sys

                print(f"(loaded {payload['ntotal']} {tier} rows from "
                      f"{codes_io.codes_path(args.index)})",
                      file=sys.stderr, flush=True)
                return idx
    search_mode = getattr(args, "search_mode", "auto")
    if search_mode == "ivf":
        from clipx.search import ivf as ivf_mod

        try:
            # memmapped: the whole IVF build chain streams (sampled
            # k-means training, chunked assignment/encode/sums), so a
            # coded capacity-scale layout builds without the corpus in
            # host RAM; the f32/bf16 tiers still materialize their
            # device corpus at install (they fit by definition)
            vectors = read_index_vectors(args.index, mmap=True)
        except (OSError, ValueError):
            return None
        # TOCTOU guard: fingerprint the sidecar NOW, at memmap-open —
        # the build below can take minutes, and a sidecar replaced
        # mid-build must not get old-row codes stamped as fresh
        # (codes_io.CodesWriter re-checks at close)
        fp_at_open = codes_io.sidecar_sample_fp(args.index)
        ivf_mod._STASH_CODES = True
        try:
            idx = build_index_from_vectors(vectors, args)
        finally:
            ivf_mod._STASH_CODES = False
        pending = getattr(idx, "_pending_codes_payload", None)
        if pending is not None:
            try:
                codes_io.write_payload_file(
                    args.index, pending, tier=tier,
                    content_hash=content_hash(vectors),
                    fp_sample=fp_at_open)
            except (OSError, ValueError):
                pass  # unwritable dir / replaced sidecar: serve from
                # RAM this process, no codes cache written
            idx._pending_codes_payload = None
        return idx
    try:
        vectors = read_index_vectors(args.index, mmap=True)
        fp_at_open = codes_io.sidecar_sample_fp(args.index)
        codes_io.write_codes_file(
            args.index, vectors, tier,
            rot=corpus_rotation(vectors.shape[1]),
            content_hash=codes_io.sidecar_full_hash(args.index),
            fp_sample=fp_at_open)
    except (OSError, ValueError):
        return None  # unwritable dir / corrupt or replaced sidecar:
        # old path
    payload = codes_io.load_codes(args.index, tier,
                                  rotated=rotation_enabled())
    if payload is None:
        return None
    return build_index_from_codes(payload, args)


def _load_codes_only(args, tier: str):
    """Codes-only boot: ``<index>.codes`` exists but the f32 sidecar
    does not (deleted to save 15x the disk — tools/kv_tool.py drop-f32,
    or a sidecar-less direct build). The codes file verifies against
    its own integrity footer and becomes the source of truth. Lost
    without the sidecar: staleness detection against newer corpora,
    re-encoding to OTHER tiers/modes, and serve's incremental reload —
    every mismatch below is therefore a hard, explained error instead
    of a silent rebuild fallback."""
    import sys

    from clipx.search import codes_io
    from clipx.search.engine import rotation_enabled

    cpath = codes_io.codes_path(args.index)
    payload = codes_io.load_codes(args.index, tier,
                                  rotated=rotation_enabled(),
                                  orphan=True)
    if payload is None:
        raise SystemExit(
            f"{cpath} failed to load for --corpus-dtype {tier} and the "
            f"f32 sidecar {args.index} is absent, so it cannot be "
            "rebuilt. Causes: integrity-footer mismatch (corrupt "
            "file), a different tier/rotation setting than the file "
            "was built with, or a truncated file. Restore the f32 "
            "sidecar or rebuild the codes file.")
    idx = build_index_from_codes(payload, args, orphan=True)
    print(f"(codes-only boot: loaded {payload['ntotal']} {tier} rows "
          f"from {cpath}; f32 sidecar absent — staleness checks and "
          "incremental reload unavailable)", file=sys.stderr,
          flush=True)
    return idx


def build_index_from_codes(payload, args, orphan: bool = False):
    """Place a loaded codes payload as the flag-selected index type
    (flat / sharded / IVF). None when the IVF composition lacks a v2
    layout cache — the caller's f32 path rebuilds it. ``orphan``
    (codes-only boot — no f32 sidecar, so no rebuild path): every
    None-fallback becomes a hard error naming the fix, except the
    residual-preference rebuild, which degrades with a warning."""
    import jax

    mode = getattr(args, "sharded", "off")
    search_mode = getattr(args, "search_mode", "auto")
    sharded = (mode == "on"
               or (mode == "auto" and len(jax.devices()) > 1))
    if payload.get("residual") and search_mode != "ivf":
        # residual-pq codes only score inside the probe (they need the
        # segment coarse term); a flat request re-encodes from f32 —
        # and overwrites the file, so alternating flat and residual-IVF
        # processes on one index re-encode per start (set
        # CLIPX_PQ_RESIDUAL=off to share one non-residual file)
        if orphan:
            raise SystemExit(
                "this codes file holds RESIDUAL pq codes, which only "
                "score under --search-mode ivf, and the f32 sidecar is "
                "absent so they cannot be re-encoded flat. Pass "
                "--search-mode ivf (the file's .ivf cache must be "
                "present too).")
        return None
    if (payload["tier"] == "pq" and not payload.get("residual")
            and search_mode == "ivf"):
        from clipx.search.pq import pq_residual_enabled

        if pq_residual_enabled():
            # a flat-built (non-residual) codes file must not silently
            # downgrade an IVF deployment to global-codebook encoding:
            # rebuild once as residual (the shipping default, measured
            # +0.07..+0.17 recall@50) and overwrite. Opt out with
            # CLIPX_PQ_RESIDUAL=off to share one non-residual file
            # between flat and IVF processes.
            if orphan:
                import sys

                # no f32 to re-encode from: keep the file's encoding,
                # but say what is being given up
                print("WARNING: codes-only boot with a NON-residual pq "
                      "file under --search-mode ivf — residual "
                      "re-encoding needs the absent f32 sidecar, so "
                      "this deployment keeps global-codebook encoding "
                      "(measured -0.07..-0.17 recall@50 vs residual).",
                      file=sys.stderr, flush=True)
            else:
                return None
    if search_mode == "ivf":
        from clipx.search.ivf import IVFIndex, ShardedIVFIndex

        cls = (ShardedIVFIndex if sharded and payload["ntotal"] > 0
               else IVFIndex)
        idx = cls.from_codes(
            payload,
            getattr(args, "index", DEFAULT_INDEX_PATH) + ".ivf",
            quantized=payload["ntotal"] >= QUANT_AUTO_THRESHOLD)
        if idx is None and orphan:
            raise SystemExit(
                "codes-only IVF boot needs the v2 .ivf layout cache "
                f"({getattr(args, 'index', DEFAULT_INDEX_PATH)}.ivf) "
                "matching this codes file (same corpus content hash"
                + (", same layout digest for residual codes"
                   if payload.get("residual") else "")
                + "); it is missing or stale, and rebuilding it needs "
                "the absent f32 sidecar. Deploy the .ivf cache "
                "alongside the codes file.")
    elif sharded and payload["ntotal"] > 0:
        from clipx.parallel.mips import ShardedVectorIndex

        idx = ShardedVectorIndex.from_codes(payload)
    else:
        from clipx.search.engine import VectorIndex

        idx = VectorIndex.from_codes(payload)
    if idx is not None:
        # serve's incremental-/reload fingerprint, straight from the
        # codes file — saves the boot-time hash pass over the sidecar
        idx._boot_content_hash = payload.get("content_hash")
    return idx


def build_index_from_vectors(vectors, args):
    """Place pre-read host vectors as the flag-selected index type
    (serve reads the sidecar itself so it can fingerprint the prefix
    for incremental reloads)."""
    from clipx.search.engine import VectorIndex

    mode = getattr(args, "sharded", "off")
    search_mode = getattr(args, "search_mode", "auto")
    dtype = corpus_dtype(args)
    import jax

    if search_mode == "ivf":
        from clipx.search.ivf import IVFIndex, ShardedIVFIndex

        cls = IVFIndex
        if (vectors.shape[0] > 0
                and (mode == "on"
                     or (mode == "auto" and len(jax.devices()) > 1))):
            cls = ShardedIVFIndex  # probe knob at pod scale
        return cls.from_vectors(
            vectors,
            quantized=vectors.shape[0] >= QUANT_AUTO_THRESHOLD,
            dtype=dtype,
            cache_path=getattr(args, "index", DEFAULT_INDEX_PATH) + ".ivf")
    if mode == "on" or (mode == "auto" and len(jax.devices()) > 1):
        from clipx.parallel.mips import ShardedVectorIndex

        if vectors.shape[0] > 0:
            sharded = ShardedVectorIndex(vectors, dtype=dtype)
            sharded.nprobe = 32
            # --search-mode applies to both branches: the int8-scan +
            # exact-rescore win must not silently disappear on a pod
            return apply_search_mode(sharded, search_mode)
    return apply_search_mode(VectorIndex.from_vectors(vectors, dtype=dtype),
                             search_mode)


def corpus_dtype(args):
    """Resolve --corpus-dtype / $CLIPX_CORPUS_DTYPE to a jnp dtype."""
    import jax.numpy as jnp

    name = getattr(args, "corpus_dtype",
                   os.environ.get("CLIPX_CORPUS_DTYPE", "f32"))
    table = {"f32": jnp.float32, "bf16": jnp.bfloat16, "int8": jnp.int8,
             "int4": jnp.int4, "pq": "pq"}
    if name not in table:
        raise SystemExit(f"unknown corpus dtype {name!r} "
                         f"(f32, bf16, int8, int4 or pq)")
    return table[name]


def add_sharded_flag(parser: argparse.ArgumentParser, what: str) -> None:
    parser.add_argument("--sharded", choices=("auto", "on", "off"),
                        default=os.environ.get("CLIPX_SHARDED", "auto"),
                        help=f"{what} over all visible devices "
                             "(auto: only when >1 device is visible)")


def apply_search_mode(index, mode: str):
    """Configure an index's scan mode per the --search-mode flag."""
    if (getattr(index, "int8_storage", False)
            or getattr(index, "int4_storage", False)
            or getattr(index, "pq_storage", False)):
        return index  # codes are the corpus: the scan is always quantized
    if hasattr(index, "quantized"):
        if mode == "ivf":
            # IVF quantizes its probed scan past the same threshold
            index.quantized = index.ntotal >= QUANT_AUTO_THRESHOLD
        else:
            index.quantized = (mode == "quant" or
                               (mode == "auto"
                                and index.ntotal >= QUANT_AUTO_THRESHOLD))
    return index


def make_encoder(args, mesh=None):
    import sys

    from clipx.runtime.encoder import Encoder

    enc = Encoder.create(args.model, checkpoint=args.checkpoint, mesh=mesh,
                         compute_quant=getattr(args, "compute", None))
    if args.checkpoint is None and args.model != "tiny-test":
        print("(no checkpoint given — using randomly initialized weights; "
              "pass --checkpoint or set $CLIPX_CHECKPOINT for real "
              "embeddings)")
    elif args.checkpoint and not enc.tokenizer.has_learned_merges:
        # Real weights with the byte-fallback tokenizer produce garbage
        # text embeddings: the weights were trained against the learned
        # BPE merge table (reference:query-index.py:107 — tokenize must
        # match the weights). Image search still works; warn loudly.
        print(
            "WARNING: checkpoint loaded but the BPE merge table "
            "(bpe_simple_vocab_16e6.txt.gz) was not found — TEXT QUERIES "
            "WILL NOT MATCH THESE WEIGHTS. Point $CLIPX_BPE_PATH at the "
            "merge file (ships with OpenAI CLIP) or place it next to "
            "clipx/text/tokenizer.py. Image-similarity ('i ID') queries "
            "are unaffected.",
            file=sys.stderr, flush=True)
    return enc


def encode_mesh(mode: str):
    """Mesh for data-parallel indexing encode per the --sharded flag:
    all visible devices on a 'dp' axis, or None for single-device."""
    import jax

    n = len(jax.devices())
    if mode == "on" or (mode == "auto" and n > 1):
        from clipx.parallel import mesh as mesh_lib

        return mesh_lib.make_mesh({"dp": n})
    return None


