#!/usr/bin/env python3
"""Search/embedding quality evaluation over a built index.

    python tools/eval_quality.py --db vectors.lmdb --index images.index

Reports, using the indexed corpus itself as queries (no labels needed):

- **self-retrieval**: every stored vector must hit its own id at rank 0
  with score ~1 — catches id/vector misalignment end to end.
- **mode agreement**: recall@k of quantized (int8+rescore) and sharded
  search against the exact single-device ranking.
- **preprocess drift** (with --photos): re-encodes a sample of source
  images through the PIL-parity and cv2 host paths and reports cosine
  agreement with the stored embeddings — the tolerance-budget check
  from SURVEY.md section 7.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


RESULTS = {}


def _record(key, **vals):
    RESULTS[key] = {k: (round(v, 4) if isinstance(v, float) else v)
                    for k, v in vals.items()}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--db", default="vectors.lmdb")
    ap.add_argument("--index", default="images.index")
    ap.add_argument("--photos", default=None,
                    help="re-encode a sample from this folder and compare "
                         "against stored embeddings (needs --model to "
                         "match the indexing run)")
    ap.add_argument("--model", default=os.environ.get("CLIPX_MODEL",
                                                      "ViT-B/32"))
    ap.add_argument("--checkpoint",
                    default=os.environ.get("CLIPX_CHECKPOINT"))
    ap.add_argument("--samples", type=int, default=64)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--json", default=None,
                    help="also write every reported number to this "
                         "JSON file (quality artifacts)")
    ap.add_argument("--pq-modes", choices=("default", "both"),
                    default="default",
                    help="pq variants to evaluate: 'default' runs the "
                         "shipping config only (opq=trained, "
                         "residual=on); 'both' adds the round-3 "
                         "baselines (opq=fixed, residual=off) for "
                         "before/after tables — each extra variant "
                         "costs a full train+encode")
    args = ap.parse_args(argv)

    from clipx.search.engine import VectorIndex, read_index

    index = read_index(args.index)
    if index.ntotal == 0:
        print("index is empty")
        return 1
    n = index.ntotal
    rng = np.random.RandomState(0)
    sample = rng.choice(n, size=min(args.samples, n), replace=False)
    queries = np.stack([index.reconstruct(int(i)) for i in sample])

    # self-retrieval
    D, I = index.search(queries, k=1)
    hits = int((I[:, 0] == sample).sum())
    score_ok = int((np.abs(D[:, 0] - 1.0) < 1e-2).sum())
    print(f"self-retrieval: {hits}/{len(sample)} rank-0 hits, "
          f"{score_ok}/{len(sample)} scores ~1.0")
    _record("self_retrieval", hits=hits, n=len(sample),
            scores_ok=score_ok)

    # quantized agreement
    k = min(args.k, n)
    De, Ie = index.search(queries, k=k)
    quant = VectorIndex.from_vectors(index.vectors(), quantized=True)
    Dq, Iq = quant.search(queries, k=k)
    recall = np.mean([len(set(Ie[i]) & set(Iq[i])) / k
                      for i in range(len(sample))])
    top1 = float(np.mean(Ie[:, 0] == Iq[:, 0]))
    print(f"int8+rescore vs exact: recall@{k} {recall:.4f}, "
          f"top-1 agreement {top1:.4f}")
    _record("quant_int8_rescore", recall=float(recall), top1=top1, k=k)

    # bf16 storage agreement (--corpus-dtype bf16, the capacity knob):
    # drift is bounded by bf16 rounding of the stored rows, so recall
    # against the f32-exact ranking is the number operators care about
    import jax.numpy as jnp

    bf16 = VectorIndex.from_vectors(index.vectors(), dtype=jnp.bfloat16,
                                    quantized=True)
    Db, Ib = bf16.search(queries, k=k)
    recall = np.mean([len(set(Ie[i]) & set(Ib[i])) / k
                      for i in range(len(sample))])
    top1 = float(np.mean(Ie[:, 0] == Ib[:, 0]))
    print(f"bf16-corpus int8+rescore vs exact f32: recall@{k} "
          f"{recall:.4f}, top-1 agreement {top1:.4f}")
    _record("bf16_storage", recall=float(recall), top1=top1, k=k)

    # int8 STORAGE (--corpus-dtype int8): codes are the corpus, rescore
    # dequantizes — the ~5x-capacity tier's quality number
    i8 = VectorIndex.from_vectors(index.vectors(), dtype=jnp.int8)
    D8, I8 = i8.search(queries, k=k)
    recall = np.mean([len(set(Ie[i]) & set(I8[i])) / k
                      for i in range(len(sample))])
    top1 = float(np.mean(Ie[:, 0] == I8[:, 0]))
    print(f"int8-storage vs exact f32: recall@{k} {recall:.4f}, "
          f"top-1 agreement {top1:.4f}")
    _record("int8_storage", recall=float(recall), top1=top1, k=k)

    # int4 STORAGE (--corpus-dtype int4): packed 4-bit codes are the
    # corpus — the ~10x-capacity tier. Rounding is 18x coarser than
    # int8 (the faiss-SQ4 trade); this line is the honest recall number
    if index.dim % 2 == 0:
        i4 = VectorIndex.from_vectors(index.vectors(), dtype=jnp.int4)
        D4, I4 = i4.search(queries, k=k)
        recall = np.mean([len(set(Ie[i]) & set(I4[i])) / k
                          for i in range(len(sample))])
        top1 = float(np.mean(Ie[:, 0] == I4[:, 0]))
        print(f"int4-storage vs exact f32: recall@{k} {recall:.4f}, "
              f"top-1 agreement {top1:.4f}")
        _record("int4_storage", recall=float(recall), top1=top1, k=k)

    # pq STORAGE (--corpus-dtype pq): 4-bit product quantization, the
    # deepest capacity rung (2 bits/dim default, 1 bit/dim at
    # CLIPX_PQ_DSUB=4) — the largest recall trade on the ladder, so
    # this line is the one to read before choosing the tier
    if index.dim % 4 == 0:
        # flat pq, both rotation modes: fixed random (round 3) vs
        # trained OPQ (pq.train_opq) — the before/after table
        opq_modes = (("trained",) if args.pq_modes == "default"
                     else ("fixed", "trained"))
        for opq in opq_modes:
            prev = os.environ.get("CLIPX_PQ_OPQ")
            os.environ["CLIPX_PQ_OPQ"] = opq
            try:
                ipq = VectorIndex.from_vectors(index.vectors(),
                                               dtype="pq")
            finally:
                # restore (not pop): the user's exported value must
                # survive this tool run (round-4 ADVICE)
                if prev is None:
                    os.environ.pop("CLIPX_PQ_OPQ", None)
                else:
                    os.environ["CLIPX_PQ_OPQ"] = prev
            Dp, Ip = ipq.search(queries, k=k)
            recall = np.mean([len(set(Ie[i]) & set(Ip[i])) / k
                              for i in range(len(sample))])
            top1 = float(np.mean(Ie[:, 0] == Ip[:, 0]))
            print(f"pq-storage (dsub={ipq._pq.dsub}, opq={opq}) vs "
                  f"exact f32: recall@{k} {recall:.4f}, "
                  f"top-1 agreement {top1:.4f}")
            _record(f"pq_storage_opq_{opq}", recall=float(recall),
                    top1=top1, k=k, dsub=ipq._pq.dsub)

    import jax
    if len(jax.devices()) > 1:
        from clipx.parallel.mips import ShardedVectorIndex

        sharded = ShardedVectorIndex(index.vectors())
        Ds, Is = sharded.search(queries, k=k)
        recall = np.mean([len(set(Ie[i]) & set(Is[i])) / k
                          for i in range(len(sample))])
        print(f"sharded vs exact: recall@{k} {recall:.4f} "
              f"({len(jax.devices())} devices)")

    # IVF agreement (--search-mode ivf): nprobe=100 probes everything
    # and must reproduce the exact ranking; the default knob (32)
    # reports the recall the approximate mode actually ships with
    from clipx.search.ivf import IVFIndex, ShardedIVFIndex

    cls = ShardedIVFIndex if len(jax.devices()) > 1 else IVFIndex
    ivf = cls.from_vectors(index.vectors())
    _, If = ivf.search(queries, k=k, nprobe=100)
    r_full = np.mean([len(set(Ie[i]) & set(If[i])) / k
                      for i in range(len(sample))])
    _, Id = ivf.search(queries, k=k)  # default nprobe=32
    r_def = np.mean([len(set(Ie[i]) & set(Id[i])) / k
                     for i in range(len(sample))])
    print(f"ivf vs exact ({cls.__name__}): recall@{k} {r_full:.4f} "
          f"at nprobe=100, {r_def:.4f} at nprobe=32")
    _record("ivf_f32", recall_nprobe100=float(r_full),
            recall_nprobe32=float(r_def), k=k)
    # ... and the int8 probed-scan variant — the kernel production ivf
    # mode actually runs past QUANT_AUTO_THRESHOLD, regardless of this
    # eval corpus's size
    ivf_q = cls.from_vectors(index.vectors(), quantized=True)
    _, Ifq = ivf_q.search(queries, k=k, nprobe=100)
    r_fullq = np.mean([len(set(Ie[i]) & set(Ifq[i])) / k
                       for i in range(len(sample))])
    print(f"ivf-int8 vs exact: recall@{k} {r_fullq:.4f} at nprobe=100")
    # ... and the codes-as-corpus capacity tier (--corpus-dtype int8
    # with --search-mode ivf): probed scan + dequantized rescore
    ivf_s = cls.from_vectors(index.vectors(), dtype=jnp.int8)
    _, Ifs = ivf_s.search(queries, k=k, nprobe=100)
    r_fulls = np.mean([len(set(Ie[i]) & set(Ifs[i])) / k
                       for i in range(len(sample))])
    print(f"ivf-int8-storage vs exact f32: recall@{k} {r_fulls:.4f} "
          f"at nprobe=100")
    _record("ivf_int8_storage", recall_nprobe100=float(r_fulls), k=k)
    if index.dim % 2 == 0:
        ivf_4 = cls.from_vectors(index.vectors(), dtype=jnp.int4)
        _, If4 = ivf_4.search(queries, k=k, nprobe=100)
        r_full4 = np.mean([len(set(Ie[i]) & set(If4[i])) / k
                           for i in range(len(sample))])
        print(f"ivf-int4-storage vs exact f32: recall@{k} {r_full4:.4f} "
              f"at nprobe=100")
        _record("ivf_int4_storage", recall_nprobe100=float(r_full4), k=k)
    if index.dim % 4 == 0:
        # probed pq, residual off (global codebooks, round 3) vs on
        # (faiss by_residual) — the before/after table for the
        # capacity artifact; nprobe=100 isolates the encoding quality
        # from probe selectivity, nprobe=32 is the shipping default
        res_modes = (("on",) if args.pq_modes == "default"
                     else ("off", "on"))
        for res in res_modes:
            prev = os.environ.get("CLIPX_PQ_RESIDUAL")
            os.environ["CLIPX_PQ_RESIDUAL"] = res
            try:
                ivf_pq = cls.from_vectors(index.vectors(), dtype="pq")
            finally:
                if prev is None:
                    os.environ.pop("CLIPX_PQ_RESIDUAL", None)
                else:
                    os.environ["CLIPX_PQ_RESIDUAL"] = prev
            _, Ifp = ivf_pq.search(queries, k=k, nprobe=100)
            r_fullp = np.mean([len(set(Ie[i]) & set(Ifp[i])) / k
                               for i in range(len(sample))])
            _, Ifd = ivf_pq.search(queries, k=k)
            r_defp = np.mean([len(set(Ie[i]) & set(Ifd[i])) / k
                              for i in range(len(sample))])
            print(f"ivf-pq-storage (residual={res}) vs exact f32: "
                  f"recall@{k} {r_fullp:.4f} at nprobe=100, "
                  f"{r_defp:.4f} at nprobe=32")
            _record(f"ivf_pq_residual_{res}", recall_nprobe100=float(r_fullp),
                    recall_nprobe32=float(r_defp), k=k)

    if args.photos:
        _preprocess_drift(args, index, sample)
    if args.json:
        import json

        RESULTS["config"] = {"index": args.index, "ntotal": int(n),
                             "dim": int(index.dim), "k": int(k),
                             "samples": int(len(sample))}
        with open(args.json, "w") as f:
            json.dump(RESULTS, f, indent=1, sort_keys=True)
        print(f"(wrote {args.json})")
    return 0 if hits == len(sample) else 2


def _preprocess_drift(args, index, sample) -> None:
    from clipx.ops.preprocess import cv2_resize_crop, pil_resize_crop
    from clipx.runtime.encoder import Encoder
    from clipx.store.kv import open_env

    env = open_env(args.db)
    idx_db = env.open_db(b"idx_db")
    fn_db = env.open_db(b"fn_db")
    # baseline pinned to bf16: with CLIPX_COMPUTE=int8 in the env the
    # drift gate would otherwise compare the int8 encoder to itself
    enc = Encoder.create(args.model, checkpoint=args.checkpoint,
                         compute_quant="bf16")
    enc8 = None
    if getattr(enc.cfg.vision, "tower", "vit") == "vit":
        # --compute int8 drift on the SAME pixels: isolates the W8A8
        # MLP quantization from decode/resample differences
        enc8 = Encoder.create(args.model, checkpoint=args.checkpoint,
                              compute_quant="int8")
    cos_pil, cos_cv2, cos_int8 = [], [], []
    from PIL import Image

    with env.begin() as txn:
        for i in sample[:16]:
            path = txn.get(str(int(i)).encode(), db=idx_db)
            if path is None:
                continue
            stored = np.frombuffer(txn.get(path, db=fn_db),
                                   dtype=np.float32)
            fname = path.decode()
            if not os.path.exists(fname):
                continue
            with Image.open(fname) as img:
                pil = pil_resize_crop(img, enc.image_size)
                rgb = np.asarray(img.convert("RGB"))
            cv = cv2_resize_crop(rgb, enc.image_size)
            e_pil = enc.encode_images(pil[None])[0]
            e_cv = enc.encode_images(cv[None])[0]
            cos_pil.append(float(stored @ e_pil))
            cos_cv2.append(float(stored @ e_cv))
            if enc8 is not None:
                e8 = enc8.encode_images(pil[None])[0]
                cos_int8.append(float(e_pil @ e8))
    env.close()
    if cos_pil:
        print(f"preprocess drift vs stored (cosine, n={len(cos_pil)}): "
              f"pil min {min(cos_pil):.4f} mean {np.mean(cos_pil):.4f}; "
              f"cv2 min {min(cos_cv2):.4f} mean {np.mean(cos_cv2):.4f}")
    if cos_int8:
        print(f"int8-compute drift vs bf16 (cosine, n={len(cos_int8)}): "
              f"min {min(cos_int8):.4f} mean {np.mean(cos_int8):.4f}")


if __name__ == "__main__":
    sys.exit(main())
