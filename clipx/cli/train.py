"""``clipx-train`` — contrastive fine-tuning CLI.

New capability beyond the reference (which is inference-only): train or
fine-tune CLIP on a folder of ``name.jpg`` + ``name.txt`` caption pairs
with the dp x tp sharded step from clipx.train, periodic orbax
checkpoints, and resume.

    python -m clipx.cli.train data/ --model ViT-B/32 --steps 1000 \
        --checkpoint-dir ckpts/

Data contract: for every image (same extensions as the indexer) a
sidecar ``.txt`` file holds the caption; pairs missing either side are
skipped with a warning count.
"""

from __future__ import annotations

import argparse
import os
import signal
import sys
import time
from typing import List, Tuple

import numpy as np

from clipx import config as config_lib
from clipx import train as train_lib
from clipx.data.pipeline import IMAGE_EXTENSIONS, iter_decoded
from clipx.models import convert
from clipx.text.tokenizer import default_tokenizer


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="clipx-train")
    p.add_argument("data_dir")
    p.add_argument("--model", default="ViT-B/32")
    p.add_argument("--init-checkpoint", default=None,
                   help=".npz params to start from (else random init)")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--warmup-steps", type=int, default=100)
    p.add_argument("--weight-decay", type=float, default=0.02)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--checkpoint-every", type=int, default=500)
    p.add_argument("--resume", action="store_true",
                   help="restore the latest checkpoint in --checkpoint-dir")
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel axis size (0 = all devices / tp)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel axis size")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize blocks to trade FLOPs for memory")
    return p


def find_pairs(data_dir: str) -> List[Tuple[str, str]]:
    pairs = []
    skipped = 0
    for fn in sorted(os.listdir(data_dir)):
        base, ext = os.path.splitext(fn)
        if ext.lower() not in IMAGE_EXTENSIONS:
            continue
        txt = os.path.join(data_dir, base + ".txt")
        if os.path.exists(txt):
            pairs.append((os.path.join(data_dir, fn), txt))
        else:
            skipped += 1
    if skipped:
        print(f"({skipped} images without captions skipped)")
    return pairs


class PairLoader:
    """Cycles (pixels, token_ids) batches from caption pairs.

    Cache misses are decoded through the indexer's thread pool in one
    sweep per batch instead of one file at a time, so cold-corpus
    fine-tuning is decode-parallel like the indexing pipeline."""

    def __init__(self, pairs, image_size: int, context_length: int,
                 batch_size: int, seed: int, decode_workers: int = 4):
        self.pairs = pairs
        self.image_size = image_size
        self.batch_size = batch_size
        self.tok = default_tokenizer()
        self.context_length = context_length
        self.rng = np.random.RandomState(seed)
        self.decode_workers = decode_workers
        self._cache = {}

    _CACHE_CAP = 8192  # decoded images kept in RAM (~150 KB each at 224px)

    def _fill_cache(self, paths) -> None:
        missing = list(dict.fromkeys(
            p for p in paths if p not in self._cache))
        if not missing:
            return
        # never evict a path in the current sweep: next_batch reads None
        # as "undecodable", so evicting a live pick would silently
        # resample a perfectly good image (sampling skew)
        live = set(paths)
        for item in iter_decoded(missing, self.image_size,
                                 workers=self.decode_workers):
            if len(self._cache) >= self._CACHE_CAP:
                victim = next((p for p in self._cache if p not in live),
                              None)
                if victim is not None:
                    self._cache.pop(victim)
            self._cache[item.path] = item.array  # None on failure

    def next_batch(self):
        from clipx.ops.preprocess import normalize_host

        pixels, captions = [], []
        while len(pixels) < self.batch_size:
            want = self.batch_size - len(pixels)
            picks = [self.pairs[self.rng.randint(len(self.pairs))]
                     for _ in range(want)]
            self._fill_cache([p for p, _ in picks])
            for img_path, txt_path in picks:
                arr = self._cache.get(img_path)
                if arr is None:
                    continue  # undecodable file: resampled next loop
                with open(txt_path, encoding="utf-8",
                          errors="replace") as f:
                    captions.append(f.read().strip())
                pixels.append(arr)
        ids = self.tok(captions, context_length=self.context_length)
        return normalize_host(np.stack(pixels)), ids


def main(argv=None) -> int:
    args = build_parser().parse_args(argv if argv is not None
                                     else sys.argv[1:])
    import jax

    from clipx.parallel import mesh as mesh_lib

    cfg = config_lib.get_config(args.model)
    pairs = find_pairs(args.data_dir)
    if not pairs:
        print(f"no (image, caption) pairs found in {args.data_dir!r}")
        return 1
    print(f"{len(pairs)} caption pairs; model {cfg.name}")

    n_dev = len(jax.devices())
    tp = max(args.tp, 1)
    dp = args.dp or max(n_dev // tp, 1)
    while dp > 1 and args.batch_size % dp != 0:
        dp -= 1  # batch must shard evenly over dp
    mesh = mesh_lib.make_mesh({"dp": dp, "tp": tp},
                              devices=jax.devices()[: dp * tp])
    print(f"mesh: dp={dp} tp={tp} on {dp * tp} device(s)")

    tx = train_lib.make_optimizer(args.lr, args.weight_decay,
                                  args.warmup_steps, args.steps)
    state, tx = train_lib.create_train_state(
        cfg, jax.random.PRNGKey(args.seed), tx)
    if args.init_checkpoint:
        params = convert.load_params(args.init_checkpoint)
        state = train_lib.TrainState(params, tx.init(params), state.step)
        if not default_tokenizer().has_learned_merges:
            # same trap as the query path (clipx/cli/common.py): real
            # weights + byte-fallback token ids would FINE-TUNE the text
            # tower against embedding rows the captions don't map to —
            # silently corrupting it rather than erroring
            print(
                "WARNING: --init-checkpoint given but the BPE merge "
                "table (bpe_simple_vocab_16e6.txt.gz) was not found — "
                "caption token ids will not match the pretrained text "
                "embeddings and fine-tuning will corrupt the text "
                "tower. Point $CLIPX_BPE_PATH at the merge file or "
                "place it next to clipx/text/tokenizer.py.",
                flush=True)

    jitted, shard_state, batch_sh = train_lib.make_sharded_train_step(
        cfg, tx, mesh, remat=args.remat)
    state = shard_state(state)

    ckpt_path = (os.path.join(args.checkpoint_dir, "latest")
                 if args.checkpoint_dir else None)
    if args.resume and ckpt_path and os.path.exists(ckpt_path):
        template = jax.device_get(state)
        state = shard_state(train_lib.restore_train_state(
            ckpt_path, train_lib.TrainState(*template)))
        print(f"resumed from {ckpt_path} at step {int(state.step)}")

    loader = PairLoader(pairs, cfg.vision.image_size,
                        cfg.text.context_length, args.batch_size, args.seed)
    start = int(jax.device_get(state.step))
    t0 = time.perf_counter()
    # SIGTERM (what a supervisor sends to stop a long run; SIGKILL is
    # banned on the TPU host — an abandoned claim wedges the chip) and
    # Ctrl-C both stop BETWEEN steps and fall through to the final
    # checkpoint save, so `--resume` picks up where the run left off.
    stop = {"sig": None}
    prev_term = None
    try:
        prev_term = signal.signal(
            signal.SIGTERM, lambda *_: stop.__setitem__("sig", "SIGTERM"))
    except ValueError:  # not the main thread (library caller)
        pass
    try:
        try:
            for step in range(start, args.steps):
                if stop["sig"]:
                    break
                pixels, ids = loader.next_batch()
                pixels = jax.device_put(pixels, batch_sh)
                ids = jax.device_put(ids, batch_sh)
                state, metrics = jitted(state, pixels, ids)
                if ((step + 1) % args.log_every == 0
                        or step + 1 == args.steps):
                    m = jax.device_get(metrics)
                    rate = (args.batch_size * args.log_every
                            / (time.perf_counter() - t0))
                    t0 = time.perf_counter()
                    print(f"step {step + 1}/{args.steps} "
                          f"loss {float(m['loss']):.4f} "
                          f"acc {float(m['accuracy']):.3f} "
                          f"({rate:,.0f} img/s)", flush=True)
                if (ckpt_path and ((step + 1) % args.checkpoint_every == 0
                                   or step + 1 == args.steps)):
                    train_lib.save_train_state(ckpt_path,
                                               jax.device_get(state))
                    print(f"checkpoint -> {ckpt_path}")
        except KeyboardInterrupt:
            stop["sig"] = "interrupt"
        # the drain below (full-state device_get over a ~2.5 MB/s tunnel
        # — minutes on real models) stays INSIDE the handler scope: a
        # supervisor's repeat SIGTERM during it must set the (already-
        # set) flag, not kill the process mid-transfer. Fetch the state
        # once and reuse it for both saves.
        host = None
        if stop["sig"]:
            host = jax.device_get(state)
            print(f"{stop['sig']}: stopping after step {int(host.step)}")
            if ckpt_path:
                train_lib.save_train_state(ckpt_path, host)
                print(f"checkpoint -> {ckpt_path}")

        if args.checkpoint_dir:
            if host is None:
                host = jax.device_get(state)
            out = os.path.join(args.checkpoint_dir, "params.npz")
            convert.save_params(out, host.params)
            print(f"final params -> {out}")
        return 0
    finally:
        if prev_term is not None:
            signal.signal(signal.SIGTERM, prev_term)


if __name__ == "__main__":
    raise SystemExit(main())
