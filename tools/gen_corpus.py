"""Generate a synthetic photo corpus for end-to-end indexing benchmarks.

The streaming-indexing benchmark (BASELINE config 4, the reference's hot
loop #1 at reference:build-index.py:27-64) needs tens of thousands of
real JPEG files to decode. Downloading photos is impossible on this host
(zero egress), so we synthesize them: ``--unique`` distinct images of
smooth gradients + shapes + grain (so JPEG entropy/decode cost is in the
ballpark of real photos, unlike pure noise which inflates file size and
decode time), written once, then hard-linked out to ``--count`` distinct
*paths*. Hard links cost no extra disk or generation time while giving
the indexer a full-size folder listing; decode cost per file is
identical to unique files (the work is per-open, per-byte-stream).

    python tools/gen_corpus.py DIR --count 50000 --unique 2000 \
        --width 1024 --height 768
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def synth_image(rng: np.random.Generator, w: int, h: int) -> np.ndarray:
    """One photo-like frame: gradient background, a few soft ellipses,
    mild grain. Returns (h, w, 3) uint8 RGB."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack([
        xx / w * rng.uniform(80, 160) + rng.uniform(0, 80),
        yy / h * rng.uniform(80, 160) + rng.uniform(0, 80),
        (xx / w + yy / h) * rng.uniform(40, 90) + rng.uniform(0, 100),
    ], axis=-1)
    for _ in range(rng.integers(2, 6)):
        cx, cy = rng.uniform(0, w), rng.uniform(0, h)
        rx, ry = rng.uniform(w / 12, w / 3), rng.uniform(h / 12, h / 3)
        mask = (((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2) < 1.0
        color = rng.uniform(0, 255, size=3).astype(np.float32)
        alpha = rng.uniform(0.3, 0.9)
        base[mask] = base[mask] * (1 - alpha) + color * alpha
    base += rng.normal(0, 6.0, size=base.shape)
    return np.clip(base, 0, 255).astype(np.uint8)


def burst_variant(rng: np.random.Generator, img: np.ndarray
                  ) -> np.ndarray:
    """A burst-shot near duplicate: tiny global brightness/contrast
    jitter, a 1-3 px translation, fresh sensor grain — the hard case
    for the int8-scan caveat (clusters of rows whose exact scores
    differ by less than the quantization noise)."""
    h, w = img.shape[:2]
    dx, dy = int(rng.integers(-3, 4)), int(rng.integers(-3, 4))
    out = np.roll(img, (dy, dx), axis=(0, 1)).astype(np.float32)
    out *= rng.uniform(0.97, 1.03)
    out += rng.uniform(-4, 4)
    out += rng.normal(0, 2.0, size=out.shape)
    return np.clip(out, 0, 255).astype(np.uint8)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="gen_corpus")
    p.add_argument("outdir")
    p.add_argument("--count", type=int, default=50000)
    p.add_argument("--unique", type=int, default=2000)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--height", type=int, default=768)
    p.add_argument("--quality", type=int, default=88)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--burst", type=int, default=1,
                   help="near-duplicate shots per unique image (>1 "
                        "writes burst variants: jittered exposure, "
                        "1-3 px shift, fresh grain — the "
                        "near-duplicate stress set for the int8-scan "
                        "caveat; unique*burst files are real, the "
                        "rest hard links)")
    args = p.parse_args(argv)

    import cv2

    os.makedirs(args.outdir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    uniques = []
    for i in range(args.unique):
        img = synth_image(rng, args.width, args.height)
        shots = [img] + [burst_variant(rng, img)
                         for _ in range(args.burst - 1)]
        for j, shot in enumerate(shots):
            name = (f"img{i:07d}.jpg" if j == 0
                    else f"img{i:07d}_b{j:02d}.jpg")
            path = os.path.join(args.outdir, name)
            cv2.imwrite(path, cv2.cvtColor(shot, cv2.COLOR_RGB2BGR),
                        [cv2.IMWRITE_JPEG_QUALITY, args.quality])
            uniques.append(path)
        if (i + 1) % 200 == 0:
            print(f"  synthesized {i + 1}/{args.unique}", flush=True)
    for i in range(args.unique, args.count):
        path = os.path.join(args.outdir, f"img{i:07d}.jpg")
        if not os.path.exists(path):
            os.link(uniques[i % args.unique], path)
    sizes = [os.path.getsize(q) for q in uniques[:200]]
    print(f"{args.count} files in {args.outdir} "
          f"({args.unique} unique, avg {np.mean(sizes) / 1024:.0f} KiB)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
