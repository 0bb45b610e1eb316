#!/usr/bin/env python3
"""Generate the real-weight golden fixture for tests/test_real_weight_parity.py.

Run this OFF this host, somewhere with the OpenAI CLIP package (the
reference installs it from source, reference:setup.sh:22-24) and its
downloaded weights:

    python tools/make_golden.py --model ViT-B/32 \
        --out tests/golden/clip_golden.npz

It encodes a deterministic set of synthetic images and prompts with the
*torch* reference model and stores the L2-normalized embeddings. The
parity gate then asserts clipx reproduces them at cosine >= 0.999 on the
converted checkpoint (SURVEY.md section 4 item 1).
"""

from __future__ import annotations

import argparse

import numpy as np

PROMPTS = [
    "a photo of a cat",
    "a diagram of the solar system",
    "two people walking on a beach at sunset",
    "macro shot of a dew drop on a leaf",
    "screenshot of a terminal with green text",
    "an oil painting of mountains in winter",
]


def synthetic_images(size: int, n: int = 6) -> np.ndarray:
    """Deterministic, structured test images (gradients + checkers —
    smooth enough that resize differences stay small)."""
    rng = np.random.RandomState(0)
    out = np.zeros((n, size, size, 3), np.uint8)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    for i in range(n):
        r = 127 + 127 * np.sin(2 * np.pi * (xx * (i + 1) + rng.rand()))
        g = 255 * yy
        b = 255 * (((xx * 8).astype(int) + (yy * 8).astype(int)) % 2)
        out[i] = np.stack([r, g, b.astype(np.float32)], -1).astype(np.uint8)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ViT-B/32")
    ap.add_argument("--out", default="tests/golden/clip_golden.npz")
    args = ap.parse_args()

    import clip  # OpenAI package, torch
    import torch
    from PIL import Image

    model, preprocess = clip.load(args.model, device="cpu", jit=False)
    model.eval()

    size = model.visual.input_resolution
    imgs = synthetic_images(size)
    with torch.no_grad():
        batch = torch.stack([preprocess(Image.fromarray(a)) for a in imgs])
        ie = model.encode_image(batch).float()
        ie = (ie / ie.norm(dim=-1, keepdim=True)).numpy()
        te = model.encode_text(clip.tokenize(PROMPTS)).float()
        te = (te / te.norm(dim=-1, keepdim=True)).numpy()

    np.savez(args.out, model=args.model, texts=np.array(PROMPTS),
             text_emb=te, images_uint8=imgs, image_emb=ie)
    print(f"wrote {args.out}: {len(PROMPTS)} texts, {len(imgs)} images")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
