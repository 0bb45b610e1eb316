#!/usr/bin/env python3
"""One-time torch -> clipx checkpoint conversion (offline utility).

The reference downloads OpenAI's ViT-B-32.pt into ~/.cache/clip at first
run (reference:build-index.py:18). In the TPU framework torch is needed
only here, to read that file once:

    python tools/convert_checkpoint.py ~/.cache/clip/ViT-B-32.pt \
        --out vit_b32.npz
    CLIPX_CHECKPOINT=vit_b32.npz python build-index.py photos/

Accepts OpenAI CLIP archives (torchscript or plain state dict) and
HuggingFace CLIPModel state dicts; auto-detects the layout and infers
the architecture from OpenAI-format files.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", help="torch .pt/.bin state dict")
    ap.add_argument("--out", required=True, help="output .npz path")
    ap.add_argument("--model", default=None,
                    help="clipx preset name; inferred from OpenAI-format "
                         "checkpoints when omitted")
    args = ap.parse_args(argv)

    import torch

    from clipx import config as config_lib
    from clipx.models import convert

    try:
        obj = torch.load(args.checkpoint, map_location="cpu",
                         weights_only=False)
    except Exception:
        # OpenAI ships torchscript archives; fall back to jit.load
        obj = torch.jit.load(args.checkpoint, map_location="cpu")
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    sd = dict(obj)

    fmt = convert.detect_format(sd)
    if args.model is not None:
        cfg = config_lib.get_config(args.model)
    elif fmt == "openai":
        cfg = convert.config_from_openai_state_dict(sd)
    else:
        ap.error("--model is required for HuggingFace-format checkpoints")
    if getattr(cfg.vision, "tower", "vit") == "resnet":
        vis = (f"resnet {cfg.vision.layers} width {cfg.vision.width} "
               f"@ {cfg.vision.image_size}px")
    else:
        vis = (f"vit {cfg.vision.layers}x{cfg.vision.width} patch "
               f"{cfg.vision.patch_size} @ {cfg.vision.image_size}px")
    print(f"layout: {fmt}; architecture: vision {vis}, text "
          f"{cfg.text.layers}x{cfg.text.width}, embed {cfg.embed_dim}")
    params = convert.from_state_dict(sd, cfg)
    convert.save_params(args.out, params)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
