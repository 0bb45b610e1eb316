"""Model/engine configuration.

The reference hardcodes CLIP "ViT-B/32" (reference:build-index.py:18,
reference:query-index.py:21) and a 512-d shared embedding space. We keep
those as named presets and add ViT-L/14@336 as the high-resolution stress
configuration (BASELINE.json config 3).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    image_size: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    # output dim of the learned projection into the shared space
    embed_dim: int = 512

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def seq_len(self) -> int:
        # CLS token + patch tokens
        return self.grid * self.grid + 1


@dataclasses.dataclass(frozen=True)
class TextConfig:
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    layers: int = 12
    heads: int = 8
    embed_dim: int = 512


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    name: str
    vision: VisionConfig
    text: TextConfig
    # QuickGELU (x * sigmoid(1.702 x)) is what OpenAI CLIP uses; keep it
    # switchable for HF checkpoints trained with exact GELU.
    quick_gelu: bool = True
    layernorm_eps: float = 1e-5
    # preprocessing constants — must match OpenAI CLIP bit-for-bit for
    # embedding parity (SURVEY.md section 2b D1p)
    image_mean: Tuple[float, float, float] = (0.48145466, 0.4578275, 0.40821073)
    image_std: Tuple[float, float, float] = (0.26862954, 0.26130258, 0.27577711)

    @property
    def embed_dim(self) -> int:
        return self.vision.embed_dim


def vit_b32() -> CLIPConfig:
    """CLIP ViT-B/32 — the reference's model (reference:build-index.py:18)."""
    return CLIPConfig(
        name="ViT-B/32",
        vision=VisionConfig(image_size=224, patch_size=32, width=768,
                            layers=12, heads=12, embed_dim=512),
        text=TextConfig(width=512, layers=12, heads=8, embed_dim=512),
    )


def vit_b16() -> CLIPConfig:
    return CLIPConfig(
        name="ViT-B/16",
        vision=VisionConfig(image_size=224, patch_size=16, width=768,
                            layers=12, heads=12, embed_dim=512),
        text=TextConfig(width=512, layers=12, heads=8, embed_dim=512),
    )


def vit_l14_336() -> CLIPConfig:
    """ViT-L/14@336 — the long-sequence (577 tokens) stress config."""
    return CLIPConfig(
        name="ViT-L/14@336px",
        vision=VisionConfig(image_size=336, patch_size=14, width=1024,
                            layers=24, heads=16, embed_dim=768),
        text=TextConfig(width=768, layers=12, heads=12, embed_dim=768),
    )


def tiny_test() -> CLIPConfig:
    """Minimal config for fast CPU unit tests (not a real model)."""
    return CLIPConfig(
        name="tiny-test",
        vision=VisionConfig(image_size=32, patch_size=16, width=64,
                            layers=2, heads=2, embed_dim=32),
        text=TextConfig(context_length=77, vocab_size=49408, width=32,
                        layers=2, heads=2, embed_dim=32),
    )


PRESETS = {
    "ViT-B/32": vit_b32,
    "ViT-B/16": vit_b16,
    "ViT-L/14@336px": vit_l14_336,
    "tiny-test": tiny_test,
}


def get_config(name: str) -> CLIPConfig:
    try:
        return PRESETS[name]()
    except KeyError:
        raise ValueError(f"unknown model preset {name!r}; "
                         f"available: {sorted(PRESETS)}") from None
