"""Checkpoint conversion: torch CLIP state dicts -> clipx param pytrees.

Two source layouts are supported:

- **OpenAI CLIP** (the ``ViT-B-32.pt`` the reference downloads into
  ``~/.cache/clip`` at reference:build-index.py:18): fused qkv
  ``in_proj_weight``, ``c_fc``/``c_proj`` MLP naming, ``visual.proj`` /
  ``text_projection`` as plain matrices.
- **HuggingFace transformers ``CLIPModel``**: split q/k/v projections,
  ``fc1``/``fc2`` MLP naming, projections as ``nn.Linear``.

Conversion happens on host numpy (torch is only needed to *read* ``.pt``
files) and produces the stacked-layer layout consumed by
clipx.models.layers.transformer. All torch ``nn.Linear`` weights are
(out, in) and are transposed to the (in, out) "x @ W" convention used
throughout clipx.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np

from clipx.config import CLIPConfig, TextConfig, VisionConfig

Params = Dict[str, Any]
Arrays = Mapping[str, np.ndarray]


def _np(sd: Arrays, key: str) -> np.ndarray:
    v = sd[key]
    # tolerate torch tensors without importing torch here
    if hasattr(v, "detach"):
        v = v.detach().cpu().float().numpy()
    return np.asarray(v, dtype=np.float32)


def _stack(per_layer):
    return np.stack(per_layer, axis=0)


def _conv_to_patch_kernel(w: np.ndarray) -> np.ndarray:
    """torch conv (out, in=3, kh, kw) -> (kh*kw*in, out) matmul kernel,
    matching the (ph, pw, channel) patch flatten order of
    clipx.models.clip._patchify."""
    out, cin, kh, kw = w.shape
    return w.transpose(2, 3, 1, 0).reshape(kh * kw * cin, out)


# ---------------------------------------------------------------------------
# OpenAI layout
# ---------------------------------------------------------------------------

def _is_resnet_sd(sd: Arrays) -> bool:
    return any(k.startswith("visual.layer1.") for k in sd)


def _conv_hwio(w: np.ndarray) -> np.ndarray:
    """torch conv (out, in, kh, kw) -> HWIO (kh, kw, in, out)."""
    return w.transpose(2, 3, 1, 0)


def _fold_bn(sd: Arrays, prefix: str):
    from clipx.models.resnet import fold_bn

    return fold_bn(_np(sd, f"{prefix}.weight"), _np(sd, f"{prefix}.bias"),
                   _np(sd, f"{prefix}.running_mean"),
                   _np(sd, f"{prefix}.running_var"))


def _rn_block(sd: Arrays, prefix: str) -> Params:
    p = {
        "conv1": _conv_hwio(_np(sd, f"{prefix}.conv1.weight")),
        "bn1": _fold_bn(sd, f"{prefix}.bn1"),
        "conv2": _conv_hwio(_np(sd, f"{prefix}.conv2.weight")),
        "bn2": _fold_bn(sd, f"{prefix}.bn2"),
        "conv3": _conv_hwio(_np(sd, f"{prefix}.conv3.weight")),
        "bn3": _fold_bn(sd, f"{prefix}.bn3"),
    }
    if f"{prefix}.downsample.0.weight" in sd:
        # torch layout: Sequential(avgpool, conv1x1, bn)
        p["down_conv"] = _conv_hwio(_np(sd, f"{prefix}.downsample.0.weight"))
        p["down_bn"] = _fold_bn(sd, f"{prefix}.downsample.1")
    return p


def _rn_visual(sd: Arrays, v) -> Params:
    out: Params = {"stem": {
        "conv1": _conv_hwio(_np(sd, "visual.conv1.weight")),
        "bn1": _fold_bn(sd, "visual.bn1"),
        "conv2": _conv_hwio(_np(sd, "visual.conv2.weight")),
        "bn2": _fold_bn(sd, "visual.bn2"),
        "conv3": _conv_hwio(_np(sd, "visual.conv3.weight")),
        "bn3": _fold_bn(sd, "visual.bn3"),
    }}
    for i, n_blocks in enumerate(v.layers):
        stage: Params = {
            "first": _rn_block(sd, f"visual.layer{i + 1}.0")}
        if n_blocks > 1:
            rest = [_rn_block(sd, f"visual.layer{i + 1}.{j}")
                    for j in range(1, n_blocks)]
            stage["rest"] = {
                key: ({k2: _stack([r[key][k2] for r in rest])
                       for k2 in rest[0][key]}
                      if isinstance(rest[0][key], dict)
                      else _stack([r[key] for r in rest]))
                for key in rest[0]}
        out[f"stage{i + 1}"] = stage
    out["attnpool"] = {
        "pos_embedding": _np(sd, "visual.attnpool.positional_embedding"),
        "wq": _np(sd, "visual.attnpool.q_proj.weight").T,
        "bq": _np(sd, "visual.attnpool.q_proj.bias"),
        "wk": _np(sd, "visual.attnpool.k_proj.weight").T,
        "bk": _np(sd, "visual.attnpool.k_proj.bias"),
        "wv": _np(sd, "visual.attnpool.v_proj.weight").T,
        "bv": _np(sd, "visual.attnpool.v_proj.bias"),
        "wc": _np(sd, "visual.attnpool.c_proj.weight").T,
        "bc": _np(sd, "visual.attnpool.c_proj.bias"),
    }
    return out


def _config_from_openai_resnet(sd: Arrays) -> CLIPConfig:
    from clipx.config import ResNetVisionConfig

    width = int(np.asarray(sd["visual.conv1.weight"]).shape[0]) * 2
    layers = tuple(
        1 + max(int(m.group(1)) for k in sd
                if (m := re.match(rf"visual\.layer{s}\.(\d+)\.", k)))
        for s in range(1, 5))
    pos = int(np.asarray(
        sd["visual.attnpool.positional_embedding"]).shape[0])
    image_size = 32 * int(round((pos - 1) ** 0.5))
    embed_dim = int(np.asarray(sd["visual.attnpool.c_proj.weight"]).shape[0])
    t_layers = 1 + max(int(m.group(1)) for k in sd
                       if (m := re.match(r"transformer\.resblocks\.(\d+)\.", k)))
    t_width = int(np.asarray(sd["ln_final.weight"]).shape[0])
    vocab = int(np.asarray(sd["token_embedding.weight"]).shape[0])
    ctx = int(np.asarray(sd["positional_embedding"]).shape[0])
    return CLIPConfig(
        name=f"openai-rn-w{width}",
        vision=ResNetVisionConfig(image_size=image_size, layers=layers,
                                  width=width, embed_dim=embed_dim),
        text=TextConfig(context_length=ctx, vocab_size=vocab, width=t_width,
                        layers=t_layers, heads=t_width // 64,
                        embed_dim=embed_dim),
    )


def config_from_openai_state_dict(sd: Arrays) -> CLIPConfig:
    """Infer the architecture from an OpenAI CLIP state dict (ViT or
    ModifiedResNet)."""
    if _is_resnet_sd(sd):
        return _config_from_openai_resnet(sd)
    conv = sd["visual.conv1.weight"]
    width = int(conv.shape[0])
    patch = int(conv.shape[-1])
    seq = int(np.asarray(sd["visual.positional_embedding"]).shape[0])
    image_size = patch * int(round((seq - 1) ** 0.5))
    v_layers = 1 + max(int(m.group(1)) for k in sd
                       if (m := re.match(r"visual\.transformer\.resblocks\.(\d+)\.", k)))
    t_layers = 1 + max(int(m.group(1)) for k in sd
                       if (m := re.match(r"transformer\.resblocks\.(\d+)\.", k)))
    embed_dim = int(np.asarray(sd["text_projection"]).shape[1])
    t_width = int(np.asarray(sd["ln_final.weight"]).shape[0])
    vocab = int(np.asarray(sd["token_embedding.weight"]).shape[0])
    ctx = int(np.asarray(sd["positional_embedding"]).shape[0])
    return CLIPConfig(
        name=f"openai-vit-{width}x{patch}",
        vision=VisionConfig(image_size=image_size, patch_size=patch,
                            width=width, layers=v_layers, heads=width // 64,
                            embed_dim=embed_dim),
        text=TextConfig(context_length=ctx, vocab_size=vocab, width=t_width,
                        layers=t_layers, heads=t_width // 64,
                        embed_dim=embed_dim),
    )


def _openai_blocks(sd: Arrays, prefix: str, layers: int, width: int) -> Params:
    wq, wk, wv, wo = [], [], [], []
    bq, bk, bv, bo = [], [], [], []
    l1s, l1b, l2s, l2b = [], [], [], []
    w1, b1, w2, b2 = [], [], [], []
    for i in range(layers):
        p = f"{prefix}.resblocks.{i}"
        in_w = _np(sd, f"{p}.attn.in_proj_weight")  # (3w, w)
        in_b = _np(sd, f"{p}.attn.in_proj_bias")
        qw, kw, vw = np.split(in_w, 3, axis=0)
        qb, kb, vb = np.split(in_b, 3, axis=0)
        wq.append(qw.T); wk.append(kw.T); wv.append(vw.T)
        bq.append(qb); bk.append(kb); bv.append(vb)
        wo.append(_np(sd, f"{p}.attn.out_proj.weight").T)
        bo.append(_np(sd, f"{p}.attn.out_proj.bias"))
        l1s.append(_np(sd, f"{p}.ln_1.weight")); l1b.append(_np(sd, f"{p}.ln_1.bias"))
        l2s.append(_np(sd, f"{p}.ln_2.weight")); l2b.append(_np(sd, f"{p}.ln_2.bias"))
        w1.append(_np(sd, f"{p}.mlp.c_fc.weight").T)
        b1.append(_np(sd, f"{p}.mlp.c_fc.bias"))
        w2.append(_np(sd, f"{p}.mlp.c_proj.weight").T)
        b2.append(_np(sd, f"{p}.mlp.c_proj.bias"))
    return {
        "ln_1": {"scale": _stack(l1s), "bias": _stack(l1b)},
        "attn": {"wq": _stack(wq), "wk": _stack(wk), "wv": _stack(wv),
                 "wo": _stack(wo), "bq": _stack(bq), "bk": _stack(bk),
                 "bv": _stack(bv), "bo": _stack(bo)},
        "ln_2": {"scale": _stack(l2s), "bias": _stack(l2b)},
        "mlp": {"w1": _stack(w1), "b1": _stack(b1),
                "w2": _stack(w2), "b2": _stack(b2)},
    }


def from_openai_state_dict(sd: Arrays, cfg: CLIPConfig) -> Params:
    v, t = cfg.vision, cfg.text
    if getattr(v, "tower", "vit") == "resnet":
        visual = _rn_visual(sd, v)
    else:
        visual = {
            "patch_embed": {"kernel": _conv_to_patch_kernel(_np(sd, "visual.conv1.weight"))},
            "class_embedding": _np(sd, "visual.class_embedding"),
            "pos_embedding": _np(sd, "visual.positional_embedding"),
            "ln_pre": {"scale": _np(sd, "visual.ln_pre.weight"),
                       "bias": _np(sd, "visual.ln_pre.bias")},
            "blocks": _openai_blocks(sd, "visual.transformer", v.layers, v.width),
            "ln_post": {"scale": _np(sd, "visual.ln_post.weight"),
                        "bias": _np(sd, "visual.ln_post.bias")},
            "proj": _np(sd, "visual.proj"),
        }
    return {
        "visual": visual,
        "text": {
            "token_embedding": _np(sd, "token_embedding.weight"),
            "pos_embedding": _np(sd, "positional_embedding"),
            "blocks": _openai_blocks(sd, "transformer", t.layers, t.width),
            "ln_final": {"scale": _np(sd, "ln_final.weight"),
                         "bias": _np(sd, "ln_final.bias")},
            "text_projection": _np(sd, "text_projection"),
        },
        "logit_scale": _np(sd, "logit_scale").reshape(()),
    }


# ---------------------------------------------------------------------------
# HuggingFace transformers layout
# ---------------------------------------------------------------------------

def _hf_blocks(sd: Arrays, prefix: str, layers: int) -> Params:
    def g(i, name):
        return _np(sd, f"{prefix}.layers.{i}.{name}")

    return {
        "ln_1": {"scale": _stack([g(i, "layer_norm1.weight") for i in range(layers)]),
                 "bias": _stack([g(i, "layer_norm1.bias") for i in range(layers)])},
        "attn": {
            "wq": _stack([g(i, "self_attn.q_proj.weight").T for i in range(layers)]),
            "wk": _stack([g(i, "self_attn.k_proj.weight").T for i in range(layers)]),
            "wv": _stack([g(i, "self_attn.v_proj.weight").T for i in range(layers)]),
            "wo": _stack([g(i, "self_attn.out_proj.weight").T for i in range(layers)]),
            "bq": _stack([g(i, "self_attn.q_proj.bias") for i in range(layers)]),
            "bk": _stack([g(i, "self_attn.k_proj.bias") for i in range(layers)]),
            "bv": _stack([g(i, "self_attn.v_proj.bias") for i in range(layers)]),
            "bo": _stack([g(i, "self_attn.out_proj.bias") for i in range(layers)]),
        },
        "ln_2": {"scale": _stack([g(i, "layer_norm2.weight") for i in range(layers)]),
                 "bias": _stack([g(i, "layer_norm2.bias") for i in range(layers)])},
        "mlp": {
            "w1": _stack([g(i, "mlp.fc1.weight").T for i in range(layers)]),
            "b1": _stack([g(i, "mlp.fc1.bias") for i in range(layers)]),
            "w2": _stack([g(i, "mlp.fc2.weight").T for i in range(layers)]),
            "b2": _stack([g(i, "mlp.fc2.bias") for i in range(layers)]),
        },
    }


def from_hf_state_dict(sd: Arrays, cfg: CLIPConfig) -> Params:
    v, t = cfg.vision, cfg.text
    return {
        "visual": {
            "patch_embed": {"kernel": _conv_to_patch_kernel(
                _np(sd, "vision_model.embeddings.patch_embedding.weight"))},
            "class_embedding": _np(sd, "vision_model.embeddings.class_embedding"),
            "pos_embedding": _np(sd, "vision_model.embeddings.position_embedding.weight"),
            # yes, HF really spells it "pre_layrnorm"
            "ln_pre": {"scale": _np(sd, "vision_model.pre_layrnorm.weight"),
                       "bias": _np(sd, "vision_model.pre_layrnorm.bias")},
            "blocks": _hf_blocks(sd, "vision_model.encoder", v.layers),
            "ln_post": {"scale": _np(sd, "vision_model.post_layernorm.weight"),
                        "bias": _np(sd, "vision_model.post_layernorm.bias")},
            "proj": _np(sd, "visual_projection.weight").T,
        },
        "text": {
            "token_embedding": _np(sd, "text_model.embeddings.token_embedding.weight"),
            "pos_embedding": _np(sd, "text_model.embeddings.position_embedding.weight"),
            "blocks": _hf_blocks(sd, "text_model.encoder", t.layers),
            "ln_final": {"scale": _np(sd, "text_model.final_layer_norm.weight"),
                         "bias": _np(sd, "text_model.final_layer_norm.bias")},
            "text_projection": _np(sd, "text_projection.weight").T,
        },
        "logit_scale": _np(sd, "logit_scale").reshape(()),
    }


def detect_format(sd: Arrays) -> str:
    if "visual.conv1.weight" in sd:
        # covers both ViT and ModifiedResNet OpenAI layouts
        return "openai"
    if "vision_model.embeddings.patch_embedding.weight" in sd:
        return "hf"
    raise ValueError("unrecognized CLIP state dict layout")


def from_state_dict(sd: Arrays, cfg: CLIPConfig) -> Params:
    fmt = detect_format(sd)
    return from_openai_state_dict(sd, cfg) if fmt == "openai" else from_hf_state_dict(sd, cfg)


# ---------------------------------------------------------------------------
# on-disk params (flat npz — no framework dependency for the artifact)
# ---------------------------------------------------------------------------

def _flatten(tree: Params, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for key, val in tree.items():
        path = f"{prefix}/{key}" if prefix else key
        if isinstance(val, dict):
            out.update(_flatten(val, path))
        else:
            out[path] = np.asarray(val)
    return out


def save_params(path: str, params: Params) -> None:
    np.savez(path, **_flatten(params))


def load_params(path: str) -> Params:
    flat = np.load(path)
    tree: Params = {}
    for key in flat.files:
        node = tree
        parts = key.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = flat[key]
    return tree
