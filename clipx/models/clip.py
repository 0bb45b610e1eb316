"""JAX CLIP: ViT image tower + causal text tower in a shared embed space.

TPU-native replacement for OpenAI CLIP ViT models as used by the reference
(loaded at reference:build-index.py:18 and reference:query-index.py:21;
``encode_image`` called at reference:build-index.py:49, ``encode_text`` at
reference:query-index.py:108).

Design choices vs the torch original:
- patch embedding is an unfold+matmul instead of a strided conv — the
  identical linear map, expressed as one large MXU matmul;
- per-tower blocks are stacked and scanned (see clipx.models.layers);
- everything is a pure function of (params, inputs) so ``jit``/``pjit``
  and sharding annotations apply cleanly;
- compute dtype is a parameter (bfloat16 on TPU, float32 for parity
  tests); embeddings are always returned in float32.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from clipx.config import CLIPConfig
from clipx.models import layers
from clipx.models.layers import (_ln_init, dense, init_block_stack,
                                 layer_norm, transformer)

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_vit_visual(cfg: CLIPConfig, rng: jax.Array) -> Params:
    v = cfg.vision
    kv = jax.random.split(rng, 5)
    patch_dim = v.patch_size * v.patch_size * 3
    return {
        "patch_embed": {
            "kernel": jax.random.normal(kv[0], (patch_dim, v.width)) * (v.width ** -0.5),
        },
        "class_embedding": jax.random.normal(kv[1], (v.width,)) * (v.width ** -0.5),
        "pos_embedding": jax.random.normal(kv[2], (v.seq_len, v.width)) * (v.width ** -0.5),
        "ln_pre": _ln_init(v.width),
        "blocks": init_block_stack(kv[3], v.layers, v.width),
        "ln_post": _ln_init(v.width),
        "proj": jax.random.normal(kv[4], (v.width, v.embed_dim)) * (v.width ** -0.5),
    }


def init_params(cfg: CLIPConfig, rng: jax.Array) -> Params:
    kv, kt = jax.random.split(rng)
    t = cfg.text
    if getattr(cfg.vision, "tower", "vit") == "resnet":
        from clipx.models import resnet

        visual = resnet.init_visual(cfg, kv)
    else:
        visual = _init_vit_visual(cfg, kv)
    kt = jax.random.split(kt, 4)
    return {
        "visual": visual,
        "text": {
            "token_embedding": jax.random.normal(kt[0], (t.vocab_size, t.width)) * 0.02,
            "pos_embedding": jax.random.normal(kt[1], (t.context_length, t.width)) * 0.01,
            "blocks": init_block_stack(kt[2], t.layers, t.width),
            "ln_final": _ln_init(t.width),
            "text_projection": jax.random.normal(kt[3], (t.width, t.embed_dim)) * (t.width ** -0.5),
        },
        "logit_scale": jnp.asarray(np.log(1.0 / 0.07), jnp.float32),
    }


# ---------------------------------------------------------------------------
# image tower
# ---------------------------------------------------------------------------

def _patchify(pixels: jax.Array, patch: int) -> jax.Array:
    """(B, H, W, 3) -> (B, n_patches, patch*patch*3), row-major patches.

    Flatten order within a patch is (ph, pw, channel), matching the weight
    layout produced by clipx.models.convert from torch's (out, in, kh, kw)
    conv kernels.
    """
    b, h, w, c = pixels.shape
    gh, gw = h // patch, w // patch
    x = pixels.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, gh, gw, ph, pw, c)
    return x.reshape(b, gh * gw, patch * patch * c)


def encode_image(params: Params, cfg: CLIPConfig, pixels: jax.Array,
                 *, normalize: bool = False, dtype=jnp.float32,
                 attn_impl: str = "xla", remat: bool = False) -> jax.Array:
    """Image embeddings. pixels: (B, H, W, 3), already preprocessed
    (resized/cropped/mean-std normalized — see clipx.ops.preprocess).

    Returns (B, embed_dim) float32. ``normalize=True`` additionally
    L2-normalizes, mirroring reference:build-index.py:50.

    Dispatches on the vision config's tower: ViT here, ModifiedResNet
    (RN50 family) in clipx.models.resnet.
    """
    if getattr(cfg.vision, "tower", "vit") == "resnet":
        from clipx.models import resnet

        return resnet.encode_image(params, cfg, pixels,
                                   normalize=normalize, dtype=dtype)
    v = cfg.vision
    p = params["visual"]
    x = _patchify(pixels.astype(dtype), v.patch_size)
    pe = p["patch_embed"]
    if "kernel_q" in pe:  # W8A8 fast path (clipx.models.quant)
        from clipx.models.quant import dense_w8a8

        x = dense_w8a8(x, pe["kernel_q"], pe["scale"])
    else:
        x = dense(x, pe["kernel"])  # (B, N, W) — the big MXU matmul
    cls = jnp.broadcast_to(p["class_embedding"].astype(dtype),
                           (x.shape[0], 1, v.width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["pos_embedding"].astype(dtype)
    x = layer_norm(x, p["ln_pre"], cfg.layernorm_eps)
    x = transformer(x, p["blocks"], v.heads, causal=False,
                    eps=cfg.layernorm_eps, use_quick_gelu=cfg.quick_gelu,
                    attn_impl=attn_impl, remat=remat)
    x = layer_norm(x[:, 0, :], p["ln_post"], cfg.layernorm_eps)
    emb = jnp.dot(x, p["proj"].astype(dtype),
                  preferred_element_type=jnp.float32)
    emb = emb.astype(jnp.float32)
    if normalize:
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    return emb


# ---------------------------------------------------------------------------
# text tower
# ---------------------------------------------------------------------------

def encode_text(params: Params, cfg: CLIPConfig, token_ids: jax.Array,
                *, normalize: bool = False, dtype=jnp.float32,
                attn_impl: str = "xla", remat: bool = False) -> jax.Array:
    """Text embeddings. token_ids: (B, context_length) int32, zero-padded,
    as produced by clipx.text.tokenize. Returns (B, embed_dim) float32.

    The sequence feature is read at the EOT position — the argmax of the
    token ids, since EOT is the largest id in the vocab (the same trick the
    torch model uses).
    """
    t = cfg.text
    p = params["text"]
    # gather BEFORE casting: casting the whole (49408, width) table to
    # touch B x 77 rows reads ~100 MB of HBM per text encode
    x = p["token_embedding"][token_ids].astype(dtype)
    x = x + p["pos_embedding"].astype(dtype)
    x = transformer(x, p["blocks"], t.heads, causal=True,
                    eps=cfg.layernorm_eps, use_quick_gelu=cfg.quick_gelu,
                    attn_impl=attn_impl, remat=remat)
    x = layer_norm(x, p["ln_final"], cfg.layernorm_eps)
    eot_pos = jnp.argmax(token_ids, axis=-1)
    x = jnp.take_along_axis(x, eot_pos[:, None, None], axis=1)[:, 0, :]
    emb = jnp.dot(x, p["text_projection"].astype(dtype),
                  preferred_element_type=jnp.float32)
    emb = emb.astype(jnp.float32)
    if normalize:
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    return emb


# ---------------------------------------------------------------------------
# joint forward (training / similarity logits)
# ---------------------------------------------------------------------------

def clip_forward(params: Params, cfg: CLIPConfig, pixels: jax.Array,
                 token_ids: jax.Array, *, dtype=jnp.float32,
                 attn_impl: str = "xla", remat: bool = False):
    """Returns (logits_per_image, logits_per_text) like the torch model."""
    img = encode_image(params, cfg, pixels, normalize=True, dtype=dtype,
                       attn_impl=attn_impl, remat=remat)
    txt = encode_text(params, cfg, token_ids, normalize=True, dtype=dtype,
                      attn_impl=attn_impl, remat=remat)
    scale = jnp.exp(params["logit_scale"])
    logits_per_image = scale * img @ txt.T
    return logits_per_image, logits_per_image.T
