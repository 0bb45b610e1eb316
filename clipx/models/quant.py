"""W8A8 dynamic-quantized matmuls for the inference encode path.

The v5e MXU runs int8 x int8 -> int32 at twice the bf16 FLOP rate
(394 TOPS vs 197 TFLOP/s), and the ViT MLP is ~2/3 of encode FLOPs —
so quantizing just the MLP GEMMs is the single biggest lever past the
bf16 compute floor documented in docs/ARCHITECTURE.md.

Scheme (the standard W8A8 inference recipe):
- **Weights**: static symmetric int8, one scale per OUTPUT channel
  (amax over the input axis), quantized once at Encoder build — no
  per-call weight reads beyond the int8 bytes (half the bf16 traffic).
- **Activations**: dynamic symmetric int8, one scale per token row
  (amax over the feature axis), computed in-graph per call. VPU work
  linear in the activation bytes; negligible next to the GEMM.
- Accumulation in int32 on the MXU, dequantized as
  ``y = acc * (row_scale x col_scale)`` in f32, bias added in f32,
  output cast back to the caller's dtype.

Opt-in (``CLIPX_COMPUTE=int8`` / ``Encoder(compute_quant="int8")``):
the default path stays bf16 for bit-stable parity with the reference
contract. Embedding drift is gated in tests (cosine vs the bf16 tower)
and by the self-retrieval quality eval.

Replaces: nothing in the reference — CLI-P runs torch CLIP in f32 on
CPU/CUDA (reference:build-index.py:18); this is the TPU-native fast
path past it.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

_EPS = 1e-12


def quantize_weight(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel int8 weights.

    ``w``: (..., in, out) — any leading stack axes (the scanned layer
    axis included). Returns ``(w_i8, scale)`` with ``scale`` shaped
    (..., out): one scale per output channel, reduced over the input
    axis only.
    """
    w = jnp.asarray(w, jnp.float32)
    scale = jnp.maximum(jnp.abs(w).max(axis=-2), _EPS) / 127.0
    w_i8 = jnp.clip(jnp.rint(w / scale[..., None, :]), -127, 127
                    ).astype(jnp.int8)
    return w_i8, scale


def dense_w8a8(x: jax.Array, w_i8: jax.Array, w_scale: jax.Array,
               b: jax.Array | None = None) -> jax.Array:
    """``dense`` with both operands int8 on the MXU.

    x: (..., in) in the compute dtype; w_i8: (in, out) int8 with
    per-output-channel ``w_scale`` (out,). Activation rows quantize
    dynamically (amax per token); int32 accumulation; f32 dequant +
    bias; cast back to ``x.dtype``.
    """
    x32 = x.astype(jnp.float32)
    x_scale = jnp.maximum(jnp.abs(x32).max(axis=-1, keepdims=True), _EPS
                          ) / 127.0
    x_i8 = jnp.clip(jnp.rint(x32 / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_i8, w_i8,
        dimension_numbers=(((x_i8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (x_scale * w_scale.astype(jnp.float32))
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def quantize_patch_embed(pe: Params) -> Params:
    """int8 patch-embedding GEMM (the (B, N, patch^2*3) x (in, W)
    matmul — ~10% of ViT encode FLOPs). Normalized pixels are
    outlier-free, so the per-token dynamic scale loses nothing."""
    k_q, s = quantize_weight(pe["kernel"])
    return {"kernel_q": k_q, "scale": s}


def quantize_attn_stack(attn: Params) -> Params:
    """int8 q/k/v/out projections (opt-in via CLIPX_INT8_ATTN — see
    Encoder): replaces the fused-bf16-sublayer kernel's GEMMs with
    W8A8 XLA GEMMs + the SDPA-only Pallas kernel. Kept separate from
    the MLP switch so the two can be A/B-measured independently."""
    out = {}
    for name in ("wq", "wk", "wv", "wo"):
        w_q, s = quantize_weight(attn[name])
        out[name + "_q"] = w_q
        out["s" + name[1:]] = s
        out["b" + name[1:]] = attn["b" + name[1:]]
    return out


def quantize_mlp_stack(mlp: Params) -> Params:
    """Swap a (possibly layer-stacked) MLP param group to int8 storage.

    Returns a new dict with ``w1_q/s1/w2_q/s2`` replacing ``w1/w2``
    (biases unchanged, still consumed in f32). ``layers.mlp_block``
    dispatches on the ``w1_q`` key.
    """
    w1_q, s1 = quantize_weight(mlp["w1"])
    w2_q, s2 = quantize_weight(mlp["w2"])
    return {"w1_q": w1_q, "s1": s1, "b1": mlp["b1"],
            "w2_q": w2_q, "s2": s2, "b2": mlp["b2"]}
