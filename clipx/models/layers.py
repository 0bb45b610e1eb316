"""Transformer building blocks for the CLIP towers.

Pure-functional: every layer is ``f(params, x) -> x`` over plain pytrees.
Per-tower blocks are *stacked* along a leading layer axis and executed
with ``lax.scan`` — one compiled block body regardless of depth, which
keeps XLA compile times flat and gives every layer identical sharding
(a single pjit rule covers all of them).

Numerical policy: parameters live in float32; matmuls run in the caller's
``dtype`` (bfloat16 on TPU) with float32 accumulation
(``preferred_element_type``); LayerNorm statistics and softmax are always
float32.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from clipx.ops.attention import packed_pair_attention, xla_attention

Params = Dict[str, Any]


def layer_norm(x: jax.Array, p: Params, eps: float) -> jax.Array:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(dtype)


def quick_gelu(x: jax.Array) -> jax.Array:
    # OpenAI CLIP's activation: x * sigmoid(1.702 x)
    return x * jax.nn.sigmoid(1.702 * x)


def dense(x: jax.Array, w: jax.Array, b: jax.Array | None = None) -> jax.Array:
    y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


_SDPA_VARIANTS = ("auto", "block", "sublayer", "pairs", "rows", "qkv")


def _sdpa_variant() -> str:
    """CLIPX_PACKED_SDPA normalized: unknown values mean 'auto' rather
    than silently selecting an arbitrary kernel."""
    import os

    v = os.environ.get("CLIPX_PACKED_SDPA", "auto")
    return v if v in _SDPA_VARIANTS else "auto"


def _fused_qkv(p: Params):
    """[wq | wk | wv] and the matching bias, packed along the out dim
    (the layout every fused qkv kernel consumes)."""
    return (jnp.concatenate([p["wq"], p["wk"], p["wv"]], axis=-1),
            jnp.concatenate([p["bq"], p["bk"], p["bv"]], axis=-1))


def mha_block(x: jax.Array, p: Params, heads: int, *, causal: bool,
              attn_impl: str = "xla") -> jax.Array:
    """Self-attention. x: (B, S, W)."""
    b, s, w = x.shape
    d = w // heads

    if "wq_q" in p:
        # W8A8 projections (CLIPX_INT8_ATTN, clipx.models.quant): int8
        # q/k/v/out GEMMs + the SDPA-only Pallas kernel in place of the
        # fused bf16 sublayer kernel (which needs bf16 VMEM weights)
        from clipx.models.quant import dense_w8a8
        from clipx.ops.packed_sdpa import packed_sdpa, packed_sdpa_rows

        q = dense_w8a8(x, p["wq_q"], p["sq"], p["bq"])
        k = dense_w8a8(x, p["wk_q"], p["sk"], p["bk"])
        v = dense_w8a8(x, p["wv_q"], p["sv"], p["bv"])
        fits = s <= 64 and d == 64 and not causal and _on_tpu()
        if fits and b % 2 == 0:
            o = packed_sdpa_rows(q, k, v, heads=heads)
        elif fits and heads % 2 == 0:
            o = packed_sdpa(q, k, v, heads=heads)
        else:
            def split(t):
                return t.reshape(b, s, heads, d).transpose(0, 2, 1, 3)

            o = xla_attention(split(q), split(k), split(v), causal=causal)
            o = o.transpose(0, 2, 1, 3).reshape(b, s, w)
        return dense_w8a8(o, p["wo_q"], p["so"], p["bo"])

    use_packed = (s <= 64 and d == 64 and (heads % 2 == 0 or b % 2 == 0))
    # K/V must fit VMEM alongside scores for the long kernel
    use_long = (s > 64 and (-(-s // 128) * 128) * w * 2 * 2 < 8 * 2 ** 20)
    # attn_impl="plain" opts out of the fused pallas kernels: used when
    # params may be TP-sharded under GSPMD (the sharded train step) —
    # the kernels consume full-width weight blocks and would force
    # gathers or break partitioning
    if (not causal and (use_packed or use_long)
            and attn_impl == "xla" and _on_tpu()):
        # fused pallas kernels: mask + f32 softmax + both matmuls in
        # VMEM, consuming/producing (B, S, W) directly — no XLA
        # transposes or score-tile HBM round-trips (clipx.ops.packed_sdpa;
        # verified bit-identical to the XLA path). Short sequences also
        # pack pairs (of batch rows, else of heads) onto full MXU tiles.
        from clipx.ops.packed_sdpa import (fused_attn_block, fused_sdpa_long,
                                           packed_sdpa, packed_sdpa_qkv,
                                           packed_sdpa_rows)

        variant = _sdpa_variant()
        if use_packed and b % 2 == 0 and variant in ("auto", "block"):
            # whole attention sublayer in ONE kernel (qkv proj -> SDPA
            # -> out proj, weights VMEM-resident): the separate GEMMs
            # measured ~29% MFU on v5e — HBM round-trips and stalls
            # around the pallas call, not matmul width, were the cost.
            # CLIPX_ATTN_ROWS packs more batch rows per program (fewer
            # programs, bigger MXU tiles, more wasted cross-row score
            # FLOPs) — measured per shape, 2 is the ViT-B/32 default.
            import os

            try:
                rows = int(os.environ.get("CLIPX_ATTN_ROWS", "2"))
            except ValueError:  # sanitize like CLIPX_PACKED_SDPA does
                rows = 2
            if rows < 2 or b % rows:
                rows = 2
            wqkv, bqkv = _fused_qkv(p)
            return fused_attn_block(x, wqkv, bqkv, p["wo"], p["bo"],
                                    heads=heads, rows=rows)
        if use_packed and b % 2 == 0 and variant == "qkv":
            # fused projection feeding the packed kernel (measured
            # slower than pairs end-to-end; kept for A/B)
            wqkv, bqkv = _fused_qkv(p)
            o = packed_sdpa_qkv(dense(x, wqkv, bqkv), heads=heads)
            return dense(o, p["wo"], p["bo"])
        if not use_packed:
            s_pad = -(-s // 128) * 128
            fits = (2 * s_pad * 3 * w * 2 + w * w * 2) < 12 * 2 ** 20
            if fits and variant == "qkv":
                # long-sequence analog of fused_attn_block — measured
                # 13% SLOWER than the split path on ViT-L/14@336 (the
                # in-kernel per-head K=64 out-projection GEMMs lose to
                # XLA's one wide GEMM); kept opt-in for A/B
                from clipx.ops.packed_sdpa import fused_sdpa_long_qkv

                wqkv, bqkv = _fused_qkv(p)
                return fused_sdpa_long_qkv(dense(x, wqkv, bqkv),
                                           p["wo"], p["bo"], heads=heads)
        q = dense(x, p["wq"], p["bq"])
        k = dense(x, p["wk"], p["bk"])
        v = dense(x, p["wv"], p["bv"])
        if not use_packed:
            o = fused_sdpa_long(q, k, v, heads=heads)
        elif b % 2 == 0 and (variant == "rows" or heads % 2):
            # batch-pair variant: same MXU packing as pairs with zero
            # scratch copies (measured equal end-to-end); also the only
            # packed kernel that accepts odd head counts
            o = packed_sdpa_rows(q, k, v, heads=heads)
        else:
            # heads is even here: use_packed with odd heads implies an
            # even batch, which routes through the rows kernel above
            o = packed_sdpa(q, k, v, heads=heads)
        return dense(o, p["wo"], p["bo"])

    def split(t):
        return t.reshape(b, s, heads, d).transpose(0, 2, 1, 3)

    q = split(dense(x, p["wq"], p["bq"]))
    k = split(dense(x, p["wk"], p["bk"]))
    v = split(dense(x, p["wv"], p["bv"]))
    if attn_impl == "pallas":
        from clipx.ops.flash_attention import flash_attention
        o = flash_attention(q, k, v, causal=causal)
    elif not causal and s <= 64 and heads % 2 == 0:
        # head-pair MXU packing (see clipx.ops.attention) — exact, and
        # much faster than per-head tiny score tiles (the XLA fallback
        # for this shape off-TPU)
        o = packed_pair_attention(q, k, v)
    else:
        o = xla_attention(q, k, v, causal=causal)
    o = o.transpose(0, 2, 1, 3).reshape(b, s, w)
    return dense(o, p["wo"], p["bo"])


def mlp_block(x: jax.Array, p: Params, use_quick_gelu: bool) -> jax.Array:
    import os

    if "w1_q" in p:
        # W8A8 inference MLP (CLIPX_COMPUTE=int8): both GEMMs run
        # int8 on the MXU at 2x the bf16 rate; GELU between them in
        # the compute dtype from the f32-dequantized fc1 output
        # (clipx.models.quant — drift gated in test_quant)
        from clipx.models.quant import dense_w8a8

        if (_on_tpu()
                and os.environ.get("CLIPX_FUSED_MLP_INT8", "off") == "on"):
            # fused variant: quant + both int8 GEMMs + activation in one
            # kernel, int8 weights VMEM-resident (A/B knob)
            from clipx.ops.packed_sdpa import (fused_mlp_w8a8,
                                               mlp_w8a8_fusible)

            w, hidden = p["w1_q"].shape
            if mlp_w8a8_fusible(w, hidden):
                return fused_mlp_w8a8(x, p["w1_q"], p["s1"], p["b1"],
                                      p["w2_q"], p["s2"], p["b2"],
                                      quick=use_quick_gelu)

        h = dense_w8a8(x, p["w1_q"], p["s1"], p["b1"])
        h = (quick_gelu(h) if use_quick_gelu
             else jax.nn.gelu(h, approximate=False))
        return dense_w8a8(h, p["w2_q"], p["s2"], p["b2"])

    # default off: unlike the attention sublayer (whose separate GEMMs
    # measured ~29% MFU), XLA already runs the MLP at ~74% MFU and the
    # fused kernel measured no end-to-end win (A/B at ViT-B/32 b256:
    # 18.3-19.2 ms fused vs 17.7-18.8 ms XLA — noise)
    if (_on_tpu() and os.environ.get("CLIPX_FUSED_MLP", "off") == "on"):
        from clipx.ops.packed_sdpa import fused_mlp, mlp_fusible

        w, hidden = p["w1"].shape
        if mlp_fusible(w, hidden, x.dtype):
            return fused_mlp(x, p["w1"], p["b1"], p["w2"], p["b2"],
                             quick=use_quick_gelu)
    h = dense(x, p["w1"], p["b1"])
    h = quick_gelu(h) if use_quick_gelu else jax.nn.gelu(h, approximate=False)
    return dense(h, p["w2"], p["b2"])


def residual_block(x: jax.Array, p: Params, heads: int, *, causal: bool,
                   eps: float, use_quick_gelu: bool,
                   attn_impl: str = "xla") -> jax.Array:
    """Pre-LN transformer block (the CLIP/GPT-2 layout)."""
    b, s, w = x.shape
    d = w // heads
    if (not causal and s <= 64 and d == 64 and b % 2 == 0
            and attn_impl == "xla" and _on_tpu()
            and "wq_q" not in p["attn"]
            and _sdpa_variant() == "sublayer"):
        # opt-in: whole pre-LN sublayer (LN -> attn -> +residual) in one
        # kernel. Measured a wash vs fused_attn_block at ViT-B/32 b256
        # (XLA already fuses the LN/residual elementwise around the
        # kernel); kept for A/B on other shapes
        from clipx.ops.packed_sdpa import fused_attn_sublayer

        a = p["attn"]
        wqkv, bqkv = _fused_qkv(a)
        x = fused_attn_sublayer(x, p["ln_1"]["scale"], p["ln_1"]["bias"],
                                wqkv, bqkv, a["wo"], a["bo"], heads=heads,
                                eps=eps)
    else:
        x = x + mha_block(layer_norm(x, p["ln_1"], eps), p["attn"], heads,
                          causal=causal, attn_impl=attn_impl)
    x = x + mlp_block(layer_norm(x, p["ln_2"], eps), p["mlp"], use_quick_gelu)
    return x


def transformer(x: jax.Array, stacked: Params, heads: int, *, causal: bool,
                eps: float, use_quick_gelu: bool,
                attn_impl: str = "xla",
                remat: bool = False) -> jax.Array:
    """Run the stacked blocks with lax.scan over the layer axis.

    CLIPX_SCAN_UNROLL=N unrolls the scan N steps so XLA can overlap
    scheduling across block boundaries (an encode-floor candidate —
    scan-step boundaries are part of the measured gap to the compute
    floor, docs/ARCHITECTURE.md); 1 keeps the compile-time-flat default.
    """
    import os

    unroll = max(1, int(os.environ.get("CLIPX_SCAN_UNROLL", "1")))

    def body(carry, layer_params):
        y = residual_block(carry, layer_params, heads, causal=causal,
                           eps=eps, use_quick_gelu=use_quick_gelu,
                           attn_impl=attn_impl)
        return y, None

    if remat:
        body = jax.checkpoint(body)
    out, _ = jax.lax.scan(body, x, stacked, unroll=unroll)
    return out


# ---------------------------------------------------------------------------
# initializers (used for training-from-scratch and tests; converted
# checkpoints overwrite these values)
# ---------------------------------------------------------------------------

def _ln_init(width: int) -> Params:
    return {"scale": jnp.ones((width,), jnp.float32),
            "bias": jnp.zeros((width,), jnp.float32)}


def init_block_stack(rng: jax.Array, layers: int, width: int) -> Params:
    """OpenAI-CLIP-style initialization for a stack of residual blocks."""
    k = jax.random.split(rng, 6)
    attn_std = width ** -0.5
    proj_std = (width ** -0.5) * ((2 * layers) ** -0.5)
    fc_std = (2 * width) ** -0.5
    hidden = width * 4

    def nrm(key, shape, std):
        return (jax.random.normal(key, shape, jnp.float32) * std)

    return {
        "ln_1": {"scale": jnp.ones((layers, width)), "bias": jnp.zeros((layers, width))},
        "attn": {
            "wq": nrm(k[0], (layers, width, width), attn_std),
            "wk": nrm(k[1], (layers, width, width), attn_std),
            "wv": nrm(k[2], (layers, width, width), attn_std),
            "wo": nrm(k[3], (layers, width, width), proj_std),
            "bq": jnp.zeros((layers, width)),
            "bk": jnp.zeros((layers, width)),
            "bv": jnp.zeros((layers, width)),
            "bo": jnp.zeros((layers, width)),
        },
        "ln_2": {"scale": jnp.ones((layers, width)), "bias": jnp.zeros((layers, width))},
        "mlp": {
            "w1": nrm(k[4], (layers, width, hidden), fc_std),
            "b1": jnp.zeros((layers, hidden)),
            "w2": nrm(k[5], (layers, hidden, width), proj_std),
            "b2": jnp.zeros((layers, width)),
        },
    }
