"""Fused packed-pair SDPA Pallas kernel for short-sequence ViT towers.

Motivation (measured on v5e, ViT-B/32 batch 256): after head-pair MXU
packing, the attention blocks still spent ~8 ms/batch, and almost none
of it was matmul FLOPs (~0.3 ms at peak) — the rest was HBM data
movement: the (B,S,W) -> (B,H,S,D) transposes XLA inserts around the
batched GEMMs, the 51->64 padding copies, and the f32 score tile
round-trips for masking + softmax.

This kernel removes all of it: it consumes q, k, v in the natural
(B, S, H*D) layout the projection matmuls produce (no XLA transpose),
and per (batch-row, head-pair) program does pack -> QK^T -> mask ->
f32 softmax -> probs @ V entirely in VMEM, writing the output back in
(B, S, H*D) layout so the out-projection consumes it directly.

Constraints: non-causal, S <= 64 (one q block), D = 64, even head
count — exactly the ViT-B/32 (50 x 12 x 64) and ViT-B/16-at-112-style
shapes. Everything else falls back to the XLA paths in
clipx.ops.attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SP = 64  # padded sequence block
_NEG = -1e30


def _kernel(q_ref, k_ref, v_ref, o_ref, qs, ks, vs, *, seq_len: int,
            heads: int, head_dim: int, scale: float):
    """Blocks: (1, SP, H*D). One program = one batch row, all head pairs.
    qs/ks/vs are (2*SP, D) VMEM scratch; pair-packing goes through
    scratch stores (Mosaic cannot concatenate lane-offset slices
    directly — 'result/input offset mismatch on non-concat dimension')."""
    hp = heads // 2
    q = q_ref[0]  # (SP, H*D)
    k = k_ref[0]
    v = v_ref[0]

    col_s = jax.lax.broadcasted_iota(jnp.int32, (2 * _SP, 2 * _SP), 1) % _SP
    row_h = jax.lax.broadcasted_iota(jnp.int32, (2 * _SP, 2 * _SP), 0) // _SP
    col_h = jax.lax.broadcasted_iota(jnp.int32, (2 * _SP, 2 * _SP), 1) // _SP
    mask = jnp.logical_and(row_h == col_h, col_s < seq_len)

    # one scratch slot per pair: reusing a single slot across loop
    # iterations miscompiled for bf16 (values of every pair but the last
    # corrupted — a write-after-read hazard in the scheduler)
    for p in range(hp):
        lo = 2 * p * head_dim
        for ref, t in ((qs, q), (ks, k), (vs, v)):
            ref[p, :_SP, :] = t[:, lo: lo + head_dim]
            ref[p, _SP:, :] = t[:, lo + head_dim: lo + 2 * head_dim]
    for p in range(hp):
        lo = 2 * p * head_dim
        scores = jax.lax.dot_general(
            qs[p], ks[p], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # (2SP, 2SP)
        scores = jnp.where(mask, scores, _NEG)
        m = jnp.max(scores, axis=1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = (e / jnp.sum(e, axis=1, keepdims=True)).astype(vs.dtype)
        out = jax.lax.dot_general(
            probs, vs[p], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)
        o_ref[0, :, lo: lo + head_dim] = out[:_SP]
        o_ref[0, :, lo + head_dim: lo + 2 * head_dim] = out[_SP:]


def _rows_kernel(q_ref, k_ref, v_ref, o_ref, *, seq_len: int, heads: int,
                 head_dim: int, scale: float):
    """Batch-pair packing: one program = TWO batch rows, looping heads.
    Blocks: (2, SP, H*D). The (2, SP, D) head slice reshapes to a
    (2*SP, D) MXU operand directly (leading-dim collapse) — the same
    full-tile (128, 128) scores as the head-pair kernel but with ZERO
    scratch copies; the block-diagonal mask keeps the rows independent."""
    q = q_ref[...]  # (2, SP, W)
    k = k_ref[...]
    v = v_ref[...]

    col_s = jax.lax.broadcasted_iota(jnp.int32, (2 * _SP, 2 * _SP), 1) % _SP
    row_b = jax.lax.broadcasted_iota(jnp.int32, (2 * _SP, 2 * _SP), 0) // _SP
    col_b = jax.lax.broadcasted_iota(jnp.int32, (2 * _SP, 2 * _SP), 1) // _SP
    mask = jnp.logical_and(row_b == col_b, col_s < seq_len)

    for h in range(heads):
        lo = h * head_dim
        q2 = q[:, :, lo: lo + head_dim].reshape(2 * _SP, head_dim)
        k2 = k[:, :, lo: lo + head_dim].reshape(2 * _SP, head_dim)
        v2 = v[:, :, lo: lo + head_dim].reshape(2 * _SP, head_dim)
        scores = jax.lax.dot_general(
            q2, k2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # (2SP, 2SP)
        scores = jnp.where(mask, scores, _NEG)
        m = jnp.max(scores, axis=1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = (e / jnp.sum(e, axis=1, keepdims=True)).astype(v2.dtype)
        out = jax.lax.dot_general(
            probs, v2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)
        o_ref[0, :, lo: lo + head_dim] = out[:_SP]
        o_ref[1, :, lo: lo + head_dim] = out[_SP:]


def _rows_qkv_kernel(qkv_ref, o_ref, *, seq_len: int, heads: int,
                     head_dim: int, scale: float, width: int):
    """Like _rows_kernel but consumes the PACKED projection output
    (B, SP, 3W) = [q | k | v] along lanes, exactly as a single fused
    qkv matmul produces it — no q/k/v slicing ever materializes in HBM."""
    t = qkv_ref[...]  # (2, SP, 3W)

    col_s = jax.lax.broadcasted_iota(jnp.int32, (2 * _SP, 2 * _SP), 1) % _SP
    row_b = jax.lax.broadcasted_iota(jnp.int32, (2 * _SP, 2 * _SP), 0) // _SP
    col_b = jax.lax.broadcasted_iota(jnp.int32, (2 * _SP, 2 * _SP), 1) // _SP
    mask = jnp.logical_and(row_b == col_b, col_s < seq_len)

    for h in range(heads):
        lo = h * head_dim
        q2 = t[:, :, lo: lo + head_dim].reshape(2 * _SP, head_dim)
        k2 = t[:, :, width + lo: width + lo + head_dim
               ].reshape(2 * _SP, head_dim)
        v2 = t[:, :, 2 * width + lo: 2 * width + lo + head_dim
               ].reshape(2 * _SP, head_dim)
        scores = jax.lax.dot_general(
            q2, k2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        scores = jnp.where(mask, scores, _NEG)
        m = jnp.max(scores, axis=1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = (e / jnp.sum(e, axis=1, keepdims=True)).astype(v2.dtype)
        out = jax.lax.dot_general(
            probs, v2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)
        o_ref[0, :, lo: lo + head_dim] = out[:_SP]
        o_ref[1, :, lo: lo + head_dim] = out[_SP:]


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def packed_sdpa_qkv(qkv: jax.Array, *, heads: int,
                    interpret: bool | None = None) -> jax.Array:
    """SDPA over a fused projection output.

    ``qkv``: (B, S, 3W) with lanes laid out [q | k | v], i.e. the result
    of one ``x @ [wq wk wv]`` matmul. One wide GEMM keeps the MXU busy
    where three narrow ones stalled (measured: the q/k/v/o projections
    ran at ~29% MFU vs the MLP's ~74% on v5e), and the kernel consumes
    the packed layout directly so nothing is sliced or copied between.
    S <= 64, D = 64, even batch; returns (B, S, W)."""
    b, s, w3 = qkv.shape
    w = w3 // 3
    d = w // heads
    if d != 64 or s > _SP or b % 2:
        raise ValueError(f"packed_sdpa_qkv needs D=64, S<=64, even B; "
                         f"got B={b}, D={d}, S={s}")
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    pad = _SP - s
    if pad:
        qkv = jnp.pad(qkv, ((0, 0), (0, pad), (0, 0)))

    in_spec = pl.BlockSpec((2, _SP, w3), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((2, _SP, w), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_rows_qkv_kernel, seq_len=s, heads=heads,
                          head_dim=d, scale=1.0 / (d ** 0.5), width=w),
        grid=(b // 2,),
        in_specs=[in_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, _SP, w), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * _SP * _SP * d,
            bytes_accessed=4 * b * _SP * w * 2,
            transcendentals=b * heads * _SP * _SP,
        ),
        interpret=interpret,
    )(qkv)
    return out[:, :s, :]


def _attn_block_kernel(x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, o_ref,
                       acc, *, seq_len: int, heads: int, head_dim: int,
                       scale: float, width: int, rows: int):
    """The ENTIRE attention block in one kernel: qkv projection -> SDPA
    -> out projection, per program over ``rows`` batch rows. Weights sit
    in VMEM (constant block index: fetched once, reused by every
    program), so the only HBM traffic per layer is x in and o out."""
    x = x_ref[...].reshape(rows * _SP, width)       # batch-packed rows
    _attn_block_core(x, wqkv_ref, bqkv_ref, wo_ref, bo_ref, o_ref, acc,
                     seq_len=seq_len, heads=heads, head_dim=head_dim,
                     scale=scale, width=width, residual=None, rows=rows)


def _attn_sublayer_kernel(x_ref, ln_scale_ref, ln_bias_ref, wqkv_ref,
                          bqkv_ref, wo_ref, bo_ref, o_ref, acc, *,
                          seq_len: int, heads: int, head_dim: int,
                          scale: float, width: int, eps: float):
    """The full pre-LN attention sublayer: LayerNorm -> qkv -> SDPA ->
    out projection -> +residual, consuming RAW x. Removes the LN-output
    and residual HBM round-trips XLA can't fuse through a pallas call."""
    raw = x_ref[...].reshape(2 * _SP, width)
    x32 = raw.astype(jnp.float32)
    mean = jnp.mean(x32, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = (y * ln_scale_ref[...].astype(jnp.float32)
         + ln_bias_ref[...].astype(jnp.float32))
    _attn_block_core(y.astype(raw.dtype), wqkv_ref, bqkv_ref, wo_ref,
                     bo_ref, o_ref, acc, seq_len=seq_len, heads=heads,
                     head_dim=head_dim, scale=scale, width=width,
                     residual=raw, rows=2)


def _attn_block_core(x, wqkv_ref, bqkv_ref, wo_ref, bo_ref, o_ref, acc, *,
                     seq_len: int, heads: int, head_dim: int, scale: float,
                     width: int, residual, rows: int = 2):
    qkv = jax.lax.dot_general(
        x, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(x.dtype)

    n = rows * _SP
    col_s = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) % _SP
    row_b = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) // _SP
    col_b = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) // _SP
    mask = jnp.logical_and(row_b == col_b, col_s < seq_len)

    for h in range(heads):
        lo = h * head_dim
        q2 = qkv[:, lo: lo + head_dim]
        k2 = qkv[:, width + lo: width + lo + head_dim]
        v2 = qkv[:, 2 * width + lo: 2 * width + lo + head_dim]
        scores = jax.lax.dot_general(
            q2, k2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        scores = jnp.where(mask, scores, _NEG)
        m = jnp.max(scores, axis=1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = (e / jnp.sum(e, axis=1, keepdims=True)).astype(x.dtype)
        acc[:, lo: lo + head_dim] = jax.lax.dot_general(
            probs, v2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)

    out = jax.lax.dot_general(
        acc[...], wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out = (out + bo_ref[...].astype(jnp.float32)).astype(o_ref.dtype)
    if residual is not None:
        # same order/dtype as the unfused `x + mha_block(...)`
        out = residual.astype(o_ref.dtype) + out
    o_ref[...] = out.reshape(rows, _SP, width)


@functools.partial(jax.jit, static_argnames=("heads", "eps", "interpret"))
def fused_attn_sublayer(x: jax.Array, ln_scale: jax.Array,
                        ln_bias: jax.Array, wqkv: jax.Array,
                        bqkv: jax.Array, wo: jax.Array, bo: jax.Array, *,
                        heads: int, eps: float = 1e-5,
                        interpret: bool | None = None) -> jax.Array:
    """``x + attn(LayerNorm(x))`` in one kernel (see
    :func:`fused_attn_block`; this variant also absorbs the LN and the
    residual add, whose intermediate arrays otherwise round-trip HBM on
    both sides of the pallas call). Same shape constraints."""
    b, s, w = x.shape
    d = w // heads
    if d != 64 or s > _SP or b % 2:
        raise ValueError(f"fused_attn_sublayer needs D=64, S<=64, even B; "
                         f"got B={b}, D={d}, S={s}")
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    pad = _SP - s
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    wqkv = wqkv.astype(x.dtype)
    wo = wo.astype(x.dtype)
    ln_scale = ln_scale.reshape(1, w).astype(jnp.float32)
    ln_bias = ln_bias.reshape(1, w).astype(jnp.float32)
    bqkv = bqkv.reshape(1, 3 * w).astype(jnp.float32)
    bo = bo.reshape(1, w).astype(jnp.float32)

    xspec = pl.BlockSpec((2, _SP, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(
        0 for _ in shape), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_sublayer_kernel, seq_len=s, heads=heads,
                          head_dim=d, scale=1.0 / (d ** 0.5), width=w,
                          eps=eps),
        grid=(b // 2,),
        in_specs=[xspec, const((1, w)), const((1, w)), const((w, 3 * w)),
                  const((1, 3 * w)), const((w, w)), const((1, w))],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, _SP, w), x.dtype),
        scratch_shapes=[pltpu.VMEM((2 * _SP, w), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * _SP * w * 4 * w + 4 * b * heads * _SP * _SP * d,
            bytes_accessed=2 * b * _SP * w * 2 + 8 * w * w * 2,
            transcendentals=b * heads * _SP * _SP,
        ),
        interpret=interpret,
    )(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo)
    return out[:, :s, :]


@functools.partial(jax.jit, static_argnames=("heads", "rows", "interpret"))
def fused_attn_block(x: jax.Array, wqkv: jax.Array, bqkv: jax.Array,
                     wo: jax.Array, bo: jax.Array, *, heads: int,
                     rows: int = 2,
                     interpret: bool | None = None) -> jax.Array:
    """qkv-projection + SDPA + out-projection fused into one pallas call.

    x: (B, S, W); wqkv: (W, 3W) = [wq | wk | wv]; wo: (W, W). S <= 64,
    D = 64, B divisible by ``rows`` (batch rows packed per program —
    rows=2 gives full (128, 128) MXU score tiles; rows=4 halves the
    program count with (256, 256) tiles). Returns (B, S, W) —
    everything between LayerNorm and the residual add of a ViT
    attention sublayer."""
    b, s, w = x.shape
    d = w // heads
    if d != 64 or s > _SP or b % rows:
        raise ValueError(f"fused_attn_block needs D=64, S<=64, "
                         f"B % rows == 0; got B={b}, D={d}, S={s}, "
                         f"rows={rows}")
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    pad = _SP - s
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    wqkv = wqkv.astype(x.dtype)
    wo = wo.astype(x.dtype)
    bqkv = bqkv.reshape(1, 3 * w).astype(jnp.float32)
    bo = bo.reshape(1, w).astype(jnp.float32)

    xspec = pl.BlockSpec((rows, _SP, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(
        0 for _ in shape), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_block_kernel, seq_len=s, heads=heads,
                          head_dim=d, scale=1.0 / (d ** 0.5), width=w,
                          rows=rows),
        grid=(b // rows,),
        in_specs=[xspec, const((w, 3 * w)), const((1, 3 * w)),
                  const((w, w)), const((1, w))],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, _SP, w), x.dtype),
        scratch_shapes=[pltpu.VMEM((rows * _SP, w), x.dtype)],
        cost_estimate=pl.CostEstimate(
            # score/probs work grows with the packed tile: each of the
            # b/rows programs does heads x (rows*SP)^2-sized matmul pairs
            flops=2 * b * _SP * w * 4 * w
            + 4 * b * rows * heads * _SP * _SP * d,
            bytes_accessed=2 * b * _SP * w * 2 + 8 * w * w * 2,
            transcendentals=b * rows * heads * _SP * _SP,
        ),
        interpret=interpret,
    )(x, wqkv, bqkv, wo, bo)
    return out[:, :s, :]


_MLP_ROWS = 128


def _mlp_block_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
                      quick: bool):
    """One program = _MLP_ROWS token rows through w1 -> gelu -> w2 with
    both weight matrices VMEM-resident. Numerics mirror layers.mlp_block
    exactly: f32 accumulation, bias in f32, activation in the compute
    dtype."""
    x = x_ref[...]
    h = jax.lax.dot_general(x, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = (h + b1_ref[...].astype(jnp.float32)).astype(x.dtype)
    # activation arithmetic in f32 (Mosaic rejects f32-scalar x bf16
    # broadcasts, and transcendentals are f32 on the VPU anyway); the
    # f32->dtype->f32 round-trip keeps input rounding identical to the
    # unfused path
    hf = h.astype(jnp.float32)
    if quick:
        hf = hf * jax.nn.sigmoid(1.702 * hf)
    else:
        hf = jax.nn.gelu(hf, approximate=False)
    h = hf.astype(x.dtype)
    out = jax.lax.dot_general(h, w2_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[...] = (out + b2_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


# weights for both GEMMs must sit in VMEM (~16 MB/core) alongside the
# row blocks and the f32 hidden tile
_MLP_VMEM_BUDGET = 12 * 2 ** 20


def mlp_fusible(width: int, hidden: int, dtype) -> bool:
    itemsize = jnp.dtype(dtype).itemsize
    weights = 2 * width * hidden * itemsize
    tiles = _MLP_ROWS * (2 * width + hidden) * itemsize + \
        _MLP_ROWS * hidden * 4
    return weights + tiles < _MLP_VMEM_BUDGET


def mlp_w8a8_fusible(width: int, hidden: int) -> bool:
    """VMEM check for the W8A8 kernel with ITS working set — int8
    weights, but bf16 x/out tiles plus f32 activations AND int32
    accumulators at (R, H); mlp_fusible's bf16 accounting undercounts
    those and would wave ViT-L (1024x4096, ~14.7 MB real) through the
    12 MB budget."""
    weights = 2 * width * hidden                       # int8
    r = _MLP_ROWS
    tiles = (r * width * 2      # x in (bf16)
             + r * width        # xq (int8)
             + r * hidden * 4   # acc1 (int32)
             + r * hidden * 4   # h (f32, activation)
             + r * hidden       # hq (int8)
             + r * width * 4    # acc2 (int32)
             + r * width * 2)   # out (bf16)
    return weights + tiles < _MLP_VMEM_BUDGET


def _mlp_w8a8_kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref,
                     b2_ref, o_ref, *, quick: bool):
    """W8A8 MLP, one program = _MLP_ROWS token rows: dynamic per-row
    activation quant -> int8 MXU GEMM -> f32 dequant -> activation ->
    requant -> int8 GEMM -> dequant. Both int8 weight matrices are
    VMEM-resident (HALF the bf16 kernel's footprint). Per-row scale
    semantics mirror clipx.models.quant.dense_w8a8; the activation runs
    in f32 (Mosaic transcendentals are f32 on the VPU)."""

    def quant_rows(v32):
        s = jnp.maximum(jnp.abs(v32).max(axis=1, keepdims=True), 1e-12
                        ) / 127.0
        q = jnp.clip(jnp.rint(v32 / s), -127, 127).astype(jnp.int8)
        return q, s

    xq, xs = quant_rows(x_ref[...].astype(jnp.float32))
    acc = jax.lax.dot_general(xq, w1_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    h = (acc.astype(jnp.float32) * (xs * s1_ref[...])
         + b1_ref[...])                                     # (R, H) f32
    if quick:
        h = h * jax.nn.sigmoid(1.702 * h)
    else:
        h = jax.nn.gelu(h, approximate=False)
    hq, hs = quant_rows(h)
    acc2 = jax.lax.dot_general(hq, w2_ref[...], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    out = acc2.astype(jnp.float32) * (hs * s2_ref[...]) + b2_ref[...]
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("quick", "interpret"))
def fused_mlp_w8a8(x: jax.Array, w1_q: jax.Array, s1: jax.Array,
                   b1: jax.Array, w2_q: jax.Array, s2: jax.Array,
                   b2: jax.Array, *, quick: bool = True,
                   interpret: bool | None = None) -> jax.Array:
    """Fused W8A8 transformer MLP (see _mlp_w8a8_kernel). Weights are
    pre-quantized int8 with per-output-channel scales
    (clipx.models.quant.quantize_weight layout)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    width, hidden = w1_q.shape
    shape = x.shape
    rows = 1
    for dim in shape[:-1]:
        rows *= dim
    x2 = x.reshape(rows, width)
    rows_pad = _round_up(rows, _MLP_ROWS)
    if rows_pad != rows:
        x2 = jnp.pad(x2, ((0, rows_pad - rows), (0, 0)))
    s1 = s1.reshape(1, hidden).astype(jnp.float32)
    s2 = s2.reshape(1, width).astype(jnp.float32)
    b1 = b1.reshape(1, hidden).astype(jnp.float32)
    b2 = b2.reshape(1, width).astype(jnp.float32)

    xspec = pl.BlockSpec((_MLP_ROWS, width), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(
        0 for _ in shape), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mlp_w8a8_kernel, quick=quick),
        grid=(rows_pad // _MLP_ROWS,),
        in_specs=[xspec, const((width, hidden)), const((1, hidden)),
                  const((1, hidden)), const((hidden, width)),
                  const((1, width)), const((1, width))],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((rows_pad, width), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * rows_pad * width * hidden,
            bytes_accessed=2 * rows_pad * width * 2 + 2 * width * hidden,
            transcendentals=rows_pad * hidden,
        ),
        interpret=interpret,
    )(x2, w1_q, s1, b1, w2_q, s2, b2)
    return out[:rows].reshape(shape)


@functools.partial(jax.jit, static_argnames=("quick", "interpret"))
def fused_mlp(x: jax.Array, w1: jax.Array, b1: jax.Array, w2: jax.Array,
              b2: jax.Array, *, quick: bool = True,
              interpret: bool | None = None) -> jax.Array:
    """Fused transformer MLP over (..., W): both GEMMs + activation in
    one kernel, 128 token rows per program (shape-agnostic — the token
    grid flattens, so any sequence length works)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    width, hidden = w1.shape
    shape = x.shape
    rows = 1
    for dim in shape[:-1]:
        rows *= dim
    x2 = x.reshape(rows, width)
    rows_pad = _round_up(rows, _MLP_ROWS)
    if rows_pad != rows:
        x2 = jnp.pad(x2, ((0, rows_pad - rows), (0, 0)))
    w1 = w1.astype(x.dtype)
    w2 = w2.astype(x.dtype)
    b1 = b1.reshape(1, hidden).astype(jnp.float32)
    b2 = b2.reshape(1, width).astype(jnp.float32)

    xspec = pl.BlockSpec((_MLP_ROWS, width), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(
        0 for _ in shape), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mlp_block_kernel, quick=quick),
        grid=(rows_pad // _MLP_ROWS,),
        in_specs=[xspec, const((width, hidden)), const((1, hidden)),
                  const((hidden, width)), const((1, width))],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((rows_pad, width), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * rows_pad * width * hidden,
            bytes_accessed=2 * rows_pad * width * 2 + 4 * width * hidden,
            transcendentals=rows_pad * hidden,
        ),
        interpret=interpret,
    )(x2, w1, b1, w2, b2)
    return out[:rows].reshape(shape)


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def packed_sdpa_rows(q: jax.Array, k: jax.Array, v: jax.Array, *,
                     heads: int, interpret: bool | None = None) -> jax.Array:
    """Batch-pair variant of :func:`packed_sdpa`: S <= 64, D = 64, any
    head count, even batch (odd batches fall back in the caller)."""
    b, s, w = q.shape
    d = w // heads
    if d != 64 or s > _SP or b % 2:
        raise ValueError(f"packed_sdpa_rows needs D=64, S<=64, even B; "
                         f"got B={b}, D={d}, S={s}")
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    pad = _SP - s
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))

    spec = pl.BlockSpec((2, _SP, w), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_rows_kernel, seq_len=s, heads=heads, head_dim=d,
                          scale=1.0 / (d ** 0.5)),
        grid=(b // 2,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, _SP, w), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * _SP * _SP * d,
            bytes_accessed=4 * b * _SP * w * 2,
            transcendentals=b * heads * _SP * _SP,
        ),
        interpret=interpret,
    )(q, k, v)
    return out[:, :s, :]


_BLOCK_Q = 128


def _long_kernel(q_ref, k_ref, v_ref, o_ref, *, seq_len: int, heads: int,
                 head_dim: int, scale: float, causal: bool):
    """Long-sequence fused SDPA: one program = (batch row, q block),
    looping heads over lane slices of the (S, H*D) layout. Blocks:
    q/o (1, BLOCK_Q, H*D); k/v (1, S_pad, H*D) resident in VMEM."""
    qi = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s_pad = k.shape[0]

    col = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK_Q, s_pad), 1)
    mask = col < seq_len
    if causal:
        row = (jax.lax.broadcasted_iota(jnp.int32, (_BLOCK_Q, s_pad), 0)
               + qi * _BLOCK_Q)
        mask = jnp.logical_and(mask, col <= row)

    for h in range(heads):
        lo = h * head_dim
        scores = jax.lax.dot_general(
            q[:, lo: lo + head_dim], k[:, lo: lo + head_dim],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # (BQ, S_pad)
        scores = jnp.where(mask, scores, _NEG)
        m = jnp.max(scores, axis=1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = (e / jnp.sum(e, axis=1, keepdims=True)).astype(v.dtype)
        o_ref[0, :, lo: lo + head_dim] = jax.lax.dot_general(
            probs, v[:, lo: lo + head_dim], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "causal", "interpret"))
def fused_sdpa_long(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    heads: int, causal: bool = False,
                    interpret: bool | None = None) -> jax.Array:
    """Fused SDPA for arbitrary sequence lengths in (B, S, W) layout.

    The ViT-L/14@336 tower (577 tokens) spends most of its XLA attention
    time writing/reading the (B, H, S, S) f32 score tensor for the
    softmax (~680 MB per layer at batch 32) plus layout transposes; this
    kernel keeps each (BLOCK_Q, S) score tile in VMEM and consumes the
    activations in their natural layout. Per-head matmuls contract over
    D=head_dim directly (no 64->128 lane padding — the waste that made
    clipx.ops.flash_attention lose to XLA in-model)."""
    b, s, w = q.shape
    d = w // heads
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    s_pad = _round_up(s, _BLOCK_Q)
    pad = s_pad - s
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    nq = s_pad // _BLOCK_Q

    qspec = pl.BlockSpec((1, _BLOCK_Q, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, s_pad, w), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_long_kernel, seq_len=s, heads=heads, head_dim=d,
                          scale=1.0 / (d ** 0.5), causal=causal),
        grid=(b, nq),
        in_specs=[qspec, kvspec, kvspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((b, s_pad, w), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * s_pad * s_pad * d,
            bytes_accessed=b * s_pad * w * 2 * (2 + 2 * nq),
            transcendentals=b * heads * s_pad * s_pad,
        ),
        interpret=interpret,
    )(q, k, v)
    return out[:, :s, :]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _long_qkv_kernel(qkv_ref, wo_ref, bo_ref, o_ref, *, seq_len: int,
                     heads: int, head_dim: int, scale: float, width: int,
                     causal: bool):
    """Long-sequence variant consuming the packed qkv projection and
    applying the out projection in-kernel. One program = (batch row,
    q block); the full (S_pad, 3W) row block sits in VMEM so K/V need
    no separate streams and q is a sublane slice of it."""
    qi = pl.program_id(1)
    t = qkv_ref[0]                      # (S_pad, 3W)
    s_pad = t.shape[0]
    q_rows = qkv_ref[0, pl.ds(qi * _BLOCK_Q, _BLOCK_Q), :]

    col = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK_Q, s_pad), 1)
    mask = col < seq_len
    if causal:
        row = (jax.lax.broadcasted_iota(jnp.int32, (_BLOCK_Q, s_pad), 0)
               + qi * _BLOCK_Q)
        mask = jnp.logical_and(mask, col <= row)

    acc = None
    for h in range(heads):
        lo = h * head_dim
        scores = jax.lax.dot_general(
            q_rows[:, lo: lo + head_dim],
            t[:, width + lo: width + lo + head_dim],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # (BQ, S_pad)
        scores = jnp.where(mask, scores, _NEG)
        m = jnp.max(scores, axis=1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = (e / jnp.sum(e, axis=1, keepdims=True)).astype(t.dtype)
        out_h = jax.lax.dot_general(
            probs, t[:, 2 * width + lo: 2 * width + lo + head_dim],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(t.dtype)
        # accumulate the out-projection head by head: o = sum_h o_h @ wo_h
        part = jax.lax.dot_general(
            out_h, wo_ref[pl.ds(lo, head_dim), :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (BQ, W) f32
        acc = part if acc is None else acc + part
    o_ref[0] = (acc + bo_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "causal", "interpret"))
def fused_sdpa_long_qkv(qkv: jax.Array, wo: jax.Array, bo: jax.Array, *,
                        heads: int, causal: bool = False,
                        interpret: bool | None = None) -> jax.Array:
    """SDPA + out projection over a packed (B, S, 3W) projection output.

    The ViT-L-class follow-up to :func:`fused_attn_block`: the qkv GEMM
    stays one wide XLA matmul (in-kernel it would be recomputed per q
    block), but nothing between it and the residual add touches HBM —
    no q/k/v slicing, no attention-output round-trip before ``wo``."""
    b, s, w3 = qkv.shape
    w = w3 // 3
    d = w // heads
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    s_pad = _round_up(s, _BLOCK_Q)
    if s_pad != s:
        qkv = jnp.pad(qkv, ((0, 0), (0, s_pad - s), (0, 0)))
    nq = s_pad // _BLOCK_Q
    wo = wo.astype(qkv.dtype)
    bo = bo.reshape(1, w).astype(jnp.float32)

    in_spec = pl.BlockSpec((1, s_pad, w3), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i, j: tuple(
        0 for _ in shape), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, _BLOCK_Q, w), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_long_qkv_kernel, seq_len=s, heads=heads,
                          head_dim=d, scale=1.0 / (d ** 0.5), width=w,
                          causal=causal),
        grid=(b, nq),
        in_specs=[in_spec, const((w, w)), const((1, w))],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, s_pad, w), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * s_pad * s_pad * d
            + 2 * b * s_pad * w * w,
            bytes_accessed=b * s_pad * w3 * 2 * nq + b * s_pad * w * 2
            + 2 * w * w,
            transcendentals=b * heads * s_pad * s_pad,
        ),
        interpret=interpret,
    )(qkv, wo, bo)
    return out[:, :s, :]


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def packed_sdpa(q: jax.Array, k: jax.Array, v: jax.Array, *, heads: int,
                interpret: bool | None = None) -> jax.Array:
    """q, k, v: (B, S, W) with W = heads * 64, S <= 64, heads even.
    Returns attention output in the same (B, S, W) layout."""
    b, s, w = q.shape
    d = w // heads
    if d != 64 or heads % 2 or s > _SP:
        raise ValueError(f"packed_sdpa needs D=64, even heads, S<=64; "
                         f"got heads={heads}, D={d}, S={s}")
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    pad = _SP - s
    if pad:
        qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    else:
        qp, kp, vp = q, k, v

    spec = pl.BlockSpec((1, _SP, w), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, seq_len=s, heads=heads, head_dim=d,
                          scale=1.0 / (d ** 0.5)),
        grid=(b,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, _SP, w), q.dtype),
        scratch_shapes=[pltpu.VMEM((heads // 2, 2 * _SP, d), q.dtype)
                        for _ in range(3)],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * _SP * _SP * d,
            bytes_accessed=4 * b * _SP * w * 2,
            transcendentals=b * heads * _SP * _SP,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :s, :]
