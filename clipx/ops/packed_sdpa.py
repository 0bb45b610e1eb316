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
