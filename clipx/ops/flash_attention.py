"""Pallas fused attention for the CLIP towers.

One kernel instance handles one (batch*head, q-block): it streams the
full K/V for that head into VMEM, computes the (BLOCK_Q, S) score tile
on the MXU, does a float32 masked softmax on the VPU, and multiplies
back into V — the (S, S) score matrix never touches HBM. For CLIP's
sequence lengths (50-577 tokens; ViT-L/14@336 is 577) whole-K/V-in-VMEM
is comfortably within the ~16 MB budget, so no online-softmax streaming
over K blocks is needed; masking handles both causality (text tower)
and the sequence padding introduced to reach block multiples.

Falls back to interpreter mode off-TPU so the same code path is unit
tested on CPU (tests/test_flash_attention.py) and compiled on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 128
_NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, seq_len: int, causal: bool,
                 scale: float):
    """q_ref: (1, BLOCK_Q, D); k_ref/v_ref: (1, S_pad, D); o_ref like q_ref."""
    qi = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # (BLOCK_Q, S_pad)

    s_pad = scores.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    mask = col < seq_len
    if causal:
        row = (jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
               + qi * BLOCK_Q)
        mask = jnp.logical_and(mask, col <= row)
    scores = jnp.where(mask, scores, _NEG_INF)

    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=1, keepdims=True)

    o_ref[0] = jax.lax.dot_general(
        probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("causal", "interpret"))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    causal: bool = False,
                    interpret: bool | None = None) -> jax.Array:
    """Fused attention on (B, H, S, D) tensors; returns (B, H, S, D)."""
    b, h, s, d = q.shape
    scale = 1.0 / (d ** 0.5)
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    s_pad = _round_up(s, BLOCK_Q)
    d_pad = _round_up(d, 128)

    def prep(x):
        x = x.reshape(b * h, s, d)
        return jnp.pad(x, ((0, 0), (0, s_pad - s), (0, d_pad - d)))

    qf, kf, vf = prep(q), prep(k), prep(v)
    bh = b * h
    nq = s_pad // BLOCK_Q

    out = pl.pallas_call(
        functools.partial(_attn_kernel, seq_len=s, causal=causal,
                          scale=scale),
        grid=(bh, nq),
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_Q, d_pad), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, s_pad, d_pad), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * s_pad * s_pad * d_pad,
            bytes_accessed=bh * s_pad * d_pad * 4 * 4,
            transcendentals=bh * s_pad * s_pad,
        ),
        interpret=interpret,
    )(qf, kf, vf)

    return out[:, :s, :d].reshape(b, h, s, d)
