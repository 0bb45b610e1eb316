"""Pallas PQ-scan kernel: one-hot x LUT matmul with VMEM-resident
expansion.

The XLA formulation of the PQ ADC scan (clipx/search/pq.py) materializes
the (rows, M*16) one-hot operand through HBM — 16x the packed-code bytes
in write+read traffic (measured 65.8 ms at 1M x 512, dsub=2, vs the
0.16 ms the 128 B/row of codes would cost at HBM roofline). This kernel
keeps the whole expansion on chip: each grid step DMAs one TILE of
packed codes into VMEM, unpacks nibbles, expands one-hot and contracts
against the LUT in GROUP-subspace slices (so the one-hot transient
lives only in VMEM), and writes back just the (Q, TILE) scores.

Arithmetic is exact: the one-hot is 0/1 (exact in bf16), the int8 LUT
values are integers <= 127 (exact in bf16), and the f32 accumulator
holds sums < 2^24 exactly — so the scores are BITWISE equal to the XLA
int8 path's (pinned in test_pq_scan).

HBM traffic per row: M/2 B codes read + 4*Q B scores written (+ read
once downstream) — ~3x the codes at Q=16, vs ~65x for the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 2048   # rows per grid step: VMEM ~= expanded group (TILE, 512)
#                bf16 x2 (replicated nibbles + one-hot) + int32 byte
#                view + acc < 8 MB, well inside the ~16 MB budget
_GROUP = 32    # subspaces per inner matmul: contraction depth 32*16=512


def _group_size(half: int) -> int:
    """Largest divisor of ``half`` (= M/2 packed bytes) <= _GROUP, so
    the static group loop tiles the byte columns evenly."""
    for g in range(min(_GROUP, half), 0, -1):
        if half % g == 0:
            return g
    return 1


def _kernel(packed_ref, lut_ref, out_ref):
    """packed_ref: (TILE, half) int8 codes (split nibble layout);
    lut_ref: (M*16, Q) bf16 int-valued LUT in TILE-PERMUTED row order
    (see ``permute_lut``); out_ref: (Q, TILE) f32.

    Everything stays strictly 2-D: Mosaic rejects minor-dim reshapes
    like (TILE, G, 16) -> (TILE, G*16) ("unsupported shape cast"), so
    the one-hot is built by TILING each group's nibble columns 16x
    across lanes (``pltpu.repeat`` has abcd-abcd semantics — a cheap
    relayout; the first cut replicated through a constant 0/1 matmul,
    which measured as 2x the main matmul's FLOPs) and comparing
    against the lane//g code pattern. The LUT rows are permuted to the
    matching (code, subspace) order outside the kernel. Small-int
    values < 16 are exact in f32/bf16 and the final integer sums
    < 2^24 are exact in f32, so scores match the XLA int8 path
    bitwise."""
    tile, half = packed_ref.shape
    q = lut_ref.shape[1]
    g = _group_size(half)
    gk = g * 16
    # zero-extend bytes to int32 once: nibble masks/shifts in int32 are
    # unconditionally supported by Mosaic
    u = pltpu.bitcast(packed_ref[:], jnp.uint8).astype(jnp.int32)
    # lane pattern: code value = lane // g under tile-replication
    cpat = jax.lax.broadcasted_iota(jnp.int32, (tile, gk), 1) // g
    # int8 LUT -> int8 x int8 MXU matmul at 2x the bf16 rate with an
    # exact int32 accumulator; bf16 LUT -> bf16 matmul (the fallback
    # knob, CLIPX_PQ_LUT). Both are exact integer arithmetic.
    int_path = lut_ref.dtype == jnp.int8
    oh_dtype = jnp.int8 if int_path else jnp.bfloat16
    acc = jnp.zeros((tile, q), jnp.int32 if int_path else jnp.float32)
    for h in range(2):                       # lo nibbles, then hi
        for gi in range(half // g):
            cols = u[:, gi * g: (gi + 1) * g]
            nib = (cols & 0xF) if h == 0 else (cols >> 4)
            nib_rep = pltpu.repeat(nib, 16, axis=1)   # (TILE, gk) tiled
            onehot = (nib_rep == cpat).astype(oh_dtype)
            row0 = (h * half + gi * g) * 16
            lut_g = lut_ref[row0: row0 + gk, :]       # (gk, Q)
            acc = acc + jax.lax.dot_general(
                onehot, lut_g, (((1,), (0,)), ((), ())),
                preferred_element_type=acc.dtype)     # (TILE, Q)
    # transposed store: callers rank per query over (Q, N) directly
    out_ref[:] = acc.T.astype(jnp.float32)


def permute_lut(lut_t: jax.Array, half: int) -> jax.Array:
    """Reorder (M*16, Q) LUT rows from the canonical (subspace, code)
    order to the kernel's tile-replicated (code, subspace-within-group)
    order: within each group block of g subspaces, row g'*16 + c moves
    to c*g + g'. Pure relayout, done once per search in XLA."""
    mk, q = lut_t.shape
    g = _group_size(half)
    blocks = mk // (g * 16)
    return (lut_t.reshape(blocks, g, 16, q)
            .transpose(0, 2, 1, 3)
            .reshape(mk, q))


@functools.partial(jax.jit, static_argnames=("interpret",))
def pq_scan_scores(packed: jax.Array, lut_t: jax.Array,
                   interpret: bool | None = None) -> jax.Array:
    """packed: (N, M/2) int8 split-layout PQ codes; lut_t: (M*16, Q)
    bf16 integer-valued LUT (pq.quantized_luts' luti, transposed —
    canonical order; permuted here for the kernel). Returns (Q, N) f32
    raw LUT-sum scores (per-query scale NOT applied — callers rank per
    query, where a positive scale is irrelevant)."""
    n, half = packed.shape
    mk, q = lut_t.shape
    if mk != 2 * half * 16:
        raise ValueError(f"lut rows {mk} != {2 * half * 16}")
    lut_t = permute_lut(lut_t, half)
    tile = min(_TILE, n)
    if n % tile:
        raise ValueError(f"rows {n} not a multiple of the {tile} tile "
                         "— pad to engine._bucket_rows")
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    return pl.pallas_call(
        _kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, half), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mk, q), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * mk * q,
            bytes_accessed=n * half + mk * q * 2 + q * n * 4,
            transcendentals=0),
        interpret=interpret,
    )(packed, lut_t)
