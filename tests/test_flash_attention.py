"""Pallas fused attention vs the XLA reference implementation.

Runs in interpreter mode on CPU (the same kernel code compiles on TPU;
bench.py exercises the compiled path)."""

import jax
import numpy as np
import pytest

import jax.numpy as jnp

from clipx.ops.attention import xla_attention
from clipx.ops.flash_attention import flash_attention


def _qkv(rng, b, h, s, d):
    def one():
        return rng.randn(b, h, s, d).astype(np.float32) * 0.5
    return one(), one(), one()


@pytest.mark.parametrize("s", [50, 77, 128, 130])
def test_matches_xla_noncausal(s):
    rng = np.random.RandomState(0)
    q, k, v = _qkv(rng, 2, 2, s, 64)
    ref = np.asarray(xla_attention(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v)))
    out = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("s", [77, 130])
def test_matches_xla_causal(s):
    rng = np.random.RandomState(1)
    q, k, v = _qkv(rng, 1, 2, s, 32)
    ref = np.asarray(xla_attention(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v), causal=True))
    out = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), causal=True,
                                     interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_padding_independence():
    """Padded tail positions must not influence valid outputs: compare a
    length-100 input against the same data embedded in a length-100 slice
    of a larger problem."""
    rng = np.random.RandomState(2)
    q, k, v = _qkv(rng, 1, 1, 100, 64)
    out = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), interpret=True))
    ref = np.asarray(xla_attention(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v)))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_vit_l_shape():
    """ViT-L/14@336 shape: 577 tokens, head dim 64."""
    rng = np.random.RandomState(3)
    q, k, v = _qkv(rng, 1, 4, 577, 64)
    ref = np.asarray(xla_attention(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v)))
    out = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_bf16_inputs():
    rng = np.random.RandomState(4)
    q, k, v = _qkv(rng, 1, 2, 64, 64)
    qb, kb, vb = (jnp.asarray(x, jnp.bfloat16) for x in (q, k, v))
    ref = np.asarray(xla_attention(qb, kb, vb), dtype=np.float32)
    out = np.asarray(flash_attention(qb, kb, vb, interpret=True),
                     dtype=np.float32)
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("s", [50, 64, 33])
def test_packed_pair_matches_xla(s):
    from clipx.ops.attention import packed_pair_attention
    rng = np.random.RandomState(7)
    q, k, v = _qkv(rng, 2, 4, s, 64)
    ref = np.asarray(xla_attention(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v)))
    out = np.asarray(packed_pair_attention(jnp.asarray(q), jnp.asarray(k),
                                           jnp.asarray(v)))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_packed_pair_heads_stay_independent():
    """Perturbing head 1's inputs must not change head 0's output."""
    from clipx.ops.attention import packed_pair_attention
    rng = np.random.RandomState(8)
    q, k, v = _qkv(rng, 1, 2, 50, 64)
    base = np.asarray(packed_pair_attention(jnp.asarray(q), jnp.asarray(k),
                                            jnp.asarray(v)))
    k2, v2 = k.copy(), v.copy()
    k2[:, 1] += 1.0
    v2[:, 1] -= 2.0
    pert = np.asarray(packed_pair_attention(jnp.asarray(q), jnp.asarray(k2),
                                            jnp.asarray(v2)))
    np.testing.assert_array_equal(base[:, 0], pert[:, 0])
    assert np.abs(base[:, 1] - pert[:, 1]).max() > 1e-3


def test_packed_sdpa_interpret_matches_xla():
    """The fused pallas SDPA kernel (interpret mode here; compiled on
    TPU) against the reference path, (B, S, W) layout."""
    from clipx.ops.packed_sdpa import packed_sdpa
    rng = np.random.RandomState(9)
    b, s, h, d = 2, 50, 4, 64
    q, k, v = (rng.randn(b, s, h * d).astype(np.float32) * 0.5
               for _ in range(3))

    def split(t):
        return jnp.asarray(t).reshape(b, s, h, d).transpose(0, 2, 1, 3)

    ref = np.asarray(xla_attention(split(q), split(k), split(v)))
    ref = ref.transpose(0, 2, 1, 3).reshape(b, s, h * d)
    out = np.asarray(packed_sdpa(jnp.asarray(q), jnp.asarray(k),
                                 jnp.asarray(v), heads=h, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_packed_sdpa_rejects_bad_shapes():
    from clipx.ops.packed_sdpa import packed_sdpa
    x = jnp.zeros((1, 50, 3 * 64))
    with pytest.raises(ValueError):
        packed_sdpa(x, x, x, heads=3, interpret=True)  # odd heads
    y = jnp.zeros((1, 100, 2 * 64))
    with pytest.raises(ValueError):
        packed_sdpa(y, y, y, heads=2, interpret=True)  # S > 64


@pytest.mark.parametrize("s,causal", [(130, False), (77, True), (577, False)])
def test_fused_sdpa_long_matches_xla(s, causal):
    from clipx.ops.packed_sdpa import fused_sdpa_long
    rng = np.random.RandomState(10)
    b, h, d = 1, 4, 64
    q, k, v = (rng.randn(b, s, h * d).astype(np.float32) * 0.5
               for _ in range(3))

    def split(t):
        return jnp.asarray(t).reshape(b, s, h, d).transpose(0, 2, 1, 3)

    ref = np.asarray(xla_attention(split(q), split(k), split(v),
                                   causal=causal))
    ref = ref.transpose(0, 2, 1, 3).reshape(b, s, h * d)
    out = np.asarray(fused_sdpa_long(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), heads=h,
                                     causal=causal, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_packed_sdpa_rows_matches_pairs_and_xla():
    """The batch-pair variant must be bit-identical to the head-pair
    kernel and match the XLA reference; it also covers odd head counts
    the pairs kernel rejects."""
    from clipx.ops.packed_sdpa import packed_sdpa, packed_sdpa_rows
    rng = np.random.RandomState(10)
    b, s, h, d = 4, 50, 4, 64
    q, k, v = (rng.randn(b, s, h * d).astype(np.float32) * 0.5
               for _ in range(3))
    pairs = np.asarray(packed_sdpa(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v), heads=h, interpret=True))
    rows = np.asarray(packed_sdpa_rows(jnp.asarray(q), jnp.asarray(k),
                                       jnp.asarray(v), heads=h,
                                       interpret=True))
    np.testing.assert_array_equal(rows, pairs)

    # odd heads: only the rows variant handles them
    h = 3
    q, k, v = (rng.randn(b, s, h * d).astype(np.float32) * 0.5
               for _ in range(3))

    def split(t):
        return jnp.asarray(t).reshape(b, s, h, d).transpose(0, 2, 1, 3)

    ref = np.asarray(xla_attention(split(q), split(k), split(v)))
    ref = ref.transpose(0, 2, 1, 3).reshape(b, s, h * d)
    out = np.asarray(packed_sdpa_rows(jnp.asarray(q), jnp.asarray(k),
                                      jnp.asarray(v), heads=h,
                                      interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_packed_sdpa_rows_rejects_odd_batch():
    from clipx.ops.packed_sdpa import packed_sdpa_rows
    x = jnp.zeros((3, 50, 2 * 64))
    with pytest.raises(ValueError):
        packed_sdpa_rows(x, x, x, heads=2, interpret=True)


@pytest.mark.parametrize("rows", [2, 4])
def test_fused_attn_block_matches_unfused(rows):
    """The whole-sublayer kernel (qkv proj -> SDPA -> out proj) against
    the composed reference ops, at both row-packing widths."""
    from clipx.ops.packed_sdpa import fused_attn_block, packed_sdpa

    rng = np.random.RandomState(11)
    b, s, h, d = 4, 50, 12, 64
    w = h * d
    x = jnp.asarray(rng.randn(b, s, w).astype(np.float32) * 0.1)
    wq, wk, wv, wo = (rng.randn(w, w).astype(np.float32) * 0.03
                      for _ in range(4))
    bq, bk, bv, bo = (rng.randn(w).astype(np.float32) * 0.01
                      for _ in range(4))

    def dense(t, wm, bias):
        return (jnp.dot(t, wm, preferred_element_type=jnp.float32)
                + bias).astype(t.dtype)

    o = packed_sdpa(dense(x, wq, bq), dense(x, wk, bk), dense(x, wv, bv),
                    heads=h, interpret=True)
    ref = np.asarray(dense(o, wo, bo))
    out = np.asarray(fused_attn_block(
        x, jnp.asarray(np.concatenate([wq, wk, wv], axis=1)),
        jnp.asarray(np.concatenate([bq, bk, bv])), jnp.asarray(wo),
        jnp.asarray(bo), heads=h, rows=rows, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_fused_mlp_matches_unfused():
    from clipx.ops.packed_sdpa import fused_mlp, mlp_fusible

    rng = np.random.RandomState(12)
    b, s, w = 3, 33, 768  # odd row count exercises padding
    hid = 4 * w
    assert mlp_fusible(w, hid, jnp.bfloat16)
    assert not mlp_fusible(1024, 4096, jnp.bfloat16)  # ViT-L: too big
    x = jnp.asarray(rng.randn(b, s, w).astype(np.float32) * 0.1)
    w1 = rng.randn(w, hid).astype(np.float32) * 0.02
    b1 = rng.randn(hid).astype(np.float32) * 0.01
    w2 = rng.randn(hid, w).astype(np.float32) * 0.02
    b2 = rng.randn(w).astype(np.float32) * 0.01

    def dense(t, wm, bias):
        return (jnp.dot(t, wm, preferred_element_type=jnp.float32)
                + bias).astype(t.dtype)

    for quick in (True, False):
        h = dense(x, w1, b1)
        if quick:
            h = h * jax.nn.sigmoid(1.702 * h)
        else:
            h = jax.nn.gelu(h, approximate=False)
        ref = np.asarray(dense(h, w2, b2))
        out = np.asarray(fused_mlp(x, jnp.asarray(w1), jnp.asarray(b1),
                                   jnp.asarray(w2), jnp.asarray(b2),
                                   quick=quick, interpret=True))
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_fused_mlp_w8a8_matches_unfused_quant_path():
    """The fused W8A8 kernel must track the unfused dense_w8a8 + gelu
    composition. Not bit-identical by design (the kernel's activation
    runs in f32, the unfused path's in the compute dtype), so the bound
    is a small fraction of the W8A8 quantization error itself."""
    from clipx.models.quant import dense_w8a8, quantize_weight
    from clipx.ops.packed_sdpa import fused_mlp_w8a8

    rng = np.random.RandomState(14)
    b, s, w = 3, 33, 768  # odd row count exercises padding
    hid = 4 * w
    x = jnp.asarray(rng.randn(b, s, w).astype(np.float32) * 0.1)
    w1_q, s1 = quantize_weight(rng.randn(w, hid).astype(np.float32) * 0.02)
    b1 = jnp.asarray(rng.randn(hid).astype(np.float32) * 0.01)
    w2_q, s2 = quantize_weight(rng.randn(hid, w).astype(np.float32) * 0.02)
    b2 = jnp.asarray(rng.randn(w).astype(np.float32) * 0.01)

    for quick in (True, False):
        h = dense_w8a8(x, w1_q, s1, b1)
        hf = h.astype(jnp.float32)
        hf = (hf * jax.nn.sigmoid(1.702 * hf) if quick
              else jax.nn.gelu(hf, approximate=False))
        ref = np.asarray(dense_w8a8(hf.astype(x.dtype), w2_q, s2, b2))
        out = np.asarray(fused_mlp_w8a8(x, w1_q, s1, b1, w2_q, s2, b2,
                                        quick=quick, interpret=True))
        denom = max(np.abs(ref).max(), 1e-6)
        assert np.abs(out - ref).max() / denom < 0.01


def test_packed_sdpa_qkv_matches_pairs():
    from clipx.ops.packed_sdpa import packed_sdpa, packed_sdpa_qkv

    rng = np.random.RandomState(13)
    b, s, h, d = 4, 50, 12, 64
    w = h * d
    q, k, v = (rng.randn(b, s, w).astype(np.float32) * 0.5
               for _ in range(3))
    ref = np.asarray(packed_sdpa(jnp.asarray(q), jnp.asarray(k),
                                 jnp.asarray(v), heads=h, interpret=True))
    out = np.asarray(packed_sdpa_qkv(
        jnp.asarray(np.concatenate([q, k, v], axis=2)), heads=h,
        interpret=True))
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("s,causal", [(577, False), (77, True)])
def test_fused_sdpa_long_qkv_matches_split(s, causal):
    from clipx.ops.packed_sdpa import fused_sdpa_long, fused_sdpa_long_qkv

    rng = np.random.RandomState(14)
    b, h, d = 2, 16, 64
    w = h * d
    q, k, v = (rng.randn(b, s, w).astype(np.float32) * 0.2
               for _ in range(3))
    wo = rng.randn(w, w).astype(np.float32) * 0.02
    bo = rng.randn(w).astype(np.float32) * 0.01
    o = fused_sdpa_long(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        heads=h, causal=causal, interpret=True)
    ref = np.asarray((jnp.dot(o, wo, preferred_element_type=jnp.float32)
                      + bo).astype(o.dtype))
    out = np.asarray(fused_sdpa_long_qkv(
        jnp.asarray(np.concatenate([q, k, v], axis=2)), jnp.asarray(wo),
        jnp.asarray(bo), heads=h, causal=causal, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=3e-5, atol=3e-5)


def test_fused_attn_sublayer_matches_composed():
    """LN -> qkv -> SDPA -> out proj -> +residual in one kernel vs the
    composed reference ops."""
    from clipx.models.layers import dense, layer_norm
    from clipx.ops.packed_sdpa import fused_attn_sublayer, packed_sdpa

    rng = np.random.RandomState(15)
    b, s, h, d = 4, 50, 12, 64
    w = h * d
    x = jnp.asarray(rng.randn(b, s, w).astype(np.float32) * 0.3)
    ln_s = rng.randn(w).astype(np.float32) * 0.1 + 1.0
    ln_b = rng.randn(w).astype(np.float32) * 0.05
    wq, wk, wv, wo = (rng.randn(w, w).astype(np.float32) * 0.03
                      for _ in range(4))
    bq, bk, bv, bo = (rng.randn(w).astype(np.float32) * 0.01
                      for _ in range(4))
    y = layer_norm(x, {"scale": jnp.asarray(ln_s),
                       "bias": jnp.asarray(ln_b)}, 1e-5)
    o = packed_sdpa(dense(y, wq, bq), dense(y, wk, bk), dense(y, wv, bv),
                    heads=h, interpret=True)
    ref = np.asarray(x + dense(o, wo, bo))
    out = np.asarray(fused_attn_sublayer(
        x, jnp.asarray(ln_s), jnp.asarray(ln_b),
        jnp.asarray(np.concatenate([wq, wk, wv], axis=1)),
        jnp.asarray(np.concatenate([bq, bk, bv])), jnp.asarray(wo),
        jnp.asarray(bo), heads=h, eps=1e-5, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=3e-5, atol=3e-5)
