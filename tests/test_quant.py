"""W8A8 inference quantization (clipx.models.quant, CLIPX_COMPUTE=int8).

The int8 MLP is an opt-in fast path past the bf16 compute floor
(docs/ARCHITECTURE.md); these tests pin its numerics on CPU — random
weights are a HARSHER drift case than trained CLIP checkpoints (no
outlier-free structure) — and the Encoder wiring/guards around it.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clipx.models import quant
from clipx.models.layers import dense


def test_quantize_weight_roundtrip_error():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(3, 64, 128)).astype(np.float32)
    w_i8, s = quant.quantize_weight(w)
    assert w_i8.dtype == jnp.int8 and s.shape == (3, 128)
    deq = np.asarray(w_i8, np.float32) * np.asarray(s)[:, None, :]
    # symmetric 127-step quant: per-channel max error <= scale/2
    err = np.abs(deq - w)
    bound = np.asarray(s)[:, None, :] * 0.5 + 1e-7
    assert (err <= bound).all()


def test_dense_w8a8_matches_dense():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 7, 96)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(96, 160)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(160,)).astype(np.float32))
    w_i8, s = quant.quantize_weight(w)
    ref = np.asarray(dense(x, w, b))
    got = np.asarray(quant.dense_w8a8(x, w_i8, s, b))
    # W8A8 double-rounding: relative error ~1% of the row magnitude
    denom = np.maximum(np.abs(ref).max(), 1e-6)
    assert np.abs(got - ref).max() / denom < 0.02


def test_dense_w8a8_zero_row_is_finite():
    x = jnp.zeros((2, 8), jnp.float32)
    w_i8, s = quant.quantize_weight(jnp.ones((8, 16), jnp.float32))
    out = np.asarray(quant.dense_w8a8(x, w_i8, s))
    assert np.isfinite(out).all() and (out == 0).all()


@pytest.fixture(scope="module")
def encoders():
    from clipx.runtime.encoder import Encoder

    base = Encoder.create("tiny-test", batch_buckets=(4,))
    q = Encoder.create("tiny-test", batch_buckets=(4,),
                       compute_quant="int8")
    return base, q


def test_encoder_int8_structure(encoders):
    _, q = encoders
    mlp = q.params["visual"]["blocks"]["mlp"]
    assert mlp["w1_q"].dtype == jnp.int8
    assert mlp["s1"].dtype == jnp.float32
    assert "w1" not in mlp
    # patchify + attention stay bf16 unless CLIPX_INT8_PATCH/_ATTN=on
    # (both measured slower on chip — see encoder.py)
    assert "kernel" in q.params["visual"]["patch_embed"]
    assert "wq" in q.params["visual"]["blocks"]["attn"]
    # text tower untouched
    assert "w1" in q.params["text"]["blocks"]["mlp"]
    assert q.compute_quant == "int8"


def test_encoder_int8_attn_opt_in(monkeypatch):
    from clipx.runtime.encoder import Encoder

    monkeypatch.setenv("CLIPX_INT8_ATTN", "on")
    monkeypatch.setenv("CLIPX_INT8_PATCH", "on")
    base = Encoder.create("tiny-test", batch_buckets=(4,))
    q = Encoder.create("tiny-test", batch_buckets=(4,),
                       compute_quant="int8")
    attn = q.params["visual"]["blocks"]["attn"]
    assert attn["wq_q"].dtype == jnp.int8 and "wq" not in attn
    pe = q.params["visual"]["patch_embed"]
    assert pe["kernel_q"].dtype == jnp.int8 and "kernel" not in pe
    rng = np.random.default_rng(4)
    batch = rng.integers(0, 255, (4, base.image_size, base.image_size, 3),
                         dtype=np.uint8)
    cos = (base.encode_images(batch) * q.encode_images(batch)).sum(axis=1)
    assert (cos > 0.98).all(), cos


def test_encoder_int8_embedding_drift(encoders):
    base, q = encoders
    rng = np.random.default_rng(2)
    batch = rng.integers(0, 255, (4, base.image_size, base.image_size, 3),
                         dtype=np.uint8)
    e0 = base.encode_images(batch)
    e1 = q.encode_images(batch)
    cos = (e0 * e1).sum(axis=1)  # both L2-normalized
    assert (cos > 0.99).all(), cos
    # text path must be bit-identical (not quantized)
    t0 = base.encode_texts(["a photo"])
    t1 = q.encode_texts(["a photo"])
    np.testing.assert_array_equal(t0, t1)


def test_encoder_int8_self_retrieval(encoders):
    """Quantization must not scramble ranking: every image's nearest
    neighbour among the batch embeddings stays itself-first under the
    exact engine (the quality-gate criterion at test scale)."""
    from clipx.search.engine import VectorIndex

    base, q = encoders
    rng = np.random.default_rng(3)
    batch = rng.integers(0, 255, (8, base.image_size, base.image_size, 3),
                         dtype=np.uint8)
    vecs = np.concatenate([q.encode_images(batch[:4]),
                           q.encode_images(batch[4:])])
    idx = VectorIndex.from_vectors(vecs)
    _, ids = idx.search(vecs, 1)
    assert (ids[:, 0] == np.arange(8)).all()


def test_encoder_int8_guards():
    from clipx.runtime.encoder import Encoder

    with pytest.raises(ValueError, match="compute mode"):
        Encoder.create("tiny-test", compute_quant="fp4")
    with pytest.raises(ValueError, match="RN family"):
        Encoder.create("RN50", compute_quant="int8")


def test_env_var_opt_in(monkeypatch):
    from clipx.runtime.encoder import Encoder

    monkeypatch.setenv("CLIPX_COMPUTE", "int8")
    enc = Encoder.create("tiny-test", batch_buckets=(4,))
    assert enc.compute_quant == "int8"
    # explicit ctor arg beats the env (flags-beat-env convention)
    monkeypatch.setenv("CLIPX_COMPUTE", "bf16")
    enc = Encoder.create("tiny-test", batch_buckets=(4,),
                         compute_quant="int8")
    assert enc.compute_quant == "int8"
