"""Encoder service unit tests: bucketing, chunking, dtype policy,
text/image consistency."""

import numpy as np
import pytest

from clipx.runtime.encoder import Encoder, _pick_bucket


@pytest.fixture(scope="module")
def enc():
    return Encoder.create("tiny-test", batch_buckets=(1, 4, 8))


def test_pick_bucket():
    assert _pick_bucket(1, (1, 4, 8)) == 1
    assert _pick_bucket(3, (1, 4, 8)) == 4
    assert _pick_bucket(8, (1, 4, 8)) == 8
    assert _pick_bucket(99, (1, 4, 8)) == 8


def test_padding_does_not_change_results(enc):
    rng = np.random.RandomState(0)
    batch = rng.randint(0, 256, (3, 32, 32, 3), np.uint8)
    out3 = enc.encode_images(batch)           # padded to bucket 4
    out1 = np.concatenate([enc.encode_images(batch[i:i + 1])
                           for i in range(3)])
    np.testing.assert_allclose(out3, out1, rtol=1e-4, atol=1e-5)


def test_oversized_batch_chunks(enc):
    rng = np.random.RandomState(1)
    batch = rng.randint(0, 256, (19, 32, 32, 3), np.uint8)  # > bucket cap 8
    out = enc.encode_images(batch)
    assert out.shape == (19, 32)
    ref = np.concatenate([enc.encode_images(batch[i:i + 1])
                          for i in range(19)])
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_embeddings_are_normalized_f32(enc):
    rng = np.random.RandomState(2)
    out = enc.encode_images(rng.randint(0, 256, (2, 32, 32, 3), np.uint8))
    assert out.dtype == np.float32
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-4)


def test_encode_texts_shapes(enc):
    out = enc.encode_texts("one string")
    assert out.shape == (1, 32)
    out = enc.encode_texts(["a", "b", "c"])
    assert out.shape == (3, 32)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-4)


def test_encode_texts_bucketed_one_compile(enc):
    """Different request sizes inside one bucket must reuse one compiled
    shape — serve's /encode_text takes arbitrary-length lists and a
    fresh XLA compile mid-request costs minutes on the tunneled TPU."""
    enc.encode_texts(["warm"] * 2)  # compile the 4-bucket once
    before = enc._encode_text._cache_size()
    a = enc.encode_texts(["two", "texts"])
    b = enc.encode_texts(["three", "texts", "now"])
    c = enc.encode_texts(["four", "texts", "this", "time"])
    assert enc._encode_text._cache_size() == before  # no new compiles
    assert a.shape == (2, 32) and b.shape == (3, 32) and c.shape == (4, 32)


def test_encode_texts_padding_parity(enc):
    """Bucket padding must not change the returned embeddings."""
    texts = ["a photo of a dog", "sunset", "blue car"]
    padded = enc.encode_texts(texts)                 # bucket 4
    singles = np.concatenate([enc.encode_texts([t]) for t in texts])
    np.testing.assert_allclose(padded, singles, rtol=1e-4, atol=1e-5)


def test_encode_texts_chunks_past_cap(enc):
    """Lists beyond the largest text bucket are chunked transparently."""
    from clipx.runtime.encoder import _TEXT_BUCKETS

    n = _TEXT_BUCKETS[-1] + 3
    out = enc.encode_texts([f"text {i}" for i in range(n)])
    assert out.shape == (n, 32)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-4)


def test_async_matches_sync(enc):
    rng = np.random.RandomState(3)
    batch = rng.randint(0, 256, (5, 32, 32, 3), np.uint8)
    sync = enc.encode_images(batch)
    handle = enc.encode_images_async(batch)
    out = enc.finalize(handle)
    np.testing.assert_allclose(out, sync, rtol=1e-5, atol=1e-6)


def test_async_rejects_oversized(enc):
    with pytest.raises(ValueError):
        enc.encode_images_async(np.zeros((9, 32, 32, 3), np.uint8))


def test_canvas_route_close_to_direct(enc):
    """A larger square canvas goes through device_resize_normalize and
    must embed close to the host-resized version of the same image."""
    from PIL import Image

    from clipx.ops.preprocess import pil_resize_crop

    rng = np.random.RandomState(4)
    img = Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8))
    canvas = np.asarray(img.resize((40, 40), Image.BICUBIC))[None]
    direct = enc.encode_images(pil_resize_crop(img, 32)[None])
    via_device = enc.encode_images(canvas)
    cos = float(direct[0] @ via_device[0])
    assert cos > 0.9


def test_warmup_runs(enc):
    enc.warmup(buckets=(1,))


def test_checkpoint_without_merges_warns(tmp_path, capsys):
    """Real-weight readiness: a supplied checkpoint without the learned
    BPE merge table must warn loudly that text queries won't match
    (reference:query-index.py:107 — tokenize must match the weights)."""
    from types import SimpleNamespace

    import jax

    from clipx.cli import common
    from clipx.config import tiny_test
    from clipx.models import clip as model_lib, convert
    from clipx.text.tokenizer import ClipTokenizer

    if ClipTokenizer().has_learned_merges:
        pytest.skip("merge table present — warning path not reachable")
    params = model_lib.init_params(tiny_test(), jax.random.PRNGKey(0))
    path = str(tmp_path / "params.npz")
    convert.save_params(path, params)
    args = SimpleNamespace(model="tiny-test", checkpoint=path)
    common.make_encoder(args)
    assert "TEXT QUERIES WILL NOT MATCH" in capsys.readouterr().err


def test_vit_preset_family_construct():
    """All ViT presets (incl. the plain ViT-L/14 the OpenAI release
    ships next to @336px) build consistent configs."""
    from clipx import config as config_lib

    for name, seq in (("ViT-B/32", 50), ("ViT-B/16", 197),
                      ("ViT-L/14", 257), ("ViT-L/14@336px", 577)):
        cfg = config_lib.get_config(name)
        assert cfg.vision.tower == "vit"
        assert cfg.vision.seq_len == seq
        assert cfg.text.embed_dim == cfg.vision.embed_dim
