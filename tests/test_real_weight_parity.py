"""Real-weight parity gate (SURVEY.md section 4 item 1).

The golden-embedding contract — clipx encoders match OpenAI CLIP on real
weights within cosine >= 0.999 — needs two artifacts this offline host
cannot produce: the converted checkpoint and the learned BPE merge
table (reference:query-index.py:107-108 — tokenization must match the
weights). These tests are therefore *gated*: they skip with a clear
reason until the artifacts exist, and become the enforcement gate the
moment they do.

To arm the gate:

1. ``tools/make_golden.py`` (run on a host with the torch CLIP package)
   writes ``tests/golden/clip_golden.npz`` with reference embeddings.
2. Put the merge table where the tokenizer finds it ($CLIPX_BPE_PATH or
   next to clipx/text/tokenizer.py).
3. ``CLIPX_CHECKPOINT=/path/to/converted.npz python -m pytest
   tests/test_real_weight_parity.py``.
"""

import os

import numpy as np
import pytest

from clipx.text.tokenizer import ClipTokenizer

CKPT = os.environ.get("CLIPX_CHECKPOINT")
GOLDEN = os.environ.get(
    "CLIPX_GOLDEN",
    os.path.join(os.path.dirname(__file__), "golden", "clip_golden.npz"))

_tok = ClipTokenizer()

needs_merges = pytest.mark.skipif(
    not _tok.has_learned_merges,
    reason="learned BPE merge table not present (see module docstring)")
needs_ckpt = pytest.mark.skipif(
    not (CKPT and os.path.exists(CKPT)),
    reason="$CLIPX_CHECKPOINT not set / missing")
needs_golden = pytest.mark.skipif(
    not os.path.exists(GOLDEN),
    reason="golden fixture missing — generate with tools/make_golden.py")


@needs_merges
def test_tokenizer_matches_openai_ids():
    """Validates the supplied merge table itself: canonical CLIP ids for
    a well-known prompt (published in the OpenAI CLIP repo examples)."""
    ids = _tok(["a photo of a cat"])[0]
    expected = [49406, 320, 1125, 539, 320, 2368, 49407]
    assert ids[: len(expected)].tolist() == expected
    assert (ids[len(expected):] == 0).all()


@needs_merges
@needs_ckpt
@needs_golden
def test_golden_embedding_parity():
    """clipx encoders vs stored torch-CLIP reference embeddings."""
    from clipx.runtime.encoder import Encoder

    data = np.load(GOLDEN, allow_pickle=True)
    model = str(data["model"]) if "model" in data else "ViT-B/32"
    enc = Encoder.create(model, checkpoint=CKPT)

    texts = [str(t) for t in data["texts"]]
    ours_t = enc.encode_texts(texts)
    ref_t = np.asarray(data["text_emb"], np.float32)
    cos_t = np.sum(ours_t * ref_t, axis=1)  # both L2-normalized
    assert cos_t.min() >= 0.999, f"text cosine {cos_t.min():.5f}"

    imgs = np.asarray(data["images_uint8"], np.uint8)
    ours_i = enc.encode_images(imgs)
    ref_i = np.asarray(data["image_emb"], np.float32)
    cos_i = np.sum(ours_i * ref_i, axis=1)
    assert cos_i.min() >= 0.999, f"image cosine {cos_i.min():.5f}"


@needs_ckpt
def test_checkpoint_tree_matches_preset():
    """Armed by the CHECKPOINT alone (neither merges nor golden
    fixture needed — the smallest artifact unblocks it): the converted
    tree must match the preset's parameter tree path-for-path and
    shape-for-shape, and image embeddings must come out unit-norm.
    Catches truncated or mis-converted weight drops the moment one
    exists, before the full golden gate can run."""
    import jax

    from clipx.runtime.encoder import Encoder

    enc = Encoder.create("ViT-B/32", checkpoint=CKPT)
    ref = Encoder.create("ViT-B/32")  # random init, same preset

    def shapes(params):
        return {jax.tree_util.keystr(p): v.shape for p, v in
                jax.tree_util.tree_leaves_with_path(params)}

    got, want = shapes(enc.params), shapes(ref.params)
    assert got.keys() == want.keys(), (
        sorted(set(want) - set(got)), sorted(set(got) - set(want)))
    bad = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not bad, bad
    emb = enc.encode_images(
        np.zeros((1, enc.image_size, enc.image_size, 3), np.uint8))
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0,
                               atol=1e-4)


@needs_ckpt
def test_checkpoint_without_merges_warns_loudly(capsys):
    """The CLI must tell the user their text queries are garbage when a
    checkpoint is supplied without the merge table."""
    if _tok.has_learned_merges:
        pytest.skip("merges present — warning path not reachable")
    from types import SimpleNamespace

    from clipx.cli import common

    args = SimpleNamespace(model="ViT-B/32", checkpoint=CKPT)
    common.make_encoder(args)
    err = capsys.readouterr().err
    assert "TEXT QUERIES WILL NOT MATCH" in err
