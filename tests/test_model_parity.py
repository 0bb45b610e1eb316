"""Golden-embedding architecture parity vs the torch CLIP implementation.

The reference's embeddings come from OpenAI CLIP in torch
(reference:build-index.py:49, reference:query-index.py:108). Real weights
aren't downloadable in this environment, so parity is checked
structurally: a randomly-initialized HuggingFace ``CLIPModel`` (same
architecture family, ``quick_gelu``) is converted through
``clipx.models.convert.from_hf_state_dict`` and must produce matching
image/text embeddings in float32. This exercises every numerical detail
of the towers (patchify-as-matmul, pre-LN placement, attention scaling,
QuickGELU, EOT pooling, projections) — the same converter handles the
real ViT-B/32 checkpoint when one is supplied.
"""

import numpy as np
import os
import pytest

import jax

from clipx.config import CLIPConfig, TextConfig, VisionConfig
from clipx.models import clip as clipx_clip
from clipx.models import convert

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

VOCAB = 512
EOS = VOCAB - 1


@pytest.fixture(scope="module")
def tiny_pair():
    """(hf torch model, clipx params, clipx config) with shared random weights."""
    from transformers import CLIPConfig as HFConfig
    from transformers import CLIPModel

    hf_cfg = HFConfig(
        text_config={
            "vocab_size": VOCAB, "hidden_size": 64, "intermediate_size": 128,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "max_position_embeddings": 16, "hidden_act": "quick_gelu",
            "eos_token_id": EOS, "bos_token_id": EOS - 1, "pad_token_id": 0,
        },
        vision_config={
            "hidden_size": 64, "intermediate_size": 128,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "image_size": 32, "patch_size": 16, "hidden_act": "quick_gelu",
        },
        projection_dim=32,
    )
    torch.manual_seed(0)
    model = CLIPModel(hf_cfg).eval()

    cfg = CLIPConfig(
        name="tiny-hf",
        vision=VisionConfig(image_size=32, patch_size=16, width=64,
                            layers=2, heads=2, embed_dim=32),
        text=TextConfig(context_length=16, vocab_size=VOCAB, width=64,
                        layers=2, heads=2, embed_dim=32),
    )
    params = convert.from_hf_state_dict(model.state_dict(), cfg)
    return model, params, cfg


def test_image_embedding_parity(tiny_pair):
    model, params, cfg = tiny_pair
    rng = np.random.RandomState(1)
    pixels = rng.randn(3, 32, 32, 3).astype(np.float32)

    with torch.no_grad():
        ref = model.get_image_features(
            pixel_values=torch.tensor(pixels).permute(0, 3, 1, 2)).numpy()

    ours = np.asarray(clipx_clip.encode_image(params, cfg, pixels))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_text_embedding_parity(tiny_pair):
    model, params, cfg = tiny_pair
    ids = np.zeros((2, 16), dtype=np.int32)
    ids[0, :5] = [EOS - 1, 5, 17, 300, EOS]
    ids[1, :3] = [EOS - 1, 42, EOS]

    with torch.no_grad():
        ref = model.get_text_features(
            input_ids=torch.tensor(ids, dtype=torch.long)).numpy()

    ours = np.asarray(clipx_clip.encode_text(params, cfg, ids))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_forward_logits_parity(tiny_pair):
    model, params, cfg = tiny_pair
    rng = np.random.RandomState(2)
    pixels = rng.randn(2, 32, 32, 3).astype(np.float32)
    ids = np.zeros((2, 16), dtype=np.int32)
    ids[0, :4] = [EOS - 1, 9, 10, EOS]
    ids[1, :4] = [EOS - 1, 30, 31, EOS]

    with torch.no_grad():
        out = model(input_ids=torch.tensor(ids, dtype=torch.long),
                    pixel_values=torch.tensor(pixels).permute(0, 3, 1, 2))
        ref = out.logits_per_image.numpy()

    ours, ours_t = clipx_clip.clip_forward(params, cfg, pixels, ids)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(ours_t), ref.T, rtol=3e-4, atol=3e-4)


def test_normalized_embeddings_unit_norm(tiny_pair):
    _, params, cfg = tiny_pair
    pixels = np.random.RandomState(3).randn(2, 32, 32, 3).astype(np.float32)
    emb = np.asarray(clipx_clip.encode_image(params, cfg, pixels, normalize=True))
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-5)


def test_openai_layout_roundtrip(tiny_pair):
    """Convert clipx params -> synthetic OpenAI state dict -> clipx again;
    embeddings must be bit-identical. Validates the OpenAI converter
    (fused qkv split, conv kernel reshape, transposes)."""
    _, params, cfg = tiny_pair
    sd = _to_openai_state_dict(params, cfg)
    inferred = convert.config_from_openai_state_dict(sd)
    assert inferred.vision.patch_size == cfg.vision.patch_size
    assert inferred.vision.layers == cfg.vision.layers
    assert inferred.text.vocab_size == cfg.text.vocab_size
    params2 = convert.from_openai_state_dict(sd, cfg)

    pixels = np.random.RandomState(4).randn(1, 32, 32, 3).astype(np.float32)
    a = np.asarray(clipx_clip.encode_image(params, cfg, pixels))
    b = np.asarray(clipx_clip.encode_image(params2, cfg, pixels))
    np.testing.assert_array_equal(a, b)


def _to_openai_state_dict(params, cfg):
    """Inverse of convert.from_openai_state_dict, for round-trip testing."""
    v, t = cfg.vision, cfg.text
    sd = {}
    pk = np.asarray(params["visual"]["patch_embed"]["kernel"])  # (p*p*3, w)
    sd["visual.conv1.weight"] = (
        pk.reshape(v.patch_size, v.patch_size, 3, v.width).transpose(3, 2, 0, 1))
    sd["visual.class_embedding"] = np.asarray(params["visual"]["class_embedding"])
    sd["visual.positional_embedding"] = np.asarray(params["visual"]["pos_embedding"])
    sd["visual.ln_pre.weight"] = np.asarray(params["visual"]["ln_pre"]["scale"])
    sd["visual.ln_pre.bias"] = np.asarray(params["visual"]["ln_pre"]["bias"])
    sd["visual.ln_post.weight"] = np.asarray(params["visual"]["ln_post"]["scale"])
    sd["visual.ln_post.bias"] = np.asarray(params["visual"]["ln_post"]["bias"])
    sd["visual.proj"] = np.asarray(params["visual"]["proj"])
    sd["token_embedding.weight"] = np.asarray(params["text"]["token_embedding"])
    sd["positional_embedding"] = np.asarray(params["text"]["pos_embedding"])
    sd["ln_final.weight"] = np.asarray(params["text"]["ln_final"]["scale"])
    sd["ln_final.bias"] = np.asarray(params["text"]["ln_final"]["bias"])
    sd["text_projection"] = np.asarray(params["text"]["text_projection"])
    sd["logit_scale"] = np.asarray(params["logit_scale"])

    for prefix, blocks, layers in (
        ("visual.transformer", params["visual"]["blocks"], v.layers),
        ("transformer", params["text"]["blocks"], t.layers),
    ):
        for i in range(layers):
            p = f"{prefix}.resblocks.{i}"
            a = blocks["attn"]
            sd[f"{p}.attn.in_proj_weight"] = np.concatenate(
                [np.asarray(a[k][i]).T for k in ("wq", "wk", "wv")], axis=0)
            sd[f"{p}.attn.in_proj_bias"] = np.concatenate(
                [np.asarray(a[k][i]) for k in ("bq", "bk", "bv")], axis=0)
            sd[f"{p}.attn.out_proj.weight"] = np.asarray(a["wo"][i]).T
            sd[f"{p}.attn.out_proj.bias"] = np.asarray(a["bo"][i])
            sd[f"{p}.ln_1.weight"] = np.asarray(blocks["ln_1"]["scale"][i])
            sd[f"{p}.ln_1.bias"] = np.asarray(blocks["ln_1"]["bias"][i])
            sd[f"{p}.ln_2.weight"] = np.asarray(blocks["ln_2"]["scale"][i])
            sd[f"{p}.ln_2.bias"] = np.asarray(blocks["ln_2"]["bias"][i])
            sd[f"{p}.mlp.c_fc.weight"] = np.asarray(blocks["mlp"]["w1"][i]).T
            sd[f"{p}.mlp.c_fc.bias"] = np.asarray(blocks["mlp"]["b1"][i])
            sd[f"{p}.mlp.c_proj.weight"] = np.asarray(blocks["mlp"]["w2"][i]).T
            sd[f"{p}.mlp.c_proj.bias"] = np.asarray(blocks["mlp"]["b2"][i])
    return sd


def test_save_load_params_roundtrip(tiny_pair, tmp_path):
    _, params, cfg = tiny_pair
    path = str(tmp_path / "params.npz")
    convert.save_params(path, params)
    loaded = convert.load_params(path)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(loaded)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_convert_checkpoint_tool_openai_roundtrip(tiny_pair, tmp_path):
    """tools/convert_checkpoint.py end-to-end on a synthetic OpenAI-format
    torch file: infer config, convert, and produce identical embeddings."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    import convert_checkpoint

    _, params, cfg = tiny_pair
    sd = {k: torch.tensor(v) for k, v in _to_openai_state_dict(params, cfg).items()}
    pt_path = str(tmp_path / "tiny.pt")
    torch.save(sd, pt_path)
    out_path = str(tmp_path / "tiny.npz")
    rc = convert_checkpoint.main([pt_path, "--out", out_path])
    assert rc == 0

    loaded = convert.load_params(out_path)
    pixels = np.random.RandomState(9).randn(1, 32, 32, 3).astype(np.float32)
    a = np.asarray(clipx_clip.encode_image(params, cfg, pixels))
    b = np.asarray(clipx_clip.encode_image(loaded, cfg, pixels))
    np.testing.assert_array_equal(a, b)
