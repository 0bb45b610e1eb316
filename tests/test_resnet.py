"""Parity and integration tests for the ModifiedResNet (RN50-family)
image tower.

There is no HuggingFace port of OpenAI's ModifiedResNet, so the torch
side here is an independent reimplementation of the published
architecture (MIT-licensed OpenAI CLIP `model.py`; not part of the
reference repo) built with the exact state-dict key names the real
RN checkpoints use. Randomized weights AND randomized BatchNorm running
statistics flow through ``clipx.models.convert`` (which folds BN) into
``clipx.models.resnet.encode_image`` — matching embeddings validate
every numerical detail: the anti-aliased stem, avgpool-before-conv
downsampling, folded BN, residual arithmetic, and the single-query
attention pool. The same converter handles real RN50/RN101/RN50x*
checkpoints when supplied.
"""

from collections import OrderedDict

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clipx import config as config_lib
from clipx.models import clip as clipx_clip
from clipx.models import convert, resnet

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional


# ---------------------------------------------------------------------------
# torch reference (OpenAI architecture, OpenAI key names)
# ---------------------------------------------------------------------------

class _Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.avgpool = nn.AvgPool2d(stride) if stride > 1 else nn.Identity()
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        if stride > 1 or inplanes != planes * 4:
            self.downsample = nn.Sequential(OrderedDict([
                ("-1", nn.AvgPool2d(stride)),
                ("0", nn.Conv2d(inplanes, planes * 4, 1, bias=False)),
                ("1", nn.BatchNorm2d(planes * 4)),
            ]))

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.avgpool(out)
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _AttentionPool2d(nn.Module):
    def __init__(self, spacial_dim, embed_dim, num_heads, output_dim):
        super().__init__()
        self.positional_embedding = nn.Parameter(
            torch.randn(spacial_dim ** 2 + 1, embed_dim) / embed_dim ** 0.5)
        self.k_proj = nn.Linear(embed_dim, embed_dim)
        self.q_proj = nn.Linear(embed_dim, embed_dim)
        self.v_proj = nn.Linear(embed_dim, embed_dim)
        self.c_proj = nn.Linear(embed_dim, output_dim)
        self.num_heads = num_heads

    def forward(self, x):
        x = x.flatten(start_dim=2).permute(2, 0, 1)     # NCHW -> (HW)NC
        x = torch.cat([x.mean(dim=0, keepdim=True), x], dim=0)
        x = x + self.positional_embedding[:, None, :]
        x, _ = F.multi_head_attention_forward(
            query=x[:1], key=x, value=x,
            embed_dim_to_check=x.shape[-1], num_heads=self.num_heads,
            q_proj_weight=self.q_proj.weight,
            k_proj_weight=self.k_proj.weight,
            v_proj_weight=self.v_proj.weight,
            in_proj_weight=None,
            in_proj_bias=torch.cat([self.q_proj.bias, self.k_proj.bias,
                                    self.v_proj.bias]),
            bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0,
            out_proj_weight=self.c_proj.weight,
            out_proj_bias=self.c_proj.bias,
            use_separate_proj_weight=True, training=False,
            need_weights=False)
        return x.squeeze(0)


class _ModifiedResNet(nn.Module):
    def __init__(self, layers, output_dim, heads, input_resolution, width):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width // 2, 3, stride=2, padding=1,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(width // 2)
        self.conv2 = nn.Conv2d(width // 2, width // 2, 3, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(width // 2)
        self.conv3 = nn.Conv2d(width // 2, width, 3, padding=1, bias=False)
        self.bn3 = nn.BatchNorm2d(width)
        self.avgpool = nn.AvgPool2d(2)
        self.relu = nn.ReLU(inplace=True)
        self._inplanes = width
        self.layer1 = self._make_layer(width, layers[0])
        self.layer2 = self._make_layer(width * 2, layers[1], stride=2)
        self.layer3 = self._make_layer(width * 4, layers[2], stride=2)
        self.layer4 = self._make_layer(width * 8, layers[3], stride=2)
        self.attnpool = _AttentionPool2d(input_resolution // 32, width * 32,
                                         heads, output_dim)

    def _make_layer(self, planes, blocks, stride=1):
        layers = [_Bottleneck(self._inplanes, planes, stride)]
        self._inplanes = planes * _Bottleneck.expansion
        for _ in range(1, blocks):
            layers.append(_Bottleneck(self._inplanes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.relu(self.bn2(self.conv2(x)))
        x = self.relu(self.bn3(self.conv3(x)))
        x = self.avgpool(x)
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
        return self.attnpool(x)


def _randomize_bn_stats(model, seed=0):
    """Non-trivial running stats so the parity test actually exercises
    the converter's BN fold (fresh BN has mean 0 / var 1)."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean = torch.randn(m.num_features, generator=g) * 0.2
            m.running_var = torch.rand(m.num_features, generator=g) + 0.5
            with torch.no_grad():
                m.weight.copy_(torch.rand(m.num_features, generator=g) + 0.5)
                m.bias.copy_(torch.randn(m.num_features, generator=g) * 0.1)


# tiny-rn-test geometry: width 8, one bottleneck per stage, 32px input
_LAYERS, _WIDTH, _IMG, _EMBED = (1, 2, 1, 1), 8, 32, 32


@pytest.fixture(scope="module")
def rn_pair():
    torch.manual_seed(3)
    heads = _WIDTH * 32 // 64
    model = _ModifiedResNet(_LAYERS, _EMBED, heads, _IMG, _WIDTH).eval()
    _randomize_bn_stats(model)
    cfg = config_lib.CLIPConfig(
        name="rn-parity",
        vision=config_lib.ResNetVisionConfig(
            image_size=_IMG, layers=_LAYERS, width=_WIDTH,
            embed_dim=_EMBED),
        text=config_lib.TextConfig(width=32, layers=2, heads=2,
                                   embed_dim=_EMBED),
    )
    sd = {f"visual.{k}": v for k, v in model.state_dict().items()}
    visual = convert._rn_visual(sd, cfg.vision)
    return model, visual, cfg


def test_resnet_visual_parity(rn_pair):
    """torch ModifiedResNet and the converted JAX tower agree in f32."""
    model, visual, cfg = rn_pair
    rng = np.random.RandomState(0)
    x = rng.randn(3, _IMG, _IMG, 3).astype(np.float32)
    with torch.no_grad():
        want = model(torch.tensor(x).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(resnet.encode_image(
        {"visual": visual}, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_resnet_parity_multi_block_stage(rn_pair):
    """Stage 2 has two blocks, so the scanned 'rest' path is exercised
    by the parity fixture; double-check its params exist."""
    _, visual, _ = rn_pair
    assert "rest" in visual["stage2"]
    assert visual["stage2"]["rest"]["conv2"].shape[0] == 1  # L-1 stacked


def test_resnet_config_inference():
    """config_from_openai_state_dict detects RN layouts and recovers
    width/layers/resolution/embed_dim from the key shapes."""
    torch.manual_seed(1)
    model = _ModifiedResNet(_LAYERS, _EMBED, 4, _IMG, _WIDTH).eval()
    sd = {f"visual.{k}": v for k, v in model.state_dict().items()}
    # minimal text keys for the inference path
    sd["transformer.resblocks.0.attn.in_proj_weight"] = torch.zeros(96, 32)
    sd["transformer.resblocks.1.attn.in_proj_weight"] = torch.zeros(96, 32)
    sd["ln_final.weight"] = torch.ones(32)
    sd["token_embedding.weight"] = torch.zeros(64, 32)
    sd["positional_embedding"] = torch.zeros(16, 32)
    cfg = convert.config_from_openai_state_dict(sd)
    v = cfg.vision
    assert v.tower == "resnet"
    assert (v.width, v.layers, v.image_size, v.embed_dim) == \
        (_WIDTH, _LAYERS, _IMG, _EMBED)
    assert cfg.text.width == 32 and cfg.text.layers == 2
    assert cfg.text.embed_dim == _EMBED


def test_rn_presets_construct():
    for name in ("RN50", "RN101", "RN50x4", "RN50x16", "RN50x64"):
        cfg = config_lib.get_config(name)
        assert cfg.vision.tower == "resnet"
        assert cfg.vision.image_size % 32 == 0
        assert cfg.text.embed_dim == cfg.vision.embed_dim
    assert config_lib.get_config("RN50").vision.heads == 32
    assert config_lib.get_config("RN50x4").vision.pool_dim == 2560


def test_tiny_rn_unit_norm_and_save_roundtrip(tmp_path):
    cfg = config_lib.get_config("tiny-rn-test")
    params = clipx_clip.init_params(cfg, jax.random.PRNGKey(0))
    x = np.random.RandomState(1).randn(2, 32, 32, 3).astype(np.float32)
    emb = clipx_clip.encode_image(params, cfg, jnp.asarray(x),
                                  normalize=True)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0,
                               atol=1e-5)
    path = str(tmp_path / "rn.npz")
    convert.save_params(path, jax.tree_util.tree_map(np.asarray, params))
    emb2 = clipx_clip.encode_image(convert.load_params(path), cfg,
                                   jnp.asarray(x), normalize=True)
    np.testing.assert_allclose(np.asarray(emb), np.asarray(emb2),
                               atol=1e-6)


def test_encoder_resnet_dp_mesh_parity():
    """Encoder with a dp mesh replicates the RN param tree (the generic
    replicate path in mesh.shard_params) and matches single-device
    embeddings. Unlike the ViT towers (bitwise under shard_map), conv
    fusion choices differ between the sharded and single-device
    programs, so the bound is float32-ulp-level rather than exact."""
    from clipx.parallel.mesh import make_mesh
    from clipx.runtime.encoder import Encoder

    single = Encoder.create("tiny-rn-test", seed=5)
    mesh = make_mesh({"dp": len(jax.devices())})
    sharded = Encoder.create("tiny-rn-test", seed=5, mesh=mesh)
    batch = np.random.RandomState(2).randint(
        0, 255, (16, 32, 32, 3), np.uint8)
    a = single.encode_images(batch)
    b = sharded.encode_images(batch)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_encoder_resnet_rejects_tp():
    from clipx.parallel.mesh import make_mesh
    from clipx.runtime.encoder import Encoder

    n = len(jax.devices())
    mesh = make_mesh({"dp": n // 2, "tp": 2})
    with pytest.raises(ValueError, match="ResNet"):
        Encoder.create("tiny-rn-test", mesh=mesh, tp="tp")


def _full_openai_rn_sd(seed=7):
    """A complete OpenAI-layout RN state dict (visual + text towers)."""
    torch.manual_seed(seed)
    model = _ModifiedResNet(_LAYERS, _EMBED, 4, _IMG, _WIDTH).eval()
    _randomize_bn_stats(model, seed)
    sd = {f"visual.{k}": v for k, v in model.state_dict().items()}
    g = torch.Generator().manual_seed(seed + 1)
    w, ctx, vocab = 32, 16, 64

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    for i in range(2):
        p = f"transformer.resblocks.{i}"
        sd[f"{p}.attn.in_proj_weight"] = r(3 * w, w)
        sd[f"{p}.attn.in_proj_bias"] = r(3 * w)
        sd[f"{p}.attn.out_proj.weight"] = r(w, w)
        sd[f"{p}.attn.out_proj.bias"] = r(w)
        sd[f"{p}.ln_1.weight"] = torch.ones(w)
        sd[f"{p}.ln_1.bias"] = torch.zeros(w)
        sd[f"{p}.ln_2.weight"] = torch.ones(w)
        sd[f"{p}.ln_2.bias"] = torch.zeros(w)
        sd[f"{p}.mlp.c_fc.weight"] = r(4 * w, w)
        sd[f"{p}.mlp.c_fc.bias"] = r(4 * w)
        sd[f"{p}.mlp.c_proj.weight"] = r(w, 4 * w)
        sd[f"{p}.mlp.c_proj.bias"] = r(w)
    sd["ln_final.weight"] = torch.ones(w)
    sd["ln_final.bias"] = torch.zeros(w)
    sd["token_embedding.weight"] = r(vocab, w)
    sd["positional_embedding"] = r(ctx, w)
    sd["text_projection"] = r(w, _EMBED)
    sd["logit_scale"] = torch.tensor(2.6593)
    return model, sd


def test_convert_checkpoint_tool_resnet(tmp_path):
    """The offline converter tool handles an RN-format .pt end to end:
    architecture inference, BN fold, npz save — and the saved params
    reproduce the torch embeddings."""
    import sys
    sys.path.insert(0, "tools")
    try:
        import convert_checkpoint
    finally:
        sys.path.pop(0)

    model, sd = _full_openai_rn_sd()
    pt = str(tmp_path / "rn.pt")
    torch.save(sd, pt)
    npz = str(tmp_path / "rn.npz")
    assert convert_checkpoint.main([pt, "--out", npz]) in (0, None)

    cfg = convert.config_from_openai_state_dict(sd)
    params = convert.load_params(npz)
    x = np.random.RandomState(4).randn(2, _IMG, _IMG, 3).astype(np.float32)
    with torch.no_grad():
        want = model(torch.tensor(x).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(clipx_clip.encode_image(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_cli_index_and_query_with_rn_tower(tmp_path, monkeypatch, capsys):
    """The reference CLI contract holds under --model tiny-rn-test: the
    RN tower drops into build-index/query-index like any preset."""
    import os

    from PIL import Image

    from clipx.cli import build_index as bi
    from clipx.cli import query_index as qi

    photos = tmp_path / "photos"
    photos.mkdir()
    rng = np.random.RandomState(11)
    for i in range(4):
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), np.uint8)
                        ).save(photos / f"p{i}.jpg")
    work = tmp_path / "work"
    work.mkdir()
    monkeypatch.chdir(work)
    assert bi.main(["--model", "tiny-rn-test", str(photos) + os.sep]) == 0
    monkeypatch.setenv("CLIPX_NO_VIEWER", "1")
    args = qi.build_parser().parse_args(["--model", "tiny-rn-test"])

    def scripted(prompt, _lines=iter(["c 2", "a photo", "q"])):
        try:
            return next(_lines)
        except StopIteration:
            raise EOFError from None

    assert qi.QueryREPL(args, input_fn=scripted).run() == 0
    out, _ = capsys.readouterr()
    assert "Search time:" in out
    assert str(photos) in out


def test_rn_sharded_train_step_reduces_loss():
    """Fine-tuning the RN tower (frozen-BN affines) under a dp x tp mesh:
    make_sharded_train_step replicates the RN tree (no TP rules for
    convs) while still sharding the batch; loss decreases."""
    from clipx import train as train_lib
    from clipx.parallel import mesh as mesh_lib

    cfg = config_lib.get_config("tiny-rn-test")
    mesh = mesh_lib.make_mesh({"dp": 4, "tp": 2})
    tx = train_lib.make_optimizer(learning_rate=1e-3, warmup_steps=1,
                                  total_steps=50)
    state, tx = train_lib.create_train_state(cfg, jax.random.PRNGKey(0), tx)
    jitted, shard_state, batch_sh = train_lib.make_sharded_train_step(
        cfg, tx, mesh)
    state = shard_state(state)
    rng = np.random.RandomState(6)
    b = 8
    pixels = rng.randn(b, 32, 32, 3).astype(np.float32)
    ids = np.zeros((b, cfg.text.context_length), np.int32)
    eot = cfg.text.vocab_size - 1
    for i in range(b):
        ids[i, 0] = eot - 1
        ids[i, 1] = rng.randint(1, 1000)
        ids[i, 2] = eot
    pixels = jax.device_put(pixels, batch_sh)
    ids = jax.device_put(ids, batch_sh)
    losses = []
    for _ in range(6):
        state, metrics = jitted(state, pixels, ids)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
