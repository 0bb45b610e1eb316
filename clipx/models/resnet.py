"""ModifiedResNet image tower — the RN50/RN101/RN50x* CLIP models.

The reference's CLIP dependency ships these checkpoints next to the
ViTs (``clip.load``'s model list; the reference scripts pick "ViT-B/32"
at reference:build-index.py:18 but any name works there). Architecture
re-implemented from the published OpenAI description: 3-conv
anti-aliased stem, bottlenecks that downsample with avgpool(stride)
before the conv ("blur pool"), and a single-query attention pool
producing the joint-space embedding.

TPU-first choices:
- **NHWC layout** end to end (channels on the lane dimension; XLA's TPU
  conv emitter targets the MXU directly in this layout).
- **Folded BatchNorm**: inference BN is a per-channel affine, so the
  converter folds (gamma, beta, running stats) into a (scale, bias)
  pair once on the host; at runtime it fuses into the conv epilogue.
  Fine-tuning trains the affine with frozen statistics — the standard
  frozen-BN regime; there is no train-mode batch-stats path.
- **Scan-stacked stage bodies**: within a stage every block after the
  first has identical shapes, so those are stacked on a leading layer
  axis and run with ``lax.scan`` (the repo-wide convention — one
  compiled body per stage regardless of depth). The first block of each
  stage (stride + channel change + downsample branch) runs unrolled.
- Convs accumulate in float32 (``preferred_element_type``); the BN
  affine and residual add run in float32 before casting back to the
  compute dtype, mirroring the LayerNorm policy in clipx.models.layers.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from clipx.config import CLIPConfig
from clipx.models.layers import dense

Params = Dict[str, Any]

_BN_EPS = 1e-5  # torch BatchNorm2d default, baked into the folded affine


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def conv2d(x: jax.Array, w: jax.Array, *, stride: int = 1,
           padding: int = 0) -> jax.Array:
    """NHWC conv with HWIO weights; float32 accumulation."""
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def _bn(x32: jax.Array, p: Params) -> jax.Array:
    """Folded-BN affine on a float32 activation."""
    return x32 * p["scale"].astype(jnp.float32) + p["bias"].astype(
        jnp.float32)


def _conv_bn(x: jax.Array, w: jax.Array, bn: Params, *, stride: int = 1,
             padding: int = 0, relu: bool = True) -> jax.Array:
    y = _bn(conv2d(x, w, stride=stride, padding=padding), bn)
    if relu:
        y = jax.nn.relu(y)
    return y.astype(x.dtype)


def avg_pool(x: jax.Array, k: int) -> jax.Array:
    """Non-overlapping k x k average pool (torch AvgPool2d(k))."""
    if k == 1:
        return x
    y = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add,
        window_dimensions=(1, k, k, 1), window_strides=(1, k, k, 1),
        padding="VALID")
    return (y / (k * k)).astype(x.dtype)


# ---------------------------------------------------------------------------
# bottleneck blocks
# ---------------------------------------------------------------------------

def _bottleneck(x: jax.Array, p: Params, *, stride: int,
                downsample: bool) -> jax.Array:
    """conv1x1-bn-relu, conv3x3-bn-relu, avgpool(stride), conv1x1-bn,
    residual add, relu. The shortcut of a stage-opening block is
    avgpool(stride) -> conv1x1 -> bn."""
    out = _conv_bn(x, p["conv1"], p["bn1"])
    out = _conv_bn(out, p["conv2"], p["bn2"], padding=1)
    out = avg_pool(out, stride)
    out = _bn(conv2d(out, p["conv3"]), p["bn3"])  # f32, relu after add
    if downsample:
        idt = _bn(conv2d(avg_pool(x, stride), p["down_conv"]),
                  p["down_bn"])
    else:
        idt = x.astype(jnp.float32)
    return jax.nn.relu(out + idt).astype(x.dtype)


def _stage(x: jax.Array, p: Params, *, stride: int) -> jax.Array:
    x = _bottleneck(x, p["first"], stride=stride, downsample=True)
    if "rest" in p:
        def body(h, lp):
            return _bottleneck(h, lp, stride=1, downsample=False), None

        x, _ = jax.lax.scan(body, x, p["rest"])
    return x


# ---------------------------------------------------------------------------
# attention pool
# ---------------------------------------------------------------------------

def _attention_pool(x: jax.Array, p: Params, heads: int) -> jax.Array:
    """(B, H, W, C) -> (B, out_dim): the mean token queries all spatial
    tokens (plus itself) through one multi-head attention, then c_proj
    maps into the joint space."""
    b, h, w, c = x.shape
    x = x.reshape(b, h * w, c)
    x = jnp.concatenate([jnp.mean(x, axis=1, keepdims=True), x], axis=1)
    x = (x.astype(jnp.float32)
         + p["pos_embedding"].astype(jnp.float32)).astype(x.dtype)
    q = dense(x[:, :1], p["wq"], p["bq"])        # (B, 1, C)
    k = dense(x, p["wk"], p["bk"])               # (B, S, C)
    v = dense(x, p["wv"], p["bv"])
    d = c // heads
    q = q.reshape(b, 1, heads, d).transpose(0, 2, 1, 3)
    k = k.reshape(b, -1, heads, d).transpose(0, 2, 1, 3)
    v = v.reshape(b, -1, heads, d).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * (d ** -0.5)
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, 1, c)[:, 0]
    return dense(out, p["wc"], p["bc"])


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def encode_image(params: Params, cfg: CLIPConfig, pixels: jax.Array,
                 *, normalize: bool = False, dtype=jnp.float32,
                 **_unused) -> jax.Array:
    """ResNet-tower image embeddings. pixels: (B, H, W, 3) preprocessed
    exactly like the ViT path (same CLIP constants). Returns
    (B, embed_dim) float32; ``normalize=True`` L2-normalizes, mirroring
    reference:build-index.py:50. Extra kwargs (attn_impl, remat) are
    accepted for signature parity with the ViT tower and ignored."""
    v = cfg.vision
    p = params["visual"]
    x = pixels.astype(dtype)
    s = p["stem"]
    x = _conv_bn(x, s["conv1"], s["bn1"], stride=2, padding=1)
    x = _conv_bn(x, s["conv2"], s["bn2"], padding=1)
    x = _conv_bn(x, s["conv3"], s["bn3"], padding=1)
    x = avg_pool(x, 2)
    for i in range(4):
        x = _stage(x, p[f"stage{i + 1}"], stride=1 if i == 0 else 2)
    emb = _attention_pool(x, p["attnpool"], v.heads)
    emb = emb.astype(jnp.float32)
    if normalize:
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    return emb


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_bn(c: int) -> Params:
    return {"scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32)}


def _init_conv(key, kh, kw, cin, cout) -> jax.Array:
    fan_in = kh * kw * cin
    return jax.random.normal(key, (kh, kw, cin, cout)) * (fan_in ** -0.5)


def _init_block(key, cin: int, planes: int, downsample: bool) -> Params:
    ks = jax.random.split(key, 4)
    p = {
        "conv1": _init_conv(ks[0], 1, 1, cin, planes),
        "bn1": _init_bn(planes),
        "conv2": _init_conv(ks[1], 3, 3, planes, planes),
        "bn2": _init_bn(planes),
        "conv3": _init_conv(ks[2], 1, 1, planes, planes * 4),
        "bn3": _init_bn(planes * 4),
    }
    if downsample:
        p["down_conv"] = _init_conv(ks[3], 1, 1, cin, planes * 4)
        p["down_bn"] = _init_bn(planes * 4)
    return p


def init_visual(cfg: CLIPConfig, rng: jax.Array) -> Params:
    v = cfg.vision
    keys = jax.random.split(rng, 9)
    w = v.width
    stem = {
        "conv1": _init_conv(keys[0], 3, 3, 3, w // 2), "bn1": _init_bn(w // 2),
        "conv2": _init_conv(keys[1], 3, 3, w // 2, w // 2), "bn2": _init_bn(w // 2),
        "conv3": _init_conv(keys[2], 3, 3, w // 2, w), "bn3": _init_bn(w),
    }
    out: Params = {"stem": stem}
    cin = w
    for i, n_blocks in enumerate(v.layers):
        planes = w * (2 ** i)
        sk = jax.random.split(keys[3 + i], n_blocks)
        stage: Params = {"first": _init_block(sk[0], cin, planes, True)}
        if n_blocks > 1:
            rest = [_init_block(k, planes * 4, planes, False)
                    for k in sk[1:]]
            stage["rest"] = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs, axis=0), *rest)
        out[f"stage{i + 1}"] = stage
        cin = planes * 4
    c = v.pool_dim
    pk = jax.random.split(keys[7], 5)
    out["attnpool"] = {
        "pos_embedding": jax.random.normal(
            pk[0], (v.grid * v.grid + 1, c)) * (c ** -0.5),
        "wq": jax.random.normal(pk[1], (c, c)) * (c ** -0.5),
        "bq": jnp.zeros((c,), jnp.float32),
        "wk": jax.random.normal(pk[2], (c, c)) * (c ** -0.5),
        "bk": jnp.zeros((c,), jnp.float32),
        "wv": jax.random.normal(pk[3], (c, c)) * (c ** -0.5),
        "bv": jnp.zeros((c,), jnp.float32),
        "wc": jax.random.normal(pk[4], (c, v.embed_dim)) * (c ** -0.5),
        "bc": jnp.zeros((v.embed_dim,), jnp.float32),
    }
    return out


def fold_bn(gamma: np.ndarray, beta: np.ndarray, mean: np.ndarray,
            var: np.ndarray, eps: float = _BN_EPS) -> Params:
    """Inference BatchNorm -> per-channel affine (host-side, float32)."""
    scale = gamma / np.sqrt(var + eps)
    return {"scale": np.asarray(scale, np.float32),
            "bias": np.asarray(beta - mean * scale, np.float32)}
