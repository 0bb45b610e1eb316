"""Device mesh construction and sharding rules.

The reference is single-process single-device (SURVEY.md section 2c);
parallelism here is new, TPU-first capability:

- **dp** — data parallelism over the batch dimension: the axis that
  scales indexing throughput (each chip's host decode feeds its shard).
- **tp** — Megatron-style tensor parallelism inside the towers: qkv and
  MLP-in projections are column-sharded, attention-out and MLP-out
  row-sharded, so each block needs only one reduce per sublayer, which
  XLA inserts automatically from the sharding annotations.
- **shard** — corpus-row sharding for distributed MIPS search
  (clipx.parallel.mips), the database analog of model sharding.

All collectives ride ICI: we only annotate shardings and let XLA place
``all-reduce``/``all-gather`` (the scaling-book recipe).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Optional[Dict[str, int]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a mesh from axis sizes, e.g. {"dp": 4, "tp": 2}.

    Defaults to all devices on a single "dp" axis. Axis sizes must
    multiply to the device count.
    """
    devices = list(devices if devices is not None else jax.devices())
    if axes is None:
        axes = {"dp": len(devices)}
    names = tuple(axes)
    sizes = tuple(axes.values())
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(f"mesh {axes} needs {np.prod(sizes)} devices, "
                         f"have {len(devices)}")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, names)


def _block_specs(tp: Optional[str]) -> Dict:
    """PartitionSpecs for one stacked block tree (leading axis = layer).

    Column-parallel: wq/wk/wv (out dim = heads) and mlp.w1; their biases
    follow. Row-parallel: wo and mlp.w2 (their input dim is sharded, the
    matmul result needs the psum XLA derives); their biases replicated.
    """
    col = P(None, None, tp)   # (L, in, out) -> shard out
    row = P(None, tp, None)   # (L, in, out) -> shard in
    bcol = P(None, tp)
    rep2 = P(None, None)
    return {
        "ln_1": {"scale": rep2, "bias": rep2},
        "attn": {"wq": col, "wk": col, "wv": col, "wo": row,
                 "bq": bcol, "bk": bcol, "bv": bcol, "bo": rep2},
        "ln_2": {"scale": rep2, "bias": rep2},
        "mlp": {"w1": col, "b1": bcol, "w2": row, "b2": rep2},
    }


def param_specs(tp: Optional[str] = "tp") -> Dict:
    """PartitionSpec pytree matching clipx.models.clip.init_params.

    ``tp=None`` yields fully-replicated params (pure DP)."""
    rep1, rep2 = P(None), P(None, None)
    return {
        "visual": {
            "patch_embed": {"kernel": P(None, tp)},
            "class_embedding": rep1,
            "pos_embedding": rep2,
            "ln_pre": {"scale": rep1, "bias": rep1},
            "blocks": _block_specs(tp),
            "ln_post": {"scale": rep1, "bias": rep1},
            "proj": rep2,
        },
        "text": {
            "token_embedding": P(None, tp),
            "pos_embedding": rep2,
            "blocks": _block_specs(tp),
            "ln_final": {"scale": rep1, "bias": rep1},
            "text_projection": rep2,
        },
        "logit_scale": P(),
    }


def param_shardings(mesh: Mesh, tp: Optional[str] = "tp") -> Dict:
    """NamedSharding pytree for the model params on ``mesh``."""
    if tp is not None and tp not in mesh.axis_names:
        tp = None
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), param_specs(tp),
        is_leaf=lambda x: isinstance(x, P))


def batch_sharding(mesh: Mesh, dp: str = "dp") -> NamedSharding:
    """Shard the leading (batch) dim over dp, replicate the rest."""
    return NamedSharding(mesh, P(dp))


def shard_params(params, mesh: Mesh, tp: Optional[str] = "tp"):
    """Place a host param pytree onto the mesh with TP shardings.

    With ``tp=None`` every leaf is replicated, which works for ANY param
    tree (the ResNet towers take this path — their convs have no TP
    rules; DP needs replication only). The TP spec tree matches the ViT
    layout produced by clipx.models.clip.init_params."""
    if tp is not None and tp not in mesh.axis_names:
        tp = None
    if tp is None:
        rep = NamedSharding(mesh, P())
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), params)
    shardings = param_shardings(mesh, tp)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, shardings)
