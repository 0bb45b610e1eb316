"""CLIP contrastive training on a device mesh.

The reference is inference-only; training is new capability so the
framework can *produce* checkpoints, fine-tune, and so the multi-chip
sharding path (dp x tp) is exercised end-to-end by the driver's
``dryrun_multichip``.

Loss: symmetric InfoNCE over the in-batch similarity matrix —
``(ce(logits_per_image) + ce(logits_per_text)) / 2`` with labels on the
diagonal, logit_scale clamped to exp(<=100) like the torch original.

Parallelism: the batch is sharded over ``dp`` and params over ``tp``
(clipx.parallel.mesh rules); the (B, B) logits matmul over row-sharded
embeddings makes XLA insert the all-gather of the "other tower" —
global negatives for free, no hand-written collective.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from clipx.config import CLIPConfig
from clipx.models import clip as model_lib
from clipx.parallel import mesh as mesh_lib


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def contrastive_loss(params, cfg: CLIPConfig, pixels, token_ids,
                     *, dtype=jnp.float32, remat: bool = False,
                     attn_impl: str = "xla"):
    img = model_lib.encode_image(params, cfg, pixels, normalize=True,
                                 dtype=dtype, remat=remat,
                                 attn_impl=attn_impl)
    txt = model_lib.encode_text(params, cfg, token_ids, normalize=True,
                                dtype=dtype, remat=remat,
                                attn_impl=attn_impl)
    scale = jnp.exp(jnp.clip(params["logit_scale"], a_max=jnp.log(100.0)))
    logits = scale * img @ txt.T                      # (B, B)
    labels = jnp.arange(logits.shape[0])
    li = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    lt = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    loss = 0.5 * (li.mean() + lt.mean())
    accuracy = jnp.mean(jnp.argmax(logits, axis=-1) == labels)
    return loss, {"loss": loss, "accuracy": accuracy,
                  "logit_scale": scale}


def make_optimizer(learning_rate: float = 1e-4, weight_decay: float = 0.02,
                   warmup_steps: int = 200,
                   total_steps: int = 10_000) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, learning_rate, warmup_steps, max(total_steps, warmup_steps + 1))
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(schedule, b1=0.9, b2=0.98, eps=1e-6,
                    weight_decay=weight_decay),
    )


def create_train_state(cfg: CLIPConfig, rng: jax.Array,
                       tx: Optional[optax.GradientTransformation] = None
                       ) -> Tuple[TrainState, optax.GradientTransformation]:
    tx = tx or make_optimizer()
    params = model_lib.init_params(cfg, rng)
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)), tx


def make_train_step(cfg: CLIPConfig, tx: optax.GradientTransformation,
                    *, dtype=jnp.float32, remat: bool = False,
                    attn_impl: str = "xla"):
    """A jittable (state, pixels, token_ids) -> (state, metrics) step."""

    def step(state: TrainState, pixels, token_ids):
        grad_fn = jax.value_and_grad(
            lambda p: contrastive_loss(p, cfg, pixels, token_ids,
                                       dtype=dtype, remat=remat,
                                       attn_impl=attn_impl),
            has_aux=True)
        (_, metrics), grads = grad_fn(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return step


def save_train_state(path: str, state: TrainState) -> None:
    """Durable training checkpoint via orbax (the framework-side
    complement to the indexer's fn_db-is-the-checkpoint model,
    SURVEY.md section 5)."""
    import os

    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), state, force=True)


def restore_train_state(path: str, template: TrainState) -> TrainState:
    import os

    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(path), template)
    return TrainState(*restored)


def _mirror_opt_shardings(opt_state, p_sh, rep):
    """Sharding pytree for ``opt_state`` mirroring the param shardings.

    Optimizer moments (adam mu/nu, etc.) embed the param pytree verbatim,
    so a leaf whose key-path *ends with* a param's key-path gets that
    param's sharding; everything else (counts, empty states) replicates.
    """
    param_sh = {tuple(map(str, path)): sh
                for path, sh in jax.tree_util.tree_flatten_with_path(p_sh)[0]}
    flat, treedef = jax.tree_util.tree_flatten_with_path(opt_state)
    out = []
    for path, _ in flat:
        keys = tuple(map(str, path))
        sh = rep
        for start in range(len(keys)):
            hit = param_sh.get(keys[start:])
            if hit is not None:
                sh = hit
                break
        out.append(sh)
    return jax.tree_util.tree_unflatten(treedef, out)


def make_sharded_train_step(cfg: CLIPConfig, tx, mesh: Mesh, *,
                            dp: str = "dp", tp: Optional[str] = "tp",
                            dtype=jnp.float32, remat: bool = False):
    """pjit the train step over ``mesh`` with dp batch sharding and tp
    param sharding. Returns (jitted_step, shard_state_fn, batch_sharding).

    ResNet towers have no TP sharding rules (and don't need them — RN50
    fits a chip), so their params are replicated: dp still shards the
    batch, and fine-tuning trains the folded-BN affines with frozen
    statistics (the standard frozen-BN regime)."""
    if getattr(cfg.vision, "tower", "vit") == "resnet":
        tp = None
    rep = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(dp))

    def shard_state(state: TrainState) -> TrainState:
        # tp=None replicates whatever tree the state holds (works for
        # the RN towers too); the TP spec tree matches the ViT layout.
        p_sh = (mesh_lib.param_shardings(mesh, tp) if tp is not None
                else jax.tree_util.tree_map(lambda _: rep, state.params))
        params = jax.tree_util.tree_map(jax.device_put, state.params, p_sh)
        # Place the EXISTING optimizer state (restored adam moments and
        # schedule step must survive --resume; rebuilding via tx.init here
        # silently restarted LR warmup) with param-mirrored shardings.
        opt_sh = _mirror_opt_shardings(state.opt_state, p_sh, rep)
        opt_state = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(jnp.asarray(x), s),
            state.opt_state, opt_sh)
        return TrainState(params, opt_state, jax.device_put(state.step, rep))

    # attn_impl="plain": params here are (potentially TP-)sharded under
    # GSPMD, and the fused pallas kernels consume full-width weight
    # blocks — keep the train step on pure-XLA attention so the
    # partitioner owns every op
    step = make_train_step(cfg, tx, dtype=dtype, remat=remat,
                           attn_impl="plain")
    jitted = jax.jit(
        step,
        in_shardings=(None, batch_sh, batch_sh),
        donate_argnums=(0,),
    )
    return jitted, shard_state, batch_sh
