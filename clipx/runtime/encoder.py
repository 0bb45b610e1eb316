"""The encoder service: jit-compiled, batch-bucketed CLIP inference.

Replaces the reference's model bootstrap + per-image forward
(``clip.load`` at reference:build-index.py:18 / reference:query-index.py:21,
``model.encode_image`` at reference:build-index.py:49, ``model.encode_text``
at reference:query-index.py:108). Differences by design:

- **batched**: the reference runs batch size 1 per image; here images are
  encoded in MXU-sized batches (the single biggest throughput lever —
  SURVEY.md section 3.1 "dominant inefficiency").
- **static shapes**: batches are padded up to a small set of bucket sizes
  so XLA compiles once per bucket instead of once per batch size.
- **bf16 on TPU**: matmuls in bfloat16 with f32 accumulation; embeddings
  come back f32 and are L2-normalized exactly like
  reference:build-index.py:50 / reference:query-index.py:13-17.
"""

from __future__ import annotations

import functools
import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from clipx import config as config_lib
from clipx.config import CLIPConfig
from clipx.models import clip as model_lib
from clipx.models import convert
from clipx.ops.preprocess import device_resize_normalize, normalize_batch
from clipx.text.tokenizer import ClipTokenizer

_DEFAULT_BUCKETS = (1, 8, 32, 128, 256)
# Text batches are padded to these row counts so serve's /encode_text
# (arbitrary-length lists, clipx/serve.py) never triggers a fresh XLA
# compile mid-request — compiles cost minutes on this tunneled TPU. The
# REPL's N=1 stays the smallest bucket.
_TEXT_BUCKETS = (1, 4, 16, 64)

_cache_enabled = False


def enable_persistent_compile_cache() -> None:
    """Point XLA's persistent compilation cache at a local directory so
    CLI processes don't re-pay the (remote) compile on every start —
    measured minutes per cold ViT-B/32 compile on this host."""
    global _cache_enabled
    if _cache_enabled:
        return
    _cache_enabled = True
    try:
        if jax.devices()[0].platform != "tpu":
            # TPU-only: compiles there go through a slow remote service
            # (minutes cold). On CPU the cache buys nothing and XLA has
            # aborted deserializing cached donated multi-device CPU
            # executables (flaky SIGABRT reproduced in the test suite).
            return
    except Exception:  # pragma: no cover
        return
    import os

    cache_dir = os.environ.get(
        "CLIPX_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "clipx", "xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


def _pick_bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def default_compute_dtype():
    try:
        return jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32
    except Exception:  # pragma: no cover
        return jnp.float32


class Encoder:
    """Holds (config, params) and compiled encode functions.

    With ``mesh`` set, image encodes run data-parallel: the batch dim is
    sharded over the mesh's ``dp`` axis and params are replicated (or
    TP-sharded when ``tp`` names a mesh axis) — the multi-chip scale-out
    of the reference's indexing hot loop (reference:build-index.py:45-51,
    SURVEY.md section 2c DP row). Embeddings are identical to the
    single-device path; only the placement changes.

    Scope: one process feeding its addressable devices. Multi-HOST
    indexing needs no cross-host batches — encode is embarrassingly
    parallel, so each host runs its own Encoder over its local chips on
    a partition of the folder list (the distributed store serializes
    writers; phase 2 then builds the index from the union). Cross-host
    meshes are for the training step (clipx.train +
    clipx.parallel.distributed), where gradients genuinely couple hosts.
    """

    def __init__(self, cfg: CLIPConfig, params, *,
                 compute_dtype=None, attn_impl: str = "auto",
                 batch_buckets: Sequence[int] = _DEFAULT_BUCKETS,
                 tokenizer: Optional[ClipTokenizer] = None,
                 mesh=None, tp: Optional[str] = None,
                 compute_quant: Optional[str] = None):
        enable_persistent_compile_cache()
        self.cfg = cfg
        self.mesh = mesh
        self.dtype = compute_dtype or default_compute_dtype()
        if attn_impl == "auto":
            # "xla" here means "let mha_block pick": on TPU it dispatches
            # the fused pallas SDPA kernels (packed_sdpa for S<=64,
            # fused_sdpa_long above) and falls back to einsum attention
            # elsewhere. attn_impl="pallas" forces the (B,H,S,D)-layout
            # flash kernel instead.
            attn_impl = "xla"
        if tp is not None and getattr(cfg.vision, "tower", "vit") == "resnet":
            raise ValueError(
                "tensor parallelism is not defined for the ResNet towers "
                "(no TP sharding rules for convs; RN50 fits one chip "
                "comfortably) — use a dp-only mesh")
        if tp is not None and attn_impl != "plain":
            # TP-sharded params under GSPMD must not hit the fused pallas
            # kernels: those consume full-width weight blocks and would
            # force gathers or break partitioning — same reasoning as the
            # sharded train step (clipx/train.py make_sharded_train_step).
            # This covers an explicit attn_impl="pallas" too, not just
            # the "xla" default — the hazard is identical either way.
            attn_impl = "plain"
        self.attn_impl = attn_impl
        self.tokenizer = tokenizer or ClipTokenizer()

        quant = compute_quant if compute_quant is not None else os.environ.get(
            "CLIPX_COMPUTE", "")
        if quant not in ("", "bf16", "int8"):
            raise ValueError(f"unknown compute mode {quant!r} "
                             "(CLIPX_COMPUTE: bf16 or int8)")
        self.compute_quant = quant if quant == "int8" else None
        qmlp = None
        if self.compute_quant:
            # W8A8 image-tower MLP (clipx.models.quant): quantize from
            # the ORIGINAL f32 weights (not the bf16 copies) so the only
            # rounding is the int8 step itself. Image tower only — text
            # encode is ~0.5 ms and stays bf16 for ranking stability.
            if getattr(cfg.vision, "tower", "vit") != "vit":
                raise ValueError("CLIPX_COMPUTE=int8 is implemented for "
                                 "the ViT towers (the RN family fits its "
                                 "budget in bf16)")
            if tp is not None:
                raise ValueError("CLIPX_COMPUTE=int8 with tensor "
                                 "parallelism is not supported (no TP "
                                 "sharding rules for the quantized MLP)")
            from clipx.models import quant as quant_lib

            qmlp = quant_lib.quantize_mlp_stack(
                params["visual"]["blocks"]["mlp"])
            # Both extensions below MEASURED SLOWER on chip and default
            # off (ViT-B/32 b256, docs/ARCHITECTURE.md): patchify
            # 15.30 -> 16.61 ms (XLA fuses the preprocess epilogue into
            # the bf16 patchify GEMM; the quant round-trip breaks that
            # fusion for a GEMM that was only ~10% of FLOPs), attention
            # projections 15.30 -> 24.24 ms (separate W8A8 GEMMs lose
            # the fused bf16 sublayer kernel — the same ~29%-MFU
            # separate-GEMM wall the fusion was built to avoid).
            qpatch = None
            if os.environ.get("CLIPX_INT8_PATCH", "off") == "on":
                qpatch = quant_lib.quantize_patch_embed(
                    params["visual"]["patch_embed"])
            qattn = None
            if os.environ.get("CLIPX_INT8_ATTN", "off") == "on":
                qattn = quant_lib.quantize_attn_stack(
                    params["visual"]["blocks"]["attn"])

        if self.dtype == jnp.bfloat16:
            # Store matrices in the compute dtype: every 2-D+ param is
            # cast to bf16 at its point of use anyway (dense / explicit
            # astype), so this is bitwise-identical (A/B-verified on
            # chip) while halving weight HBM (~175 MB on ViT-B/32,
            # ~850 MB on ViT-L) and the per-batch cast traffic. 1-D
            # params (LN scales, biases) stay f32 — those are consumed
            # in f32. The subtree qmlp replaces is excluded first:
            # casting the largest stacks in the tower only to drop them
            # one statement later is wasted device work and a transient
            # HBM spike at every serve start/reload.
            if qmlp is not None:
                params = dict(params)
                params["visual"] = dict(params["visual"])
                params["visual"]["blocks"] = {
                    k: v for k, v in params["visual"]["blocks"].items()
                    if k != "mlp"}
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if getattr(x, "ndim", 0) >= 2 else x, params)

        if qmlp is not None:
            # reattach AFTER the bf16 cast so int8 codes and f32 scales
            # keep their dtypes; the cast's tree_map rebuilt every
            # container, so the tree is ours to mutate (the bf16-off
            # path never reaches here with a caller-owned tree: quant
            # requires the shallow copies made above)
            if self.dtype != jnp.bfloat16:
                params = dict(params)
                params["visual"] = dict(params["visual"])
                params["visual"]["blocks"] = dict(
                    params["visual"]["blocks"])
            params["visual"]["blocks"]["mlp"] = qmlp
            if qattn is not None:
                params["visual"]["blocks"]["attn"] = qattn
            if qpatch is not None:
                params["visual"]["patch_embed"] = qpatch

        self._batch_sh = None
        out_sh = None
        dp_wrap = lambda fn: fn
        if mesh is not None:
            from clipx.parallel import mesh as mesh_lib

            dp_size = mesh.shape.get("dp")
            if dp_size is None:
                raise ValueError("encoder mesh must have a 'dp' axis")
            from jax.sharding import NamedSharding, PartitionSpec as P

            # replicate (tp=None) or TP-shard the params onto the mesh
            params = mesh_lib.shard_params(params, mesh, tp)
            self._batch_sh = NamedSharding(mesh, P("dp"))
            out_sh = self._batch_sh
            # every bucket must split evenly over dp, with an even
            # per-device share so the pallas kernels' batch-pair packing
            # applies locally
            grain = 2 * dp_size
            batch_buckets = {max(grain, -(-b // grain) * grain)
                             for b in batch_buckets}
            if tp is None:
                # Pure DP runs under shard_map: every device executes
                # the encode on its LOCAL batch shard, so the pallas
                # kernels partition by construction instead of relying
                # on XLA's custom-call partitioner (encode needs no
                # cross-device collectives — params are replicated).
                def dp_wrap(fn):  # noqa: F811 — intentional rebind
                    # check_vma=False: pallas_call outputs don't carry
                    # the varying-mesh-axes annotation the static
                    # checker wants (same situation as parallel.mips)
                    return jax.shard_map(
                        fn, mesh=mesh, in_specs=(P(), P("dp")),
                        out_specs=P("dp"), check_vma=False)
        self.params = params
        self.buckets = tuple(sorted(batch_buckets))

        @functools.partial(jax.jit, out_shardings=out_sh)
        @dp_wrap
        def _encode_images(params, batch_uint8):
            pixels = normalize_batch(batch_uint8, dtype=self.dtype)
            return model_lib.encode_image(params, cfg, pixels,
                                          normalize=True, dtype=self.dtype,
                                          attn_impl=attn_impl)

        @functools.partial(jax.jit, out_shardings=out_sh)
        @dp_wrap
        def _encode_canvases(params, batch_uint8):
            # fully on-device preprocess: antialiased bicubic resize from
            # a square decode canvas (e.g. 256x256) to the model input,
            # then normalize + encode — the host only decodes
            pixels = device_resize_normalize(
                batch_uint8, size=cfg.vision.image_size, dtype=self.dtype)
            return model_lib.encode_image(params, cfg, pixels,
                                          normalize=True, dtype=self.dtype,
                                          attn_impl=attn_impl)

        @functools.partial(jax.jit, static_argnames=())
        def _encode_pixels(params, pixels):
            return model_lib.encode_image(params, cfg,
                                          pixels.astype(self.dtype),
                                          normalize=True, dtype=self.dtype,
                                          attn_impl=attn_impl)

        @functools.partial(jax.jit, static_argnames=())
        def _encode_text(params, token_ids):
            # text tower is 77 tokens — always below the pallas win
            # threshold, XLA path unconditionally
            return model_lib.encode_text(params, cfg, token_ids,
                                         normalize=True, dtype=self.dtype,
                                         attn_impl="xla")

        self._encode_images = _encode_images
        self._encode_canvases = _encode_canvases
        self._encode_pixels = _encode_pixels
        self._encode_text = _encode_text

    # -- construction ---------------------------------------------------------
    @classmethod
    def create(cls, model: str = "ViT-B/32",
               checkpoint: Optional[str] = None,
               seed: int = 0, **kw) -> "Encoder":
        """Build from a preset name and an optional converted checkpoint
        (.npz from clipx.models.convert.save_params, or a torch .pt
        state dict converted on the fly)."""
        cfg = config_lib.get_config(model)
        if checkpoint is None:
            params = model_lib.init_params(cfg, jax.random.PRNGKey(seed))
        elif checkpoint.endswith(".npz"):
            params = convert.load_params(checkpoint)
        else:
            params = _load_torch_checkpoint(checkpoint, cfg)
        return cls(cfg, params, **kw)

    # -- API ------------------------------------------------------------------
    @property
    def image_size(self) -> int:
        return self.cfg.vision.image_size

    @property
    def embed_dim(self) -> int:
        return self.cfg.embed_dim

    def encode_images(self, batch_uint8: np.ndarray) -> np.ndarray:
        """(B, S, S, 3) uint8 -> (B, embed_dim) float32, L2-normalized.

        Pads to the nearest batch bucket; oversized batches are chunked.
        """
        batch_uint8 = np.ascontiguousarray(batch_uint8, dtype=np.uint8)
        n = batch_uint8.shape[0]
        cap = self.buckets[-1]
        if n > cap:
            return np.concatenate([
                self.encode_images(batch_uint8[i: i + cap])
                for i in range(0, n, cap)], axis=0)
        return self.finalize(self.encode_images_async(batch_uint8))

    def encode_images_async(self, batch_uint8: np.ndarray):
        """Enqueue one batch without waiting: H2D + encode are dispatched
        and a lazy handle is returned. Holding 2+ handles in flight
        overlaps transfer and compute with host-side decode/writeback —
        the streaming indexer's pipelining (SURVEY.md section 7 step 4).
        Finalize with :meth:`finalize`."""
        batch_uint8 = np.ascontiguousarray(batch_uint8, dtype=np.uint8)
        n = batch_uint8.shape[0]
        if n > self.buckets[-1]:
            raise ValueError(f"async batch exceeds bucket cap "
                             f"{self.buckets[-1]}")
        bucket = _pick_bucket(n, self.buckets)
        if bucket != n:
            pad = np.zeros((bucket - n,) + batch_uint8.shape[1:], np.uint8)
            batch_uint8 = np.concatenate([batch_uint8, pad], axis=0)
        # batches at the model input size go straight to encode; larger
        # square canvases take the fused on-device resize path
        fn = (self._encode_images
              if batch_uint8.shape[1] == self.image_size
              else self._encode_canvases)
        # dp mode: the H2D transfer itself is sharded — each device
        # receives only its 1/dp slice of the batch
        dev_batch = jax.device_put(batch_uint8, self._batch_sh)
        out = fn(self.params, dev_batch)
        return (out, n)

    @staticmethod
    def finalize(handle) -> np.ndarray:
        """Wait for an encode_images_async handle and return host f32."""
        out, n = handle
        return np.asarray(out[:n], dtype=np.float32)

    def encode_pixels(self, pixels: np.ndarray) -> np.ndarray:
        """Pre-normalized float pixels (parity path / tests)."""
        pixels = np.atleast_3d(np.asarray(pixels, dtype=np.float32))
        if pixels.ndim == 3:
            pixels = pixels[None]
        return np.asarray(self._encode_pixels(self.params, pixels),
                          dtype=np.float32)

    def encode_texts(self, texts) -> np.ndarray:
        """str or list[str] -> (N, embed_dim) float32, L2-normalized
        (the reference's text path, reference:query-index.py:107-108).

        Token rows are padded to a small bucket set (like image batches)
        so every request size reuses a compiled shape; padding rows are
        all-zero token ids whose outputs are sliced away (EOT argmax of a
        zero row is position 0 — harmless garbage, never returned)."""
        if isinstance(texts, str):
            texts = [texts]
        ids = self.tokenizer(texts,
                             context_length=self.cfg.text.context_length)
        n = ids.shape[0]
        cap = _TEXT_BUCKETS[-1]
        if n > cap:
            return np.concatenate([
                self._encode_text_bucketed(ids[i: i + cap])
                for i in range(0, n, cap)], axis=0)
        return self._encode_text_bucketed(ids)

    def _encode_text_bucketed(self, ids: np.ndarray) -> np.ndarray:
        n = ids.shape[0]
        bucket = _pick_bucket(n, _TEXT_BUCKETS)
        if bucket != n:
            pad = np.zeros((bucket - n, ids.shape[1]), ids.dtype)
            ids = np.concatenate([ids, pad], axis=0)
        out = self._encode_text(self.params, ids)
        return np.asarray(out[:n], dtype=np.float32)

    def warmup(self, buckets: Optional[Sequence[int]] = None) -> None:
        """Pre-compile the hot shapes so the first real batch isn't slow."""
        s = self.image_size
        for b in (buckets or self.buckets):
            self.encode_images(np.zeros((b, s, s, 3), np.uint8))
        self.encode_texts(["warmup"])


def _load_torch_checkpoint(path: str, cfg: CLIPConfig):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    sd = {k: v for k, v in obj.items()}
    return convert.from_state_dict(sd, cfg)
