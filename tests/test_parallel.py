"""Multi-device tests on the 8-device virtual CPU mesh: sharded MIPS
equivalence, TP-sharded encode parity, and the dp x tp train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipx import train as train_lib
from clipx.config import tiny_test
from clipx.models import clip as model_lib
from clipx.parallel import mesh as mesh_lib
from clipx.parallel.mips import ShardedVectorIndex
from clipx.search.engine import VectorIndex

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _normed(rng, n, d=64):
    v = rng.randn(n, d).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


# ---------------------------------------------------------------------------
# sharded MIPS
# ---------------------------------------------------------------------------

def test_sharded_search_matches_single_device():
    rng = np.random.RandomState(0)
    corpus = _normed(rng, 1000)
    queries = _normed(rng, 4)
    mesh = mesh_lib.make_mesh({"shard": 8})
    sharded = ShardedVectorIndex(corpus, mesh)
    single = VectorIndex.from_vectors(corpus)
    Ds, Is = sharded.search(queries, k=20)
    D1, I1 = single.search(queries, k=20)
    np.testing.assert_array_equal(Is, I1)
    np.testing.assert_allclose(Ds, D1, rtol=1e-5, atol=1e-6)


def test_sharded_search_odd_sizes_and_padding():
    rng = np.random.RandomState(1)
    corpus = _normed(rng, 777)  # not divisible by 8
    queries = _normed(rng, 1)
    mesh = mesh_lib.make_mesh({"shard": 8})
    sharded = ShardedVectorIndex(corpus, mesh)
    single = VectorIndex.from_vectors(corpus)
    Ds, Is = sharded.search(queries, k=10)
    D1, I1 = single.search(queries, k=10)
    np.testing.assert_array_equal(Is, I1)
    assert (Is < 777).all()


def test_sharded_search_k_exceeds_total():
    rng = np.random.RandomState(2)
    corpus = _normed(rng, 5)
    mesh = mesh_lib.make_mesh({"shard": 8})
    sharded = ShardedVectorIndex(corpus, mesh)
    D, I = sharded.search(_normed(rng, 1), k=9)
    assert (I[0, :5] >= 0).all()
    assert (I[0, 5:] == -1).all()


def test_sharded_search_high_query_count_chunked():
    """Q beyond the per-call cap is chunked (same _MAX_Q bound as the
    single-device index — per-shard top-k scratch scales with Q just
    the same) and must still match single-device results."""
    rng = np.random.RandomState(24)
    corpus = _normed(rng, 1500)
    queries = _normed(rng, 64)
    mesh = mesh_lib.make_mesh({"shard": 8})
    sharded = ShardedVectorIndex(corpus, mesh)
    single = VectorIndex.from_vectors(corpus)
    Ds, Is = sharded.search(queries, k=10)
    D1, I1 = single.search(queries, k=10)
    assert Ds.shape == (64, 10)
    np.testing.assert_array_equal(Is, I1)
    np.testing.assert_allclose(Ds, D1, rtol=1e-5, atol=1e-6)


def test_sharded_search_empty():
    mesh = mesh_lib.make_mesh({"shard": 8})
    idx = ShardedVectorIndex(np.zeros((0, 16), np.float32), mesh)
    D, I = idx.search(np.zeros((1, 16), np.float32), k=3)
    assert (I == -1).all()


def test_sharded_add_matches_fresh_build():
    """Incremental add on the sharded index (serve's cheap /reload path)
    must search identically to a from-scratch build of the full corpus,
    across in-capacity updates AND a capacity-growing one."""
    rng = np.random.RandomState(25)
    full = _normed(rng, 1400)
    queries = _normed(rng, 3)
    mesh = mesh_lib.make_mesh({"shard": 8})
    grown = ShardedVectorIndex(full[:900], mesh)
    grown.add(full[900:910])     # small in-capacity delta
    grown.add(full[910:1400])    # forces capacity growth + reshard
    assert grown.ntotal == 1400
    fresh = ShardedVectorIndex(full, mesh)
    Dg, Ig = grown.search(queries, k=25)
    Df, If = fresh.search(queries, k=25)
    np.testing.assert_array_equal(Ig, If)
    np.testing.assert_allclose(Dg, Df, rtol=1e-5, atol=1e-6)
    # quantized scan copy rebuilds lazily after add and stays correct
    grown.quantized = True
    Dq, Iq = grown.search(queries, k=25)
    np.testing.assert_array_equal(Iq, If)


def test_sharded_add_from_empty():
    mesh = mesh_lib.make_mesh({"shard": 8})
    rng = np.random.RandomState(26)
    idx = ShardedVectorIndex(np.zeros((0, 64), np.float32), mesh)
    vecs = _normed(rng, 50)
    idx.add(vecs)
    D, I = idx.search(vecs[:2], k=1)
    np.testing.assert_array_equal(I[:, 0], [0, 1])


# ---------------------------------------------------------------------------
# TP-sharded encode parity
# ---------------------------------------------------------------------------

def test_tp_sharded_encode_matches_replicated():
    cfg = tiny_test()
    params = model_lib.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(3)
    pixels = rng.randn(4, 32, 32, 3).astype(np.float32)

    ref = np.asarray(model_lib.encode_image(params, cfg, pixels))

    mesh = mesh_lib.make_mesh({"dp": 4, "tp": 2})
    sharded_params = mesh_lib.shard_params(params, mesh)
    fn = jax.jit(lambda p, x: model_lib.encode_image(p, cfg, x))
    out = np.asarray(fn(sharded_params,
                        jax.device_put(pixels,
                                       mesh_lib.batch_sharding(mesh))))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# training step
# ---------------------------------------------------------------------------

def _tiny_batch(rng, b, cfg):
    pixels = rng.randn(b, cfg.vision.image_size, cfg.vision.image_size,
                       3).astype(np.float32)
    ids = np.zeros((b, cfg.text.context_length), np.int32)
    eot = cfg.text.vocab_size - 1
    for i in range(b):
        ids[i, 0] = eot - 1
        ids[i, 1] = rng.randint(1, 1000)
        ids[i, 2] = eot
    return pixels, ids


def test_single_device_train_step_reduces_loss():
    cfg = tiny_test()
    tx = train_lib.make_optimizer(learning_rate=1e-3, warmup_steps=1,
                                  total_steps=50)
    state, tx = train_lib.create_train_state(cfg, jax.random.PRNGKey(0), tx)
    step = jax.jit(train_lib.make_train_step(cfg, tx))
    rng = np.random.RandomState(0)
    pixels, ids = _tiny_batch(rng, 8, cfg)
    losses = []
    for _ in range(8):
        state, metrics = step(state, pixels, ids)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 8


def test_sharded_train_step_runs_and_matches_shape():
    cfg = tiny_test()
    mesh = mesh_lib.make_mesh({"dp": 4, "tp": 2})
    tx = train_lib.make_optimizer(learning_rate=1e-3, warmup_steps=1,
                                  total_steps=50)
    state, tx = train_lib.create_train_state(cfg, jax.random.PRNGKey(0), tx)
    jitted, shard_state, batch_sh = train_lib.make_sharded_train_step(
        cfg, tx, mesh)
    state = shard_state(state)
    rng = np.random.RandomState(1)
    pixels, ids = _tiny_batch(rng, 8, cfg)
    pixels = jax.device_put(pixels, batch_sh)
    ids = jax.device_put(ids, batch_sh)
    state, metrics = jitted(state, pixels, ids)
    assert np.isfinite(float(metrics["loss"]))
    state, metrics2 = jitted(state, pixels, ids)
    assert float(metrics2["loss"]) < float(metrics["loss"]) + 1.0
    assert int(state.step) == 2


def test_sharded_vs_single_loss_parity():
    """Same batch, same params: dp x tp loss must match single-device."""
    cfg = tiny_test()
    params = model_lib.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(2)
    pixels, ids = _tiny_batch(rng, 8, cfg)
    loss_ref, _ = train_lib.contrastive_loss(params, cfg, pixels, ids)

    mesh = mesh_lib.make_mesh({"dp": 4, "tp": 2})
    p_sh = mesh_lib.shard_params(params, mesh)
    fn = jax.jit(lambda p, x, t: train_lib.contrastive_loss(p, cfg, x, t)[0])
    loss_sh = fn(p_sh,
                 jax.device_put(pixels, mesh_lib.batch_sharding(mesh)),
                 jax.device_put(ids, mesh_lib.batch_sharding(mesh)))
    np.testing.assert_allclose(float(loss_sh), float(loss_ref),
                               rtol=1e-4, atol=1e-4)


def test_make_mesh_validates_sizes():
    with pytest.raises(ValueError):
        mesh_lib.make_mesh({"dp": 3, "tp": 5})


def test_train_state_checkpoint_roundtrip(tmp_path):
    import jax

    cfg = tiny_test()
    tx = train_lib.make_optimizer(warmup_steps=1, total_steps=10)
    state, tx = train_lib.create_train_state(cfg, jax.random.PRNGKey(7), tx)
    path = str(tmp_path / "ckpt")
    train_lib.save_train_state(path, state)
    template = jax.tree_util.tree_map(np.zeros_like,
                                      jax.device_get(state))
    template = train_lib.TrainState(*template)
    restored = train_lib.restore_train_state(path, template)
    a = jax.tree_util.tree_leaves(jax.device_get(state))
    b = jax.tree_util.tree_leaves(jax.device_get(restored))
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_sharded_quantized_matches_exact():
    rng = np.random.RandomState(21)
    corpus = _normed(rng, 2000)
    queries = _normed(rng, 3)
    mesh = mesh_lib.make_mesh({"shard": 8})
    exact = ShardedVectorIndex(corpus, mesh)
    quant = ShardedVectorIndex(corpus, mesh, quantized=True)
    De, Ie = exact.search(queries, k=15)
    Dq, Iq = quant.search(queries, k=15)
    np.testing.assert_array_equal(Iq, Ie)
    np.testing.assert_allclose(Dq, De, rtol=1e-5, atol=1e-6)


def test_sharded_absurd_k_is_clamped():
    rng = np.random.RandomState(22)
    mesh = mesh_lib.make_mesh({"shard": 8})
    idx = ShardedVectorIndex(_normed(rng, 10), mesh)
    D, I = idx.search(_normed(rng, 1), k=9_999_999_999)
    assert D.shape[1] <= 16384
    assert (I[0, :10] >= 0).all()


def test_sharded_k_beyond_rows_per_shard_matches_single_device():
    """k larger than rows-per-shard must still return every valid row
    (the merge selects from the gathered n_shards * kk pool, not kk)."""
    rng = np.random.RandomState(23)
    corpus = _normed(rng, 1024)  # 8 shards x 128 rows
    queries = _normed(rng, 2)
    mesh = mesh_lib.make_mesh({"shard": 8})
    sharded = ShardedVectorIndex(corpus, mesh)
    single = VectorIndex.from_vectors(corpus)
    Ds, Is = sharded.search(queries, k=500)
    D1, I1 = single.search(queries, k=500)
    assert (Is >= 0).all(), "valid rows were dropped / padded with -1"
    np.testing.assert_array_equal(Is, I1)
    np.testing.assert_allclose(Ds, D1, rtol=1e-5, atol=1e-6)


def test_shard_state_preserves_opt_state():
    """--resume contract: re-sharding a restored TrainState must keep the
    adam moments and schedule step, not rebuild them via tx.init."""
    cfg = tiny_test()
    mesh = mesh_lib.make_mesh({"dp": 4, "tp": 2})
    tx = train_lib.make_optimizer(learning_rate=1e-3, warmup_steps=2,
                                  total_steps=50)
    state, tx = train_lib.create_train_state(cfg, jax.random.PRNGKey(3), tx)
    jitted, shard_state, batch_sh = train_lib.make_sharded_train_step(
        cfg, tx, mesh)
    state = shard_state(state)
    rng = np.random.RandomState(4)
    pixels, ids = _tiny_batch(rng, 8, cfg)
    pixels = jax.device_put(pixels, batch_sh)
    ids = jax.device_put(ids, batch_sh)
    for _ in range(3):
        state, _ = jitted(state, pixels, ids)
    host = train_lib.TrainState(*jax.device_get(state))  # what orbax saves

    resharded = shard_state(host)  # what --resume does after restore
    a = jax.tree_util.tree_leaves(host.opt_state)
    b = jax.tree_util.tree_leaves(jax.device_get(resharded).opt_state)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    flat = jax.tree_util.tree_flatten_with_path(
        jax.device_get(resharded).opt_state)[0]
    counts = [np.asarray(leaf) for path, leaf in flat
              if "count" in "".join(map(str, path))]
    assert counts and all(int(c) == 3 for c in counts)
    # moments carry the same shardings as before (next step still runs)
    resharded, metrics = jitted(resharded, pixels, ids)
    assert np.isfinite(float(metrics["loss"]))


# ---------------------------------------------------------------------------
# data-parallel indexing encode (the reference's hot loop #1 scaled out,
# reference:build-index.py:45-51; SURVEY.md section 2c DP row)
# ---------------------------------------------------------------------------

def test_dp_encode_bitwise_matches_single_device():
    from clipx.runtime.encoder import Encoder

    cfg = tiny_test()
    params = model_lib.init_params(cfg, jax.random.PRNGKey(0))
    single = Encoder(cfg, params)
    mesh = mesh_lib.make_mesh({"dp": 8})
    dp = Encoder(cfg, params, mesh=mesh)
    rng = np.random.RandomState(0)
    s = cfg.vision.image_size
    batch = rng.randint(0, 256, (20, s, s, 3), dtype=np.uint8)
    np.testing.assert_array_equal(single.encode_images(batch),
                                  dp.encode_images(batch))


def test_dp_encode_int8_compute_matches_single_device():
    """--compute int8 under the dp shard_map: the quantized param tree
    (int8 codes + f32 scales) replicates over the mesh and dp encode
    stays bitwise-equal to the single-device int8 encoder."""
    from clipx.runtime.encoder import Encoder

    cfg = tiny_test()
    params = model_lib.init_params(cfg, jax.random.PRNGKey(0))
    single = Encoder(cfg, params, compute_quant="int8")
    mesh = mesh_lib.make_mesh({"dp": 8})
    dp = Encoder(cfg, params, mesh=mesh, compute_quant="int8")
    assert dp.params["visual"]["blocks"]["mlp"]["w1_q"].dtype == jnp.int8
    rng = np.random.RandomState(1)
    s = cfg.vision.image_size
    batch = rng.randint(0, 256, (20, s, s, 3), dtype=np.uint8)
    np.testing.assert_array_equal(single.encode_images(batch),
                                  dp.encode_images(batch))


def test_dp_encode_batch_actually_sharded():
    """The compiled dp encode must consume a dp-sharded batch and produce
    a dp-sharded output — not silently replicate onto one device."""
    from jax.sharding import PartitionSpec as P
    from clipx.runtime.encoder import Encoder

    cfg = tiny_test()
    params = model_lib.init_params(cfg, jax.random.PRNGKey(0))
    mesh = mesh_lib.make_mesh({"dp": 8})
    enc = Encoder(cfg, params, mesh=mesh)
    assert all(b % 8 == 0 for b in enc.buckets)
    s = cfg.vision.image_size
    out, n = enc.encode_images_async(
        np.zeros((16, s, s, 3), np.uint8))
    assert n == 16
    assert out.sharding.spec == P("dp")
    # placement: each device holds exactly 1/8 of the (bucketed) batch
    shard_rows = {sh.data.shape[0] for sh in out.addressable_shards}
    assert shard_rows == {out.shape[0] // 8}


def test_dp_encode_tp_sharded_params():
    """dp x tp: params TP-sharded via the mesh rules, batch over dp."""
    from clipx.runtime.encoder import Encoder

    cfg = tiny_test()
    params = model_lib.init_params(cfg, jax.random.PRNGKey(1))
    single = Encoder(cfg, params)
    mesh = mesh_lib.make_mesh({"dp": 4, "tp": 2})
    dptp = Encoder(cfg, params, mesh=mesh, tp="tp")
    rng = np.random.RandomState(1)
    s = cfg.vision.image_size
    batch = rng.randint(0, 256, (8, s, s, 3), dtype=np.uint8)
    np.testing.assert_allclose(single.encode_images(batch),
                               dptp.encode_images(batch),
                               rtol=2e-5, atol=2e-6)


def test_search_mode_wired_through_sharded_index(tmp_path):
    """--search-mode must configure the sharded index too, not just the
    single-device branch (the int8 win must survive on a pod)."""
    from types import SimpleNamespace

    from clipx.cli.query_index import _load_index
    from clipx.search.engine import write_index

    rng = np.random.RandomState(30)
    idx = VectorIndex.from_vectors(_normed(rng, 300))
    path = str(tmp_path / "images.index")
    write_index(idx, path)
    for sm, expect in (("quant", True), ("exact", False), ("auto", False)):
        args = SimpleNamespace(index=path, sharded="on", search_mode=sm)
        loaded = _load_index(args)
        assert isinstance(loaded, ShardedVectorIndex)
        assert loaded.quantized is expect, sm


def test_tp_forces_plain_attention_even_when_pallas_requested():
    """TP-sharded params must never reach the fused pallas kernels —
    they consume full-width weight blocks and would force gathers or
    break GSPMD partitioning. The guard has to cover an EXPLICIT
    attn_impl='pallas' too, not just the 'auto'/'xla' default."""
    from clipx.runtime.encoder import Encoder

    cfg = tiny_test()
    params = model_lib.init_params(cfg, jax.random.PRNGKey(0))
    mesh = mesh_lib.make_mesh({"dp": 4, "tp": 2})
    for impl in ("auto", "xla", "pallas"):
        enc = Encoder(cfg, params, mesh=mesh, tp="tp", attn_impl=impl)
        assert enc.attn_impl == "plain", impl
