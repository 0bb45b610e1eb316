"""Worker for the 2-process multi-host smoke test (run as __main__).

Each process owns 4 virtual CPU devices; jax.distributed wires them into
one 8-device global mesh over the loopback coordinator — the same shape
a 2-host DCN deployment has (SURVEY.md section 2c, comm backend row).
Prints one RESULT line the test compares across processes.
"""

import os
import sys


def main() -> int:
    pid = int(sys.argv[1])
    port = sys.argv[2]
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    # env-var platform selection is overridden by the host's TPU plugin
    # site; config.update after import is authoritative (same trick as
    # tests/conftest.py) and keeps this entirely off the real chip
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from clipx.parallel import distributed

    distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
    assert distributed.is_multi_process()
    assert jax.process_count() == 2 and len(jax.devices()) == 8

    import numpy as np

    from clipx import train as train_lib
    from clipx.config import tiny_test
    from clipx.parallel import mesh as mesh_lib
    from clipx.parallel.mips import ShardedVectorIndex

    # -- one dp x tp train step on the global mesh --------------------------
    cfg = tiny_test()
    mesh = mesh_lib.make_mesh({"dp": 4, "tp": 2})
    tx = train_lib.make_optimizer(learning_rate=1e-3, warmup_steps=1,
                                  total_steps=10)
    state, tx = train_lib.create_train_state(cfg, jax.random.PRNGKey(0), tx)
    jitted, shard_state, batch_sh = train_lib.make_sharded_train_step(
        cfg, tx, mesh)
    state = shard_state(state)

    rng = np.random.RandomState(0)
    global_batch = 8
    local = distributed.process_local_batch(global_batch)
    pixels = rng.randn(global_batch, cfg.vision.image_size,
                       cfg.vision.image_size, 3).astype(np.float32)
    ids = np.zeros((global_batch, cfg.text.context_length), np.int32)
    ids[:, 0] = cfg.text.vocab_size - 2
    ids[:, 1] = cfg.text.vocab_size - 1
    lo = pid * local
    gp = jax.make_array_from_process_local_data(
        batch_sh, pixels[lo: lo + local])
    gi = jax.make_array_from_process_local_data(batch_sh,
                                                ids[lo: lo + local])
    state, metrics = jitted(state, gp, gi)
    loss = float(jax.device_get(metrics["loss"]))
    assert np.isfinite(loss)

    # -- one sharded search over the global mesh ----------------------------
    corpus = rng.randn(300, 64).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    idx = ShardedVectorIndex(corpus,
                             mesh_lib.make_mesh({"shard": 8}))
    D, I = idx.search(corpus[:2], k=1)
    assert (I[:, 0] == [0, 1]).all(), I

    print(f"RESULT loss={loss:.6f} top1=self", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
