"""Train CLI end-to-end on synthetic caption pairs (tiny model, CPU)."""

import os

import numpy as np
import pytest
from PIL import Image

from clipx.cli import train as train_cli


@pytest.fixture()
def pair_dir(tmp_path):
    d = tmp_path / "data"
    d.mkdir()
    rng = np.random.RandomState(0)
    captions = ["a red square", "a green field", "blue sky", "noise",
                "a sunset", "the ocean", "a forest", "city lights"]
    for i, cap in enumerate(captions):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(d / f"img{i}.jpg")
        (d / f"img{i}.txt").write_text(cap)
    # an image without caption -> skipped
    Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                    ).save(d / "orphan.jpg")
    return str(d)


def test_find_pairs(pair_dir, capsys):
    pairs = train_cli.find_pairs(pair_dir)
    assert len(pairs) == 8
    assert "1 images without captions skipped" in capsys.readouterr().out


def test_train_runs_and_checkpoints(pair_dir, tmp_path, capsys):
    ckpt = str(tmp_path / "ckpts")
    rc = train_cli.main([pair_dir, "--model", "tiny-test", "--steps", "4",
                         "--batch-size", "4", "--log-every", "2",
                         "--checkpoint-dir", ckpt,
                         "--checkpoint-every", "2", "--lr", "1e-3",
                         "--warmup-steps", "1"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "step 4/4" in out and "loss" in out
    assert os.path.exists(os.path.join(ckpt, "latest"))
    assert os.path.exists(os.path.join(ckpt, "params.npz"))

    # the trained params must load back into an Encoder
    from clipx.runtime.encoder import Encoder

    enc = Encoder.create("tiny-test",
                         checkpoint=os.path.join(ckpt, "params.npz"))
    emb = enc.encode_texts(["a red square"])
    assert emb.shape == (1, 32) and np.isfinite(emb).all()


def test_train_resume(pair_dir, tmp_path, capsys):
    ckpt = str(tmp_path / "ckpts")
    base = [pair_dir, "--model", "tiny-test", "--batch-size", "4",
            "--checkpoint-dir", ckpt, "--checkpoint-every", "2",
            "--log-every", "2", "--lr", "1e-3", "--warmup-steps", "1"]
    assert train_cli.main(base + ["--steps", "2"]) == 0
    capsys.readouterr()
    assert train_cli.main(base + ["--steps", "4", "--resume"]) == 0
    out = capsys.readouterr().out
    assert "resumed from" in out and "at step 2" in out
    assert "step 4/4" in out


def test_train_empty_dir(tmp_path, capsys):
    d = tmp_path / "empty"
    d.mkdir()
    assert train_cli.main([str(d), "--model", "tiny-test"]) == 1
    assert "no (image, caption) pairs" in capsys.readouterr().out


def test_train_dp_tp_mesh(pair_dir, capsys):
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rc = train_cli.main([pair_dir, "--model", "tiny-test", "--steps", "2",
                         "--batch-size", "8", "--dp", "4", "--tp", "2",
                         "--log-every", "1", "--lr", "1e-3",
                         "--warmup-steps", "1"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "mesh: dp=4 tp=2" in out
    assert "step 2/2" in out


def test_train_resume_relative_checkpoint_dir(pair_dir, tmp_path,
                                              monkeypatch, capsys):
    """orbax needs absolute paths; both save and restore must absolutize
    (caught by end-to-end verification with --checkpoint-dir ckpts)."""
    monkeypatch.chdir(tmp_path)
    base = [pair_dir, "--model", "tiny-test", "--batch-size", "4",
            "--checkpoint-dir", "ckpts", "--checkpoint-every", "2",
            "--log-every", "2", "--lr", "1e-3", "--warmup-steps", "1"]
    assert train_cli.main(base + ["--steps", "2"]) == 0
    capsys.readouterr()
    assert train_cli.main(base + ["--steps", "4", "--resume"]) == 0
    out = capsys.readouterr().out
    assert "resumed from" in out and "at step 2" in out


def test_pair_loader_pooled_decode_and_bad_file(pair_dir):
    """Cold-cache batches decode through the thread pool in one sweep;
    undecodable files are resampled, never crash the loader."""
    (os.path.join(pair_dir, "bad.jpg"))
    with open(os.path.join(pair_dir, "bad.jpg"), "wb") as f:
        f.write(b"garbage not an image")
    with open(os.path.join(pair_dir, "bad.txt"), "w") as f:
        f.write("caption of a broken file")
    pairs = train_cli.find_pairs(pair_dir)
    assert any(p[0].endswith("bad.jpg") for p in pairs)
    loader = train_cli.PairLoader(pairs, image_size=32, context_length=16,
                                  batch_size=6, seed=3, decode_workers=4)
    for _ in range(4):  # several batches so the bad file gets sampled
        pixels, ids = loader.next_batch()
        assert pixels.shape == (6, 32, 32, 3)
        assert ids.shape == (6, 16)
        assert np.isfinite(pixels).all()
    # the bad file is cached as None (decoded once, skipped forever)
    bad = [p for p in loader._cache if p.endswith("bad.jpg")]
    assert all(loader._cache[p] is None for p in bad)


def test_interrupt_checkpoints_and_resumes(pair_dir, tmp_path, capsys,
                                           monkeypatch):
    """Ctrl-C between steps must save a checkpoint and exit 0 so
    --resume continues the run (long fine-tunes are stopped, not
    babysat)."""
    ckpt = str(tmp_path / "ckpts")
    base = [pair_dir, "--model", "tiny-test", "--batch-size", "4",
            "--checkpoint-dir", ckpt, "--checkpoint-every", "50",
            "--lr", "1e-3", "--warmup-steps", "1", "--log-every", "50"]

    real_next = train_cli.PairLoader.next_batch
    calls = {"n": 0}

    def interrupting(self):
        calls["n"] += 1
        if calls["n"] > 3:
            raise KeyboardInterrupt
        return real_next(self)

    monkeypatch.setattr(train_cli.PairLoader, "next_batch", interrupting)
    rc = train_cli.main(base + ["--steps", "100"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "interrupt: stopping after step 3" in out
    assert os.path.exists(os.path.join(ckpt, "latest"))

    monkeypatch.setattr(train_cli.PairLoader, "next_batch", real_next)
    rc = train_cli.main(base + ["--steps", "5", "--resume"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "resumed from" in out and "at step 3" in out
    assert "step 5/5" in out


def test_sigterm_checkpoints_and_exits_zero(pair_dir, tmp_path):
    """`kill PID` on a training run must stop between steps, save a
    checkpoint, and exit 0 — the default disposition would die
    mid-device-dispatch and abandon the chip claim."""
    import signal

    from tests._subproc import finish, read_until, spawn

    ckpt = str(tmp_path / "ckpts")
    code = ("import jax; jax.config.update('jax_platforms', 'cpu');"
            "from clipx.cli.train import main;"
            f"raise SystemExit(main([{pair_dir!r}, '--model', 'tiny-test',"
            f"'--steps', '100000', '--batch-size', '4', '--lr', '1e-3',"
            f"'--warmup-steps', '1', '--log-every', '1',"
            f"'--checkpoint-every', '100000', '--checkpoint-dir',"
            f"{ckpt!r}]))")
    proc = spawn(code)
    try:
        buf = read_until(proc, lambda t: "step " in t, timeout=180)
        assert "step " in buf, buf
        proc.send_signal(signal.SIGTERM)
        out = finish(proc, timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()
            finish(proc, timeout=30)
    out = buf + out
    assert proc.returncode == 0, out
    assert "SIGTERM: stopping after step" in out
    assert "checkpoint ->" in out
    assert os.path.exists(os.path.join(ckpt, "latest"))
    assert os.path.exists(os.path.join(ckpt, "params.npz"))


def test_init_checkpoint_without_merges_warns(pair_dir, tmp_path, capsys):
    """Fine-tuning REAL weights with the byte-fallback tokenizer would
    silently corrupt the text tower (caption ids don't map to the
    pretrained embedding rows) — the CLI must warn loudly, same as the
    query path (clipx/cli/common.py make_encoder)."""
    from clipx import config as config_lib
    from clipx.models import clip as model_lib
    from clipx.models import convert

    cfg = config_lib.get_config("tiny-test")
    import jax
    params = model_lib.init_params(cfg, jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "init.npz")
    convert.save_params(ckpt, params)

    rc = train_cli.main([pair_dir, "--model", "tiny-test", "--steps", "1",
                         "--batch-size", "4", "--lr", "1e-3",
                         "--warmup-steps", "1",
                         "--init-checkpoint", ckpt])
    assert rc == 0
    out = capsys.readouterr().out
    assert "BPE merge" in out and "WARNING" in out
