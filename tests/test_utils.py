"""Stage timers and the single-writer indexer lock."""

import os
import subprocess
import sys
import time

import pytest

from clipx.utils.locking import LockHeldError, SingleWriterLock
from clipx.utils.profiling import StageTimers


def test_stage_timers_accumulate():
    t = StageTimers()
    with t.stage("a", items=10):
        time.sleep(0.01)
    with t.stage("a", items=5):
        pass
    with t.stage("b"):
        pass
    assert t.seconds("a") >= 0.01
    assert t.items("a") == 15
    s = t.summary()
    assert "a:" in s and "n=15" in s and "b:" in s and "/s)" in s


def test_lock_excludes_second_writer_same_process(tmp_path):
    d = str(tmp_path / "env")
    lock = SingleWriterLock(d)
    lock.acquire()
    try:
        # flock is per-fd, so a second lock object conflicts even in
        # the same process
        with pytest.raises(LockHeldError):
            SingleWriterLock(d).acquire()
    finally:
        lock.release()
    # after release it is acquirable again
    with SingleWriterLock(d):
        pass


def test_lock_excludes_other_process(tmp_path):
    d = str(tmp_path / "env")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (f"import sys; sys.path.insert(0, {repo!r})\n"
            f"from clipx.utils.locking import SingleWriterLock, LockHeldError\n"
            f"try:\n"
            f"    SingleWriterLock({d!r}).acquire()\n"
            f"    print('ACQUIRED')\n"
            f"except LockHeldError:\n"
            f"    print('HELD')\n")
    with SingleWriterLock(d):
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True)
        assert out.stdout.strip() == "HELD"
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True)
    assert out.stdout.strip() == "ACQUIRED"


def test_build_cli_refuses_second_indexer(tmp_path, monkeypatch, capsys):
    """The CLI-level guard: a held lock aborts with a clear error."""
    from clipx.cli import build_index as bi

    monkeypatch.chdir(tmp_path)
    with SingleWriterLock("vectors.lmdb"):
        rc = bi.main(["--model", "tiny-test"])
    assert rc == 1
    assert "another indexer" in capsys.readouterr().out


def test_viewer_fit_resolution():
    """The reference's sequential clamp arithmetic
    (reference:query-index.py:126-139) incl. rounding."""
    from clipx.cli.viewer import fit_resolution

    # no resize when within bounds
    assert fit_resolution(640, 480, (1280, 720)) == (640, 480, False)
    # width clamp scales height
    w, h, r = fit_resolution(2560, 1440, (1280, 720))
    assert (w, h, r) == (1280, 720, True)
    # width clamp then height clamp (both exceed after first pass)
    w, h, r = fit_resolution(2000, 3000, (1280, 720))
    assert r and h == 720 and w == round(2000 * (1280 / 2000) * (720 / 1920))
    # only height exceeds
    w, h, r = fit_resolution(500, 1000, (1280, 720))
    assert r and h == 720 and w == 360


def test_kv_tool_cli(tmp_path, capsys):
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    import kv_tool

    from clipx.store import kv as kv_mod
    env_path = str(tmp_path / "vectors.lmdb")
    env = kv_mod.open_env(env_path)
    db = env.open_db(b"fn_db")
    with env.begin(db=db, write=True) as txn:
        for i in range(20):
            txn.put(f"k{i:02d}".encode(), b"v" * 50)
    # garbage for compaction
    for _ in range(3):
        with env.begin(db=db, write=True) as txn:
            for i in range(20):
                txn.put(f"k{i:02d}".encode(), b"w" * 50)
    env.close()

    assert kv_tool.main(["stat", env_path]) == 0
    out = capsys.readouterr().out
    assert "fn_db" in out and "20" in out

    assert kv_tool.main(["compact", env_path]) == 0
    assert "compacted" in capsys.readouterr().out

    assert kv_tool.main(["verify", env_path]) == 0
    assert "verify: OK" in capsys.readouterr().out

    assert kv_tool.main(["stat", str(tmp_path / "missing")]) == 1


def test_kv_tool_check_index(tmp_path, monkeypatch, capsys):
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    import kv_tool
    import numpy as np
    from PIL import Image
    from clipx.cli import build_index as bi

    photos = tmp_path / "photos"
    photos.mkdir()
    rng = np.random.RandomState(0)
    for n in ("a.jpg", "b.jpg", "c.jpg"):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(photos / n)
    work = tmp_path / "w"
    work.mkdir()
    monkeypatch.chdir(work)
    assert bi.main(["--model", "tiny-test", str(photos) + os.sep]) == 0
    capsys.readouterr()

    assert kv_tool.main(["check-index", "vectors.lmdb"]) == 0
    assert "check-index: OK" in capsys.readouterr().out

    # corrupt: add a new embedding without rebuilding the index
    from clipx.store import kv as kv_mod
    env = kv_mod.open_env("vectors.lmdb")
    fn_db = env.open_db(b"fn_db")
    with env.begin(db=fn_db, write=True) as txn:
        txn.put(b"zzz_new.jpg", np.zeros(32, np.float32).tobytes())
    env.close()
    assert kv_tool.main(["check-index", "vectors.lmdb"]) == 2
    assert "STALE" in capsys.readouterr().out


def test_process_local_batch():
    from clipx.parallel.distributed import process_local_batch

    # single-process: the whole global batch is local
    assert process_local_batch(64) == 64


def test_eval_quality_tool(tmp_path, monkeypatch, capsys):
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    import eval_quality
    import numpy as np
    from PIL import Image
    from clipx.cli import build_index as bi

    photos = tmp_path / "photos"
    photos.mkdir()
    rng = np.random.RandomState(1)
    for i in range(6):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(photos / f"x{i}.jpg")
    work = tmp_path / "w"
    work.mkdir()
    monkeypatch.chdir(work)
    assert bi.main(["--model", "tiny-test", str(photos) + os.sep]) == 0
    capsys.readouterr()

    rc = eval_quality.main(["--model", "tiny-test",
                            "--photos", str(photos) + os.sep,
                            "--samples", "6", "--k", "3"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "self-retrieval: 6/6 rank-0 hits" in out
    assert "int8+rescore vs exact: recall@3 1.0000" in out
    assert "sharded vs exact: recall@3 1.0000" in out
    assert "preprocess drift" in out
