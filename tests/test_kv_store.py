"""Native KV store tests: the LMDB-shaped contract the CLI layer needs."""

import os
import struct
import subprocess
import sys
import threading

import numpy as np
import pytest

from clipx.store import kv


@pytest.fixture()
def env(tmp_path):
    e = kv.open_env(str(tmp_path / "vectors.lmdb"), map_size=1 << 30, max_dbs=4)
    yield e
    e.close()


def test_put_get_roundtrip(env):
    db = env.open_db(b"fn_db")
    with env.begin(db=db, write=True) as txn:
        txn.put(b"key1", b"value1")
    with env.begin(db=db) as txn:
        assert txn.get(b"key1") == b"value1"
        assert txn.get(b"missing") is None
        assert txn.get(b"missing", default=b"d") == b"d"


def test_binary_values(env):
    """512 float32 embeddings as raw bytes — the fn_db value format
    (reference:build-index.py:51)."""
    db = env.open_db(b"fn_db")
    vec = np.random.RandomState(0).randn(512).astype(np.float32)
    with env.begin(db=db, write=True) as txn:
        txn.put(b"/photos/a.jpg", vec.tobytes())
    with env.begin(db=db) as txn:
        out = np.frombuffer(txn.get(b"/photos/a.jpg"), dtype=np.float32)
    np.testing.assert_array_equal(out, vec)


def test_sub_databases_are_isolated(env):
    a = env.open_db(b"fn_db")
    b = env.open_db(b"skip_db")
    with env.begin(write=True) as txn:
        txn.put(b"k", b"in_a", db=a)
        txn.put(b"k", b"in_b", db=b)
    with env.begin() as txn:
        assert txn.get(b"k", db=a) == b"in_a"
        assert txn.get(b"k", db=b) == b"in_b"


def test_cursor_lexicographic_order(env):
    """Cursor order drives faiss-id assignment (reference:build-index.py:75-88)."""
    db = env.open_db(b"fn_db")
    keys = [b"zeta", b"alpha", b"mid", b"alpha2", b"a"]
    with env.begin(db=db, write=True) as txn:
        for i, k in enumerate(keys):
            txn.put(k, str(i).encode())
    with env.begin(db=db) as txn:
        got = [k for k, _ in txn.cursor()]
    assert got == sorted(keys)


def test_cursor_first_then_iterate(env):
    db = env.open_db(b"fn_db")
    with env.begin(db=db, write=True) as txn:
        txn.put(b"b", b"2")
        txn.put(b"a", b"1")
    with env.begin(db=db) as txn:
        cur = txn.cursor()
        assert cur.first()
        assert list(cur) == [(b"a", b"1"), (b"b", b"2")]
    with env.begin(db=db) as txn:
        cur = txn.cursor()
        # empty-db contract
        env2_items = list(cur)
        assert env2_items == [(b"a", b"1"), (b"b", b"2")]


def test_stat_entries(env):
    db = env.open_db(b"fn_db")
    with env.begin(db=db) as txn:
        assert txn.stat()["entries"] == 0
    with env.begin(db=db, write=True) as txn:
        for i in range(7):
            txn.put(f"k{i}".encode(), b"v")
    with env.begin(db=db) as txn:
        assert txn.stat()["entries"] == 7


def test_abort_discards_writes(env):
    db = env.open_db(b"fn_db")
    try:
        with env.begin(db=db, write=True) as txn:
            txn.put(b"k", b"v")
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    with env.begin(db=db) as txn:
        assert txn.get(b"k") is None


def test_read_your_writes(env):
    db = env.open_db(b"fn_db")
    with env.begin(db=db, write=True) as txn:
        assert txn.get(b"k") is None
        txn.put(b"k", b"v")
        assert txn.get(b"k") == b"v"
        txn.delete(b"k")
        assert txn.get(b"k") is None


def test_persistence_across_reopen(tmp_path):
    path = str(tmp_path / "vectors.lmdb")
    env = kv.open_env(path)
    db = env.open_db(b"fn_db")
    with env.begin(db=db, write=True) as txn:
        txn.put(b"persist", b"yes")
    env.close()

    env = kv.open_env(path)
    db = env.open_db(b"fn_db")
    with env.begin(db=db) as txn:
        assert txn.get(b"persist") == b"yes"
    env.close()


def test_overwrite_and_delete(env):
    db = env.open_db(b"fn_db")
    with env.begin(db=db, write=True) as txn:
        txn.put(b"k", b"v1")
    with env.begin(db=db, write=True) as txn:
        txn.put(b"k", b"v2")
        assert txn.delete(b"nope") is False
    with env.begin(db=db) as txn:
        assert txn.get(b"k") == b"v2"
    with env.begin(db=db, write=True) as txn:
        assert txn.delete(b"k") is True
    with env.begin(db=db) as txn:
        assert txn.get(b"k") is None
        assert txn.stat()["entries"] == 0


def test_reader_cursor_interleaved_with_writer(env):
    """The indexer's phase-2 pattern: iterate fn_db with a read cursor
    while committing write txns to idx_db per row
    (reference:build-index.py:68-88). Must not deadlock or skip rows."""
    fn_db = env.open_db(b"fn_db")
    idx_db = env.open_db(b"idx_db")
    with env.begin(db=fn_db, write=True) as txn:
        for i in range(50):
            txn.put(f"path{i:03d}".encode(), struct.pack("f", float(i)))
    count = 0
    with env.begin(db=fn_db) as txn:
        for i, (key, _val) in enumerate(txn.cursor()):
            with env.begin(db=idx_db, write=True) as idx_txn:
                idx_txn.put(str(i).encode(), key)
            count += 1
    assert count == 50
    with env.begin(db=idx_db) as txn:
        assert txn.stat()["entries"] == 50
        assert txn.get(b"0") == b"path000"
        assert txn.get(b"49") == b"path049"


def _store_bytes(path):
    """Total size of data-bearing store files (segment + WAL)."""
    return sum(os.path.getsize(os.path.join(path, f))
               for f in os.listdir(path)
               if f.endswith((".cxkv", ".cxs")))


def test_compaction_preserves_data(tmp_path):
    path = str(tmp_path / "vectors.lmdb")
    env = kv.open_env(path)
    db = env.open_db(b"fn_db")
    # create garbage: overwrite the same keys repeatedly
    for round_ in range(5):
        with env.begin(db=db, write=True) as txn:
            for i in range(20):
                txn.put(f"k{i}".encode(), f"v{round_}".encode())
    size_before = _store_bytes(path)
    env.compact()
    size_after = _store_bytes(path)
    assert size_after < size_before
    with env.begin(db=db) as txn:
        assert txn.stat()["entries"] == 20
        assert txn.get(b"k3") == b"v4"
    env.close()
    # compaction rotated to a sorted segment + fresh WAL generation
    assert any(f.startswith("seg-") for f in os.listdir(path))
    env = kv.open_env(path)
    with env.begin(db=env.open_db(b"fn_db")) as txn:
        assert txn.stat()["entries"] == 20
        assert txn.get(b"k19") == b"v4"
    env.close()


def test_torn_tail_recovery(tmp_path):
    """A crash mid-append must not lose previously committed records."""
    path = str(tmp_path / "vectors.lmdb")
    env = kv.open_env(path)
    db = env.open_db(b"fn_db")
    with env.begin(db=db, write=True) as txn:
        txn.put(b"good", b"record")
    env.close()
    # simulate a torn write: append half a record
    with open(os.path.join(path, "data.cxkv"), "ab") as f:
        f.write(b"\x01\xff\xff")
    env = kv.open_env(path)
    db = env.open_db(b"fn_db")
    with env.begin(db=db) as txn:
        assert txn.get(b"good") == b"record"
        assert txn.stat()["entries"] == 1
    # and the env still accepts writes afterwards
    with env.begin(db=db, write=True) as txn:
        txn.put(b"more", b"data")
    env.close()
    env = kv.open_env(path)
    db = env.open_db(b"fn_db")
    with env.begin(db=db) as txn:
        assert txn.get(b"more") == b"data"
    env.close()


def test_open_time_trim_waits_for_writer_flock(tmp_path):
    """Opening an env must not trim the log while another process holds
    the writer flock: a half-appended record under the lock is a commit
    in flight, not a torn tail, and truncating it would corrupt the
    transaction the writer is about to fdatasync."""
    import fcntl
    import time

    path = str(tmp_path / "vectors.lmdb")
    env = kv.open_env(path)
    db = env.open_db(b"fn_db")
    with env.begin(db=db, write=True) as txn:
        txn.put(b"good", b"record")
    env.close()
    log = os.path.join(path, "data.cxkv")
    committed_size = os.path.getsize(log)
    # a writer mid-commit: flock held, record partially appended
    with open(log, "ab") as f:
        f.write(b"\x01\xff\xff")
    lock_fd = os.open(os.path.join(path, "LOCK"), os.O_RDWR)
    fcntl.flock(lock_fd, fcntl.LOCK_EX)
    try:
        code = (
            "import sys; sys.path.insert(0, {root!r})\n"
            "from clipx.store import kv\n"
            "e = kv.open_env({path!r})\n"
            "print('OPENED', flush=True)\n"
            "e.close()\n"
        ).format(root=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), path=path)
        proc = subprocess.Popen([sys.executable, "-c", code],
                                stdout=subprocess.PIPE, text=True)
        time.sleep(1.0)
        assert proc.poll() is None, "open proceeded despite held flock"
        # the partial record must still be on disk while the lock is held
        assert os.path.getsize(log) == committed_size + 3
    finally:
        fcntl.flock(lock_fd, fcntl.LOCK_UN)
        os.close(lock_fd)
    out, _ = proc.communicate(timeout=30)
    assert proc.returncode == 0 and "OPENED" in out
    # after release the opener trimmed the (now genuinely torn) tail
    assert os.path.getsize(log) == committed_size
    env = kv.open_env(path)
    db = env.open_db(b"fn_db")
    with env.begin(db=db) as txn:
        assert txn.get(b"good") == b"record"
    env.close()


def test_concurrent_threads(env):
    """Parallel writers from many threads (the data pipeline's LMDB
    writeback workers) must serialize cleanly."""
    db = env.open_db(b"fn_db")
    errors = []

    def worker(tid):
        try:
            for i in range(25):
                with env.begin(db=db, write=True) as txn:
                    txn.put(f"t{tid}-{i}".encode(), b"x" * 64)
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    with env.begin(db=db) as txn:
        assert txn.stat()["entries"] == 100


def test_cross_process_persistence(tmp_path):
    path = str(tmp_path / "vectors.lmdb")
    code = (
        "import sys; sys.path.insert(0, {!r});\n"
        "from clipx.store import kv\n"
        "env = kv.open_env({!r})\n"
        "db = env.open_db(b'fn_db')\n"
        "txn = env.begin(db=db, write=True)\n"
        "txn.put(b'from-child', b'hello')\n"
        "txn.commit(); env.close()\n"
    ).format(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), path)
    subprocess.run([sys.executable, "-c", code], check=True)
    env = kv.open_env(path)
    db = env.open_db(b"fn_db")
    with env.begin(db=db) as txn:
        assert txn.get(b"from-child") == b"hello"
    env.close()


def test_kill9_mid_writes_recovers(tmp_path):
    """SIGKILL a writer mid-stream; reopening must recover every
    committed transaction and stay writable."""
    import signal
    import time

    path = str(tmp_path / "vectors.lmdb")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        f"import sys; sys.path.insert(0, {repo!r})\n"
        f"from clipx.store import kv\n"
        f"env = kv.open_env({path!r})\n"
        f"db = env.open_db(b'fn_db')\n"
        f"i = 0\n"
        f"while True:\n"
        f"    with env.begin(db=db, write=True) as txn:\n"
        f"        txn.put(f'k{{i:06d}}'.encode(), b'v' * 100)\n"
        f"    i += 1\n"
    )
    proc = subprocess.Popen([sys.executable, "-c", code])
    # wait until the child has demonstrably committed work
    log = os.path.join(path, "data.cxkv")
    deadline = time.time() + 30
    while time.time() < deadline:
        if os.path.exists(log) and os.path.getsize(log) > 4096:
            break
        time.sleep(0.05)
    proc.send_signal(signal.SIGKILL)
    proc.wait()

    env = kv.open_env(path)
    db = env.open_db(b"fn_db")
    with env.begin(db=db) as txn:
        n = txn.stat()["entries"]
        assert n > 0
        # contiguous prefix: every committed key present in order
        keys = [k for k, _ in txn.cursor()]
        assert keys == [f"k{i:06d}".encode() for i in range(n)]
    with env.begin(db=db, write=True) as txn:
        txn.put(b"after-crash", b"ok")
    with env.begin(db=db) as txn:
        assert txn.get(b"after-crash") == b"ok"
    env.close()


def _child_write(path, key, val):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (f"import sys; sys.path.insert(0, {repo!r})\n"
            f"from clipx.store import kv\n"
            f"env = kv.open_env({path!r})\n"
            f"db = env.open_db(b'fn_db')\n"
            f"with env.begin(db=db, write=True) as txn:\n"
            f"    txn.put({key!r}, {val!r})\n"
            f"env.close()\n")
    subprocess.run([sys.executable, "-c", code], check=True)


def test_refresh_sees_other_process_commits(tmp_path):
    path = str(tmp_path / "vectors.lmdb")
    env = kv.open_env(path)
    db = env.open_db(b"fn_db")
    with env.begin(db=db, write=True) as txn:
        txn.put(b"mine", b"1")
    _child_write(path, b"theirs", b"2")
    with env.begin(db=db) as txn:
        assert txn.get(b"theirs") is None  # snapshot-as-of-open
    env.refresh()
    with env.begin(db=db) as txn:
        assert txn.get(b"theirs") == b"2"
        assert txn.get(b"mine") == b"1"
    env.close()


def test_compact_preserves_other_process_commits(tmp_path):
    """A long-lived handle must never compact away records another
    process appended after it opened (found by review: compaction wrote
    the log from stale in-memory state)."""
    path = str(tmp_path / "vectors.lmdb")
    env = kv.open_env(path)
    db = env.open_db(b"fn_db")
    for i in range(30):  # make some garbage so compaction has work
        with env.begin(db=db, write=True) as txn:
            txn.put(b"gkey", f"v{i}".encode())
    _child_write(path, b"from-other", b"precious")
    env.compact()  # must catch up before rewriting
    env.close()

    env = kv.open_env(path)
    db = env.open_db(b"fn_db")
    with env.begin(db=db) as txn:
        assert txn.get(b"from-other") == b"precious"
        assert txn.get(b"gkey") == b"v29"
    env.close()


def test_own_commit_catches_up_first(tmp_path):
    """Committing from a stale handle must fold in other processes'
    records rather than diverge."""
    path = str(tmp_path / "vectors.lmdb")
    env = kv.open_env(path)
    db = env.open_db(b"fn_db")
    _child_write(path, b"other", b"x")
    with env.begin(db=db, write=True) as txn:
        txn.put(b"mine", b"y")
    with env.begin(db=db) as txn:  # commit path caught us up
        assert txn.get(b"other") == b"x"
        assert txn.get(b"mine") == b"y"
    env.close()


def test_commit_after_foreign_torn_tail(tmp_path):
    """Another process dies mid-append while we're live; our next commit
    must trim the torn tail instead of appending after it (which would
    orphan our records at the next open)."""
    path = str(tmp_path / "vectors.lmdb")
    env = kv.open_env(path)
    db = env.open_db(b"fn_db")
    with env.begin(db=db, write=True) as txn:
        txn.put(b"a", b"1")
    # simulate a foreign torn append
    with open(os.path.join(path, "data.cxkv"), "ab") as f:
        f.write(b"\x01\x10\x00")
    with env.begin(db=db, write=True) as txn:
        txn.put(b"b", b"2")
    env.close()
    env = kv.open_env(path)
    db = env.open_db(b"fn_db")
    with env.begin(db=db) as txn:
        assert txn.get(b"a") == b"1"
        assert txn.get(b"b") == b"2"
    env.close()


def test_close_waits_for_live_transactions(tmp_path):
    """env.close() must not unmap segments under a reader in another
    thread (observed as a segfault when serving raced a close): it
    blocks until in-flight transactions finish, then closes; new
    transactions on the closed env raise instead of crashing."""
    import time

    path = str(tmp_path / "vectors.lmdb")
    env = kv.open_env(path)
    db = env.open_db(b"fn_db")
    with env.begin(db=db, write=True) as txn:
        txn.put(b"k", b"v")

    in_txn, finish = threading.Event(), threading.Event()
    got = {}

    def reader():
        txn = env.begin(db=db)
        got["val"] = txn.get(b"k")
        in_txn.set()
        finish.wait(30)
        time.sleep(0.3)       # close() must outwait this window
        got["val2"] = txn.get(b"k")
        txn.abort()

    t = threading.Thread(target=reader)
    t.start()
    assert in_txn.wait(10)
    t0 = time.monotonic()
    finish.set()
    env.close()               # blocks until the reader's abort
    assert time.monotonic() - t0 >= 0.25
    t.join(10)
    assert got["val"] == b"v" and got["val2"] == b"v"
    with pytest.raises(kv.Error, match="closed"):
        env.begin(db=db)
