"""CLI contract tests (SURVEY.md section 4 item 3): drive the
build-index / query-index equivalents over a tiny generated photo folder
and assert the storage layout, resume semantics, and REPL behaviors —
including the rank-0 display skip and pagination.

Uses the tiny-test model preset (random weights, deterministic seed) so
the whole flow is CPU-fast; the contract under test is storage + CLI
semantics, not embedding quality.
"""

import os

import numpy as np
import pytest
from PIL import Image

from clipx.cli import build_index as bi
from clipx.cli import query_index as qi
from clipx.cli.common import FN_DB, IDX_DB, SKIP_DB
from clipx.store.kv import open_env

MODEL_FLAGS = ["--model", "tiny-test"]
EMBED_DIM = 32  # tiny-test embed dim


@pytest.fixture()
def photo_dir(tmp_path):
    d = tmp_path / "photos"
    d.mkdir()
    rng = np.random.RandomState(0)
    names = ["cat.jpg", "dog.jpeg", "bird.PNG", "zebra.png"]
    for name in names:
        arr = rng.randint(0, 255, (48, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / name)
    # a corrupt jpeg and a non-image file
    (d / "broken.jpg").write_bytes(b"not really a jpeg")
    (d / "notes.txt").write_text("not an image")
    return str(d) + os.sep  # trailing slash, as the reference requires


@pytest.fixture()
def workdir(tmp_path, monkeypatch):
    w = tmp_path / "work"
    w.mkdir()
    monkeypatch.chdir(w)
    return w


def _build(photo_dir, extra=()):
    rc = bi.main(MODEL_FLAGS + list(extra) + [photo_dir])
    assert rc == 0


def test_build_creates_contract_layout(photo_dir, workdir, capsys):
    _build(photo_dir)
    out = capsys.readouterr().out
    assert f"CLIPing {photo_dir}..." in out
    assert out.count(".") >= 4  # one dot per good image
    assert "#" in out           # the corrupt jpeg
    assert "Preparing index for 4 entries..." in out
    assert "Saving index..." in out and "Done!" in out
    assert os.path.isdir("vectors.lmdb")
    assert os.path.exists("images.index")

    env = open_env("vectors.lmdb")
    fn_db, skip_db, idx_db = (env.open_db(FN_DB), env.open_db(SKIP_DB),
                              env.open_db(IDX_DB))
    with env.begin(db=fn_db) as txn:
        assert txn.stat()["entries"] == 4
        # value format: raw float32[embed_dim] bytes keyed by concat path
        key = (photo_dir + "cat.jpg").encode()
        vec = np.frombuffer(txn.get(key), dtype=np.float32)
        assert vec.shape == (EMBED_DIM,)
        np.testing.assert_allclose(np.linalg.norm(vec), 1.0, atol=1e-3)
    with env.begin(db=skip_db) as txn:
        assert txn.get((photo_dir + "broken.jpg").encode()) == b"1"
        assert txn.stat()["entries"] == 1
    with env.begin(db=idx_db) as txn:
        assert txn.stat()["entries"] == 4
        # ids are the byte-sorted rank of the path (reference quirk)
        with env.begin(db=fn_db) as fn_txn:
            sorted_paths = [k for k, _ in fn_txn.cursor()]
        for i, path in enumerate(sorted_paths):
            assert txn.get(str(i).encode()) == path
    env.close()


def test_rerun_is_incremental(photo_dir, workdir, capsys):
    _build(photo_dir)
    capsys.readouterr()
    _build(photo_dir)  # second run: nothing new to encode
    out = capsys.readouterr().out
    # no '.' progress dots in phase 1 (all deduped), no '#' (skip_db hit)
    phase1 = out.split("Preparing index")[0]
    assert "." not in phase1.replace(f"CLIPing {photo_dir}...", "")
    assert "#" not in phase1
    assert "Preparing index for 4 entries..." in out


def test_non_image_files_ignored(photo_dir, workdir):
    _build(photo_dir)
    env = open_env("vectors.lmdb")
    fn_db = env.open_db(FN_DB)
    with env.begin(db=fn_db) as txn:
        assert txn.get((photo_dir + "notes.txt").encode()) is None
    env.close()


class ScriptedInput:
    def __init__(self, lines):
        self.lines = list(lines)

    def __call__(self, prompt):
        assert prompt == "[h,q,i,r,a,c,p] >>> "
        if not self.lines:
            raise EOFError
        return self.lines.pop(0)


def _repl(workdir, lines, monkeypatch):
    monkeypatch.setenv("CLIPX_NO_VIEWER", "1")
    args = qi.build_parser().parse_args(MODEL_FLAGS)
    repl = qi.QueryREPL(args, input_fn=ScriptedInput(lines))
    rc = repl.run()
    assert rc == 0
    return repl


def test_repl_text_query_and_rank0_skip(photo_dir, workdir, capsys,
                                        monkeypatch):
    _build(photo_dir)
    capsys.readouterr()
    _repl(workdir, ["a cat photo", "q"], monkeypatch)
    out = capsys.readouterr().out
    assert "Search time:" in out
    rows = [l for l in out.splitlines()
            if l and l.split()[0].replace("-", "").replace(".", "").isdigit()]
    # 4 indexed images, rank 0 skipped -> 3 result rows
    assert len(rows) == 3
    shown_ids = [int(r.split()[1]) for r in rows]
    assert 0 <= min(shown_ids) and max(shown_ids) <= 3
    # rows are "score id path"
    for r in rows:
        parts = r.split()
        float(parts[0])
        assert parts[2].endswith((".jpg", ".jpeg", ".PNG", ".png"))


def test_repl_image_similarity_uses_stored_vector(photo_dir, workdir,
                                                  capsys, monkeypatch):
    _build(photo_dir)
    capsys.readouterr()
    repl = _repl(workdir, ["i 0", "q"], monkeypatch)
    out = capsys.readouterr().out
    assert "Similar to " in out
    assert "Search time:" in out
    # encoder must never have been constructed: i ID reuses stored vectors
    assert repl.encoder is None


def test_repl_image_similarity_not_found(photo_dir, workdir, capsys,
                                         monkeypatch):
    _build(photo_dir)
    capsys.readouterr()
    _repl(workdir, ["i 999", "i junk", "q"], monkeypatch)
    out = capsys.readouterr().out
    assert out.count("Not found.") == 2


def test_repl_pagination(photo_dir, workdir, capsys, monkeypatch):
    _build(photo_dir)
    capsys.readouterr()
    # c 1 => one result per page; text query shows rank 1; empty line pages on
    _repl(workdir, ["c 1", "a cat", "", "q"], monkeypatch)
    out = capsys.readouterr().out
    assert "Showing 1 results." in out
    assert out.count("Search time:") == 2
    rows = [l for l in out.splitlines() if len(l.split()) == 3
            and "." in l.split()[0] and l.split()[1].isdigit()]
    ids = [int(r.split()[1]) for r in rows]
    assert len(ids) == 2
    assert ids[0] != ids[1]  # page 2 shows the next rank


def test_repl_pagination_inert_without_text_query(photo_dir, workdir,
                                                  capsys, monkeypatch):
    """Empty input before any text query must not search — the
    ``texts is None`` guard (reference:query-index.py:101-103), even
    after an ``i ID`` query (texts is only set by text queries)."""
    _build(photo_dir)
    capsys.readouterr()
    _repl(workdir, ["", "q"], monkeypatch)
    out = capsys.readouterr().out
    assert "Search time:" not in out
    _repl(workdir, ["i 0", "", "q"], monkeypatch)
    out = capsys.readouterr().out
    assert out.count("Search time:") == 1  # only the i-query searched


def test_repl_commands(photo_dir, workdir, capsys, monkeypatch):
    _build(photo_dir)
    capsys.readouterr()
    _repl(workdir, ["h", "p 10", "p 500", "p junk", "a", "a",
                    "r 1280x720", "r bogus", "c 0", "c junk", "q"],
          monkeypatch)
    out = capsys.readouterr().out
    assert "Commands:" in out                       # help text
    assert "Set to probe 10 subsets." in out
    assert out.count("Invalid probe value.") == 2
    assert "Aligning window position." in out
    assert "Not aligning window position." in out
    assert "Set maximum resolution to 1280x720." in out
    assert "Unset maximum resolution." in out
    assert "Reset number of results to 50." in out
    assert "Invalid result count." in out


def test_query_main_without_index(workdir, capsys):
    rc = qi.main(MODEL_FLAGS)
    assert rc == 1
    assert "run build-index.py first" in capsys.readouterr().out


def test_keyboard_interrupt_still_builds_index(photo_dir, workdir,
                                               monkeypatch, capsys):
    """Ctrl-C during encoding must still fall through to the index build
    (reference:build-index.py:53-54,63-64)."""
    from clipx.cli import build_index as bi_mod

    def boom(*a, **kw):
        raise KeyboardInterrupt

    monkeypatch.setattr(bi_mod, "_encode_phase", boom)
    rc = bi_mod.main(MODEL_FLAGS + [photo_dir])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Interrupted!" in out
    assert "Done!" in out


def test_repl_sharded_search_matches_single(photo_dir, workdir, capsys,
                                            monkeypatch):
    """--sharded on (8 virtual CPU devices) must print the same result
    rows as the single-device engine."""
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    _build(photo_dir)
    capsys.readouterr()

    monkeypatch.setenv("CLIPX_NO_VIEWER", "1")

    def run(extra):
        args = qi.build_parser().parse_args(MODEL_FLAGS + extra)
        qi.QueryREPL(args, input_fn=ScriptedInput(["a cat", "q"])).run()
        out = capsys.readouterr().out
        return [l for l in out.splitlines() if len(l.split()) == 3
                and "." in l.split()[0] and l.split()[1].isdigit()]

    rows_single = run(["--sharded", "off"])
    rows_sharded = run(["--sharded", "on"])
    assert rows_single and rows_single == rows_sharded


def test_device_preprocess_path(photo_dir, workdir, capsys):
    """--preprocess device: embeddings land close to the host path."""
    _build(photo_dir)
    env = open_env("vectors.lmdb")
    fn_db = env.open_db(FN_DB)
    with env.begin(db=fn_db) as txn:
        host_vecs = {k: np.frombuffer(v, dtype=np.float32)
                     for k, v in txn.cursor()}
    env.close()
    os.remove("images.index")
    import shutil
    shutil.rmtree("vectors.lmdb")

    _build(photo_dir, extra=["--preprocess", "device"])
    env = open_env("vectors.lmdb")
    fn_db = env.open_db(FN_DB)
    with env.begin(db=fn_db) as txn:
        dev_vecs = {k: np.frombuffer(v, dtype=np.float32)
                    for k, v in txn.cursor()}
    env.close()
    assert host_vecs.keys() == dev_vecs.keys()
    for k in host_vecs:
        cos = float(host_vecs[k] @ dev_vecs[k])
        assert cos > 0.9, (k, cos)  # same image, different resample path


def test_multiple_dirs_one_invocation(photo_dir, tmp_path, workdir,
                                      capsys):
    """`build-index.py DIR1/ DIR2/` indexes the union with one id space:
    one CLIPing banner per folder, ids = byte-sorted rank over ALL
    stored paths (reference:build-index.py:28-34,87-88 — the reference
    loops argv dirs the same way)."""
    d2 = tmp_path / "morephotos"
    d2.mkdir()
    rng = np.random.RandomState(77)
    for name in ["x1.jpg", "x2.png"]:
        Image.fromarray(rng.randint(0, 255, (48, 64, 3), dtype=np.uint8)
                        ).save(d2 / name)
    dir2 = str(d2) + os.sep
    rc = bi.main(MODEL_FLAGS + [photo_dir, dir2])
    assert rc == 0
    out = capsys.readouterr().out
    assert f"CLIPing {photo_dir}..." in out
    assert f"CLIPing {dir2}..." in out
    assert "Preparing index for 6 entries..." in out

    env = open_env("vectors.lmdb", max_dbs=4)
    idx_db = env.open_db(IDX_DB)
    with env.begin(db=idx_db) as txn:
        paths = [txn.get(f"{i}".encode()).decode() for i in range(6)]
    env.close()
    # ids are the byte-sorted rank across BOTH folders' paths
    assert paths == sorted(paths)
    assert {os.path.dirname(p) + os.sep for p in paths} == \
        {photo_dir, dir2}
