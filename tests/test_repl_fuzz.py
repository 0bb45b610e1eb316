"""REPL robustness fuzz: random command soup must never crash the
session (the reference dies on malformed ints — ours must not), and
session state must stay coherent."""

import os
import random

import numpy as np
import pytest
from PIL import Image

from clipx.cli import build_index as bi
from clipx.cli import query_index as qi


@pytest.fixture(scope="module")
def indexed(tmp_path_factory):
    photos = tmp_path_factory.mktemp("photos")
    rng = np.random.RandomState(0)
    for i in range(5):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(photos / f"p{i}.jpg")
    work = tmp_path_factory.mktemp("work")
    cwd = os.getcwd()
    os.chdir(work)
    try:
        assert bi.main(["--model", "tiny-test", str(photos) + os.sep]) == 0
        yield str(work)
    finally:
        os.chdir(cwd)


def _gen_inputs(rng, n):
    atoms = [
        "q_not", "h", "a", "", " ", "p", "c", "i", "r",
        "p 0", "p 1", "p 100", "p 101", "p -3", "p x",
        "c -1", "c 1", "c 1000", "c 9999999999", "c nan",
        "i 0", "i 4", "i -1", "i 99999", "i 1e3", "i " + "9" * 50,
        "r 1x1", "r 0x0", "r -5x10", "r axb", "r 1920x1080", "r  ",
        "some text query", "??? !!!", "\t\t", "p  5", "i  2",
        "\x00weird", "🎈🎈🎈", "a" * 500,
    ]
    return [rng.choice(atoms) for _ in range(n)] + ["q"]


def test_random_command_soup_never_crashes(indexed, monkeypatch, capsys):
    # one REPL (and thus one jit-compiled encoder) fed a long soup: a
    # fresh REPL per trial re-compiles everything, which crawls on a
    # single-core host
    monkeypatch.setenv("CLIPX_NO_VIEWER", "1")
    monkeypatch.setenv("CLIPX_NO_WARMUP", "1")
    rng = random.Random(1234)
    lines = _gen_inputs(rng, 150)
    args = qi.build_parser().parse_args(["--model", "tiny-test"])
    feed = list(lines)

    def input_fn(prompt):
        if not feed:
            raise EOFError
        return feed.pop(0)

    repl = qi.QueryREPL(args, input_fn=input_fn)
    rc = repl.run()
    assert rc == 0, f"crashed with inputs {lines!r}"
    capsys.readouterr()  # drain


def test_state_coherent_after_abuse(indexed, monkeypatch, capsys):
    """After arbitrary junk, a normal query still works."""
    monkeypatch.setenv("CLIPX_NO_WARMUP", "1")
    monkeypatch.setenv("CLIPX_NO_VIEWER", "1")
    args = qi.build_parser().parse_args(["--model", "tiny-test"])
    lines = ["p junk", "c -5", "i zzz", "r 0x-1", "", "🎈",
             "c 2", "a real query", "q"]
    feed = list(lines)
    repl = qi.QueryREPL(args, input_fn=lambda p: feed.pop(0) if feed
                        else (_ for _ in ()).throw(EOFError))
    assert repl.run() == 0
    out = capsys.readouterr().out
    # the 🎈 line is a text query; plus the final one
    assert out.count("Search time:") == 2
    rows = [l for l in out.splitlines() if len(l.split()) == 3
            and "." in l.split()[0] and l.split()[1].isdigit()]
    assert rows  # the real query produced results


def test_random_soup_under_ivf_mode(indexed, monkeypatch, capsys):
    """The same command soup with --search-mode ivf: the functional
    `p` knob (and its sharded index on the 8-device suite) must be as
    crash-proof as the exact no-op path."""
    monkeypatch.setenv("CLIPX_NO_VIEWER", "1")
    monkeypatch.setenv("CLIPX_NO_WARMUP", "1")
    rng = random.Random(4321)
    lines = _gen_inputs(rng, 60)
    args = qi.build_parser().parse_args(
        ["--model", "tiny-test", "--search-mode", "ivf"])
    feed = list(lines)
    repl = qi.QueryREPL(args, input_fn=lambda p: feed.pop(0) if feed
                        else (_ for _ in ()).throw(EOFError))
    assert repl.run() == 0, f"crashed with inputs {lines!r}"
    capsys.readouterr()
