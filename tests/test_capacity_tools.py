"""Smoke tests for the capacity-scale measurement tools (round 4):
make_synth_index builds real artifacts (sidecar + id map) and
load_timing reports the cold/warm phases over them."""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

import load_timing  # noqa: E402
import make_synth_index  # noqa: E402


def test_make_synth_index_and_load_timing(tmp_path, capsys):
    out = str(tmp_path / "cap")
    assert make_synth_index.main([out, "--rows", "3000", "--dim", "64",
                                  "--store", "ids"]) == 0
    index = os.path.join(out, "images.index")
    assert os.path.exists(index)
    from clipx.search.engine import read_index_vectors
    from clipx.store.kv import open_env

    v = read_index_vectors(index)
    assert v.shape == (3000, 64)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-4)
    env = open_env(os.path.join(out, "vectors.lmdb"))
    idx_db = env.open_db(b"idx_db")
    with env.begin(db=idx_db) as txn:
        assert txn.get(b"0") is not None
        assert txn.get(b"2999") is not None
    env.close()
    # cold load writes the codes sidecar and reports phases
    jpath = str(tmp_path / "lt.json")
    assert load_timing.main(["--index", index, "--corpus-dtype", "int8",
                             "--cold", "--json", jpath]) == 0
    cold = json.load(open(jpath))
    assert cold["mode"] == "cold" and cold["ntotal"] == 3000
    assert os.path.exists(index + ".codes")
    # warm load uses it
    assert load_timing.main(["--index", index, "--corpus-dtype", "int8",
                             "--query", "--json", jpath]) == 0
    warm = json.load(open(jpath))
    assert warm["mode"] == "warm"
    assert warm["query_p50_ms"] > 0
