"""Sidecar-less direct build (tools/build_codes_direct.py).

The 100-200M capacity tier cannot materialize its 200-400 GB f32
sidecar (round-4 verdict, missing item 3); the direct build streams a
chunk-keyed deterministic synthetic corpus straight into the codes
file + .ivf cache. Pinned here at small scale:

- the produced artifacts boot through the PRODUCTION load chain
  (cli.common.load_index, codes-only path) as residual IVFPQ;
- self-match: corpus rows find themselves at rank 0;
- recall@50 vs an exact index over the regenerated rows is in the
  residual-IVFPQ band despite the approximate hierarchical assignment;
- the generator is deterministic (chunk regeneration is bit-identical,
  which is what stands in for reading rows from disk).
"""

import argparse
import os

import numpy as np
import pytest

from clipx.cli import common

ROWS = 120_000
DIM = 64


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    from tools import build_codes_direct as bcd

    outdir = str(tmp_path_factory.mktemp("direct"))
    rc = bcd.main([outdir, "--rows", str(ROWS), "--dim", str(DIM),
                   "--dsub", "2", "--store", "none",
                   "--json", os.path.join(outdir, "build.json")])
    assert rc == 0
    return outdir


def test_generator_is_deterministic(built):
    from tools.build_codes_direct import SynthCorpus

    c1 = SynthCorpus(ROWS, DIM, "clustered", 0)
    c2 = SynthCorpus(ROWS, DIM, "clustered", 0)
    np.testing.assert_array_equal(c1.chunk(0), c2.chunk(0))
    idx = np.array([5, 131073 % ROWS, 7, 5])
    np.testing.assert_array_equal(c1.rows_at(idx), c2.rows_at(idx))
    # rows_at agrees with chunk()
    np.testing.assert_array_equal(c1.rows_at(np.arange(10)),
                                  c1.chunk(0)[:10])


def test_artifacts_and_codes_only_boot(built):
    from clipx.search import codes_io

    index = os.path.join(built, "images.index")
    assert not os.path.exists(index)          # never materialized
    assert os.path.exists(index + ".codes")
    assert os.path.exists(index + ".ivf")
    payload = codes_io.load_codes(index, "pq", rotated=True, orphan=True)
    assert payload is not None
    assert payload["residual"] is True
    assert payload["layout_digest"] is not None
    args = argparse.Namespace(index=index, corpus_dtype="pq",
                              search_mode="ivf", sharded="off")
    idx = common.load_index(args)
    from clipx.search.ivf import IVFIndex

    assert isinstance(idx, IVFIndex)
    assert idx._residual and idx.ntotal == ROWS


def test_self_match_and_recall(built):
    from tools.build_codes_direct import SynthCorpus

    index = os.path.join(built, "images.index")
    args = argparse.Namespace(index=index, corpus_dtype="pq",
                              search_mode="ivf", sharded="off")
    idx = common.load_index(args)
    corpus = SynthCorpus(ROWS, DIM, "clustered", 0)
    rng = np.random.default_rng(3)
    qids = rng.choice(ROWS, 64, replace=False)
    q = corpus.rows_at(qids)
    _, ids = idx.search(q, 10, nprobe=100)
    self1 = float(np.mean(ids[:, 0] == qids))
    # 0.84 is what the exact-assignment production build measures on
    # this corpus (dsub=2 resolution, not an assignment artifact — the
    # direct build measured 0.86 on the same queries)
    assert self1 >= 0.8, self1
    self10 = float(np.mean((ids == qids[:, None]).any(axis=1)))
    assert self10 >= 0.95, self10
    # recall@50 vs exact over the SAME regenerated rows; full corpus on
    # host (120k x 64 — fine at test scale)
    from clipx.search.engine import VectorIndex

    full = np.concatenate([corpus.chunk(c)
                           for c in range(corpus.n_chunks())])
    exact = VectorIndex.from_vectors(full)
    _, Ie = exact.search(q, 50)
    _, Ip = idx.search(q, 50, nprobe=100)
    recall = np.mean([len(set(Ie[i]) & set(Ip[i])) / 50
                      for i in range(len(q))])
    # round-4 residual dsub=2 on clustered corpora measured ~0.87 with
    # exact assignment; the hierarchical assignment may cost a little
    assert recall >= 0.7, recall
