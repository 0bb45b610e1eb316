"""tools/find_dupes.py — near-duplicate grouping over a built index."""

import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

import find_dupes  # noqa: E402


def _unit(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_dupe_groups_finds_clusters_and_respects_threshold():
    rng = np.random.default_rng(0)
    base_a = _unit(rng.normal(size=32).astype(np.float32))
    base_b = _unit(rng.normal(size=32).astype(np.float32))
    # two tight clusters + unrelated singletons
    clus_a = _unit(base_a + 1e-3 * rng.normal(size=(5, 32)
                                              ).astype(np.float32))
    clus_b = _unit(base_b + 1e-3 * rng.normal(size=(3, 32)
                                              ).astype(np.float32))
    singles = _unit(rng.normal(size=(20, 32)).astype(np.float32))
    corpus = np.concatenate([clus_a, clus_b, singles])

    groups = find_dupes.dupe_groups(corpus, threshold=0.99)
    sizes = sorted(len(m) for m, _ in groups)
    assert sizes == [3, 5]
    members = {frozenset(m) for m, _ in groups}
    assert frozenset(range(5)) in members
    assert frozenset(range(5, 8)) in members
    for _, mean in groups:
        assert mean >= 0.99
    # an impossible threshold finds nothing
    assert find_dupes.dupe_groups(corpus, threshold=1.0) == []
    assert find_dupes.dupe_groups(corpus[:0], threshold=0.9) == []


def test_dupe_groups_transitive_beyond_k():
    """A clique larger than --neighbors still groups fully: membership
    chains across rows even when each row sees only k neighbours."""
    rng = np.random.default_rng(1)
    base = _unit(rng.normal(size=32).astype(np.float32))
    clique = _unit(base + 1e-3 * rng.normal(size=(12, 32)
                                            ).astype(np.float32))
    corpus = np.concatenate(
        [clique, _unit(rng.normal(size=(10, 32)).astype(np.float32))])
    groups = find_dupes.dupe_groups(corpus, threshold=0.99, k=4)
    assert len(groups) == 1 and len(groups[0][0]) == 12


def test_cli_over_built_index(tmp_path, monkeypatch, capsys):
    from clipx.cli import build_index as bi

    photos = tmp_path / "photos"
    photos.mkdir()
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
    Image.fromarray(img).save(photos / "a.png")
    Image.fromarray(img).save(photos / "b.png")  # exact duplicate
    Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                    ).save(photos / "c.png")
    work = tmp_path / "work"
    work.mkdir()
    monkeypatch.chdir(work)
    assert bi.main(["--model", "tiny-test", str(photos) + os.sep]) == 0
    rc = find_dupes.main(["--threshold", "0.999"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "group of 2" in out
    assert "a.png" in out and "b.png" in out and "c.png" not in out
    # bad threshold errors
    assert find_dupes.main(["--threshold", "1.5"]) == 1
