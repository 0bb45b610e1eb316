"""HTTP serving layer tests: real server on a loopback port, driven
with http.client over a tiny built index."""

import json
import os
import threading
import time
from http.client import HTTPConnection

import numpy as np
import pytest
from PIL import Image

from clipx import serve
from clipx.cli import build_index as bi


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    photos = tmp_path_factory.mktemp("photos")
    rng = np.random.RandomState(0)
    for name in ["a.jpg", "b.jpg", "c.png", "d.jpeg"]:
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), dtype=np.uint8)
                        ).save(photos / name)
    work = tmp_path_factory.mktemp("work")
    cwd = os.getcwd()
    os.chdir(work)
    try:
        assert bi.main(["--model", "tiny-test", str(photos) + os.sep]) == 0
        args = serve.build_parser().parse_args(
            ["--model", "tiny-test", "--port", "0"])
        server = serve.make_server(args)
        port = server.server_address[1]
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        _wait_warm(port)
        yield port
        server.shutdown()
    finally:
        os.chdir(cwd)


def _get(port, path):
    conn = HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("GET", path)
    resp = conn.getresponse()
    return resp.status, json.loads(resp.read())


def _get_raw(port, path):
    """Like _get but also returns the response headers (Retry-After)."""
    conn = HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("GET", path)
    resp = conn.getresponse()
    return resp.status, json.loads(resp.read()), dict(resp.getheaders())


def _wait_warm(port, timeout=180):
    """Block until the cold-shape guard disarms (/healthz warm=true).
    Servers started with --warmup 503 guarded endpoints while shape
    families compile; tests that exercise post-warm behavior wait here
    first (on the CPU test platform this is seconds)."""
    deadline = time.time() + timeout
    while time.time() < deadline:
        status, h = _get(port, "/healthz")
        if status == 200 and h.get("warm", True):
            return
        time.sleep(0.1)
    raise AssertionError("server never reported warm")


def _post(port, path, payload):
    conn = HTTPConnection("127.0.0.1", port, timeout=60)
    body = json.dumps(payload)
    conn.request("POST", path, body=body,
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    return resp.status, json.loads(resp.read())


def _retry_cold(fn, timeout=120):
    """Retry a request while the armed cold-shape guard answers 503
    (a post-warmup novel shape compiles off-thread; clients honor
    Retry-After — on the CPU test platform the compile is seconds).
    Returns the first non-503 response tuple."""
    deadline = time.time() + timeout
    while True:
        out = fn()
        if out[0] != 503 or time.time() > deadline:
            return out
        time.sleep(0.2)


def test_healthz(served):
    status, data = _get(served, "/healthz")
    assert status == 200
    assert data["status"] == "ok" and data["ntotal"] == 4
    assert data["dim"] == 32


def test_text_search(served):
    status, data = _get(served, "/search?q=a+red+photo&k=3")
    assert status == 200
    results = data["results"]
    assert len(results) == 3
    assert data["search_time_s"] > 0
    # true ranking: rank 0 present (no REPL display skip in the API)
    assert results[0]["rank"] == 0
    scores = [r["score"] for r in results]
    assert scores == sorted(scores, reverse=True)
    assert all(r["path"].endswith((".jpg", ".jpeg", ".png")) for r in results)


def test_similar(served):
    status, data = _get(served, "/similar?id=1&k=4")
    assert status == 200
    # self-match at rank 0 with score ~1
    assert data["results"][0]["id"] == 1
    assert abs(data["results"][0]["score"] - 1.0) < 1e-3


def test_similar_not_found(served):
    status, data = _get(served, "/similar?id=99")
    assert status == 404
    assert "not found" in data["error"]


def test_search_missing_query(served):
    status, data = _get(served, "/search")
    assert status == 400


def test_search_bad_k(served):
    status, _ = _get(served, "/search?q=x&k=0")
    assert status == 400
    status, _ = _get(served, "/search?q=x&k=junk")
    assert status == 400


def test_unknown_endpoint(served):
    status, _ = _get(served, "/nope")
    assert status == 404


def test_encode_text(served):
    status, data = _post(served, "/encode_text", {"texts": ["hello", "cat"]})
    assert status == 200
    emb = np.asarray(data["embeddings"], dtype=np.float32)
    assert emb.shape == (2, 32)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-4)


def test_search_vector_roundtrip(served):
    _, enc = _post(served, "/encode_text", {"texts": ["a photo"]})
    status, direct = _post(served, "/search_vector",
                           {"vector": enc["embeddings"][0], "k": 2})
    assert status == 200
    _, via_text = _get(served, "/search?q=a+photo&k=2")
    assert [r["id"] for r in direct["results"]] == \
        [r["id"] for r in via_text["results"]]


def test_search_vector_wrong_dim(served):
    status, data = _post(served, "/search_vector", {"vector": [1.0, 2.0]})
    assert status == 400
    assert "dim" in data["error"]


def test_malformed_json(served):
    conn = HTTPConnection("127.0.0.1", served, timeout=60)
    conn.request("POST", "/encode_text", body="{not json",
                 headers={"Content-Length": "9"})
    resp = conn.getresponse()
    assert resp.status == 400


def test_pagination_offset(served):
    _, page1 = _get(served, "/search?q=photo&k=2")
    _, page2 = _get(served, "/search?q=photo&k=2&offset=2")
    ids1 = [r["id"] for r in page1["results"]]
    ids2 = [r["id"] for r in page2["results"]]
    assert not set(ids1) & set(ids2)
    assert page2["results"][0]["rank"] == 2


def test_nprobe_ignored_without_ivf(served):
    """nprobe on a flat index is accepted and ignored — the REPL's `p N`
    no-op contract in exact mode (reference:query-index.py:76-79)."""
    status, r = _get(served, "/similar?id=1&k=2&nprobe=7")
    assert status == 200
    status, r2 = _get(served, "/similar?id=1&k=2")
    assert status == 200
    assert r["results"] == r2["results"]
    status, _ = _get(served, "/similar?id=1&k=2&nprobe=999")
    assert status == 400  # still validated even when it won't bind


def test_search_vector_bad_k(served):
    """/search_vector validates k like /search (1..1000)."""
    vec = [0.0] * 32
    for bad_k in (0, -3, 1001, "junk"):
        status, data = _post(served, "/search_vector",
                             {"vector": vec, "k": bad_k})
        assert status == 400, bad_k
        assert "k must be" in data["error"] or "bad request" in data["error"]


def test_post_body_cap(served):
    """A hostile Content-Length must be rejected before the read, not
    buffered into RAM."""
    conn = HTTPConnection("127.0.0.1", served, timeout=60)
    conn.request("POST", "/encode_text", body=b"x",
                 headers={"Content-Length": str(3 * 1024 ** 3)})
    resp = conn.getresponse()
    assert resp.status == 413
    body = json.loads(resp.read())
    assert "exceeds" in body["error"]


def test_concurrent_search_and_encode(served):
    """ThreadingHTTPServer under concurrency: two searchers race an
    encoder thread; every response must be well-formed and correct."""
    errors = []

    def searcher(i):
        try:
            for _ in range(5):
                status, data = _get(served, "/similar?id=%d&k=3" % (i % 4))
                assert status == 200
                assert data["results"][0]["id"] == i % 4
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    def encoder():
        try:
            for _ in range(3):
                status, data = _post(served, "/encode_text",
                                     {"texts": ["busy", "bee"]})
                assert status == 200
                assert len(data["embeddings"]) == 2
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=searcher, args=(i,))
               for i in range(2)] + [threading.Thread(target=encoder)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors


def test_metrics_counters_and_latency(served):
    _get(served, "/search?q=metrics+probe&k=1")
    _get(served, "/similar?id=0&k=1")
    _get(served, "/nope")  # counted as an error
    status, m = _get(served, "/metrics")
    assert status == 200
    assert m["ntotal"] == 4 and m["uptime_s"] >= 0
    assert m["counters"]["search"] >= 1
    assert m["counters"]["similar"] >= 1
    assert m["counters"]["errors"] >= 1
    assert m["search_latency_avg_s"] > 0
    assert m["encoder_loaded"] is True


def test_reload_swaps_in_rebuilt_index(tmp_path, monkeypatch):
    """The serving answer to the reference's rebuild-while-querying
    staleness: rebuild on disk, POST /reload, no restart."""
    import numpy as np
    from clipx.cli import build_index as bi

    photos = tmp_path / "photos"
    photos.mkdir()
    rng = np.random.RandomState(3)
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(photos / f"p{i}.jpg")
    work = tmp_path / "work"
    work.mkdir()
    monkeypatch.chdir(work)
    assert bi.main(["--model", "tiny-test", str(photos) + os.sep]) == 0

    args = serve.build_parser().parse_args(["--model", "tiny-test",
                                            "--port", "0"])
    server = serve.make_server(args)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        _wait_warm(port)
        _, h = _get(port, "/healthz")
        assert h["ntotal"] == 3

        # grow the corpus and rebuild while the server keeps running
        for i in range(3, 6):
            Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                            ).save(photos / f"p{i}.jpg")
        assert bi.main(["--model", "tiny-test", str(photos) + os.sep]) == 0
        _, h = _get(port, "/healthz")
        assert h["ntotal"] == 3  # still the old snapshot

        status, r = _post(port, "/reload", {})
        assert status == 200
        assert r["previous_ntotal"] == 3 and r["ntotal"] == 6
        # p3..p5 sort after p0..p2, so ids 0-2 are unchanged and the
        # prefix hash matches: only the 3-row delta was uploaded
        assert r["mode"] == "incremental"
        _, h = _get(port, "/healthz")
        assert h["ntotal"] == 6
        # new ids resolve through the refreshed store
        status, sim = _get(port, "/similar?id=5&k=1")
        assert status == 200
        assert sim["results"][0]["id"] == 5

        # a file sorting BEFORE the old ones shifts every id (byte-sorted
        # path ranks) -> prefix mismatch -> drop-first full rebuild
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(photos / "a0.jpg")
        assert bi.main(["--model", "tiny-test", str(photos) + os.sep]) == 0
        status, r = _post(port, "/reload", {})
        assert status == 200
        assert r["mode"] == "rebuild" and r["ntotal"] == 7
        status, sim = _retry_cold(lambda: _get(port, "/similar?id=0&k=1"))
        assert status == 200
        assert sim["results"][0]["path"].endswith("a0.jpg")
    finally:
        server.shutdown()


def test_search_during_rebuild_reload(tmp_path, monkeypatch):
    """Searches racing a drop-first rebuild reload must all succeed —
    they block through the brief no-index window instead of erroring
    (the window exists so a full rebuild never holds two device corpora,
    clipx/serve.py reload)."""
    photos = tmp_path / "photos"
    photos.mkdir()
    rng = np.random.RandomState(9)
    for i in range(4):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(photos / f"p{i}.jpg")
    work = tmp_path / "work"
    work.mkdir()
    monkeypatch.chdir(work)
    assert bi.main(["--model", "tiny-test", str(photos) + os.sep]) == 0

    args = serve.build_parser().parse_args(["--model", "tiny-test",
                                            "--port", "0"])
    server = serve.make_server(args)
    port = server.server_address[1]
    service = server.RequestHandlerClass.service
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        _wait_warm(port)
        # force the rebuild branch (prefix mismatch) and slow it down so
        # the search threads really hit the no-index window
        service._sidecar_hash = b"not-the-real-hash"
        real_build = serve.common.build_index_from_vectors
        entered = threading.Event()

        def slow_build(vectors, a):
            entered.set()
            time.sleep(0.5)
            return real_build(vectors, a)

        monkeypatch.setattr(serve.common, "build_index_from_vectors",
                            slow_build)
        errors = []

        def searcher():
            try:
                status, data = _get(port, "/similar?id=1&k=2")
                assert status == 200, data
                assert data["results"][0]["id"] == 1
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)

        reload_thread = threading.Thread(
            target=lambda: _post(port, "/reload", {}))
        reload_thread.start()
        assert entered.wait(30)
        threads = [threading.Thread(target=searcher) for _ in range(4)]
        for t in threads:
            t.start()
        for t in threads + [reload_thread]:
            t.join(timeout=60)
        assert not errors, errors
    finally:
        server.shutdown()


def test_search_during_incremental_reload(tmp_path, monkeypatch):
    """Searches racing an INCREMENTAL reload must all succeed: the
    in-place add donates the corpus buffer, so serve drains reader
    dispatches for the mutation window — without that, a concurrent
    search can dispatch against the donated (deleted) array."""
    photos = tmp_path / "photos"
    photos.mkdir()
    rng = np.random.RandomState(10)
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(photos / f"p{i}.jpg")
    work = tmp_path / "work"
    work.mkdir()
    monkeypatch.chdir(work)
    assert bi.main(["--model", "tiny-test", str(photos) + os.sep]) == 0

    args = serve.build_parser().parse_args(["--model", "tiny-test",
                                            "--port", "0", "--no-warmup"])
    server = serve.make_server(args)
    port = server.server_address[1]
    service = server.RequestHandlerClass.service
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        for i in range(3, 6):  # append-sorting names -> incremental path
            Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                            ).save(photos / f"p{i}.jpg")
        assert bi.main(["--model", "tiny-test", str(photos) + os.sep]) == 0

        cls = type(service.index)
        real_add = cls.add
        entered = threading.Event()

        def slow_add(self_idx, vectors):
            entered.set()
            time.sleep(0.5)
            return real_add(self_idx, vectors)

        monkeypatch.setattr(cls, "add", slow_add)
        errors, results = [], []

        def searcher():
            try:
                status, data = _get(port, "/similar?id=1&k=2")
                assert status == 200, data
                assert data["results"][0]["id"] == 1
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)

        def reloader():
            results.append(_post(port, "/reload", {}))

        rt = threading.Thread(target=reloader)
        rt.start()
        assert entered.wait(30)
        threads = [threading.Thread(target=searcher) for _ in range(4)]
        for t in threads:
            t.start()
        for t in threads + [rt]:
            t.join(timeout=60)
        assert not errors, errors
        status, r = results[0]
        assert status == 200 and r["mode"] == "incremental", r
        # post-reload, the new rows resolve
        status, sim = _get(port, "/similar?id=5&k=1")
        assert status == 200 and sim["results"][0]["id"] == 5
    finally:
        server.shutdown()


def test_warmup_precompiles_text_path(served):
    """--warmup (default) builds the encoder + compiles the single-text
    shape in the background; the fixture server was created with it, so
    by the time other tests ran the encoder must be loaded."""
    deadline = time.time() + 60
    while time.time() < deadline:
        _, m = _get(served, "/metrics")
        if m["encoder_loaded"]:
            break
        time.sleep(0.5)
    else:
        raise AssertionError("warmup never loaded the encoder")
    # ... and pre-compiles every coalescer-reachable shape: text fills
    # 1..cap pad to _TEXT_BUCKETS {1,4,16} (3 shapes) and search fills
    # to power-of-two Q buckets {1,2,4,8,16} (5 shapes), so after warmup
    # no live request pays a fresh compile (139.7 s/shape on the
    # tunnel-attached TPU, SERVING_r03). Progress is observable as
    # counters.
    deadline = time.time() + 60
    while time.time() < deadline:
        _, m = _get(served, "/metrics")
        if (m["counters"].get("warmup_search_shapes", 0) >= 5
                and m["counters"].get("warmup_text_shapes", 0) >= 3
                and m["counters"].get("warmup_image_shapes", 0) >= 2):
            return
        time.sleep(0.5)
    raise AssertionError(
        f"warmup compiled {m['counters'].get('warmup_text_shapes', 0)} "
        f"text shapes (expected 3), "
        f"{m['counters'].get('warmup_search_shapes', 0)} search Q shapes "
        f"(expected 5) and "
        f"{m['counters'].get('warmup_image_shapes', 0)} image shapes "
        f"(expected 2: the N=1 and N=_IMG_CHUNK buckets requests "
        f"chunk to)")


def test_current_index_times_out_when_reload_stalls(tmp_path, monkeypatch):
    """If a rebuild reload stalls indefinitely, searches fail with a
    clear error after the wait timeout instead of hanging forever."""
    photos = tmp_path / "photos"
    photos.mkdir()
    rng = np.random.RandomState(11)
    Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                    ).save(photos / "p0.jpg")
    work = tmp_path / "work"
    work.mkdir()
    monkeypatch.chdir(work)
    assert bi.main(["--model", "tiny-test", str(photos) + os.sep]) == 0
    args = serve.build_parser().parse_args(["--model", "tiny-test"])
    service = serve.SearchService(args)
    try:
        service._index_ready.clear()
        service.index = None  # simulate a stalled drop-first rebuild
        with pytest.raises(RuntimeError, match="reloading"):
            service.current_index(timeout=0.2)
    finally:
        service.env.close()


def test_encode_image_and_search_image(served, tmp_path):
    """Image bytes over HTTP ride the indexer's decode+preprocess path:
    posting a copy of an indexed photo must reproduce its stored vector
    (top hit = itself, score ~1) — a capability the reference REPL
    lacks entirely (`i ID` only reaches already-indexed ids)."""
    import base64

    rng = np.random.RandomState(0)  # same seed as the fixture photos
    img = rng.randint(0, 255, (40, 40, 3), dtype=np.uint8)
    buf = tmp_path / "copy.jpg"
    Image.fromarray(img).save(buf)  # byte-identical re-encode of a.jpg
    b64 = base64.b64encode(buf.read_bytes()).decode()

    status, data = _post(served, "/encode_image", {"images_b64": [b64]})
    assert status == 200
    emb = np.asarray(data["embeddings"], np.float32)
    assert emb.shape == (1, 32)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0,
                               rtol=1e-4)

    status, data = _post(served, "/search_image",
                         {"image_b64": b64, "k": 2})
    assert status == 200
    top = data["results"][0]
    assert top["path"].endswith("a.jpg") and top["score"] > 0.999

    # error surface
    status, _ = _post(served, "/encode_image", {"images_b64": []})
    assert status == 400
    status, _ = _post(served, "/encode_image",
                      {"images_b64": ["!!!not-base64!!!"]})
    assert status == 400
    status, _ = _post(served, "/search_image",
                      {"image_b64": base64.b64encode(b"junk").decode()})
    assert status == 400
    status, _ = _post(served, "/encode_image", {"images_b64": [b64] * 65})
    assert status == 400


def test_serve_compute_int8(tmp_path, monkeypatch):
    """serve --compute int8: the encoder quantizes its image-tower MLP
    and every endpoint still answers (text encode is byte-identical by
    design, so search results match the bf16 server's for text
    queries)."""
    photos = tmp_path / "photos"
    photos.mkdir()
    rng = np.random.RandomState(3)
    for name in ["a.jpg", "b.jpg", "c.png"]:
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), dtype=np.uint8)
                        ).save(photos / name)
    work = tmp_path / "work"
    work.mkdir()
    monkeypatch.chdir(work)
    assert bi.main(["--model", "tiny-test", str(photos) + os.sep]) == 0
    args = serve.build_parser().parse_args(
        ["--model", "tiny-test", "--port", "0", "--compute", "int8"])
    server = serve.make_server(args)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        _wait_warm(port)
        status, data = _get(port, "/search?q=a+red+photo&k=2")
        assert status == 200 and len(data["results"]) == 2
        enc = server.RequestHandlerClass.service.encoder()
        assert enc.compute_quant == "int8"
        import jax.numpy as jnp

        assert enc.params["visual"]["blocks"]["mlp"]["w1_q"
                                                     ].dtype == jnp.int8
        status, data = _post(port, "/encode_text", {"texts": ["x"]})
        assert status == 200 and len(data["embeddings"]) == 1
    finally:
        server.shutdown()


def test_serve_sharded_index(served):
    """On the 8-device test mesh the default --sharded auto serves from
    the corpus-sharded index (the pod path), same results contract."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from clipx.parallel.mips import ShardedVectorIndex

    args = serve.build_parser().parse_args(["--model", "tiny-test"])
    service = serve.SearchService(args)
    try:
        assert isinstance(service.index, ShardedVectorIndex)
        # the results contract really holds: the sharded service returns
        # what the fixture server (also sharded-by-default here) returns
        vec = service.stored_vector(1)
        got = service.search(vec, k=3)
        _, via_http = _get(served, "/similar?id=1&k=3")
        assert ([r["id"] for r in got["results"]]
                == [r["id"] for r in via_http["results"]])
        assert got["results"][0]["id"] == 1
    finally:
        service.env.close()


# -- query coalescing ---------------------------------------------------------

def _standalone_service(tmp_path, monkeypatch, n_images=5, seed=7):
    """A SearchService over a freshly built tiny index (direct API, no
    HTTP) for exercising the coalescing dispatcher deterministically."""
    photos = tmp_path / "photos"
    photos.mkdir()
    rng = np.random.RandomState(seed)
    for i in range(n_images):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(photos / f"p{i}.jpg")
    work = tmp_path / "work"
    work.mkdir()
    monkeypatch.chdir(work)
    assert bi.main(["--model", "tiny-test", str(photos) + os.sep]) == 0
    args = serve.build_parser().parse_args(["--model", "tiny-test"])
    return serve.SearchService(args)


def _unit_queries(n, dim, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(n, dim).astype(np.float32)
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def test_coalesced_search_batches_concurrent_queries(tmp_path, monkeypatch):
    """Concurrent single-row searches ride ONE device call: block the
    dispatcher mid-dispatch, pile up 8 queries, release — the backlog
    must coalesce into a single batched index.search with each request
    still getting its own k rows and the exact per-query ranking.
    INFLIGHT=1 pins the serial dispatcher so the blocked first call
    deterministically dams the queue."""
    monkeypatch.setenv("CLIPX_SERVE_INFLIGHT", "1")
    service = _standalone_service(tmp_path, monkeypatch)
    try:
        idx = service.index
        orig = idx.search  # bound method; instance attr below shadows it
        calls = []
        entered, release = threading.Event(), threading.Event()

        def gated(feats, k):
            calls.append(feats.shape[0])
            if len(calls) == 1:
                entered.set()
                assert release.wait(30)
            return orig(feats, k)

        idx.search = gated
        qs = _unit_queries(9, idx.dim)
        results = [None] * 9
        ks = [3] + [2 + (i % 3) for i in range(1, 9)]

        def do(i):
            results[i] = service.search(qs[i: i + 1], ks[i])

        threads = [threading.Thread(target=do, args=(0,))]
        threads[0].start()
        assert entered.wait(30)  # dispatcher now blocked inside query 0
        for i in range(1, 9):
            threads.append(threading.Thread(target=do, args=(i,)))
            threads[-1].start()
        deadline = time.time() + 30
        while True:  # wait until all 8 queue behind the blocked dispatch
            with service._search_co._cv:
                if len(service._search_co._queue) == 8:
                    break
            assert time.time() < deadline, "queries never queued"
            time.sleep(0.01)
        release.set()
        for t in threads:
            t.join(30)
        assert calls == [1, 8]  # the backlog coalesced into one call
        for i in range(9):
            rows = results[i]["results"]
            assert len(rows) == min(ks[i], idx.ntotal)
            D, I = orig(qs[i: i + 1], ks[i])
            assert [r["id"] for r in rows] == \
                [int(x) for x in I[0][: len(rows)]]
        m = service.metrics()
        assert m["coalesce"]["queries"] == 9
        assert m["coalesce"]["batches"] == 2
    finally:
        service.close()
        service.env.close()


def test_coalesced_search_error_propagates(tmp_path, monkeypatch):
    """A device failure fails every query in the batch with the real
    exception, and the dispatcher keeps serving afterwards."""
    service = _standalone_service(tmp_path, monkeypatch, n_images=3)
    try:
        q = _unit_queries(1, service.index.dim)

        def bad(feats, k):
            raise RuntimeError("device fell over")

        service.index.search = bad
        with pytest.raises(RuntimeError, match="device fell over"):
            service.search(q, 2)
        del service.index.__dict__["search"]  # restore the class method
        out = service.search(q, 2)
        assert len(out["results"]) == 2
    finally:
        service.close()
        service.env.close()


def test_coalesce_disabled_dispatches_inline(tmp_path, monkeypatch):
    """CLIPX_SERVE_COALESCE=0 keeps the old behavior: the request thread
    itself dispatches (no dispatcher thread at all)."""
    monkeypatch.setenv("CLIPX_SERVE_COALESCE", "0")
    service = _standalone_service(tmp_path, monkeypatch, n_images=3)
    try:
        assert service._search_co is None
        seen = {}
        orig = service.index.search

        def spy(feats, k):
            seen["tid"] = threading.get_ident()
            return orig(feats, k)

        service.index.search = spy
        out = service.search(_unit_queries(1, service.index.dim), 2)
        assert len(out["results"]) == 2
        assert seen["tid"] == threading.get_ident()
    finally:
        service.close()
        service.env.close()


def test_coalesced_batches_pipeline(tmp_path, monkeypatch):
    """With INFLIGHT>1 a second batch dispatches while the first is
    still in flight — the property that keeps tunnel-RTT hosts at full
    throughput (a serial dispatcher measured 3x slower than inline)."""
    monkeypatch.setenv("CLIPX_SERVE_INFLIGHT", "2")
    service = _standalone_service(tmp_path, monkeypatch)
    try:
        idx = service.index
        orig = idx.search
        first_in, release = threading.Event(), threading.Event()
        second_in = threading.Event()
        calls = []

        def gated(feats, k):
            calls.append(feats.shape[0])
            if len(calls) == 1:
                first_in.set()
                assert release.wait(30)
            else:
                second_in.set()
            return orig(feats, k)

        idx.search = gated
        qs = _unit_queries(2, idx.dim)
        results = [None, None]

        def do(i):
            results[i] = service.search(qs[i: i + 1], 2)

        t0 = threading.Thread(target=do, args=(0,))
        t0.start()
        assert first_in.wait(30)      # batch 1 is now blocked in flight
        t1 = threading.Thread(target=do, args=(1,))
        t1.start()
        # batch 2 must dispatch WHILE batch 1 is still blocked
        assert second_in.wait(30), "second batch never overlapped"
        release.set()
        t0.join(30)
        t1.join(30)
        assert all(len(r["results"]) == 2 for r in results)
    finally:
        service.close()
        service.env.close()


def test_multirow_search_bypasses_coalescing(tmp_path, monkeypatch):
    """Q>1 callers already amortize; they dispatch inline even with
    coalescing enabled."""
    service = _standalone_service(tmp_path, monkeypatch, n_images=4)
    try:
        assert service._search_co is not None
        seen = {}
        orig = service.index.search

        def spy(feats, k):
            seen["tid"] = threading.get_ident()
            return orig(feats, k)

        service.index.search = spy
        service.search(_unit_queries(2, service.index.dim), 2)
        assert seen["tid"] == threading.get_ident()
    finally:
        service.close()
        service.env.close()


def test_coalesced_text_encode_batches_concurrent_queries(
        tmp_path, monkeypatch):
    """Concurrent single-text encodes coalesce into one encoder call,
    each caller getting exactly its own row; a multi-text call goes
    inline. INFLIGHT=1 pins the serial dispatcher so the blocked first
    encode deterministically dams the queue."""
    monkeypatch.setenv("CLIPX_SERVE_INFLIGHT", "1")
    service = _standalone_service(tmp_path, monkeypatch, n_images=3)
    try:
        enc = service.encoder()  # build once, outside the spy
        orig = enc.encode_texts
        calls = []
        entered, release = threading.Event(), threading.Event()

        def gated(texts):
            calls.append(len(texts))
            if len(calls) == 1:
                entered.set()
                assert release.wait(30)
            return orig(texts)

        enc.encode_texts = gated
        texts = [f"a {w} photo" for w in
                 ("red", "green", "blue", "gray", "pink")]
        results = [None] * len(texts)

        def do(i):
            results[i] = service.encode_texts([texts[i]])

        threads = [threading.Thread(target=do, args=(0,))]
        threads[0].start()
        assert entered.wait(30)  # dispatcher blocked inside text 0
        for i in range(1, len(texts)):
            threads.append(threading.Thread(target=do, args=(i,)))
            threads[-1].start()
        deadline = time.time() + 30
        while True:  # wait until the rest queue behind the block
            with service._text_co._cv:
                if len(service._text_co._queue) == len(texts) - 1:
                    break
            assert time.time() < deadline, "texts never queued"
            time.sleep(0.01)
        release.set()
        for t in threads:
            t.join(30)
        assert calls == [1, len(texts) - 1]  # backlog rode one call
        for i, t in enumerate(texts):
            expect = orig([t])
            assert results[i].shape == expect.shape
            np.testing.assert_allclose(results[i], expect,
                                       rtol=1e-5, atol=1e-6)
        # multi-text requests dispatch inline on the caller's thread
        seen = {}

        def spy(ts):
            seen["tid"] = threading.get_ident()
            return orig(ts)

        enc.encode_texts = spy
        service.encode_texts(texts[:2])
        assert seen["tid"] == threading.get_ident()
        m = service.metrics()
        assert m["text_coalesce"]["queries"] == len(texts)
        assert m["text_coalesce"]["batches"] == 2
    finally:
        service.close()
        service.env.close()


def test_serve_ivf_mode_search_and_reload(tmp_path, monkeypatch):
    """--search-mode ivf end-to-end behind HTTP: probed search answers,
    an append-only rebuild reloads incrementally (IVFIndex.add grows the
    exact tail, reference:query-index.py:29-30's nprobe semantics keep
    working), and a prefix-invalidating rebuild retrains via the full
    drop-first path."""
    photos = tmp_path / "photos"
    photos.mkdir()
    rng = np.random.RandomState(11)
    for i in range(4):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(photos / f"p{i}.jpg")
    work = tmp_path / "work"
    work.mkdir()
    monkeypatch.chdir(work)
    assert bi.main(["--model", "tiny-test", str(photos) + os.sep]) == 0

    args = serve.build_parser().parse_args(
        ["--model", "tiny-test", "--port", "0", "--search-mode", "ivf"])
    server = serve.make_server(args)
    port = server.server_address[1]
    service = server.RequestHandlerClass.service
    import jax

    from clipx.search.ivf import IVFIndex, ShardedIVFIndex
    assert isinstance(service.index, IVFIndex)
    if len(jax.devices()) >= 8:
        # default --sharded auto: on the 8-device test mesh this whole
        # test exercises serve + SHARDED IVF (probe knob, tail add,
        # retrain) — pin it so a loader regression can't silently fall
        # back to the single-device index
        assert isinstance(service.index, ShardedIVFIndex)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        _wait_warm(port)
        _, h = _get(port, "/healthz")
        assert h["ntotal"] == 4
        # a stored vector finds itself first through the probed scan
        vec = service.index.reconstruct(2).tolist()
        # k=2 is a NOVEL shape key post-warmup (probe floor differs from
        # the warmed k=50/10): the armed guard 503s while the off-thread
        # compile runs, then the retried request passes
        status, r = _retry_cold(lambda: _post(
            port, "/search_vector", {"vector": vec, "k": 2}))
        assert status == 200
        assert r["results"][0]["id"] == 2
        # per-request nprobe binds this call only: the index-global knob
        # must not move, and full-probe results stay exact
        status, r = _retry_cold(lambda: _post(
            port, "/search_vector",
            {"vector": vec, "k": 2, "nprobe": 100}))
        assert status == 200
        assert r["results"][0]["id"] == 2
        assert service.index.nprobe == 32  # untouched default
        status, sim = _retry_cold(
            lambda: _get(port, "/similar?id=2&k=2&nprobe=1"))
        assert status == 200
        assert sim["results"][0]["id"] == 2
        status, r = _post(port, "/search_vector",
                          {"vector": vec, "k": 2, "nprobe": 0})
        assert status == 400
        status, _ = _get(port, "/similar?id=2&k=2&nprobe=101")
        assert status == 400

        # append-only growth: IVF reloads incrementally via the tail
        for i in range(4, 6):
            Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                            ).save(photos / f"p{i}.jpg")
        assert bi.main(["--model", "tiny-test", str(photos) + os.sep]) == 0
        status, r = _post(port, "/reload", {})
        assert status == 200
        assert r["mode"] == "incremental" and r["ntotal"] == 6
        assert service.index is not None and service.index.tail_fraction > 0
        vec = service.index.reconstruct(5).tolist()
        status, r = _retry_cold(lambda: _post(
            port, "/search_vector", {"vector": vec, "k": 2}))
        assert status == 200
        assert r["results"][0]["id"] == 5
        status, sim = _retry_cold(lambda: _get(port, "/similar?id=4&k=1"))
        assert status == 200
        assert sim["results"][0]["id"] == 4

        # id-shifting rebuild (file sorts first) -> full retrain path
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(photos / "a0.jpg")
        assert bi.main(["--model", "tiny-test", str(photos) + os.sep]) == 0
        status, r = _post(port, "/reload", {})
        assert status == 200
        assert r["mode"] == "rebuild" and r["ntotal"] == 7
        assert isinstance(service.index, IVFIndex)
        assert service.index.tail_fraction == 0
        status, sim = _retry_cold(lambda: _get(port, "/similar?id=0&k=1"))
        assert status == 200
        assert sim["results"][0]["path"].endswith("a0.jpg")
    finally:
        server.shutdown()


def test_healthz_nonblocking_during_rebuild(tmp_path, monkeypatch):
    """/healthz must answer immediately (503 reloading) while a full
    rebuild holds the no-index window — a blocked health probe makes a
    load balancer kill the process, and killing a TPU process mid-claim
    wedges the chip (CLAUDE.md)."""
    photos = tmp_path / "photos"
    photos.mkdir()
    rng = np.random.RandomState(21)
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(photos / f"p{i}.jpg")
    work = tmp_path / "work"
    work.mkdir()
    monkeypatch.chdir(work)
    assert bi.main(["--model", "tiny-test", str(photos) + os.sep]) == 0

    args = serve.build_parser().parse_args(["--model", "tiny-test",
                                            "--port", "0", "--no-warmup"])
    server = serve.make_server(args)
    port = server.server_address[1]
    service = server.RequestHandlerClass.service
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        service._sidecar_hash = b"force-rebuild"
        real_build = serve.common.build_index_from_vectors
        entered = threading.Event()
        release = threading.Event()

        def slow_build(vectors, a):
            entered.set()
            release.wait(30)
            return real_build(vectors, a)

        monkeypatch.setattr(serve.common, "build_index_from_vectors",
                            slow_build)
        reload_thread = threading.Thread(
            target=lambda: _post(port, "/reload", {}))
        reload_thread.start()
        assert entered.wait(30)
        t0 = time.time()
        status, data = _get(port, "/healthz")
        dt = time.time() - t0
        assert status == 503 and data["status"] == "reloading"
        assert dt < 5, f"healthz blocked {dt:.1f}s through the rebuild"
        release.set()
        reload_thread.join(timeout=60)
        status, data = _get(port, "/healthz")
        assert status == 200 and data["status"] == "ok"
    finally:
        release.set()
        server.shutdown()


def test_rebuild_reload_waits_for_readers(tmp_path, monkeypatch):
    """The rebuild path must drain in-flight reader dispatches BEFORE
    dropping the old corpus: a reader's reference would otherwise keep
    it alive in HBM through the new upload — the transient double-HBM
    window drop-first exists to avoid."""
    photos = tmp_path / "photos"
    photos.mkdir()
    rng = np.random.RandomState(22)
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(photos / f"p{i}.jpg")
    work = tmp_path / "work"
    work.mkdir()
    monkeypatch.chdir(work)
    assert bi.main(["--model", "tiny-test", str(photos) + os.sep]) == 0

    args = serve.build_parser().parse_args(["--model", "tiny-test",
                                            "--port", "0", "--no-warmup"])
    server = serve.make_server(args)
    service = server.RequestHandlerClass.service
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        service._sidecar_hash = b"force-rebuild"
        entered = threading.Event()
        real_build = serve.common.build_index_from_vectors

        def marking_build(vectors, a):
            entered.set()
            return real_build(vectors, a)

        monkeypatch.setattr(serve.common, "build_index_from_vectors",
                            marking_build)
        service._begin_read()          # an in-flight search dispatch
        reload_thread = threading.Thread(target=service.reload)
        reload_thread.start()
        # reload must be parked in _exclude_readers, not building yet
        assert not entered.wait(1.0), \
            "rebuild dropped the old corpus while a reader was in flight"
        service._end_read()
        assert entered.wait(30)
        reload_thread.join(timeout=60)
        assert service.index is not None
    finally:
        server.shutdown()


def test_coalescer_submit_after_close_runs_inline():
    """A submit racing close() must not block for the full timeout on a
    dead dispatcher — it falls back to an inline single-item call."""
    co = serve._Coalescer(lambda items: [x * 10 for x in items],
                          cap=4, inflight=2, name="t")
    assert co.submit(3) == 30
    co.close()
    t0 = time.time()
    assert co.submit(5) == 50      # inline: dispatcher is gone
    assert time.time() - t0 < 5


def test_sigterm_shuts_down_cleanly(tmp_path, monkeypatch):
    """`kill PID` (SIGTERM — what a supervisor sends) must exit 0 after
    draining, same as Ctrl-C: the default handler would kill the process
    mid-device-dispatch, and an abandoned claim wedges the chip."""
    import signal as _signal

    from tests._subproc import finish, read_until, spawn

    photos = tmp_path / "photos"
    photos.mkdir()
    rng = np.random.RandomState(23)
    for i in range(2):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(photos / f"p{i}.jpg")
    work = tmp_path / "work"
    work.mkdir()
    monkeypatch.chdir(work)
    assert bi.main(["--model", "tiny-test", str(photos) + os.sep]) == 0

    code = ("import jax; jax.config.update('jax_platforms', 'cpu');"
            "from clipx.serve import main;"
            "raise SystemExit(main(['--model', 'tiny-test', '--port', '0',"
            "'--no-warmup']))")
    proc = spawn(code, cwd=work)
    try:
        # skip plugin warnings etc. until the startup banner
        buf = read_until(proc, lambda t: "clipx-serve on" in t,
                         timeout=120)
        assert "clipx-serve on" in buf, buf
        proc.send_signal(_signal.SIGTERM)
        out = finish(proc, timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
            finish(proc, timeout=30)
    assert proc.returncode == 0, buf + out
    assert "bye" in out


@pytest.mark.parametrize("cdtype", ["bf16", "int8", "int4", "pq"])
def test_serve_corpus_dtype_search_and_incremental_reload(
        tmp_path, monkeypatch, cdtype):
    """--corpus-dtype under serve: searches work, and an append-only
    rebuild reloads INCREMENTALLY — the delta-add path differs per
    storage (bf16 pads+casts rows, int8/int4 quantize on host), so all
    are pinned against the full-reload fallback silently taking over."""
    photos = tmp_path / "photos"
    photos.mkdir()
    rng = np.random.RandomState(9)
    for i in range(4):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(photos / f"p{i}.jpg")
    work = tmp_path / "work"
    work.mkdir()
    monkeypatch.chdir(work)
    assert bi.main(["--model", "tiny-test", str(photos) + os.sep]) == 0

    args = serve.build_parser().parse_args(
        ["--model", "tiny-test", "--port", "0",
         "--corpus-dtype", cdtype])
    server = serve.make_server(args)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        if cdtype == "int8":
            assert server.RequestHandlerClass.service.index.int8_storage
        elif cdtype == "int4":
            assert server.RequestHandlerClass.service.index.int4_storage
        elif cdtype == "pq":
            assert server.RequestHandlerClass.service.index.pq_storage
        _wait_warm(port)
        status, data = _get(port, "/search?q=anything&k=2")
        assert status == 200 and len(data["results"]) == 2
        status, sim = _get(port, "/similar?id=1&k=2")
        assert status == 200 and sim["results"][0]["id"] == 1

        # append-only growth -> prefix hash matches -> incremental add
        for i in range(4, 7):
            Image.fromarray(rng.randint(0, 255, (32, 32, 3),
                                        dtype=np.uint8)
                            ).save(photos / f"p{i}.jpg")
        assert bi.main(["--model", "tiny-test", str(photos) + os.sep]) == 0
        status, r = _post(port, "/reload", {})
        assert status == 200 and r["mode"] == "incremental", r
        assert r["ntotal"] == 7
        status, sim = _get(port, "/similar?id=6&k=1")
        assert status == 200 and sim["results"][0]["id"] == 6
    finally:
        server.shutdown()


def test_serve_ivf_int8_storage_search_and_reload(tmp_path, monkeypatch):
    """--search-mode ivf + --corpus-dtype int8 (the codes-as-corpus
    capacity tier with a functional nprobe) behind HTTP: probed search
    answers, per-request nprobe binds, and append-only rebuilds reload
    incrementally into the int8 exact tail."""
    photos = tmp_path / "photos"
    photos.mkdir()
    rng = np.random.RandomState(21)
    for i in range(5):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(photos / f"p{i}.jpg")
    work = tmp_path / "work"
    work.mkdir()
    monkeypatch.chdir(work)
    assert bi.main(["--model", "tiny-test", str(photos) + os.sep]) == 0

    args = serve.build_parser().parse_args(
        ["--model", "tiny-test", "--port", "0", "--search-mode", "ivf",
         "--corpus-dtype", "int8"])
    server = serve.make_server(args)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        svc = server.RequestHandlerClass.service
        assert svc.index.int8_storage and svc.index.supports_nprobe
        assert svc.index._corpus3 is None  # codes are the corpus
        _wait_warm(port)
        # k=2 + nprobe=100 is a novel shape key post-warmup: the armed
        # guard 503s while the off-thread compile runs, then passes
        status, data = _retry_cold(
            lambda: _get(port, "/search?q=anything&k=2&nprobe=100"))
        assert status == 200 and len(data["results"]) == 2
        status, sim = _get(port, "/similar?id=1&k=1&nprobe=100")
        assert status == 200 and sim["results"][0]["id"] == 1

        for i in range(5, 8):
            Image.fromarray(rng.randint(0, 255, (32, 32, 3),
                                        dtype=np.uint8)
                            ).save(photos / f"p{i}.jpg")
        assert bi.main(["--model", "tiny-test", str(photos) + os.sep]) == 0
        status, r = _post(port, "/reload", {})
        assert status == 200 and r["mode"] == "incremental", r
        assert r["ntotal"] == 8
        assert svc.index._tail is not None and svc.index._tail.int8_storage
        status, sim = _get(port, "/similar?id=7&k=1&nprobe=100")
        assert status == 200 and sim["results"][0]["id"] == 7
    finally:
        server.shutdown()


# -- cold-shape 503 guard -----------------------------------------------------

def test_cold_shape_guard(tmp_path, monkeypatch):
    """While warmup compiles a shape family, requests needing it get an
    immediate 503 + Retry-After instead of stalling minutes behind the
    compile (the SERVING_r03 cold-bucket p99 hole). The gate disarms
    per family as warmup covers it, and /healthz reports warm."""
    photos = tmp_path / "photos"
    photos.mkdir()
    rng = np.random.RandomState(3)
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(photos / f"p{i}.jpg")
    work = tmp_path / "work"
    work.mkdir()
    monkeypatch.chdir(work)
    assert bi.main(["--model", "tiny-test", str(photos) + os.sep]) == 0
    # --no-warmup: no gate is attached automatically; attach one by
    # hand so the cold window is deterministic (a real warmup on the
    # CPU test platform disarms in seconds and the race is untestable)
    args = serve.build_parser().parse_args(
        ["--model", "tiny-test", "--port", "0", "--no-warmup"])
    server = serve.make_server(args)
    service = server.RequestHandlerClass.service
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        gate = serve._WarmGate(retry_after=7)
        service._warm_gate = gate
        status, h = _get(port, "/healthz")
        assert status == 200 and h["warm"] is False
        # every shape-compiling endpoint rejects with Retry-After
        status, body, headers = _get_raw(port, "/similar?id=1&k=2")
        assert status == 503
        assert headers.get("Retry-After") == "7"
        assert body["warming"] == "search"
        assert body["retry_after_s"] == 7
        status, body = _post(port, "/encode_text", {"texts": ["x"]})
        assert status == 503 and body["warming"] == "text"
        status, body = _get(port, "/search?q=anything&k=2")
        assert status == 503 and body["warming"] == "text"
        status, body = _post(port, "/encode_image",
                             {"images_b64": ["aGk="]})
        assert status == 503 and body["warming"] == "image"
        # non-shape endpoints keep answering through the cold window
        status, _ = _get(port, "/metrics")
        assert status == 200
        # per-family phase end: search family ready -> /similar passes
        # the phase gate; its (k=2) shape key is novel, so the ARMED
        # layer 503s once and compiles it off-thread (round-5: the
        # guard no longer disarms wholesale at warmup exit)
        gate.mark("search")
        status, data = _retry_cold(
            lambda: _get(port, "/similar?id=1&k=2"))
        assert status == 200 and data["results"][0]["id"] == 1
        # ...and once compiled, the same shape answers 200 immediately
        status, data = _get(port, "/similar?id=1&k=2")
        assert status == 200
        status, body = _post(port, "/encode_text", {"texts": ["x"]})
        assert status == 503
        # all family phases done (what the warmup thread's exit
        # guarantees); novel keys still gate through the bg compiler
        gate.mark_all()
        status, h = _get(port, "/healthz")
        assert h["warm"] is True
        status, data = _retry_cold(
            lambda: _get(port, "/search?q=anything&k=2"))
        assert status == 200
        # rejects were counted but not as errors
        _, m = _get(port, "/metrics")
        assert m["counters"].get("cold_rejects", 0) >= 4
        assert m["counters"].get("errors", 0) == 0
    finally:
        server.shutdown()


def test_warmup_attaches_gate_and_disarms(tmp_path, monkeypatch):
    """--warmup (default) arms the guard at startup and the warmup
    thread disarms every family by completion; CLIPX_SERVE_COLD_GUARD=off
    keeps the old queue-behind-compile behavior (no gate at all)."""
    photos = tmp_path / "photos"
    photos.mkdir()
    rng = np.random.RandomState(4)
    for i in range(2):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(photos / f"p{i}.jpg")
    work = tmp_path / "work"
    work.mkdir()
    monkeypatch.chdir(work)
    assert bi.main(["--model", "tiny-test", str(photos) + os.sep]) == 0
    args = serve.build_parser().parse_args(["--model", "tiny-test",
                                            "--port", "0"])
    server = serve.make_server(args)
    service = server.RequestHandlerClass.service
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        assert service._warm_gate is not None
        _wait_warm(port)
        assert service._warm_gate.all_ready()
        status, _ = _get(port, "/search?q=x&k=1")
        assert status == 200
    finally:
        server.shutdown()
    # guard opt-out
    monkeypatch.setenv("CLIPX_SERVE_COLD_GUARD", "off")
    args = serve.build_parser().parse_args(["--model", "tiny-test",
                                            "--port", "0"])
    server2 = serve.make_server(args)
    try:
        assert server2.RequestHandlerClass.service._warm_gate is None
    finally:
        # serve_forever never ran for server2, so shutdown() would
        # block forever waiting for the loop to exit — close the
        # socket and join the warmup thread directly
        server2.server_close()
        if getattr(server2, "_warmup_stop", None) is not None:
            server2._warmup_stop.set()
            server2._warmup_thread.join(timeout=120)


def test_metrics_index_provenance(tmp_path, monkeypatch):
    """/metrics reports the live index's storage tier, class, and
    whether the process booted from the codes sidecar — the first
    things to check when capacity numbers look wrong."""
    photos = tmp_path / "photos"
    photos.mkdir()
    rng = np.random.RandomState(6)
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(photos / f"p{i}.jpg")
    work = tmp_path / "work"
    work.mkdir()
    monkeypatch.chdir(work)
    assert bi.main(["--model", "tiny-test", str(photos) + os.sep]) == 0
    args = serve.build_parser().parse_args(
        ["--model", "tiny-test", "--port", "0", "--no-warmup",
         "--corpus-dtype", "int8", "--sharded", "off"])
    # first boot encodes + writes codes; boot again so the server
    # actually loads them
    serve.SearchService(args).env.close()
    server = serve.make_server(args)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        status, m = _get(port, "/metrics")
        assert status == 200
        info = m["index"]
        assert info["storage"] == "int8"
        assert info["class"] == "VectorIndex"
        assert info["booted_from_codes"] is True
    finally:
        server.shutdown()


def test_armed_gate_compiles_novel_shapes_and_manifest_replays(
        tmp_path, monkeypatch):
    """Round-5 cold-shape guard: POST-warmup novel shape keys 503 +
    compile off-thread (never stall a live request), the discovered
    shape lands in the warmup manifest, and a SECOND boot replays the
    manifest so the same request passes without a single 503."""
    photos = tmp_path / "photos"
    photos.mkdir()
    rng = np.random.RandomState(5)
    for i in range(4):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(photos / f"p{i}.jpg")
    work = tmp_path / "work"
    work.mkdir()
    monkeypatch.chdir(work)
    assert bi.main(["--model", "tiny-test", str(photos) + os.sep]) == 0

    def boot():
        args = serve.build_parser().parse_args(
            ["--model", "tiny-test", "--port", "0"])  # warmup ON
        server = serve.make_server(args)
        threading.Thread(target=server.serve_forever,
                         daemon=True).start()
        return server, server.server_address[1]

    server, port = boot()
    try:
        _wait_warm(port)
        # k=17 (bucket 32) was never warmed: the first attempt must be
        # an immediate 503 (not a stall), then the off-thread compile
        # lands and the retried request answers
        status, body, headers = _get_raw(port, "/similar?id=1&k=17")
        assert status == 503 and "Retry-After" in headers
        status, data = _retry_cold(
            lambda: _get(port, "/similar?id=1&k=17"))
        assert status == 200 and data["results"][0]["id"] == 1
        _, m = _get(port, "/metrics")
        assert m["counters"].get("bg_compiles", 0) >= 1
        assert m["counters"].get("cold_rejects", 0) >= 1
        # the discovered shape is recorded for future boots
        with open("images.index.warmup.json") as f:
            entries = json.load(f)["entries"]
        assert {"family": "search", "k": 17, "nprobe": None} in entries
    finally:
        server.shutdown()

    # second boot: manifest replay pre-warms k=17 — zero 503s
    server, port = boot()
    try:
        _wait_warm(port)
        status, data = _get(port, "/similar?id=1&k=17")
        assert status == 200 and data["results"][0]["id"] == 1
    finally:
        server.shutdown()
