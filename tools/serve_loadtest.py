"""Closed-loop HTTP load generator for `clipx.serve`.

Measures sustained /search_vector throughput and latency under N
concurrent clients — the workload the serve-side query coalescer
(CLIPX_SERVE_COALESCE) exists for: on a tunnel-attached chip each
device call pays the tunnel RTT, so batching concurrent queries into
one call multiplies qps by the batch size. Pure host process; the one
TPU process is the serve instance under test.

    python tools/serve_loadtest.py --url http://localhost:8931 \
        --threads 64 --seconds 30 --dim 512

Prints one JSON line: qps, latency p50/p95/p99, error count, and the
server's /metrics coalesce counters (delta over the run window).
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
import urllib.request

import numpy as np


def _get(url: str, timeout: float = 600.0):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return json.load(r)


def _post(url: str, obj, timeout: float = 600.0):
    req = urllib.request.Request(
        url, json.dumps(obj).encode(), {"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return json.load(r)
    except urllib.error.HTTPError as e:
        # cold-shape guard 503s carry a JSON body + Retry-After —
        # surface them as data, not exceptions (the loadtest counts
        # them separately from real errors)
        body = e.read()
        try:
            out = json.loads(body)
        except ValueError:
            out = {"error": body.decode(errors="replace")}
        out["_status"] = e.code
        return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description=__doc__.splitlines()[0],
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--url", default="http://localhost:8765")
    p.add_argument("--threads", type=int, default=64,
                   help="concurrent closed-loop clients")
    p.add_argument("--seconds", type=float, default=30.0,
                   help="measurement window (after warmup)")
    p.add_argument("--warmup-seconds", type=float, default=5.0,
                   help="run this long before the measured window so "
                        "compiles/first dispatches don't pollute it")
    p.add_argument("--dim", type=int, default=512)
    p.add_argument("--k", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    health = _get(args.url + "/healthz")
    if health.get("dim") not in (None, args.dim):
        print(f"note: server dim {health['dim']} != --dim {args.dim}; "
              f"using server dim", file=sys.stderr)
        args.dim = health["dim"]

    # Pre-generate distinct unit queries per thread (identical-arg
    # dispatch has produced above-roofline numbers on this runtime —
    # vary inputs per call, CLAUDE.md).
    rng = np.random.RandomState(args.seed)
    pool = rng.randn(max(1024, args.threads * 4), args.dim)
    pool /= np.linalg.norm(pool, axis=1, keepdims=True)
    pool = pool.astype(np.float32)

    t_end_warmup = time.perf_counter() + args.warmup_seconds
    t_end = t_end_warmup + args.seconds
    lat: list = []          # measured-window latencies (s)
    errors = [0]
    rejects = [0]           # cold-shape 503s (fast, by design)
    reject_lat: list = []
    lock = threading.Lock()
    m0 = {}

    def worker(tid: int) -> None:
        lrng = np.random.RandomState(args.seed + 1 + tid)
        url = args.url + "/search_vector"
        while True:
            now = time.perf_counter()
            if now >= t_end:
                return
            vec = pool[lrng.randint(len(pool))]
            t0 = time.perf_counter()
            cold = False
            try:
                out = _post(url, {"vector": vec.tolist(), "k": args.k})
                ok = bool(out.get("results"))
                cold = out.get("_status") == 503 and "warming" in out
            except Exception:
                ok = False
            t1 = time.perf_counter()
            if t0 >= t_end_warmup:         # measured window only
                with lock:
                    if ok:
                        lat.append(t1 - t0)
                    elif cold:
                        rejects[0] += 1
                        reject_lat.append(t1 - t0)
                    else:
                        errors[0] += 1

    threads = [threading.Thread(target=worker, args=(i,), daemon=True)
               for i in range(args.threads)]
    for t in threads:
        t.start()
    # snapshot server counters at the start of the measured window
    time.sleep(args.warmup_seconds)
    try:
        m0 = _get(args.url + "/metrics")
    except Exception:
        m0 = {}
    for t in threads:
        t.join()
    try:
        m1 = _get(args.url + "/metrics")
    except Exception:
        m1 = {}

    ls = np.sort(np.asarray(lat)) if lat else np.zeros(0)
    window = args.seconds
    co0 = (m0.get("coalesce") or {})
    co1 = (m1.get("coalesce") or {})
    result = {
        "threads": args.threads,
        "seconds": window,
        "requests": int(len(ls)),
        "errors": int(errors[0]),
        "cold_503s": int(rejects[0]),
        "cold_503_p95_ms": (round(float(np.percentile(
            np.asarray(reject_lat), 95)) * 1e3, 2) if reject_lat
            else None),
        "qps": round(len(ls) / window, 1),
        "p50_ms": round(float(ls[len(ls) // 2]) * 1e3, 2) if len(ls) else None,
        "p95_ms": (round(float(ls[int(len(ls) * 0.95)]) * 1e3, 2)
                   if len(ls) else None),
        "p99_ms": (round(float(ls[int(len(ls) * 0.99)]) * 1e3, 2)
                   if len(ls) else None),
        "coalesce_cap": co1.get("cap"),
        "coalesce_batches": ((co1.get("batches") or 0)
                             - (co0.get("batches") or 0)) or None,
        "coalesce_queries": ((co1.get("queries") or 0)
                             - (co0.get("queries") or 0)) or None,
        "ntotal": health.get("ntotal"),
    }
    print(json.dumps(result))
    return 0 if not errors[0] else 1


if __name__ == "__main__":
    raise SystemExit(main())
