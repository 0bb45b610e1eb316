"""Multi-host smoke test: two real processes, one global mesh over the
loopback coordinator (clipx.parallel.distributed -> jax.distributed).

Everything else in SURVEY.md section 2c is proven on the single-process
8-device virtual mesh; this covers the remaining cell — cross-process
initialization, a dp x tp train step whose gradients genuinely couple
the processes, and a corpus-sharded search spanning both processes'
devices.
"""

import os
import socket
import subprocess
import sys

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "_dist_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_pair():
    """One attempt: spawn both workers on a fresh port, return
    (procs, outs)."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    return procs, outs


def test_two_process_mesh_train_and_search():
    procs, outs = _run_pair()
    if any(p.returncode != 0 for p in procs) and any(
            "gloo" in out.lower() and "preamble" in out.lower()
            for out in outs):
        # Gloo's loopback rendezvous is flaky under heavy host
        # contention (observed: a transport preamble-size abort while a
        # parallel CPU job saturated every core). Retry ONLY that
        # specific signature — a real collective bug whose traceback
        # merely passes through a gloo frame must not get a free pass
        # (it fails deterministically on the retry anyway, but the
        # narrow match keeps the first failure visible).
        procs, outs = _run_pair()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    results = [line for out in outs for line in out.splitlines()
               if line.startswith("RESULT ")]
    assert len(results) == 2, outs
    # the global train step must produce the identical loss on both
    # processes (replicated metrics after the dp psum)
    assert results[0] == results[1], results
