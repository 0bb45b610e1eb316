"""Helpers for the real-subprocess signal tests.

Signals need a real process, and the watch-output-then-signal pattern
needs deadlines that actually fire: a blocking ``stdout.read(1)`` makes
any ``while ... and time.time() < deadline`` loop dead code (a stalled
child hangs the whole suite). Pipes are opened unbuffered in bytes mode
and polled with ``select`` so every wait is bounded.
"""

import os
import select
import subprocess
import sys
import time

import clipx

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(
    clipx.__file__)))


def spawn(code: str, cwd=None) -> subprocess.Popen:
    """Launch ``python -u -c code`` with the repo importable and
    stderr merged, unbuffered bytes pipes (see module docstring)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen([sys.executable, "-u", "-c", code],
                            cwd=cwd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, bufsize=0, env=env)


def read_until(proc, predicate, timeout: float) -> str:
    """Accumulate the child's output until ``predicate(text)`` is true,
    EOF, or the timeout; returns the text read so far either way."""
    buf = b""
    fd = proc.stdout.fileno()
    deadline = time.time() + timeout
    while time.time() < deadline:
        if predicate(buf.decode("utf-8", "replace")):
            break
        ready, _, _ = select.select([fd], [], [], 0.25)
        if ready:
            chunk = os.read(fd, 4096)
            if not chunk:        # EOF: child closed stdout
                break
            buf += chunk
    return buf.decode("utf-8", "replace")


def finish(proc, timeout: float = 120.0) -> str:
    """communicate() + decode; kills the child on timeout."""
    try:
        out, _ = proc.communicate(timeout=timeout)
    except subprocess.TimeoutExpired:
        proc.kill()
        out, _ = proc.communicate(timeout=30)
    return out.decode("utf-8", "replace") if isinstance(out, bytes) else out
