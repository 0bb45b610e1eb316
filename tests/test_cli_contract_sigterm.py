"""SIGTERM contract for the indexer CLI, in a real subprocess.

`kill PID` (SIGTERM — what a supervisor sends; SIGKILL is banned on the
TPU host, an abandoned claim wedges the single-tenant chip) must behave
like Ctrl-C: break out of the encode loop but still build the index
over what was encoded (reference:build-index.py:62-64). The default
SIGTERM disposition would kill the process mid-device-dispatch.

Timing-sensitive by nature (the signal races the encode loop), so the
scenario retries a few times and requires at least one attempt to land
mid-loop; landing after the loop is not a product failure, just an
uninformative attempt.
"""

import os
import signal
import subprocess
import sys
import time

import numpy as np
from PIL import Image

import clipx


def _launch(photos, work, env):
    code = ("import jax; jax.config.update('jax_platforms', 'cpu');"
            "from clipx.cli.build_index import main;"
            f"raise SystemExit(main(['--model', 'tiny-test',"
            f"'--batch-size', '8', {str(photos) + os.sep!r}]))")
    return subprocess.Popen([sys.executable, "-u", "-c", code],
                            cwd=work, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, env=env)


def _attempt(photos, work, env):
    """One launch + mid-loop TERM. Returns (rc, merged output)."""
    proc = _launch(photos, work, env)
    try:
        # wait for the first progress dot (at least one image committed,
        # so phase 2 has something to index), then TERM mid-loop. Anchor
        # past the newline of the "CLIPing ..." banner itself (it ends
        # in "...", and plugin/stderr lines may precede it).
        buf = ""
        deadline = time.time() + 120
        while "CLIPing" not in buf and time.time() < deadline:
            buf += proc.stdout.read(1)
        assert "CLIPing" in buf, buf
        banner_at = buf.index("CLIPing")
        while "\n" not in buf[banner_at:] and time.time() < deadline:
            buf += proc.stdout.read(1)
        banner_end = banner_at + buf[banner_at:].index("\n") + 1
        while "." not in buf[banner_end:] and time.time() < deadline:
            buf += proc.stdout.read(1)
        assert "." in buf[banner_end:], buf
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate(timeout=30)
    return proc.returncode, buf + out


def test_sigterm_rides_the_interrupt_contract(tmp_path):
    photos = tmp_path / "photos"
    photos.mkdir()
    rng = np.random.RandomState(31)
    for i in range(96):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(photos / f"p{i:03d}.jpg")
    repo_root = os.path.dirname(os.path.dirname(
        os.path.abspath(clipx.__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")

    attempts = []
    for attempt in range(3):
        work = tmp_path / f"work{attempt}"
        work.mkdir()
        rc, out = _attempt(photos, work, env)
        attempts.append((rc, out[-500:]))
        if "Interrupted!" in out:
            # the signal landed mid-encode-loop: the contract applies
            assert rc == 0, out
            assert "Done!" in out            # phase 2 still ran
            assert os.path.exists(work / "images.index")
            return
        # Landed after the loop (run finished, or died inside phase 2
        # via the propagating KeyboardInterrupt, same as the reference's
        # own Ctrl-C there) — uninformative; retry.
    raise AssertionError(
        f"SIGTERM never landed mid-encode in 3 attempts: {attempts}")
