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

import numpy as np
from PIL import Image

from tests._subproc import finish, read_until, spawn


def _attempt(photos, work):
    """One launch + mid-loop TERM. Returns (rc, merged output)."""
    code = ("import jax; jax.config.update('jax_platforms', 'cpu');"
            "from clipx.cli.build_index import main;"
            f"raise SystemExit(main(['--model', 'tiny-test',"
            f"'--batch-size', '8', {str(photos) + os.sep!r}]))")
    proc = spawn(code, cwd=work)
    try:
        # wait for the first progress dot past the "CLIPing ..." banner
        # newline (the banner itself ends in "...", and plugin/stderr
        # lines may precede it): at least one batch is committed, so
        # phase 2 has something to index. Then TERM mid-loop.
        def saw_dot(text):
            at = text.find("CLIPing")
            if at < 0:
                return False
            nl = text.find("\n", at)
            return nl >= 0 and "." in text[nl + 1:]

        buf = read_until(proc, saw_dot, timeout=120)
        assert saw_dot(buf), buf
        proc.send_signal(signal.SIGTERM)
        out = finish(proc, timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()
            finish(proc, timeout=30)
    return proc.returncode, buf + out


def test_sigterm_rides_the_interrupt_contract(tmp_path):
    photos = tmp_path / "photos"
    photos.mkdir()
    rng = np.random.RandomState(31)
    for i in range(96):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(photos / f"p{i:03d}.jpg")

    attempts = []
    for attempt in range(3):
        work = tmp_path / f"work{attempt}"
        work.mkdir()
        rc, out = _attempt(photos, work)
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
