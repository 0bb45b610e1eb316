"""The CLIPX_* env-leak guard: helpers and the guard itself.

Round-4 postmortem coverage: tools/load_timing.py leaked
CLIPX_CODES=refresh and nine codes_io tests failed later in suite
order.  Three layers are pinned here:

1. the snapshot/diff helpers detect adds/removes/changes;
2. ``clipx.utils.env.restoring`` restores exact prior state;
3. the conftest autouse guard actually FAILS a polluting test (proved
   by running a deliberately-leaky test file in a pytest subprocess);
4. the tool mains that burned us restore the namespace.
"""

import os
import subprocess
import sys
import textwrap

from clipx.utils import env as envmod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_snapshot_and_diff_detect_all_drift_kinds(monkeypatch):
    monkeypatch.setenv("CLIPX_GUARD_A", "1")
    monkeypatch.setenv("CLIPX_GUARD_B", "x")
    before = envmod.snapshot()
    assert envmod.diff(before) == ""
    os.environ["CLIPX_GUARD_C"] = "new"          # add
    os.environ["CLIPX_GUARD_A"] = "2"            # change
    os.environ.pop("CLIPX_GUARD_B")              # remove
    try:
        drift = envmod.diff(before)
        assert "added CLIPX_GUARD_C='new'" in drift
        assert "changed CLIPX_GUARD_A: '1' -> '2'" in drift
        assert "removed CLIPX_GUARD_B (was 'x')" in drift
    finally:
        os.environ.pop("CLIPX_GUARD_C", None)
        os.environ["CLIPX_GUARD_A"] = "1"
        os.environ["CLIPX_GUARD_B"] = "x"


def test_restoring_context_restores_value_and_absence(monkeypatch):
    monkeypatch.setenv("CLIPX_GUARD_SET", "orig")
    monkeypatch.delenv("CLIPX_GUARD_UNSET", raising=False)
    with envmod.restoring(CLIPX_GUARD_SET="tmp", CLIPX_GUARD_UNSET="tmp2"):
        assert os.environ["CLIPX_GUARD_SET"] == "tmp"
        assert os.environ["CLIPX_GUARD_UNSET"] == "tmp2"
    assert os.environ["CLIPX_GUARD_SET"] == "orig"
    assert "CLIPX_GUARD_UNSET" not in os.environ
    # exception path restores too
    try:
        with envmod.restoring(CLIPX_GUARD_SET="boom"):
            raise RuntimeError
    except RuntimeError:
        pass
    assert os.environ["CLIPX_GUARD_SET"] == "orig"


def test_conftest_guard_fails_the_polluting_test(tmp_path):
    """A leaky test run under the repo conftest must fail ITSELF.

    The leaky file lives in a temp subdir of tests/ so the repo
    conftest (and its autouse guard) applies; pytest runs in a
    subprocess so the nested session can't disturb this one.
    """
    subdir = os.path.join(os.path.dirname(__file__), "_guard_tmp")
    os.makedirs(subdir, exist_ok=True)
    leaky = os.path.join(subdir, "test_leaky_tmp.py")
    with open(leaky, "w") as f:
        f.write(textwrap.dedent("""\
            import os

            def test_that_leaks():
                os.environ["CLIPX_LEAKED_BY_TEST"] = "refresh"

            def test_after_leak_sees_clean_env():
                # the guard restores after failing the leaker, so the
                # NEXT test must not inherit the pollution
                assert "CLIPX_LEAKED_BY_TEST" not in os.environ
        """))
    env = dict(os.environ)
    env.pop("CLIPX_LEAKED_BY_TEST", None)
    env["CLIPX_NO_EXIT_GUARD"] = "1"
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", leaky, "-q", "-p",
             "no:cacheprovider"],
            capture_output=True, text=True, cwd=REPO, env=env,
            timeout=300)
        out = proc.stdout + proc.stderr
        assert "test leaked CLIPX_* env mutations" in out, out
        assert "added 'CLIPX_LEAKED_BY_TEST'" in out or \
            "CLIPX_LEAKED_BY_TEST" in out, out
        # exactly the leaker is flagged (pytest reports a teardown
        # failure as ERROR on that test); the follow-up passes clean
        assert "test_leaky_tmp.py::test_that_leaks" in out, out
        assert "2 passed, 1 error" in out, out
    finally:
        os.remove(leaky)
        try:
            os.rmdir(subdir)
        except OSError:
            pass


def test_load_timing_cold_restores_clipx_codes(tmp_path, monkeypatch):
    """The exact round-4 leak: --cold must not leave CLIPX_CODES set."""
    monkeypatch.delenv("CLIPX_CODES", raising=False)
    from tools import load_timing

    # a nonexistent index makes common.load_index raise quickly; the
    # finally must restore regardless
    import pytest
    with pytest.raises(Exception):
        load_timing.main(["--index", str(tmp_path / "nope.index"),
                          "--cold"])
    assert "CLIPX_CODES" not in os.environ

    monkeypatch.setenv("CLIPX_CODES", "keep-me")
    with pytest.raises(Exception):
        load_timing.main(["--index", str(tmp_path / "nope.index"),
                          "--cold"])
    assert os.environ["CLIPX_CODES"] == "keep-me"
