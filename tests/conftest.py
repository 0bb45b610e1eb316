"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so multi-chip sharding
(`shard_map` / pjit over a Mesh) is exercised without TPU hardware — the
standard JAX fake-mesh trick (SURVEY.md section 4 item 2). Environment
variables must be set before jax initializes its backends, hence the
module-level code here (conftest imports before any test module).
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
# The host image pins JAX_PLATFORMS=axon (one real TPU chip behind a
# tunnel). Unit tests run on the virtual CPU mesh instead; the TPU is
# reserved for bench.py.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

from clipx.utils import env as _envmod  # noqa: E402


@pytest.fixture(autouse=True)
def _clipx_env_leak_guard():
    """Fail the POLLUTING test when it leaks a CLIPX_* env mutation.

    Round-4 postmortem: tools/load_timing.py left CLIPX_CODES=refresh
    set process-wide and nine unrelated codes_io tests failed later in
    the default suite order.  This guard pins the blame where it
    belongs: any test that returns with the CLIPX_* namespace changed
    fails itself, immediately.  Tests that need a knob should use
    monkeypatch.setenv (auto-restored) or clipx.utils.env.restoring.
    """
    before = _envmod.snapshot()
    yield
    drift = _envmod.diff(before)
    if drift:
        # restore so ONE offender doesn't cascade into victims anyway
        for k in _envmod.snapshot():
            if k not in before:
                os.environ.pop(k, None)
        os.environ.update(before)
        pytest.fail(f"test leaked CLIPX_* env mutations: {drift}")


_exit_status = [0]


def pytest_sessionfinish(session, exitstatus):
    _exit_status[0] = int(exitstatus)


def pytest_unconfigure(config):
    """Skip CPython interpreter finalization, keeping pytest's own exit
    status. Constraint: conftest hooks run first (pluggy LIFO), so
    later plugins' unconfigure work is skipped (e.g. pytest-cov would
    write no data) and a process embedding pytest.main() never gets
    control back — set CLIPX_NO_EXIT_GUARD=1 for those workflows. A native teardown crash — `terminate called after throwing
    an instance of ''` + `FATAL: exception not rethrown`, i.e. a C++
    forced-unwind caught without rethrow in a static destructor — turns
    a fully green run into SIGABRT(134) nondeterministically. It needs
    pytest's teardown ordering to trigger (the same serve/reload
    operations in a plain script exit 0), reproduces at older known-good
    commits, and leaves no Python frame (faulthandler shows only the
    finalizing main thread), so it is native-library exit-time behavior,
    not a test failure. Runs after the terminal summary, so no output is
    lost; exitstatus still reports real failures."""
    if os.environ.get("CLIPX_NO_EXIT_GUARD"):
        return
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(_exit_status[0])
