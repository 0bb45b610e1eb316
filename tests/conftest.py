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
