"""Multi-host (multi-process) initialization over DCN.

Single-pod-slice clipx needs nothing here — one process sees all local
chips and ICI collectives come from shardings alone. Past one host,
JAX's standard multi-process runtime applies: every host runs the same
program, `jax.distributed.initialize` wires them over DCN, and
`jax.devices()` becomes the global device list that
clipx.parallel.mesh builds meshes from (SURVEY.md section 5,
"distributed communication backend": XLA is the backend; no custom
transport layer is warranted).

On Cloud TPU pods the coordinator/process env vars are injected by the
platform and ``initialize()`` works with no arguments; explicit args are
for bring-your-own-cluster setups.
"""

from __future__ import annotations

from typing import Optional

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Idempotent jax.distributed.initialize wrapper."""
    global _initialized
    if _initialized:
        return
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes,
                      process_id=process_id)
    jax.distributed.initialize(**kwargs)
    _initialized = True


def is_multi_process() -> bool:
    import jax

    return jax.process_count() > 1


def process_local_batch(global_batch: int) -> int:
    """Rows this process contributes to a dp-sharded global batch."""
    import jax

    count = jax.process_count()
    if global_batch % count:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{count} processes")
    return global_batch // count
