"""Multi-host initialization helpers.

Parity note: the reference launches TP as `mpirun -np N` processes with
MPI/oneCCL rendezvous (docs/tensor_parallelism.md, parallel_context.cpp).
On TPU pods the launcher is `jax.distributed` — one process per host, ICI
collectives inside a slice, DCN across slices; the same NamedShardings
from parallel/tp.py then span all hosts.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> int:
    """Initialize jax.distributed from args or the standard env
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID, or TPU metadata
    auto-detection when no args are given).  Returns the process index.
    Safe to call on a single host (no-op)."""
    num = num_processes or int(os.environ.get("NUM_PROCESSES", "1") or 1)
    if num <= 1 and coordinator_address is None:
        return 0
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("COORDINATOR_ADDRESS"),
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index()


def global_mesh(tp: Optional[int] = None, dp: Optional[int] = None):
    """Build a ('dp','tp') mesh over ALL devices of all hosts (parity: the
    MPI world becomes the mesh; see parallel/tp.py make_mesh for the
    single-host variant)."""
    from .tp import make_mesh

    n = jax.device_count()
    tp = tp or n
    dp = dp or (n // tp)
    return make_mesh(tp=tp, dp=dp)
