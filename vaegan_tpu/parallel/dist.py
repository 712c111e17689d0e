"""Multi-host bootstrap over DCN.

For pod-scale runs spanning hosts, ``initialize()`` wraps
``jax.distributed.initialize`` (the framework's entire communication backend is
XLA collectives: ICI within a slice, DCN across hosts — no NCCL/MPI, SURVEY.md §2.4).
Single-host runs need not call this.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def is_multihost() -> bool:
    import jax

    return jax.process_count() > 1
