"""Multi-host (DCN) initialization.

The reference reads ``WORLD_SIZE``/``LOCAL_RANK`` from the deepspeed launcher
and builds NCCL process groups in every entry point
(/root/reference/src/train.py:41-57). The JAX equivalent is a single call per
host process; afterwards ``jax.devices()`` spans the whole slice and every
mesh built by ``parallel.mesh.make_mesh`` covers it — shardings, not ranks,
express the distribution. Collectives between hosts ride DCN, within a host
ICI, chosen by XLA from the mesh layout.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running multi-host; no-op otherwise.

    Arguments default to the standard JAX env vars
    (``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``) or
    TPU pod metadata autodetection. Returns True when distributed mode was
    initialized.
    """
    import jax

    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if num_processes is not None and num_processes <= 1:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except (ValueError, RuntimeError):
        # single-process / already initialized / no coordinator configured
        return False


def is_primary_host() -> bool:
    import jax

    return jax.process_index() == 0
