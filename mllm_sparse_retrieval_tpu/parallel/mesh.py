"""Device mesh construction and sharding helpers.

The TPU-native replacement for the reference's NCCL process groups
(/root/reference/src/train.py:41-57, src/encode.py:178-188): one Python
process drives all local chips through a ``jax.sharding.Mesh``; collectives
ride ICI via XLA (``psum``/``all_gather`` inside ``shard_map``/``jit``),
multi-host extension via ``jax.distributed.initialize`` + the same mesh over
DCN. There is no rank bookkeeping anywhere downstream — shardings carry it.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data_parallel: int = -1,
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2-D ``(data, model)`` mesh over the available devices.

    ``data_parallel=-1`` consumes all devices not taken by ``model_parallel``.
    On a single chip this degenerates to a 1×1 mesh and every sharded program
    still compiles (XLA elides the collectives).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if model_parallel <= 0:
        raise ValueError("model_parallel must be >= 1")
    if data_parallel == -1:
        if n % model_parallel != 0:
            raise ValueError(
                f"{n} devices not divisible by model_parallel={model_parallel}")
        data_parallel = n // model_parallel
    if data_parallel * model_parallel != n:
        raise ValueError(
            f"data_parallel*model_parallel = {data_parallel * model_parallel} "
            f"!= {n} devices")
    dev_array = np.asarray(devices).reshape(data_parallel, model_parallel)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def shard_batch(mesh: Mesh, array, axis: int = 0):
    """Place a host array on the mesh, sharded along the data axis.

    The batch dimension must be divisible by the data-axis size — callers pad
    with repeated samples (ids travel with vectors, so duplicates are benign,
    matching the reference's DistributedSampler padding tolerance,
    /root/reference/src/encode.py:276-278).
    """
    spec = [None] * np.ndim(array)
    spec[axis] = DATA_AXIS
    sharding = NamedSharding(mesh, P(*spec))
    return jax.device_put(array, sharding)


def replicated(mesh: Mesh, array):
    """Place a host array on the mesh fully replicated."""
    return jax.device_put(array, NamedSharding(mesh, P()))
