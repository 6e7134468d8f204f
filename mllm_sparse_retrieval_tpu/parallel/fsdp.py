"""FSDP-style parameter sharding over the data axis (ZeRO-3 equivalent).

The reference reaches 7–8B-parameter training through DeepSpeed ZeRO-3
(``ds_configs/zero3.json``: parameter partitioning over data-parallel ranks
with gather-on-use). The GSPMD expression of the same idea: give every large
parameter leaf a ``NamedSharding`` that splits its largest divisible
dimension over the ``data`` mesh axis. XLA inserts the all-gathers where a
layer consumes its weight and the reduce-scatters on the gradient path —
no runtime partitioner, no parameter-server bookkeeping.

Composes with the ``model`` axis (tensor parallel, parallel/tp.py): TP leaves
already sharded over ``model`` stay sharded there; FSDP picks a *different*
dimension for the data axis when one is divisible.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mllm_sparse_retrieval_tpu.parallel.mesh import DATA_AXIS

# leaves smaller than this stay replicated (sharding tiny tensors costs more
# in collective latency than it saves in HBM)
MIN_SHARD_SIZE = 2 ** 14


def fsdp_shardings(tree, mesh: Mesh, min_size: int = MIN_SHARD_SIZE):
    """Per-leaf shardings: largest data-axis-divisible dim sharded, rest
    replicated. Leaves carrying an existing PartitionSpec (jax.Arrays placed
    by TP) keep their model-axis placement and gain the data axis on another
    dim when possible."""
    n = mesh.shape[DATA_AXIS]

    def leaf_sharding(x):
        shape = getattr(x, "shape", ())
        ndim = len(shape)
        size = int(np.prod(shape)) if ndim else 0
        existing = [None] * ndim
        sh = getattr(x, "sharding", None)
        if isinstance(sh, NamedSharding) and len(sh.spec) <= ndim:
            existing = list(sh.spec) + [None] * (ndim - len(sh.spec))
        def as_spec(entries):
            return P(*entries) if any(e is not None for e in entries) else P()

        used = {a for e in existing if e is not None
                for a in (e if isinstance(e, tuple) else (e,))}
        if ndim == 0 or size < min_size or n <= 1 or DATA_AXIS in used:
            return NamedSharding(mesh, as_spec(existing))
        for d in sorted(range(ndim), key=lambda d: -shape[d]):
            if existing[d] is None and shape[d] % n == 0:
                spec = list(existing)
                spec[d] = DATA_AXIS
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, as_spec(existing))

    return jax.tree_util.tree_map(leaf_sharding, tree)


def shard_params_fsdp(params, mesh: Mesh,
                      min_size: int = MIN_SHARD_SIZE):
    """Place a param tree on the mesh FSDP-sharded over the data axis."""
    return jax.device_put(params, fsdp_shardings(params, mesh, min_size))


def assert_fsdp_sharded(params, mesh: Mesh,
                        min_size: int = MIN_SHARD_SIZE) -> int:
    """Test helper: verify every large leaf that fsdp_shardings WOULD shard
    actually carries a data-axis sharding; returns the count of sharded
    leaves. Leaves whose only data-divisible dims are occupied by other mesh
    axes (TP) are legitimately skipped and not asserted."""
    n = mesh.shape[DATA_AXIS]
    count = 0
    for path, x in jax.tree_util.tree_flatten_with_path(params)[0]:
        size = int(np.prod(x.shape)) if x.ndim else 0
        if size < min_size or n <= 1:
            continue
        spec = tuple(x.sharding.spec) if isinstance(x.sharding,
                                                    NamedSharding) else ()
        spec = spec + (None,) * (x.ndim - len(spec))
        axes_used = {a for e in spec if e is not None
                     for a in (e if isinstance(e, tuple) else (e,))}
        if DATA_AXIS in axes_used:
            count += 1
            continue
        # shardable = some dim is data-divisible AND not taken by another axis
        shardable = any(s % n == 0 and spec[d] is None
                        for d, s in enumerate(x.shape))
        assert not shardable, (
            f"leaf {jax.tree_util.keystr(path)} {x.shape} has a free "
            f"data-divisible dim but no data-axis sharding: {spec}")
    return count
