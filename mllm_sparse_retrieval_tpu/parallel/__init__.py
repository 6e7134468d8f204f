"""Device-mesh construction, sharding specs, and collective helpers."""

from mllm_sparse_retrieval_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    shard_batch,
)

__all__ = ["DATA_AXIS", "MODEL_AXIS", "make_mesh", "shard_batch"]
