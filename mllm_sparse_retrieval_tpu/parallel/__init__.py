"""Device-mesh construction, sharding specs, and collective helpers."""

from mllm_sparse_retrieval_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    shard_batch,
)
from mllm_sparse_retrieval_tpu.parallel.ep import (
    MoEConfig,
    moe_ffn,
    shard_moe_params,
)
from mllm_sparse_retrieval_tpu.parallel.pp import (
    PIPE_AXIS,
    make_pp3_mesh,
    make_pp_mesh,
)
from mllm_sparse_retrieval_tpu.parallel.sp import (
    apply_sequence_parallel,
    ring_attention,
)

__all__ = ["DATA_AXIS", "MODEL_AXIS", "MoEConfig", "PIPE_AXIS",
           "apply_sequence_parallel", "make_mesh", "make_pp3_mesh",
           "make_pp_mesh", "moe_ffn", "ring_attention", "shard_batch",
           "shard_moe_params"]
