"""End-to-end pipelines: offline corpus encoding, live search + evaluation."""

from mllm_sparse_retrieval_tpu.pipelines.encode import (
    EncodeResult,
    encode_examples,
    write_artifacts,
)

__all__ = ["EncodeResult", "encode_examples", "write_artifacts"]
