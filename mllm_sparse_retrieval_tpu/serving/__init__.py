"""Online serving: micro-batching retrieval service + HTTP front end.

The reference repo serves retrieval only as offline batch scripts
(/root/reference/src/search.py runs a dataset through the index and exits);
this package is the deployment surface the runbook (docs/SERVING.md)
deploys — a transport-free :class:`RetrievalService` that coalesces
concurrent single queries into device-sized batches (the TPU wants large
static-shape programs; a per-request dispatch would waste the MXU and pay
the relay round trip per query), and a stdlib HTTP server in front of it.
"""

from mllm_sparse_retrieval_tpu.serving.batcher import MicroBatcher
from mllm_sparse_retrieval_tpu.serving.encoder import OnlineQueryEncoder
from mllm_sparse_retrieval_tpu.serving.service import (
    QueryRequest,
    RetrievalService,
)

__all__ = ["MicroBatcher", "OnlineQueryEncoder", "QueryRequest",
           "RetrievalService"]
