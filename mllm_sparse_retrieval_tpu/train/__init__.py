"""Contrastive LoRA fine-tuning over a device mesh."""

from mllm_sparse_retrieval_tpu.train.contrastive import (
    info_nce_loss,
    sharded_info_nce_loss,
)
from mllm_sparse_retrieval_tpu.train.trainer import ContrastiveTrainer, TrainBatch

__all__ = ["info_nce_loss", "sharded_info_nce_loss", "ContrastiveTrainer",
           "TrainBatch"]
