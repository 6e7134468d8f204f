"""Command-line entry points (the L8 orchestration layer).

One process drives all chips; there is no launcher wrapper to configure
(the reference needs ``deepspeed --num_gpus=N`` + NCCL env,
/root/reference/scripts/*.sh). Each CLI maps 1:1 to a reference entry point:

- ``python -m mllm_sparse_retrieval_tpu.cli.encode``  ≈ src/encode.py
- ``python -m mllm_sparse_retrieval_tpu.cli.index``   ≈ scripts/sparse_index.sh
- ``python -m mllm_sparse_retrieval_tpu.cli.search``  ≈ src/search.py
- ``python -m mllm_sparse_retrieval_tpu.cli.train``   ≈ src/train.py
- ``python -m mllm_sparse_retrieval_tpu.cli.stats``   ≈ src/sparse_statistic.py
                                                        + src/score_statistic.py
"""
