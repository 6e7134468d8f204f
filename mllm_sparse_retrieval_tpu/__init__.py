"""mllm_sparse_retrieval_tpu — TPU-native cross-modal dense+sparse retrieval with MLLMs.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of
``cjc20000323/mllm_sparse_retrieval`` (PromptReps-style prompting of multimodal
LLMs for joint dense + SPLADE-style sparse retrieval representations), built
for TPU hardware:

- ``data``     — Karpathy-split COCO/Flickr CSV corpora, ground-truth maps,
                 host-side caption tokenization (vendored Treebank/stopwords).
- ``models``   — functional JAX MLLM encoders (vision tower + projector +
                 decoder LM), prompt templates, LoRA, representation heads.
- ``ops``      — Pallas TPU kernels + XLA compute paths (tiled MIPS, top-k,
                 impact scoring, quantization).
- ``sparse``   — SPLADE-style term selection / quantization / expansion.
- ``index``    — sharded dense flat MIPS index; HBM-resident impact-ordered
                 CSR inverted index (+ optional C++ host builder).
- ``search``   — batched query engines, min-max score fusion, TREC run IO.
- ``train``    — contrastive LoRA fine-tuning with differentiable global
                 negatives over a device mesh, sharded optimizer state.
- ``eval``     — recall@k metrics and diagnostics/statistics tools.
- ``parallel`` — mesh construction, sharding specs, collective helpers.

The reference implementation is CUDA/Torch/Lucene; every component here is a
TPU-first re-design (see SURVEY.md at the repo root for the capability map).
"""

__version__ = "0.1.0"
