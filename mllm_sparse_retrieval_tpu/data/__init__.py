"""Host-side data layer: Karpathy-split corpora, tokenization, collation."""

from mllm_sparse_retrieval_tpu.data.karpathy import CrossModalCorpus, Example
from mllm_sparse_retrieval_tpu.data.tokenization import (
    ENGLISH_STOPWORDS,
    caption_words,
    word_tokenize,
)

__all__ = [
    "CrossModalCorpus",
    "Example",
    "ENGLISH_STOPWORDS",
    "caption_words",
    "word_tokenize",
]
