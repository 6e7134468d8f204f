"""Qwen family end-to-end through the encode pipeline and trainer."""

import os

import numpy as np
import pytest

from mllm_sparse_retrieval_tpu.configs import (
    ModelConfig, ModelFamily, SearchConfig, SparseConfig, TrainConfig)
from mllm_sparse_retrieval_tpu.data import CrossModalCorpus
from mllm_sparse_retrieval_tpu.data.karpathy import Example
from mllm_sparse_retrieval_tpu.index.dense import DenseFlatIndex
from mllm_sparse_retrieval_tpu.models import build_model
from mllm_sparse_retrieval_tpu.pipelines.encode import encode_examples
from mllm_sparse_retrieval_tpu.search.engine import run_search

DATA_ROOT = "/root/reference/data"
needs_data = pytest.mark.skipif(
    not os.path.isdir(DATA_ROOT), reason="reference data unavailable")


@pytest.fixture(scope="module")
def qwen_setup():
    corpus = CrossModalCorpus("flickr", "test", DATA_ROOT)
    caps = [corpus.text_dict[t] for t in corpus.text_id_list[:200]]
    cfg = ModelConfig(family=ModelFamily.TINY_QWEN_DEBUG, dtype="float32",
                      tiny_vocab_size=512, tiny_hidden_size=64,
                      tiny_num_layers=2, tiny_num_heads=4)
    params, arch, tok, template = build_model(cfg, captions=caps)
    return corpus, params, arch, tok, template


@needs_data
def test_qwen_encode_and_self_retrieval(qwen_setup):
    corpus, params, arch, tok, template = qwen_setup
    examples = corpus.examples_single()[:16]
    scfg = SparseConfig()
    res = encode_examples(examples, params, arch, tok, template,
                          encode_type="image", sparse_cfg=scfg, batch_size=8)
    assert res.dense.shape == (16, arch.text.hidden_size)
    np.testing.assert_allclose(np.linalg.norm(res.dense, axis=1), 1.0,
                               rtol=1e-5)
    index = DenseFlatIndex()
    index.add(res.dense, res.ids)
    out = run_search(examples, params, arch, tok, template,
                     query_type="image", sparse_cfg=scfg,
                     search_cfg=SearchConfig(depth=5),
                     dense_index=index, batch_size=8,
                     get_target=lambda qid: qid)
    assert out.dense_recall[1] == 1.0


@needs_data
def test_qwen_text_encode(qwen_setup):
    corpus, params, arch, tok, template = qwen_setup
    examples = corpus.examples_full()[:8]
    res = encode_examples(examples, params, arch, tok, template,
                          encode_type="text", sparse_cfg=SparseConfig(),
                          batch_size=8)
    assert len(res.sparse_vectors) == 8
    assert all(len(v) > 0 for v in res.sparse_vectors)


def test_qwen_train_step():
    caps = ["a red car on the road", "two dogs in the park",
            "a man rides a horse", "a bowl of ripe fruit",
            "kids play in sand", "a boat on the lake",
            "snow covers the street", "a bird on a wire"]
    cfg = ModelConfig(family=ModelFamily.TINY_QWEN_DEBUG, dtype="float32",
                      tiny_vocab_size=512, tiny_hidden_size=64,
                      tiny_num_layers=2, tiny_num_heads=4)
    params, arch, tok, template = build_model(cfg, captions=caps)
    examples = [Example(c, f"/nx/{k}.jpg", f"t{k}", f"i{k}")
                for k, c in enumerate(caps)]

    import jax
    from mllm_sparse_retrieval_tpu.models import lora as lora_lib
    from mllm_sparse_retrieval_tpu.train import ContrastiveTrainer
    from mllm_sparse_retrieval_tpu.train.trainer import make_collator

    adapters = lora_lib.init_lora(jax.random.PRNGKey(0), params, arch,
                                  rank=4, alpha=8)
    trainer = ContrastiveTrainer(params, arch, adapters,
                                 TrainConfig(learning_rate=1e-3,
                                             shard_optimizer_state=False))
    collate = make_collator(tok, template, arch)
    batch = collate(examples)
    assert batch.image_pos_ids is not None
    assert batch.image_pos_ids.shape[0] == 3
    l0 = trainer.train_on_batch(batch)
    l1 = trainer.train_on_batch(batch)
    assert np.isfinite(l0) and np.isfinite(l1)
    assert l1 < l0
