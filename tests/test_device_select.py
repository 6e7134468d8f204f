"""Device-side term selection: parity with the host golden implementation."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from mllm_sparse_retrieval_tpu.configs import (
    ModelConfig, ModelFamily, SparseConfig)
from mllm_sparse_retrieval_tpu.ops.select import (
    candidate_topk, pad_candidates, vocab_topk)
from mllm_sparse_retrieval_tpu.sparse.term_selection import _topk

DATA_ROOT = "/root/reference/data"
needs_data = pytest.mark.skipif(
    not os.path.isdir(DATA_ROOT), reason="reference data unavailable")


def test_vocab_topk_matches_host():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, 300)).astype(np.float32)
    vals, ids = vocab_topk(jnp.asarray(logits), 16)
    for b in range(4):
        hv, hi = _topk(logits[b], 16)
        np.testing.assert_array_equal(np.asarray(ids[b]), hi)
        np.testing.assert_allclose(np.asarray(vals[b]), hv, rtol=1e-6)


def test_vocab_topk_tie_breaking():
    logits = np.zeros((1, 64), np.float32)
    logits[0, [5, 9, 30]] = 1.0   # three-way tie
    vals, ids = vocab_topk(jnp.asarray(logits), 3)
    np.testing.assert_array_equal(np.asarray(ids[0]), [5, 9, 30])


def test_candidate_topk_matches_host_restriction():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(3, 200)).astype(np.float32)
    rows = [np.sort(rng.choice(200, size=n, replace=False)).astype(np.int32)
            for n in (5, 37, 0)]
    ids, mask = pad_candidates(rows)
    vals, sel_ids, counts = candidate_topk(
        jnp.asarray(logits), jnp.asarray(ids), jnp.asarray(mask), 128)
    np.testing.assert_array_equal(np.asarray(counts), [5, 37, 0])
    for b, cands in enumerate(rows):
        if len(cands) == 0:
            continue
        k = min(len(cands), 128)
        hv, hpos = _topk(logits[b][cands], k)
        np.testing.assert_array_equal(np.asarray(sel_ids[b])[:k], cands[hpos])
        np.testing.assert_allclose(np.asarray(vals[b])[:k], hv, rtol=1e-6)


@needs_data
@pytest.mark.parametrize("encode_type", ["text", "image"])
@pytest.mark.parametrize("manual", [False, True])
def test_pipeline_device_select_parity(encode_type, manual):
    """encode_examples(device_select=True) == host path, term for term."""
    from mllm_sparse_retrieval_tpu.data import CrossModalCorpus
    from mllm_sparse_retrieval_tpu.models import build_model
    from mllm_sparse_retrieval_tpu.pipelines.encode import encode_examples

    corpus = CrossModalCorpus("flickr", "test", DATA_ROOT)
    caps = [corpus.text_dict[t] for t in corpus.text_id_list[:300]]
    params, arch, tok, template = build_model(
        ModelConfig(family=ModelFamily.TINY_DEBUG, dtype="float32"),
        captions=caps)
    examples = (corpus.examples_full()[:12] if encode_type == "text"
                else corpus.examples_single()[:12])
    scfg = SparseConfig(sparse_manual=manual, sparse_length=32)

    dev = encode_examples(examples, params, arch, tok, template,
                          encode_type=encode_type, sparse_cfg=scfg,
                          batch_size=4, device_select=True)
    host = encode_examples(examples, params, arch, tok, template,
                           encode_type=encode_type, sparse_cfg=scfg,
                           batch_size=4, device_select=False)
    assert dev.ids == host.ids
    assert dev.sparse_vectors == host.sparse_vectors
    np.testing.assert_allclose(dev.dense, host.dense, rtol=1e-6)
    # query-form artifacts (is_query=True builds query_weights instead)
    devq = encode_examples(examples[:4], params, arch, tok, template,
                           encode_type=encode_type, sparse_cfg=scfg,
                           batch_size=4, device_select=True, is_query=True)
    hostq = encode_examples(examples[:4], params, arch, tok, template,
                            encode_type=encode_type, sparse_cfg=scfg,
                            batch_size=4, device_select=False, is_query=True)
    assert devq.query_weights == hostq.query_weights
    assert devq.sparse_vectors == [] and devq.query_weights


@needs_data
def test_expansion_device_path_matches_host_golden():
    """num_expanded_tokens > 0 runs on device (filtered_topk + host
    exclusion) and must reproduce the host golden path bit-for-bit, for
    both modalities."""
    from mllm_sparse_retrieval_tpu.data import CrossModalCorpus
    from mllm_sparse_retrieval_tpu.models import build_model
    from mllm_sparse_retrieval_tpu.pipelines.encode import encode_examples

    corpus = CrossModalCorpus("flickr", "test", DATA_ROOT)
    caps = [corpus.text_dict[t] for t in corpus.text_id_list[:100]]
    params, arch, tok, template = build_model(
        ModelConfig(family=ModelFamily.TINY_DEBUG, dtype="float32"),
        captions=caps)
    scfg = SparseConfig(num_expanded_tokens=4)
    for encode_type, examples in (
        ("text", corpus.examples_full()[:6]),
        ("image", corpus.examples_single()[:6]),
    ):
        dev = encode_examples(examples, params, arch, tok, template,
                              encode_type=encode_type, sparse_cfg=scfg,
                              batch_size=3, device_select=True)
        host = encode_examples(examples, params, arch, tok, template,
                               encode_type=encode_type, sparse_cfg=scfg,
                               batch_size=3, device_select=False)
        assert dev.sparse_vectors == host.sparse_vectors, encode_type
        # expansion actually added terms beyond the base selection
        base = encode_examples(examples, params, arch, tok, template,
                               encode_type=encode_type,
                               sparse_cfg=SparseConfig(),
                               batch_size=3, device_select=True)
        assert any(len(a) > len(b) for a, b in
                   zip(dev.sparse_vectors, base.sparse_vectors)), encode_type


@needs_data
def test_manual_mode_stopword_caption_fallback_parity():
    """sparse_manual with sparse_length < fallback_top_k and an all-stopword
    caption: the fallback must still emit fallback_top_k full-vocab terms on
    the device path (review finding: the device batch truncated to
    sparse_length)."""
    from mllm_sparse_retrieval_tpu.data import CrossModalCorpus
    from mllm_sparse_retrieval_tpu.data.karpathy import Example
    from mllm_sparse_retrieval_tpu.models import build_model
    from mllm_sparse_retrieval_tpu.pipelines.encode import encode_examples

    corpus = CrossModalCorpus("flickr", "test", DATA_ROOT)
    caps = [corpus.text_dict[t] for t in corpus.text_id_list[:100]]
    params, arch, tok, template = build_model(
        ModelConfig(family=ModelFamily.TINY_DEBUG, dtype="float32"),
        captions=caps)
    scfg = SparseConfig(sparse_manual=True, sparse_length=5, fallback_top_k=10)
    examples = [
        Example("and the of a", "/none.jpg", "t0", "i0"),  # all stopwords
        Example(caps[0], "/none.jpg", "t1", "i1"),
    ]
    dev = encode_examples(examples, params, arch, tok, template,
                          encode_type="text", sparse_cfg=scfg,
                          batch_size=2, device_select=True)
    host = encode_examples(examples, params, arch, tok, template,
                           encode_type="text", sparse_cfg=scfg,
                           batch_size=2, device_select=False)
    assert dev.sparse_vectors == host.sparse_vectors
    assert len(dev.sparse_vectors[1]) <= 5  # manual rows keep sparse_length
