"""Online query encoding in the serving layer.

Contract: a text query POSTed to the server must retrieve exactly what the
offline engine retrieves for the same caption — the serving encoder is the
SAME program factory + resolve helper as the offline pipeline
(pipelines.encode.make_text_ds_encode / resolve_text_ds_rows), compiled
once at a fixed shape, so terms and dense reps must match
``encode_examples`` bit-for-bit (padding adds masked tokens only; every
reduction a query token sees is unchanged).
"""

import json
import os
import threading
import urllib.request

import numpy as np
import pytest

from mllm_sparse_retrieval_tpu.configs import (
    ModelConfig, ModelFamily, SearchConfig, SparseConfig)
from mllm_sparse_retrieval_tpu.data import CrossModalCorpus
from mllm_sparse_retrieval_tpu.index.dense import DenseFlatIndex
from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex
from mllm_sparse_retrieval_tpu.models import build_model
from mllm_sparse_retrieval_tpu.pipelines.encode import encode_examples
from mllm_sparse_retrieval_tpu.search.engine import run_search
from mllm_sparse_retrieval_tpu.serving import (
    OnlineQueryEncoder, RetrievalService)
from mllm_sparse_retrieval_tpu.serving.http import make_server
from mllm_sparse_retrieval_tpu.sparse import canonical_id_map

DATA_ROOT = "/root/reference/data"
needs_data = pytest.mark.skipif(
    not os.path.isdir(DATA_ROOT), reason="reference data unavailable")

N_CORPUS = 40
N_QUERY = 10


@pytest.fixture(scope="module")
def setup():
    corpus = CrossModalCorpus("flickr", "test", DATA_ROOT)
    caps = [corpus.text_dict[t] for t in corpus.text_id_list[:400]]
    cfg = ModelConfig(family=ModelFamily.TINY_DEBUG, dtype="float32",
                      tiny_vocab_size=1024, tiny_hidden_size=64,
                      tiny_num_layers=2, tiny_num_heads=4,
                      tiny_image_size=32, tiny_patch_size=16)
    params, arch, tok, template = build_model(cfg, captions=caps)
    scfg = SparseConfig()
    examples = corpus.examples_full()[:N_CORPUS]

    res = encode_examples(examples, params, arch, tok, template,
                          encode_type="text", sparse_cfg=scfg, batch_size=8)
    cmap = canonical_id_map(tok.get_vocab(), scfg.is_filtered)
    impact = ImpactIndex.from_selected_terms(res.ids, res.selected_terms,
                                             canonical_map=cmap)
    assert impact.query_canonical and impact.int_keyed
    dense = DenseFlatIndex()
    dense.add(res.dense, res.ids)
    return corpus, params, arch, tok, template, scfg, examples, impact, dense


@needs_data
def test_online_encoder_matches_offline_pipeline(setup):
    _, params, arch, tok, template, scfg, examples, _, _ = setup
    queries = examples[:N_QUERY]
    off = encode_examples(queries, params, arch, tok, template,
                          encode_type="text", sparse_cfg=scfg,
                          batch_size=8, is_query=True)
    enc = OnlineQueryEncoder(params, arch, tok, template, scfg,
                             max_text_len=64)
    dense, terms = enc.encode_texts([ex.text for ex in queries], pad_to=16)
    assert dense.shape == (N_QUERY, arch.text.hidden_size)
    np.testing.assert_allclose(dense, off.dense, rtol=1e-5, atol=1e-6)
    for got, ref in zip(terms, off.selected_terms):
        np.testing.assert_array_equal(got.token_ids, ref.token_ids)
        np.testing.assert_array_equal(got.weights, ref.weights)


@needs_data
def test_online_encoder_matches_with_expansion(setup):
    """Expansion config (num_expanded_tokens > 0) compiles the filtered-
    top-k block in; expansion terms must match the offline golden path."""
    _, params, arch, tok, template, _, examples, _, _ = setup
    scfg = SparseConfig(num_expanded_tokens=5)
    queries = examples[:6]
    off = encode_examples(queries, params, arch, tok, template,
                          encode_type="text", sparse_cfg=scfg,
                          batch_size=6, is_query=True)
    enc = OnlineQueryEncoder(params, arch, tok, template, scfg,
                             max_text_len=64)
    _, terms = enc.encode_texts([ex.text for ex in queries], pad_to=8)
    for got, ref in zip(terms, off.selected_terms):
        np.testing.assert_array_equal(got.token_ids, ref.token_ids)
        np.testing.assert_array_equal(got.weights, ref.weights)


@needs_data
def test_text_search_matches_offline_engine(setup):
    """Text queries through the micro-batched service == run_search's
    device-fused hybrid on the same captions (score,id sets per query)."""
    _, params, arch, tok, template, scfg, examples, impact, dense = setup
    queries = examples[:N_QUERY]
    depth = 10

    ref = run_search(
        queries, params, arch, tok, template, query_type="text",
        sparse_cfg=scfg, search_cfg=SearchConfig(depth=depth, alpha=0.5),
        dense_index=dense, impact_index=impact, batch_size=8,
        fusion_mode="device")

    enc = OnlineQueryEncoder(params, arch, tok, template, scfg,
                             max_text_len=64)
    svc = RetrievalService(dense, impact, alpha=0.5, depth_levels=(depth,),
                           default_depth=depth, max_batch=8,
                           max_wait_ms=20.0, query_encoder=enc)
    try:
        futs = [svc.search_async(text=ex.text) for ex in queries]
        got = [f.result(120) for f in futs]
    finally:
        svc.close()

    for ex, row in zip(queries, got):
        ref_row = ref.fusion_run[str(ex.text_id)]
        assert {(d, round(float(s), 4)) for d, s in row} == \
               {(d, round(float(s), 4)) for d, s in ref_row.items()}


@needs_data
def test_text_sparse_only_matches_search_terms(setup):
    """Sparse-only text serving == ImpactIndex.search_terms with the
    canonical map (the id-keyed engine fast path)."""
    _, params, arch, tok, template, scfg, examples, impact, _ = setup
    queries = examples[:6]
    enc = OnlineQueryEncoder(params, arch, tok, template, scfg,
                             max_text_len=64)
    _, terms = enc.encode_texts([ex.text for ex in queries])
    cmap = canonical_id_map(tok.get_vocab(), scfg.is_filtered)
    ref_s, ref_i = impact.search_terms(terms, 10, canonical_map=cmap)

    svc = RetrievalService(impact_index=impact, depth_levels=(10,),
                           max_batch=8, max_wait_ms=20.0,
                           query_encoder=enc)
    try:
        got = [svc.search(text=ex.text, depth=10) for ex in queries]
    finally:
        svc.close()
    for row, s, i in zip(got, ref_s, ref_i):
        assert {(d, round(float(sc), 4)) for d, sc in row} == \
               {(d, round(float(sc), 4)) for d, sc in zip(i, s)}


@needs_data
def test_text_validation(setup):
    _, params, arch, tok, template, scfg, examples, impact, dense = setup
    svc = RetrievalService(dense, impact, depth_levels=(10,), max_batch=2,
                           max_wait_ms=1.0)
    try:
        with pytest.raises(ValueError, match="query_encoder"):
            svc.search(text="hello")
    finally:
        svc.close()
    enc = OnlineQueryEncoder(params, arch, tok, template, scfg)
    svc = RetrievalService(dense, impact, depth_levels=(10,), max_batch=2,
                           max_wait_ms=1.0, query_encoder=enc)
    try:
        with pytest.raises(ValueError, match="not both"):
            svc.search(text="hello", terms={1: 1.0})
        with pytest.raises(ValueError, match="non-empty"):
            svc.search(text="   ")
    finally:
        svc.close()


@needs_data
def test_http_text_query(setup):
    _, params, arch, tok, template, scfg, examples, impact, dense = setup
    enc = OnlineQueryEncoder(params, arch, tok, template, scfg,
                             max_text_len=64)
    svc = RetrievalService(dense, impact, alpha=0.5, depth_levels=(10,),
                           max_batch=4, max_wait_ms=10.0,
                           query_encoder=enc)
    server = make_server(svc, port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = "http://127.0.0.1:%d" % server.server_address[1]
    try:
        payload = {"queries": [{"text": ex.text, "depth": 10}
                               for ex in examples[:3]]}
        req = urllib.request.Request(
            base + "/search", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as resp:
            body = json.loads(resp.read())
        assert len(body["results"]) == 3
        # self-retrieval: corpus was built from these very captions' text
        # encodings, so the fused top-1 must be the caption itself
        for ex, row in zip(examples[:3], body["results"]):
            assert row[0][0] == str(ex.text_id)
    finally:
        server.shutdown()
        server.server_close()
        svc.close()


# ---- image queries ------------------------------------------------------------


@needs_data
def test_online_image_encoder_matches_offline_fixed_spec(setup):
    """Fixed-spec family (tiny_debug square ViT): encode_images must match
    encode_examples(encode_type='image') bit-for-bit when fed the same raw
    pixels."""
    from mllm_sparse_retrieval_tpu.models.api import image_input_spec
    from mllm_sparse_retrieval_tpu.pipelines.encode import CLIP_MEAN, CLIP_STD

    _, params, arch, tok, template, scfg, examples, _, _ = setup
    spec = image_input_spec(arch)
    assert not spec.variable
    s = spec.image_size
    rng = np.random.default_rng(11)
    raws = [rng.uniform(size=(s, s, 3)).astype(np.float32) for _ in range(5)]

    # key by text_id: examples_full has 5 captions per IMAGE, so img_id
    # repeats across the first examples and would collapse distinct raws
    by_ex = {ex.text_id: raw for ex, raw in zip(examples[:5], raws)}
    off = encode_examples(
        examples[:5], params, arch, tok, template, encode_type="image",
        sparse_cfg=scfg, batch_size=5, is_query=True,
        pixel_loader=lambda ex: spec.preprocess(
            (by_ex[ex.text_id] - CLIP_MEAN) / CLIP_STD))

    enc = OnlineQueryEncoder(params, arch, tok, template, scfg)
    dense, terms = enc.encode_images(raws, pad_to=8)
    np.testing.assert_allclose(dense, off.dense, rtol=1e-5, atol=1e-6)
    for got, ref in zip(terms, off.selected_terms):
        np.testing.assert_array_equal(got.token_ids, ref.token_ids)
        np.testing.assert_array_equal(got.weights, ref.weights)


def test_online_image_encoder_variable_spec_anyres():
    """Variable-spec family (tiny LLaVA-NeXT anyres): the lazy image
    program handles per-image grids at one compiled shape; parity vs the
    offline pipeline on the same raw images."""
    import jax

    from mllm_sparse_retrieval_tpu.data.karpathy import Example
    from mllm_sparse_retrieval_tpu.models import mllm, templates
    from mllm_sparse_retrieval_tpu.models.llama import LlamaConfig
    from mllm_sparse_retrieval_tpu.models.mllm import MLLMConfig
    from mllm_sparse_retrieval_tpu.models.tokenizer import (
        WordPieceLiteTokenizer)
    from mllm_sparse_retrieval_tpu.models.vit import ViTConfig

    caps = ["a dog runs on grass", "a cat sits on a mat",
            "two people ride bikes", "a red bus in the city"]
    tok = WordPieceLiteTokenizer.from_corpus_captions(caps, vocab_size=96)
    arch = MLLMConfig(
        vision=ViTConfig(image_size=28, patch_size=14, hidden_size=32,
                         num_layers=2, num_heads=4, feature_layer=-2),
        text=LlamaConfig(vocab_size=128, hidden_size=32, num_layers=2,
                         num_heads=4, num_kv_heads=2, intermediate_size=128,
                         rope_theta=10000.0),
        image_token_id=4,
        grid_pinpoints=((28, 56), (56, 28), (56, 56)),
    )
    params = mllm.init_params(jax.random.PRNGKey(0), arch)
    scfg = SparseConfig()

    rng = np.random.default_rng(3)
    sizes = [(64, 64), (40, 120), (64, 64), (120, 40)]
    raws = [rng.uniform(size=s + (3,)).astype(np.float32) for s in sizes]
    examples = [Example(text=caps[i % 4], image_path=f"/nonexistent/{i}.jpg",
                        text_id=f"t{i}", img_id=f"i{i}")
                for i in range(len(raws))]
    by_img = {ex.img_id: raw for ex, raw in zip(examples, raws)}
    off = encode_examples(examples, params, arch, tok, templates.TINY,
                          encode_type="image", sparse_cfg=scfg,
                          batch_size=4, is_query=True,
                          pixel_loader=lambda ex: by_img[ex.img_id])

    enc = OnlineQueryEncoder(params, arch, tok, templates.TINY, scfg)
    dense, terms = enc.encode_images(raws, pad_to=4)
    np.testing.assert_allclose(dense, off.dense, rtol=1e-5, atol=1e-6)
    for got, ref in zip(terms, off.selected_terms):
        np.testing.assert_array_equal(got.token_ids, ref.token_ids)
        np.testing.assert_array_equal(got.weights, ref.weights)


@needs_data
def test_http_image_query_b64(setup):
    """image_b64 queries decode, encode, and search; malformed b64 -> 400."""
    import base64
    import io
    import urllib.error

    from PIL import Image

    _, params, arch, tok, template, scfg, examples, impact, dense = setup
    enc = OnlineQueryEncoder(params, arch, tok, template, scfg)
    svc = RetrievalService(dense, impact, alpha=0.5, depth_levels=(10,),
                           max_batch=4, max_wait_ms=10.0,
                           query_encoder=enc)
    server = make_server(svc, port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = "http://127.0.0.1:%d" % server.server_address[1]
    try:
        rng = np.random.default_rng(5)
        img = Image.fromarray(
            (rng.uniform(size=(48, 48, 3)) * 255).astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        b64 = base64.b64encode(buf.getvalue()).decode()
        req = urllib.request.Request(
            base + "/search",
            data=json.dumps({"image_b64": b64, "depth": 10}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as resp:
            body = json.loads(resp.read())
        assert len(body["results"]) == 1 and len(body["results"][0]) > 0

        bad = urllib.request.Request(
            base + "/search",
            data=json.dumps({"image_b64": "!!!not-b64!!!"}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(bad, timeout=30)
        assert e.value.code == 400
    finally:
        server.shutdown()
        server.server_close()
        svc.close()
