"""End-to-end slice (SURVEY.md §7.3): encode → index → search → recall,
tiny model × real Flickr captions × synthetic pixels, on the 8-device mesh.

With random weights cross-modal recall is chance; the deterministic pipeline
invariant is *self-retrieval*: using the same modality as corpus and queries,
each item's normalized dense vector scores 1.0 against itself, so dense
recall@1 with self-targets must be 1.0, and sparse self-retrieval must beat
chance by a wide margin. Artifact round-trips (pkl/jsonl/tsv) are also
exercised.
"""

import os

import numpy as np
import pytest

from mllm_sparse_retrieval_tpu.configs import (
    ModelConfig, ModelFamily, SearchConfig, SparseConfig)
from mllm_sparse_retrieval_tpu.data import CrossModalCorpus
from mllm_sparse_retrieval_tpu.eval import recall_at_k
from mllm_sparse_retrieval_tpu.index.dense import DenseFlatIndex
from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex
from mllm_sparse_retrieval_tpu.models import build_model
from mllm_sparse_retrieval_tpu.parallel import make_mesh
from mllm_sparse_retrieval_tpu.pipelines.encode import (
    encode_examples, read_query_tsv, write_artifacts)
from mllm_sparse_retrieval_tpu.search.engine import run_search

DATA_ROOT = "/root/reference/data"
needs_data = pytest.mark.skipif(
    not os.path.isdir(DATA_ROOT), reason="reference data unavailable")


@pytest.fixture(scope="module")
def setup():
    corpus = CrossModalCorpus("flickr", "test", DATA_ROOT)
    caps = [corpus.text_dict[t] for t in corpus.text_id_list[:500]]
    cfg = ModelConfig(family=ModelFamily.TINY_DEBUG, dtype="float32",
                      tiny_vocab_size=1024, tiny_hidden_size=64,
                      tiny_num_layers=2, tiny_num_heads=4,
                      tiny_image_size=32, tiny_patch_size=16)
    params, arch, tok, template = build_model(cfg, captions=caps)
    return corpus, params, arch, tok, template


@needs_data
def test_text_encode_artifacts_roundtrip(setup, tmp_path):
    corpus, params, arch, tok, template = setup
    examples = corpus.examples_full()[:24]
    scfg = SparseConfig()
    res = encode_examples(examples, params, arch, tok, template,
                          encode_type="text", sparse_cfg=scfg, batch_size=8)
    assert res.dense.shape == (24, arch.text.hidden_size)
    np.testing.assert_allclose(np.linalg.norm(res.dense, axis=1), 1.0,
                               rtol=1e-5)
    assert len(res.sparse_vectors) == 24
    assert all(len(v) > 0 for v in res.sparse_vectors)

    # corpus artifacts
    write_artifacts(res, str(tmp_path / "dense"), str(tmp_path / "sparse"))
    idx = DenseFlatIndex.load(str(tmp_path / "dense"))
    assert idx.size == 24
    imp = ImpactIndex.from_jsonl([str(tmp_path / "sparse" / "corpus_0.jsonl")])
    assert imp.num_docs == 24

    # query artifacts
    write_artifacts(res, str(tmp_path / "qd"), str(tmp_path / "qs"),
                    is_query=True)
    parsed = read_query_tsv(str(tmp_path / "qs" / "query.tsv"))
    # tsv counts reproduce the (collision-summed) query weights
    for qid, weights in zip(res.ids, res.query_weights):
        if weights:
            assert parsed[str(qid)] == {k: v for k, v in weights.items()}


@needs_data
def test_dense_self_retrieval_recall_is_one(setup):
    corpus, params, arch, tok, template = setup
    examples = corpus.examples_single()[:32]
    scfg = SparseConfig()
    res = encode_examples(examples, params, arch, tok, template,
                          encode_type="image", sparse_cfg=scfg, batch_size=8)
    index = DenseFlatIndex()
    index.add(res.dense, res.ids)

    out = run_search(
        examples, params, arch, tok, template,
        query_type="image", sparse_cfg=scfg,
        search_cfg=SearchConfig(depth=10),
        dense_index=index, batch_size=8,
        metrics=("mrr", "ndcg", "map"),
        get_target=lambda qid: qid)  # self as ground truth
    assert out.dense_recall[1] == 1.0
    # self-retrieval is a perfect single-target ranking: every extra
    # metric must agree at 1.0, and the summary must report them
    for m in ("mrr", "ndcg", "map"):
        assert out.extra_metrics["dense"][m][1] == 1.0
    assert "dense mrr@1 1.0000" in out.summary()


@needs_data
def test_sparse_self_retrieval_beats_chance(setup):
    corpus, params, arch, tok, template = setup
    examples = corpus.examples_single()[:32]
    scfg = SparseConfig()
    res = encode_examples(examples, params, arch, tok, template,
                          encode_type="image", sparse_cfg=scfg, batch_size=8)
    imp = ImpactIndex()
    imp.add_many(zip(res.ids, res.sparse_vectors))
    imp.finalize()

    out = run_search(
        examples, params, arch, tok, template,
        query_type="image", sparse_cfg=scfg,
        search_cfg=SearchConfig(depth=10),
        impact_index=imp, batch_size=8,
        get_target=lambda qid: qid)
    # chance recall@5 for 32 docs ~= 0.16; self-vectors should dominate
    assert out.sparse_recall[5] >= 0.9


@needs_data
def test_engine_id_fast_path_matches_string_path(setup):
    """run_search over an int-keyed index (id fast path, no string round
    trip) produces the exact sparse run of the string-keyed path."""
    from mllm_sparse_retrieval_tpu.sparse import canonical_id_map

    corpus, params, arch, tok, template = setup
    examples = corpus.examples_single()[:32]
    scfg = SparseConfig()
    res = encode_examples(examples, params, arch, tok, template,
                          encode_type="image", sparse_cfg=scfg, batch_size=8)
    imp_str = ImpactIndex()
    imp_str.add_many(zip(res.ids, res.sparse_vectors))
    imp_str.finalize()
    cmap = canonical_id_map(tok.get_vocab(), scfg.is_filtered)
    imp_id = ImpactIndex.from_selected_terms(res.ids, res.selected_terms,
                                             cmap)
    assert imp_id.int_keyed and not imp_str.int_keyed

    # depth >= corpus size: no tie-cut at the boundary, runs comparable
    kw = dict(query_type="image", sparse_cfg=scfg,
              search_cfg=SearchConfig(depth=40), batch_size=8,
              get_target=lambda qid: qid)
    out_id = run_search(examples, params, arch, tok, template,
                        impact_index=imp_id, **kw)
    out_str = run_search(examples, params, arch, tok, template,
                         impact_index=imp_str, **kw)
    assert out_id.sparse_run == out_str.sparse_run
    assert out_id.sparse_recall[5] >= 0.9


@needs_data
def test_full_hybrid_search_on_mesh(setup):
    corpus, params, arch, tok, template = setup
    mesh = make_mesh()
    examples = corpus.examples_single()[:16]
    scfg = SparseConfig()
    res = encode_examples(examples, params, arch, tok, template,
                          encode_type="image", sparse_cfg=scfg,
                          batch_size=8, mesh=mesh)
    dense = DenseFlatIndex()
    dense.add(res.dense, res.ids)
    imp = ImpactIndex()
    imp.add_many(zip(res.ids, res.sparse_vectors))
    imp.finalize()

    out = run_search(
        examples, params, arch, tok, template,
        query_type="image", sparse_cfg=scfg,
        search_cfg=SearchConfig(depth=10, alpha=0.5),
        dense_index=dense, impact_index=imp, batch_size=8, mesh=mesh,
        get_target=lambda qid: qid)
    assert out.dense_recall[1] == 1.0
    assert out.fusion_recall is not None
    assert out.fusion_recall[5] >= 0.9
    # fused scores live in [0, 1] (min-max normalized, alpha-weighted)
    for docs in out.fusion_run.values():
        assert all(0.0 <= s <= 1.0 + 1e-9 for s in docs.values())


@needs_data
@pytest.mark.parametrize("id_keyed", [False, True])
def test_engine_device_fusion_matches_host(setup, id_keyed):
    """run_search(fusion_mode='device') reproduces the host fusion run to
    f32 rounding on both sparse-encode routes (string dicts / id-keyed
    SelectedTerms), including remove_query semantics."""
    from mllm_sparse_retrieval_tpu.sparse import canonical_id_map

    corpus, params, arch, tok, template = setup
    examples = corpus.examples_single()[:24]
    scfg = SparseConfig()
    res = encode_examples(examples, params, arch, tok, template,
                          encode_type="image", sparse_cfg=scfg, batch_size=8)
    dense = DenseFlatIndex()
    dense.add(res.dense, res.ids)
    if id_keyed:
        cmap = canonical_id_map(tok.get_vocab(), scfg.is_filtered)
        imp = ImpactIndex.from_selected_terms(res.ids, res.selected_terms,
                                              cmap)
        assert imp.int_keyed
    else:
        imp = ImpactIndex()
        imp.add_many(zip(res.ids, res.sparse_vectors))
        imp.finalize()

    # depth >= union size: the device run's top-depth IS the full union,
    # so the doc sets must match exactly, not just prefix-wise
    kw = dict(query_type="image", sparse_cfg=scfg,
              search_cfg=SearchConfig(depth=48, alpha=0.3,
                                      remove_query=True),
              dense_index=dense, impact_index=imp, batch_size=8,
              get_target=lambda qid: qid)
    host = run_search(examples, params, arch, tok, template, **kw)
    dev = run_search(examples, params, arch, tok, template,
                     fusion_mode="device", **kw)

    assert not dev.dense_run and not dev.sparse_run  # never materialized
    assert set(dev.fusion_run) == set(host.fusion_run)
    for qid, docs in host.fusion_run.items():
        assert set(dev.fusion_run[qid]) == set(docs), qid
        for doc, s in docs.items():
            assert dev.fusion_run[qid][doc] == pytest.approx(s, abs=1e-5)
    assert dev.fusion_recall.hits == host.fusion_recall.hits


def test_device_fusion_mode_requires_both_indexes():
    from mllm_sparse_retrieval_tpu.search.engine import run_search as rs
    with pytest.raises(ValueError, match="BOTH a dense and an impact"):
        rs([], None, None, None, None, query_type="text",
           sparse_cfg=SparseConfig(), search_cfg=SearchConfig(),
           dense_index=DenseFlatIndex(), fusion_mode="device")


@needs_data
def test_remove_query_drops_self_hit(setup):
    corpus, params, arch, tok, template = setup
    examples = corpus.examples_single()[:16]
    scfg = SparseConfig()
    res = encode_examples(examples, params, arch, tok, template,
                          encode_type="image", sparse_cfg=scfg, batch_size=8)
    dense = DenseFlatIndex()
    dense.add(res.dense, res.ids)
    out = run_search(
        examples, params, arch, tok, template,
        query_type="image", sparse_cfg=scfg,
        search_cfg=SearchConfig(depth=5, remove_query=True),
        dense_index=dense, batch_size=8,
        get_target=lambda qid: qid)
    # self-hit removed -> recall@1 of self-target collapses to 0
    assert out.dense_recall[1] == 0.0
    for qid, entry in out.dense_run.items():
        assert qid not in entry["docs"]


@needs_data
def test_t2i_pipeline_runs_with_ground_truth(setup):
    """Cross-modal t2i with a random model: validates plumbing + ground-truth
    wiring (recall is chance-level, just assert the machinery)."""
    corpus, params, arch, tok, template = setup
    img_examples = corpus.examples_single()[:20]
    scfg = SparseConfig()
    res = encode_examples(img_examples, params, arch, tok, template,
                          encode_type="image", sparse_cfg=scfg, batch_size=4)
    dense = DenseFlatIndex()
    dense.add(res.dense, res.ids)

    text_queries = [e for e in corpus.examples_full()[:40]
                    if e.img_id in set(res.ids)]
    out = run_search(
        text_queries, params, arch, tok, template,
        query_type="text", sparse_cfg=scfg,
        search_cfg=SearchConfig(depth=20),
        dense_index=dense, batch_size=8,
        get_target=lambda qid: corpus.get_target(qid, "text"))
    # depth >= corpus size -> every target is found somewhere
    r = recall_at_k(out.dense_run,
                    lambda q: corpus.get_target(q, "text"), ks=(20,))
    assert r[20] == 1.0


@needs_data
def test_engine_compact48_wire_matches_i32(setup):
    """run_search(impact_wire='compact48') reproduces the i32 wire's sparse
    run (score, id) content exactly through the product path."""
    from mllm_sparse_retrieval_tpu.sparse import canonical_id_map

    corpus, params, arch, tok, template = setup
    examples = corpus.examples_single()[:16]
    scfg = SparseConfig()
    res = encode_examples(examples, params, arch, tok, template,
                          encode_type="image", sparse_cfg=scfg, batch_size=8)
    cmap = canonical_id_map(tok.get_vocab(), scfg.is_filtered)
    imp = ImpactIndex.from_selected_terms(res.ids, res.selected_terms, cmap)

    kw = dict(query_type="image", sparse_cfg=scfg,
              search_cfg=SearchConfig(depth=40), batch_size=8)
    a = run_search(examples, params, arch, tok, template, impact_index=imp,
                   **kw)
    b = run_search(examples, params, arch, tok, template, impact_index=imp,
                   impact_wire="compact48", **kw)
    for qid, row in a.sparse_run.items():
        # rows are {'docs': {docid: score}, 'min_score', 'max_score'};
        # the docs maps must be identical (dict equality is order-free)
        assert row["docs"] == b.sparse_run[qid]["docs"]
        assert row["min_score"] == b.sparse_run[qid]["min_score"]
        assert row["max_score"] == b.sparse_run[qid]["max_score"]


@needs_data
def test_engine_respects_canonical_provenance(setup):
    """run_search must NOT fold queries through a canonical map when the
    index was built without one (review r6: a tokenizer with case-colliding
    ids would silently mis-score), and the map decision is recorded on the
    index and survives save/load."""
    import tempfile

    corpus, params, arch, tok, template = setup
    examples = corpus.examples_single()[:12]
    scfg = SparseConfig()
    res = encode_examples(examples, params, arch, tok, template,
                          encode_type="image", sparse_cfg=scfg, batch_size=8)
    # built WITHOUT a canonical map: queries must go through unmapped
    imp_raw = ImpactIndex.from_selected_terms(res.ids, res.selected_terms)
    assert imp_raw.query_canonical is False
    kw = dict(query_type="image", sparse_cfg=scfg,
              search_cfg=SearchConfig(depth=30), batch_size=8)
    out = run_search(examples, params, arch, tok, template,
                     impact_index=imp_raw, **kw)
    ref_s, ref_i = imp_raw.search_terms(res.selected_terms, 30,
                                        canonical_map=None)
    want = {qid: dict(zip(ids_row, s_row))
            for qid, s_row, ids_row in zip(res.ids, ref_s, ref_i)}
    got = {qid: row["docs"] for qid, row in out.sparse_run.items()}
    assert got == want

    # built WITH a map: flag recorded and persisted
    from mllm_sparse_retrieval_tpu.sparse import canonical_id_map
    cmap = canonical_id_map(tok.get_vocab(), scfg.is_filtered)
    imp_map = ImpactIndex.from_selected_terms(res.ids, res.selected_terms,
                                              cmap)
    assert imp_map.query_canonical is True
    with tempfile.TemporaryDirectory() as d:
        imp_map.save(d)
        assert ImpactIndex.load(d).query_canonical is True
        imp_raw.save(d)
        assert ImpactIndex.load(d).query_canonical is False


@needs_data
@pytest.mark.parametrize("which", ["sparse", "dense", "hybrid"])
def test_engine_device_eval_matches_host(setup, which):
    """run_search(eval_mode='device') reports the EXACT recall and extra
    metrics of the host consumer over the same programs, for every leg,
    without materializing any run on host."""
    corpus, params, arch, tok, template = setup
    examples = corpus.examples_single()[:24]
    scfg = SparseConfig()
    res = encode_examples(examples, params, arch, tok, template,
                          encode_type="image", sparse_cfg=scfg, batch_size=8)
    dense = impact = None
    if which in ("dense", "hybrid"):
        dense = DenseFlatIndex()
        dense.add(res.dense, res.ids)
    if which in ("sparse", "hybrid"):
        impact = ImpactIndex()
        impact.add_many(zip(res.ids, res.sparse_vectors))
        impact.finalize()

    kw = dict(query_type="image", sparse_cfg=scfg,
              search_cfg=SearchConfig(depth=12, alpha=0.4,
                                      remove_query=(which != "hybrid")),
              dense_index=dense, impact_index=impact, batch_size=8,
              get_target=lambda qid: qid, ks=(1, 5, 10),
              metrics=("mrr", "ndcg", "map"))
    if which == "hybrid":
        kw["fusion_mode"] = "device"
    host = run_search(examples, params, arch, tok, template, **kw)
    dev = run_search(examples, params, arch, tok, template,
                     eval_mode="device", **kw)

    assert not dev.dense_run and not dev.sparse_run and not dev.fusion_run
    name = {"sparse": "sparse", "dense": "dense", "hybrid": "fusion"}[which]
    h = getattr(host, f"{name}_recall")
    d = getattr(dev, f"{name}_recall")
    assert d.recalls == h.recalls and d.hits == h.hits
    for m in ("mrr", "ndcg", "map"):
        assert dev.extra_metrics[name][m].values == \
            host.extra_metrics[name][m].values
