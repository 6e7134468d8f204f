"""Full-corpus system check: the complete pipeline at REAL dataset scale.

Runs the whole stack — encode every Flickr30k-test caption (5,000, mode
'full') and unique image (1,000, mode 'single'), build dense + impact
indexes, dual-direction search (t2i / i2t) with fusion, recall@k — with the
hermetic tiny model (synthetic pixels: recall is expected to be near random;
what this validates is the SYSTEM at true corpus scale: single-compile
batching, artifact round-trips, index build, both search backends, memory).

    python tools/corpus_e2e.py [--limit-captions N] [--batch-size B]

Prints per-phase timings and the recall table; exits non-zero on any
pipeline inconsistency (id mismatches, non-finite scores, self-retrieval
failure for captions-as-their-own-queries).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

from mllm_sparse_retrieval_tpu.cli.common import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from mllm_sparse_retrieval_tpu.configs import (ModelConfig, ModelFamily,
                                               SearchConfig, SparseConfig)
from mllm_sparse_retrieval_tpu.data import CrossModalCorpus
from mllm_sparse_retrieval_tpu.index.dense import DenseFlatIndex
from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex
from mllm_sparse_retrieval_tpu.models.registry import build_model
from mllm_sparse_retrieval_tpu.pipelines.encode import encode_examples
from mllm_sparse_retrieval_tpu.search.engine import run_search


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--limit-captions", type=int, default=0,
                    help="0 = full corpus")
    ap.add_argument("--limit-queries", type=int, default=128)
    ap.add_argument("--batch-size", type=int, default=32)
    args = ap.parse_args()

    t_start = time.time()
    corpus = CrossModalCorpus("flickr", "test", "/root/reference/data")
    captions = corpus.examples("full")
    images = corpus.examples("single")
    if args.limit_captions:
        captions = captions[:args.limit_captions]
    print(f"corpus: {len(captions)} captions, {len(images)} images "
          f"(backend={jax.default_backend()})", flush=True)

    cfg = ModelConfig(family=ModelFamily.TINY_DEBUG, dtype="float32",
                      tiny_vocab_size=2048, tiny_hidden_size=128)
    params, arch, tok, tmpl = build_model(
        cfg, captions=[e.text for e in captions])
    sp = SparseConfig()

    t0 = time.time()
    enc = encode_examples(captions, params, arch, tok, tmpl,
                          encode_type="text", sparse_cfg=sp,
                          batch_size=args.batch_size)
    n = len(captions)
    rate = n / (time.time() - t0)
    print(f"caption encode: {time.time() - t0:.1f}s "
          f"({rate:.0f} captions/s)", flush=True)
    assert enc.dense.shape == (n, 128) and len(enc.ids) == n
    assert np.isfinite(enc.dense).all()

    t0 = time.time()
    dense = DenseFlatIndex()
    dense.add(enc.dense, enc.ids)
    # product path: id-keyed index straight from SelectedTerms (run_search
    # then takes the dict-free fast path)
    from mllm_sparse_retrieval_tpu.sparse import canonical_id_map
    cmap = canonical_id_map(tok.get_vocab(), sp.is_filtered)
    imp = ImpactIndex.from_selected_terms(enc.ids, enc.selected_terms, cmap)
    assert imp.int_keyed
    print(f"index build (id-keyed): {time.time() - t0:.1f}s "
          f"({imp.num_docs} docs, {imp.num_terms} terms)", flush=True)

    # cross-check: the Lucene-parity string path scores identically
    t0 = time.time()
    imp_str = ImpactIndex()
    for i, v in zip(enc.ids, enc.sparse_vectors):
        imp_str.add(i, v)
    imp_str.finalize()
    from mllm_sparse_retrieval_tpu.sparse import query_string_weights
    probe = enc.selected_terms[:64]
    probe_dicts = [query_string_weights(t, enc.id_to_token, sp.is_filtered)
                   for t in probe]
    fs, fi = imp.search_terms(probe, 20, canonical_map=cmap)
    ss, si = imp_str.search(probe_dicts, 20)
    for a_s, a_i, b_s, b_i in zip(fs, fi, ss, si):
        assert sorted(zip(a_s, a_i)) == sorted(zip(b_s, b_i)), \
            "id fast path diverged from the string path"
    del imp_str
    print(f"id-keyed vs string-path parity OK ({time.time() - t0:.1f}s)",
          flush=True)

    # i2t: images query the caption corpus (the reference's main direction)
    t0 = time.time()
    queries = images[:args.limit_queries]
    out = run_search(queries, params, arch, tok, tmpl, query_type="image",
                     sparse_cfg=sp,
                     search_cfg=SearchConfig(depth=100, alpha=0.5),
                     dense_index=dense, impact_index=imp,
                     batch_size=args.batch_size,
                     get_target=lambda qid: corpus.get_target(qid, "image"))
    print(f"i2t search ({len(queries)} queries): {time.time() - t0:.1f}s",
          flush=True)
    print(out.summary(), flush=True)
    assert len(out.dense_run) == len(queries)
    assert len(out.sparse_run) == len(queries)

    # caption self-retrieval sanity: a caption queried against the caption
    # corpus must hit itself at rank 1 (dense cosine = 1.0 with itself)
    t0 = time.time()
    self_q = captions[:32]
    out2 = run_search(self_q, params, arch, tok, tmpl, query_type="text",
                      sparse_cfg=sp, search_cfg=SearchConfig(depth=10),
                      dense_index=dense, batch_size=args.batch_size,
                      get_target=lambda qid: qid)
    r1 = out2.dense_recall[1]
    print(f"caption self-retrieval r@1 = {r1:.3f} "
          f"({time.time() - t0:.1f}s)", flush=True)
    assert r1 >= 0.95, f"self-retrieval broken: r@1={r1}"

    print(f"CORPUS E2E OK in {time.time() - t_start:.0f}s total", flush=True)


if __name__ == "__main__":
    main()
