"""Interleaved A/B: raw array serving path vs the id-keyed engine path.

Measures, in ONE process with alternating reps (cancels relay drift):
  A) ImpactIndex.search_encoded_stream on pre-encoded padded arrays — the
     benchmark headline path;
  B) SelectedTerms -> search_terms_stream -> search.runs.make_run — the
     run_search product path (VERDICT r3 #1's done criterion tracks B
     within ~10-15% of A).

Usage:  python tools/engine_ab.py [--docs 25010] [--batch 4096] [--reps 4]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon sitecustomize force-sets jax_platforms; the env var alone
    # does not switch backends here (CLAUDE.md) — honor it explicitly so
    # the harness can smoke-test on CPU
    jax.config.update("jax_platforms", "cpu")

from mllm_sparse_retrieval_tpu.cli.common import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex  # noqa: E402
from mllm_sparse_retrieval_tpu.search.runs import (ArrayRun,    # noqa: E402
                                                   make_run)
from mllm_sparse_retrieval_tpu.sparse import SelectedTerms      # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=25_010)
    ap.add_argument("--terms", type=int, default=20_000)
    ap.add_argument("--doc-k", type=int, default=128)
    ap.add_argument("--query-terms", type=int, default=64)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    zipf = 1.0 / np.arange(1, args.terms + 1)
    zipf /= zipf.sum()
    doc_terms = np.empty((args.docs, args.doc_k), np.int32)
    for i in range(0, args.docs, 4096):
        n = min(4096, args.docs - i)
        doc_terms[i:i + n] = rng.choice(args.terms, size=(n, args.doc_k),
                                        p=zipf)
    doc_weights = rng.integers(
        1, 350, size=(args.docs, args.doc_k)).astype(np.float32)
    index = ImpactIndex.from_packed_arrays(doc_terms, doc_weights,
                                           term_keys=range(args.terms))
    t0 = time.time()
    index._materialize(None, "i16", kernel_layout=True).block_until_ready()
    print(f"placement: {time.time() - t0:.1f}s", flush=True)

    q_idx = rng.choice(args.terms, size=(args.batch, args.query_terms),
                       p=zipf).astype(np.int32)
    q_w = rng.integers(1, 300, size=(args.batch, args.query_terms)
                       ).astype(np.float32)
    batches, term_batches = [], []
    for r in range(args.rounds):
        ri, rw = np.roll(q_idx, r, axis=0), np.roll(q_w, r, axis=0)
        batches.append((ri, rw))
        rwi = rw.astype(np.int32)
        term_batches.append(
            [SelectedTerms(ri[i], rwi[i]) for i in range(args.batch)])
    qids = [str(i) for i in range(args.batch)]

    def run_arrays():
        for _ in index.search_encoded_stream(batches, args.depth,
                                             backend="taat"):
            pass

    def run_engine():
        for s, i in index.search_terms_stream(term_batches, args.depth,
                                              backend="taat"):
            make_run(qids, s, i)

    def run_engine_lazy():
        # the ArrayRun product path (VERDICT r4 #4): same engine stream,
        # run construction is O(1) — dict assembly deferred to consumers
        # that actually need dicts (recall/metrics/TREC read rows)
        for s, i in index.search_terms_stream(term_batches, args.depth,
                                              backend="taat"):
            ArrayRun(qids, s, i, scores_sorted=True)

    legs = [("arrays", run_arrays), ("engine", run_engine),
            ("lazy  ", run_engine_lazy)]
    for _, f in legs:
        f()   # warm
    times = {name: [] for name, _ in legs}
    for _ in range(args.reps):
        for name, f in legs:
            t0 = time.time()
            f()
            times[name].append((time.time() - t0) / args.rounds)
    best = {name: min(ts) for name, ts in times.items()}
    for name, _ in legs:
        print(f"{name} ms/batch:", [f"{x * 1e3:.1f}" for x in times[name]])
    a = best["arrays"]
    print(f"best: arrays {a * 1e3:.1f} ms ({args.batch / a:.0f} QPS)  "
          f"engine {best['engine'] * 1e3:.1f} ms "
          f"({args.batch / best['engine']:.0f} QPS, "
          f"gap {100 * (best['engine'] / a - 1):.1f}%)  "
          f"lazy {best['lazy  '] * 1e3:.1f} ms "
          f"({args.batch / best['lazy  ']:.0f} QPS, "
          f"gap {100 * (best['lazy  '] / a - 1):.1f}%)")


if __name__ == "__main__":
    main()
