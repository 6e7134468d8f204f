"""Interleaved A/B: host evaluation consumer vs the on-device one.

The reference's retrieval pipeline ends in ``RecallMetrics``
(/root/reference/src/metrices.py:29-84) at default depth 1000
(src/arguments.py:60). The host consumer must fetch the [B, 2*depth]
packed run (8 MB/batch at B=1024 on the i32 wire — the measured bound on
every depth-1000 leg, BASELINE.md), build run dicts, and partial-sort per
query; the device consumer (ops/eval_ranks.py + eval/device_eval.py)
computes target hit ranks ON DEVICE and fetches one [B, 1+T] int32 array
(~28 KB at T=6), with bit-equal metric values.

Measures, in ONE process with alternating reps (cancels relay drift),
each leg timed THROUGH its recall@{1,5,10,100,200} computation:

  sparse/host  — search_encoded_stream -> make_run -> recall_at_k
  sparse/dev   — impact_eval_ranks -> metrics_from_ranks
  hybrid/host  — dense + sparse runs + Python fuse -> recall_at_k
                 (the reference-default configuration, fusion_mode='host')
  hybrid/fused — FusedHybridSearcher.search_run -> recall_at_k
                 (fusion_mode='device', host eval)
  hybrid/dev   — FusedHybridSearcher.eval_ranks -> metrics_from_ranks
                 (fusion_mode='device', eval_mode='device')

Every leg's recall values are asserted EQUAL to the host consumer's
before timing. Usage:
    python tools/eval_ab.py [--docs 25010] [--batch 1024] [--depth 1000]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from mllm_sparse_retrieval_tpu.cli.common import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from mllm_sparse_retrieval_tpu.eval.device_eval import (      # noqa: E402
    build_target_arrays, dense_doc_pos, impact_doc_pos, impact_eval_ranks,
    metrics_from_ranks)
from mllm_sparse_retrieval_tpu.eval.recall import recall_at_k  # noqa: E402
from mllm_sparse_retrieval_tpu.index.dense import DenseFlatIndex  # noqa: E402
from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex  # noqa: E402
from mllm_sparse_retrieval_tpu.search.device_fusion import (  # noqa: E402
    FusedHybridSearcher)
from mllm_sparse_retrieval_tpu.search.fusion import fuse      # noqa: E402
from mllm_sparse_retrieval_tpu.search.runs import make_run    # noqa: E402

KS = (1, 5, 10, 100, 200)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=25_010)
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--terms", type=int, default=20_000)
    ap.add_argument("--doc-k", type=int, default=128)
    ap.add_argument("--query-terms", type=int, default=64)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--depth", type=int, default=1000)
    ap.add_argument("--targets", type=int, default=5,
                    help="relevant docs per query (image queries have ~5)")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--alpha", type=float, default=0.5)
    ap.add_argument("--sparse-only", action="store_true")
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
    impact = ImpactIndex.from_packed_arrays(doc_terms, doc_weights,
                                            term_keys=range(args.terms))
    doc_ids = list(impact.doc_ids)
    dense = None
    if not args.sparse_only:
        dense = DenseFlatIndex()
        reps_m = rng.normal(size=(args.docs, args.dim)).astype(np.float32)
        dense.add(reps_m, doc_ids)

    backend = "taat" if jax.default_backend() == "tpu" else "matmul"
    t0 = time.time()
    impact._materialize(None, "i16" if backend == "taat" else "f32",
                        kernel_layout=(backend == "taat"))
    if dense is not None:
        dense._materialize(None)
        dense._corpus_dev.block_until_ready()
    print(f"placement: {time.time() - t0:.1f}s", flush=True)

    q_idx = rng.choice(args.terms, size=(args.batch, args.query_terms),
                       p=zipf).astype(np.int32)
    q_w = rng.integers(1, 300, size=(args.batch, args.query_terms)
                       ).astype(np.float32)
    q_reps = rng.normal(size=(args.batch, args.dim)).astype(np.float32)
    batches = []
    for r in range(args.rounds):
        batches.append((np.roll(q_reps, r, axis=0),
                        np.roll(q_idx, r, axis=0), np.roll(q_w, r, axis=0)))
    qids = [f"q{i}" for i in range(args.batch)]
    tmap = {q: [doc_ids[int(j)] for j in
                rng.choice(args.docs, size=args.targets, replace=False)]
            for q in qids}
    get_target = tmap.__getitem__

    tgt_i, ntg, selfp = build_target_arrays(qids, get_target,
                                            impact_doc_pos(impact))
    fused = None
    tgt_d = None
    if dense is not None:
        fused = FusedHybridSearcher(dense, impact, alpha=args.alpha,
                                    backend=backend)
        tgt_d, _, _ = build_target_arrays(qids, get_target,
                                          dense_doc_pos(dense))

    def sparse_host():
        out = None
        for _, qi, qw in batches:
            s, i = impact.search_encoded(qi, qw, args.depth, backend=backend)
            run = make_run(qids, s, i, scores_sorted=True)
            out = recall_at_k(run, get_target, KS)
        return out

    def sparse_dev():
        out = None
        for _, qi, qw in batches:
            ranks = impact_eval_ranks(impact, qi, qw, tgt_i, selfp,
                                      args.depth, backend=backend)
            out, _ = metrics_from_ranks(qids, ranks, ntg, KS)
        return out

    def hybrid_host():
        out = None
        for reps_b, qi, qw in batches:
            d_s, d_i = dense.search_ids(reps_b, args.depth,
                                        batch_size=args.batch)
            d_run = make_run(qids, d_s.tolist(), d_i, scores_sorted=True)
            s_s, s_i = impact.search_encoded(qi, qw, args.depth,
                                             backend=backend)
            s_run = make_run(qids, s_s, s_i, scores_sorted=True)
            f = fuse([d_run, s_run], [args.alpha, 1.0 - args.alpha])
            out = recall_at_k(f, get_target, KS)
        return out

    def hybrid_fused_host_eval():
        out = None
        for reps_b, qi, qw in batches:
            run = fused.search_run(reps_b, qi, qw, qids, args.depth)
            out = recall_at_k(run, get_target, KS)
        return out

    def hybrid_dev():
        out = None
        for reps_b, qi, qw in batches:
            ranks = fused.eval_ranks(reps_b, qi, qw, tgt_d, args.depth)
            out, _ = metrics_from_ranks(qids, ranks, ntg, KS)
        return out

    legs = [("sparse/host ", sparse_host, "sparse"),
            ("sparse/dev  ", sparse_dev, "sparse")]
    if dense is not None:
        legs += [("hybrid/host ", hybrid_host, "hybrid"),
                 ("hybrid/fused", hybrid_fused_host_eval, "fused"),
                 ("hybrid/dev  ", hybrid_dev, "fused")]

    # warm + parity gate: device legs must report the host leg's recall
    warm = {}
    for name, f, family in legs:
        warm[name] = (f(), family)
    for fam in ("sparse", "fused"):
        vals = [r.recalls for (r, f) in warm.values() if f == fam]
        for v in vals[1:]:
            assert v == vals[0], f"{fam} recall mismatch: {v} != {vals[0]}"
    print("parity: device-consumer recall == host-consumer recall "
          f"(sparse r@10={warm['sparse/host '][0][10]:.4f})", flush=True)

    times = {name: [] for name, _, _ in legs}
    for _ in range(args.reps):
        for name, f, _ in legs:
            t0 = time.time()
            f()
            times[name].append((time.time() - t0) / args.rounds)
    print(f"config: {args.docs} docs, batch {args.batch}, depth "
          f"{args.depth}, {args.targets} targets/query, backend {backend}")
    base = {}
    for name, _, family in legs:
        ts = times[name]
        best = min(ts)
        key = "sparse" if family == "sparse" else "hybrid"
        base.setdefault(key, best)
        print(f"{name}: best {best * 1e3:7.1f} ms/batch "
              f"({args.batch / best:7.0f} QPS)  x{base[key] / best:.2f} "
              f"vs {key}/host  "
              f"all [{', '.join(f'{t * 1e3:.0f}' for t in ts)}]")


if __name__ == "__main__":
    main()
