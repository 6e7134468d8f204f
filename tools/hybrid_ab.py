"""Interleaved A/B: host-fused hybrid vs on-device fused hybrid.

The reference's hybrid pipeline default is depth 1000
(/root/reference/src/arguments.py:60, scripts/search.sh): dense run +
sparse run materialized on host, then min-max fusion in Python
(src/hybrid.py:32-53). On a thin host link that is two [B, 2*depth]
packed fetches (8 MB each at B=1024) plus ~2*depth dict ops/query of
host fusion per batch.

This tool measures, in ONE process with alternating reps (cancels relay
drift):
  A) host path   — DenseFlatIndex.batch_search + ImpactIndex
                   .search_encoded -> make_run x2 -> fuse (the
                   fusion_mode='host' product route);
  B) device path — FusedHybridSearcher.search_encoded: both engines'
                   top-k fused on device, ONE packed [B, 2*out_depth]
                   fetch per chunk (fusion_mode='device').

B is run at out_depth=depth (full-depth parity) and out_depth=200 (the
recall consumer's max k — scripts/search.sh evaluates r@{1..200}).

Usage:  python tools/hybrid_ab.py [--docs 25010] [--dim 1024]
        [--batch 1024] [--depth 1000] [--reps 4]
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

from mllm_sparse_retrieval_tpu.index.dense import DenseFlatIndex      # noqa: E402
from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex        # noqa: E402
from mllm_sparse_retrieval_tpu.search.device_fusion import (          # noqa: E402
    FusedHybridSearcher)
from mllm_sparse_retrieval_tpu.search.fusion import fuse              # noqa: E402
from mllm_sparse_retrieval_tpu.search.runs import make_run            # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=25_010)
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--terms", type=int, default=20_000)
    ap.add_argument("--doc-k", type=int, default=128)
    ap.add_argument("--query-terms", type=int, default=64)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--depth", type=int, default=1000)
    ap.add_argument("--out-depth", type=int, default=200)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--alpha", type=float, default=0.5)
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
    dense = DenseFlatIndex()
    reps_m = rng.normal(size=(args.docs, args.dim)).astype(np.float32)
    dense.add(reps_m, impact.doc_ids)

    t0 = time.time()
    impact._materialize(None, "i16", kernel_layout=True).block_until_ready()
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
    qids = [str(-1 - i) for i in range(args.batch)]  # no self hits

    backend = "taat" if jax.default_backend() == "tpu" else "matmul"
    fused = FusedHybridSearcher(dense, impact, alpha=args.alpha,
                                backend=backend)

    def run_host():
        for reps_b, qi, qw in batches:
            d_s, d_i = dense.search_ids(reps_b, args.depth,
                                        batch_size=args.batch)
            d_run = make_run(qids, d_s.tolist(), d_i, scores_sorted=True)
            s_s, s_i = impact.search_encoded(qi, qw, args.depth,
                                             backend=backend)
            s_run = make_run(qids, s_s, s_i, scores_sorted=True)
            fuse([d_run, s_run], [args.alpha, 1.0 - args.alpha])

    def run_device(out_depth):
        for reps_b, qi, qw in batches:
            fused.search_encoded(reps_b, qi, qw, args.depth,
                                 out_depth=out_depth)

    def run_stream(out_depth):
        for _ in fused.search_encoded_stream(batches, args.depth,
                                             out_depth=out_depth):
            pass

    legs = [("host ", run_host),
            (f"dev{args.depth:>4}", lambda: run_device(args.depth)),
            (f"dev{args.out_depth:>4}", lambda: run_device(args.out_depth)),
            (f"str{args.depth:>4}", lambda: run_stream(args.depth)),
            (f"str{args.out_depth:>4}", lambda: run_stream(args.out_depth))]
    for _, f in legs:
        f()  # warm compiles
    times = {name: [] for name, _ in legs}
    for _ in range(args.reps):
        for name, f in legs:
            t0 = time.time()
            f()
            times[name].append((time.time() - t0) / args.rounds)
    print(f"config: {args.docs} docs, dim {args.dim}, batch {args.batch}, "
          f"depth {args.depth}, backend {backend}")
    base = None
    for name, _ in legs:
        ts = times[name]
        best = min(ts)
        if base is None:
            base = best
        print(f"{name}: best {best * 1e3:7.1f} ms/batch "
              f"({args.batch / best:7.0f} QPS)  x{base / best:.2f} vs host  "
              f"all [{', '.join(f'{t * 1e3:.0f}' for t in ts)}]")


if __name__ == "__main__":
    main()
