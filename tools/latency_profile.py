"""Serving tail-latency profile: per-batch latency percentiles, not QPS.

Throughput numbers (bench.py) hide the serving property production cares
about: the latency DISTRIBUTION a closed-loop consumer sees per batch.
This drives ``search_encoded_stream`` exactly like a serving loop — a new
batch is submitted as soon as the pipeline accepts it, results are consumed
in order — and records, per batch, the wall-time from submit-available to
results-on-host. Reports p50/p90/p95/p99/max plus the steady-state
inter-arrival gap (effective ms/batch).

The first ``--warm`` batches are excluded (compile + cache warmup). With
``--wire compact48`` the sparse fetch ships 6 bytes/result instead of 8
(ops/packing.py) — at depth 1000 the fetch dominates, so the wire choice
moves the whole distribution.

Usage:  python tools/latency_profile.py [--docs 25010] [--batch 1024]
            [--depth 1000] [--rounds 24] [--wire i32|compact48]
            [--backend taat]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # sitecustomize force-sets jax_platforms; honor the env var explicitly
    jax.config.update("jax_platforms", "cpu")

from mllm_sparse_retrieval_tpu.cli.common import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex  # noqa: E402

N_TERMS = 20_000
DOC_K = 128
QUERY_TERMS = 64


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=25_010)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--depth", type=int, default=1000)
    ap.add_argument("--rounds", type=int, default=24)
    ap.add_argument("--warm", type=int, default=4)
    ap.add_argument("--wire", default="i32", choices=["i32", "compact48"])
    ap.add_argument("--backend", default="auto",
                    choices=["auto", "taat", "matmul"])
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    zipf = 1.0 / np.arange(1, N_TERMS + 1)
    zipf /= zipf.sum()
    doc_t = rng.choice(N_TERMS, size=(args.docs, DOC_K), p=zipf
                       ).astype(np.int32)
    doc_w = rng.integers(1, 350, size=(args.docs, DOC_K)).astype(np.float32)
    index = ImpactIndex.from_packed_arrays(doc_t, doc_w,
                                           term_keys=range(N_TERMS))
    q_i = rng.choice(N_TERMS, size=(args.batch, QUERY_TERMS), p=zipf
                     ).astype(np.int32)
    q_w = rng.integers(1, 300, size=(args.batch, QUERY_TERMS)
                       ).astype(np.float32)
    index._materialize(
        None, "i16" if args.backend != "matmul" else "f32",
        kernel_layout=args.backend != "matmul").block_until_ready()

    total = args.warm + args.rounds
    submit_t = []

    def batches():
        for r in range(total):
            submit_t.append(time.perf_counter())
            yield (np.roll(q_i, r, axis=0), np.roll(q_w, r, axis=0))

    resolve_t = []
    t_start = time.perf_counter()
    for _ in index.search_encoded_stream(batches(), args.depth,
                                         backend=args.backend,
                                         wire=args.wire):
        resolve_t.append(time.perf_counter())
    t_end = time.perf_counter()

    lat = 1e3 * (np.asarray(resolve_t) - np.asarray(submit_t[:len(resolve_t)]))
    lat = lat[args.warm:]
    gaps = 1e3 * np.diff(np.asarray(resolve_t[args.warm:]))
    q = lambda p: float(np.percentile(lat, p))
    print(f"latency profile: {args.docs} docs, batch {args.batch}, depth "
          f"{args.depth}, backend {args.backend}, wire {args.wire}, "
          f"{len(lat)} measured batches")
    print(f"  per-batch latency ms: p50 {q(50):.1f}  p90 {q(90):.1f}  "
          f"p95 {q(95):.1f}  p99 {q(99):.1f}  max {lat.max():.1f}")
    if gaps.size:
        print(f"  steady-state gap: mean {gaps.mean():.1f} ms/batch "
              f"(p99 {np.percentile(gaps, 99):.1f}) -> "
              f"{args.batch / gaps.mean() * 1e3:.0f} QPS sustained")
    print(f"  whole run: {t_end - t_start:.2f}s for {total} batches "
          f"(incl. {args.warm} warmup)")


if __name__ == "__main__":
    main()
