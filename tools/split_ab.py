"""Interleaved A/B: plain TAAT vs the taat-split backend on the chip.

Measures, in ONE process with alternating reps (cancels relay drift), the
pipelined serving path (``search_encoded_stream``) at the benchmark's
headline shapes for:
  A) backend='taat'        — every query term walks the kernel;
  B) backend='taat-split'  — the hottest ``--heads`` terms score as one MXU
     matmul, only the Zipf tail walks the kernel (dead rows skipped).

Also prints what fraction of query term slots each head width absorbs
(the quantity the split converts from per-step DMA cost to MXU FLOPs).

Usage:  python tools/split_ab.py [--heads 512,1024] [--reps 4]
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

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_traceback_in_locations_limit", 0)

from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex  # noqa: E402


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
    ap.add_argument("--heads", type=str, default="512",
                    help="comma-separated taat_split_head widths to A/B")
    args = ap.parse_args()
    heads = [int(h) for h in args.heads.split(",")]

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
    # df-descending relabel means term id == matrix row - 1; report head
    # coverage of the actual query slots per candidate width
    lut = index._term_lut()
    rows = lut[q_idx] + 1
    for h in heads:
        cov = float((rows <= h).mean())
        print(f"head {h}: absorbs {cov * 100:.1f}% of query term slots",
              flush=True)

    batches = [(np.roll(q_idx, r, axis=0), np.roll(q_w, r, axis=0))
               for r in range(args.rounds)]

    def run(backend):
        for _ in index.search_encoded_stream(batches, args.depth,
                                             backend=backend):
            pass

    legs = [("taat", None)] + [(f"split-{h}", h) for h in heads]
    for name, h in legs:
        if h is not None:
            index.taat_split_head = h
        t0 = time.time()
        run("taat" if h is None else "taat-split")
        print(f"{name}: compile+warm {time.time() - t0:.1f}s", flush=True)

    times = {name: [] for name, _ in legs}
    for _ in range(args.reps):
        for name, h in legs:
            if h is not None:
                index.taat_split_head = h
            t0 = time.time()
            run("taat" if h is None else "taat-split")
            times[name].append((time.time() - t0) / args.rounds)
    base = min(times["taat"])
    for name, _ in legs:
        ts = times[name]
        best = min(ts)
        print(f"{name}: ms/batch {[f'{x * 1e3:.1f}' for x in ts]} "
              f"best {best * 1e3:.1f} ({args.batch / best:.0f} QPS, "
              f"{base / best:.2f}x taat)", flush=True)


if __name__ == "__main__":
    main()
