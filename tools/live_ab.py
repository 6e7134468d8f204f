"""Interleaved A/B: static vs live index serving overhead (sparse + dense).

The live layer (index/live.py) adds per-search costs over a static index:
a snapshot read, per-segment searches (base + deltas), over-fetch for
tombstones, and the host top-k merge (C, hostops.merge_topk_rows). This
measures that overhead at the headline shape, in ONE process with
alternating reps (cancels relay drift):

  A) static ImpactIndex.search_encoded          (the BASELINE headline leg)
  B) LiveImpactIndex, base only                 (pure wrapper overhead)
  C) LiveImpactIndex, base + 4 deltas + tombstones   (steady-state serving)
  D/E/F) the same trio for DenseFlatIndex / LiveDenseIndex

Round 8 adds the ARENA implementation (index/arena.py) beside each live
leg: base-only (should be ~the static program) and post-mutation
steady state (same adds + tombstones as the segment legs; cost = one
fused filter `where`). The arena wraps its OWN copy of the corpus so
capacity-mode placement never perturbs the static/segment legs.

Usage: python tools/live_ab.py [--docs 25010] [--terms 20000] [--reps 4]
Smoke: JAX_PLATFORMS=cpu python tools/live_ab.py --smoke
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

from mllm_sparse_retrieval_tpu.index import (ArenaDenseIndex,  # noqa: E402
                                             ArenaImpactIndex, DenseFlatIndex,
                                             LiveDenseIndex, LiveImpactIndex)
from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex  # noqa: E402


def _best(fn, reps):
    times = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=25_010)
    ap.add_argument("--terms", type=int, default=20_000)
    ap.add_argument("--doc-k", type=int, default=128)
    ap.add_argument("--q-k", type=int, default=64)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--delta-docs", type=int, default=512,
                    help="docs per delta segment (x4 deltas)")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        args.docs, args.terms, args.doc_k, args.q_k = 2000, 400, 16, 8
        args.dim, args.batch, args.delta_docs, args.reps = 32, 256, 64, 2

    rng = np.random.default_rng(0)
    zipf = 1.0 / np.arange(1, args.terms + 1)
    zipf /= zipf.sum()
    doc_t = rng.choice(args.terms, size=(args.docs, args.doc_k), p=zipf
                       ).astype(np.int32)
    doc_w = rng.integers(1, 350, size=(args.docs, args.doc_k)
                         ).astype(np.float32)
    impact = ImpactIndex.from_packed_arrays(doc_t, doc_w,
                                            term_keys=range(args.terms))
    q_idx = rng.choice(args.terms, size=(args.batch, args.q_k), p=zipf
                       ).astype(np.int64)
    q_w = rng.integers(1, 300, size=(args.batch, args.q_k))
    terms = [dict(zip(r.tolist(), w.tolist())) for r, w in zip(q_idx, q_w)]
    enc = impact.encode_queries(terms)

    def sparse_static():
        impact.search_encoded(*enc, args.depth, backend=args.backend)

    live_s = LiveImpactIndex(impact)

    def sparse_live():
        live_s.search_rows(terms, args.depth, backend=args.backend)

    # the arena wraps its OWN copy (adoption drops device caches and
    # re-places with capacity — must not touch the static leg's index)
    impact_b = ImpactIndex.from_packed_arrays(doc_t.copy(), doc_w.copy(),
                                              term_keys=range(args.terms))
    arena_s = ArenaImpactIndex(impact_b,
                               doc_headroom=4 * args.delta_docs + 1024)

    def sparse_arena():
        arena_s.search_rows(terms, args.depth, backend=args.backend)

    # warm + measure A/B interleaved
    sparse_static(), sparse_live(), sparse_arena()
    rows = {}
    for name, fn in (("sparse_static", sparse_static),
                     ("sparse_live_base", sparse_live),
                     ("sparse_arena_base", sparse_arena)):
        rows[name] = _best(fn, args.reps)

    # C: steady-state live (4 deltas + tombstones in base and deltas)
    for d in range(4):
        ids = [f"n{d}_{i}" for i in range(args.delta_docs)]
        docs = [(i, {int(t): int(rng.integers(1, 300))
                     for t in rng.choice(args.terms, 8, replace=False)})
                for i in ids]
        live_s.add_documents(docs)
        arena_s.add_documents(docs)
    dead = [impact.doc_ids[i] for i in range(0, 200, 2)] \
        + [f"n0_{i}" for i in range(0, 50)]
    live_s.delete_documents(dead)
    arena_s.delete_documents(dead)
    sparse_live(), sparse_arena()
    rows["sparse_live_deltas"] = _best(sparse_live, args.reps)
    rows["sparse_arena_mutated"] = _best(sparse_arena, args.reps)

    # dense trio
    reps = rng.normal(size=(args.docs, args.dim)).astype(np.float32)
    reps /= np.linalg.norm(reps, axis=1, keepdims=True)
    dense = DenseFlatIndex()
    dense.add(reps, [str(i) for i in range(args.docs)])
    q = rng.normal(size=(args.batch, args.dim)).astype(np.float32)

    def dense_static():
        dense.search_ids(q, args.depth, batch_size=args.batch)

    live_d = LiveDenseIndex(dense)

    def dense_live():
        live_d.search_rows(q, args.depth, batch_size=args.batch)

    dense_b = DenseFlatIndex()
    dense_b.add(reps, [str(i) for i in range(args.docs)])
    arena_d = ArenaDenseIndex(dense_b,
                              doc_headroom=4 * args.delta_docs + 1024)

    def dense_arena():
        arena_d.search_rows(q, args.depth, batch_size=args.batch)

    dense_static(), dense_live(), dense_arena()
    for name, fn in (("dense_static", dense_static),
                     ("dense_live_base", dense_live),
                     ("dense_arena_base", dense_arena)):
        rows[name] = _best(fn, args.reps)
    for d in range(4):
        block = rng.normal(size=(args.delta_docs, args.dim)
                           ).astype(np.float32)
        ids = [f"m{d}_{i}" for i in range(args.delta_docs)]
        live_d.add_documents(block, ids)
        arena_d.add_documents(block, ids)
    dead_d = [str(i) for i in range(0, 200, 2)]
    live_d.delete_documents(dead_d)
    arena_d.delete_documents(dead_d)
    dense_live(), dense_arena()
    rows["dense_live_deltas"] = _best(dense_live, args.reps)
    rows["dense_arena_mutated"] = _best(dense_arena, args.reps)

    for name, t in rows.items():
        print(f"[{name}] {t * 1e3:.1f} ms/batch -> "
              f"{args.batch / t:.0f} QPS", flush=True)
    for eng in ("sparse", "dense"):
        base = rows[f"{eng}_static"]
        print(f"{eng} live overhead vs static: segments base-only "
              f"{rows[f'{eng}_live_base'] / base - 1:+.1%}, "
              f"segments 4 deltas+tombstones "
              f"{rows[f'{eng}_live_deltas'] / base - 1:+.1%}; "
              f"ARENA base-only "
              f"{rows[f'{eng}_arena_base'] / base - 1:+.1%}, "
              f"ARENA mutated "
              f"{rows[f'{eng}_arena_mutated'] / base - 1:+.1%}", flush=True)


if __name__ == "__main__":
    main()
