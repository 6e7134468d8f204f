"""Interleaved A/B/C: f32 vs bf16 vs int8 dense MIPS serving (dtype modes).

Measures, in ONE process with alternating reps (cancels relay drift), at
COCO scale (25k docs x 4096-d, the LLaVA hidden size; depth 10 per the
dense-only script /root/reference/scripts/search_dense.sh):
  A) DenseFlatIndex(dtype=float32)  — FAISS-flat-parity scoring
     (f32-HIGHEST multi-pass on the MXU);
  B) DenseFlatIndex(dtype=bfloat16) — half the HBM + host->device bytes,
     single-pass MXU matmul with f32 accumulation;
  C) DenseFlatIndex(dtype=int8)     — FAISS-SQ8-class scalar quantization:
     1/4 the bytes, s8 x s8 -> s32 MXU pass, per-row/per-query dequant.

Reports, for each: HBM placement time, device-compute ms/batch (queries
pre-staged), e2e batch_search ms/batch (upload-bound through the relay),
and each mode's top-k overlap vs f32 on the same data.

Usage:  python tools/dense_ab.py [--docs 25010] [--dim 4096] [--reps 4]
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

import jax.numpy as jnp                                          # noqa: E402

from mllm_sparse_retrieval_tpu.index.dense import DenseFlatIndex  # noqa: E402
from mllm_sparse_retrieval_tpu.ops.mips import mips_topk          # noqa: E402


def _time_best(fn, reps):
    times = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=25_010)
    ap.add_argument("--dim", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(args.docs, args.dim)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.normal(size=(args.batch, args.dim)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    ids = [str(i) for i in range(args.docs)]

    checksum = jax.jit(lambda c: jnp.sum(c.astype(jnp.float32)))
    indexes = {}
    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16),
                        ("int8", jnp.int8)):
        idx = DenseFlatIndex(dtype=dtype)
        idx.add(corpus, ids)
        t0 = time.time()
        idx._materialize(None)
        # a reduction over the corpus forces the transfer to complete
        # (block_until_ready alone can return at enqueue through relays)
        float(checksum(idx._corpus_dev))
        place = time.time() - t0
        mb = idx._corpus_dev.nbytes / 1e6
        print(f"[{name}] HBM placement: {place:.1f} s ({mb:.0f} MB)",
              flush=True)
        indexes[name] = idx

    # Device-compute leg: queries pre-staged in the index dtype, timed with
    # block_until_ready — isolates MXU throughput from the relay links.
    # int8 pre-stages the quantized queries + scales and runs the packed
    # SQ8 program (its production form); f32/bf16 run the unpacked topk.
    from mllm_sparse_retrieval_tpu.ops.mips import mips_topk_packed_q8
    fn_f = jax.jit(lambda q, c: mips_topk(q, c, args.depth)[0])

    def make_runner(name, idx):
        if getattr(idx, "q8", False):
            q8, qs = idx._quantize_rows(queries)
            q8_dev, qs_dev = jax.device_put(q8), jax.device_put(qs)
            return lambda: mips_topk_packed_q8(
                q8_dev, qs_dev, idx._corpus_dev, idx._row_scale_dev,
                args.depth)
        q_dev = jax.device_put(
            np.ascontiguousarray(np.asarray(queries, dtype=idx.dtype)))
        return lambda: fn_f(q_dev, idx._corpus_dev)

    runners = {name: make_runner(name, idx)
               for name, idx in indexes.items()}
    for run in runners.values():
        run().block_until_ready()  # compile

    # Pipelined throughput: k back-to-back dispatches, one host sync on the
    # LAST result's scores (np.asarray forces a real device->host read —
    # block_until_ready alone can return at enqueue through relays); the
    # device executes serially so elapsed/k is per-batch compute.
    flops = 2.0 * args.docs * args.batch * args.dim
    k_pipe = 8
    best = {}
    for r in range(args.reps):
        for name, run in runners.items():
            t0 = time.time()
            for _ in range(k_pipe):
                out = run()
            np.asarray(out)
            t = (time.time() - t0) / k_pipe
            best[name] = min(best.get(name, t), t)
    for name, t in best.items():
        print(f"[{name}] device compute: {t * 1e3:.2f} ms/batch -> "
              f"{args.batch / t:.0f} QPS ({flops / t / 1e12:.1f} TFLOP/s)",
              flush=True)
    for name in ("bf16", "int8"):
        if "f32" in best and name in best:
            print(f"{name} device-compute speedup: "
                  f"{best['f32'] / best[name]:.2f}x", flush=True)

    # E2e leg through DenseFlatIndex.batch_search (includes the query
    # upload — halved bytes for bf16 — and the packed result fetch).
    e2e = {}
    for name, idx in indexes.items():    # warm both programs first
        idx.batch_search(queries, args.depth, batch_size=args.batch)
    for r in range(args.reps):
        for name, idx in indexes.items():
            t = _time_best(
                lambda: idx.batch_search(queries, args.depth,
                                         batch_size=args.batch), 1)
            e2e[name] = min(e2e.get(name, t), t)
    for name, t in e2e.items():
        print(f"[{name}] e2e batch_search: {t * 1e3:.1f} ms/batch -> "
              f"{args.batch / t:.0f} QPS", flush=True)
    for name in ("bf16", "int8"):
        if "f32" in e2e and name in e2e:
            print(f"{name} e2e speedup: {e2e['f32'] / e2e[name]:.2f}x",
                  flush=True)

    # Rank agreement on this data (Gaussian reps — the adversarial case for
    # low-precision rounding; real caption embeddings separate further).
    _, i32 = indexes["f32"].search(queries[:256], args.depth)
    i32 = np.asarray(i32)
    for name in ("bf16", "int8"):
        if name not in indexes:
            continue
        _, i_lo = indexes[name].search(queries[:256], args.depth)
        i_lo = np.asarray(i_lo)
        overlap = np.mean([len(set(i32[r]) & set(i_lo[r])) / args.depth
                           for r in range(i32.shape[0])])
        top1 = float(np.mean(i32[:, 0] == i_lo[:, 0]))
        print(f"{name} vs f32 top-{args.depth} overlap: {overlap:.4f}; "
              f"top-1 agreement: {top1:.4f}", flush=True)


if __name__ == "__main__":
    main()
