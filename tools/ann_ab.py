"""Interleaved A/B: exact flat MIPS vs ANN (low-rank prefilter + rescore).

Measures, in ONE process with alternating reps (cancels relay drift):
  A) DenseFlatIndex(float32)  — the exact FAISS-flat-parity path;
  B) DenseFlatIndex(bfloat16) — the exact single-pass MXU path;
  C) DenseANNIndex(rank, candidates) — stage-1 [B, N] x [N, r] +
     approx_max_k + exact rescore of the candidate pool (ops/ann.py).

Reports device-compute ms/batch, QPS, the ANN speedup vs each exact mode,
and candidate recall@depth vs the f32 oracle on the SAME corpus — the
speed/recall frontier point the flags select. Corpus rows follow a
spectrally-decaying model (embedding-like; an isotropic corpus is the
prefilter's worst case and is available via --isotropic for honesty).

Usage: python tools/ann_ab.py [--docs 200000] [--dim 512] [--rank 64]
                              [--candidates 1024] [--depth 10] [--reps 4]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # sitecustomize force-sets jax_platforms; honor the env override so
    # the CPU smoke path works (CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")

from mllm_sparse_retrieval_tpu.cli.common import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax.numpy as jnp                                            # noqa: E402

from mllm_sparse_retrieval_tpu.index.ann import DenseANNIndex      # noqa: E402
from mllm_sparse_retrieval_tpu.index.dense import DenseFlatIndex   # noqa: E402


def _spectral_corpus(rng, n, d, isotropic=False):
    x = rng.normal(size=(n, d)).astype(np.float32)
    if not isotropic:
        # power-law singular-value decay, the shape of real embedding
        # matrices (most variance in the leading directions)
        x *= (np.arange(1, d + 1, dtype=np.float32) ** -0.75)[None, :]
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--rank", type=int, default=64)
    ap.add_argument("--candidates", type=int, default=1024)
    ap.add_argument("--recall-target", type=float, default=0.95)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--isotropic", action="store_true",
                    help="flat-spectrum corpus (ANN worst case)")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    corpus = _spectral_corpus(rng, args.docs, args.dim, args.isotropic)
    queries = _spectral_corpus(rng, args.batch, args.dim, args.isotropic)
    ids = [str(i) for i in range(args.docs)]

    checksum = jax.jit(lambda c: jnp.sum(c.astype(jnp.float32)))
    modes = {
        "f32": DenseFlatIndex(dtype=jnp.float32),
        "bf16": DenseFlatIndex(dtype=jnp.bfloat16),
        "ann": DenseANNIndex(rank=args.rank, candidates=args.candidates,
                             recall_target=args.recall_target),
    }
    for name, idx in modes.items():
        idx.add(corpus, ids)
        t0 = time.time()
        idx._materialize(None)
        float(checksum(idx._corpus_dev))
        extra = ""
        if name == "ann":
            float(checksum(idx._corpus_r_dev))
            extra = (f" (+{idx._corpus_r_dev.nbytes / 1e6:.0f} MB projected,"
                     f" rank {args.rank})")
        print(f"[{name}] HBM placement: {time.time() - t0:.1f} s "
              f"({idx._corpus_dev.nbytes / 1e6:.0f} MB){extra}", flush=True)

    # Device-compute leg: queries pre-staged, k back-to-back dispatches,
    # one forced host read on the last result (relay rule: np.asarray, not
    # block_until_ready).
    from mllm_sparse_retrieval_tpu.ops.ann import ann_topk_packed
    from mllm_sparse_retrieval_tpu.ops.mips import mips_topk_packed

    staged = {name: jax.device_put(np.ascontiguousarray(
        np.asarray(queries, dtype=idx.dtype)))
        for name, idx in modes.items()}
    runners = {
        "f32": lambda: mips_topk_packed(
            staged["f32"], modes["f32"]._corpus_dev, args.depth),
        "bf16": lambda: mips_topk_packed(
            staged["bf16"], modes["bf16"]._corpus_dev, args.depth),
        "ann": lambda: ann_topk_packed(
            staged["ann"], modes["ann"]._corpus_dev,
            modes["ann"]._corpus_r_dev, modes["ann"]._proj_dev,
            args.depth, max(args.candidates, args.depth),
            recall_target=args.recall_target),
    }
    for run in runners.values():
        np.asarray(run())                      # compile + settle

    k_pipe = 8
    best = {}
    for _ in range(args.reps):
        for name, run in runners.items():
            t0 = time.time()
            for _ in range(k_pipe):
                out = run()
            np.asarray(out)
            t = (time.time() - t0) / k_pipe
            best[name] = min(best.get(name, t), t)
    exact_flops = 2.0 * args.docs * args.batch * args.dim
    for name, t in best.items():
        note = f" ({exact_flops / t / 1e12:.1f} TFLOP/s)" \
            if name != "ann" else ""
        print(f"[{name}] device compute: {t * 1e3:.2f} ms/batch -> "
              f"{args.batch / t:.0f} QPS{note}", flush=True)
    for name in ("f32", "bf16"):
        print(f"ann speedup vs {name}: {best[name] / best['ann']:.2f}x",
              flush=True)

    # Candidate recall vs the f32 oracle (sampled queries keep this cheap)
    n_eval = min(512, args.batch)
    _, exact_ids = modes["f32"].search_ids(queries[:n_eval], args.depth,
                                           batch_size=n_eval)
    _, ann_ids = modes["ann"].search_ids(queries[:n_eval], args.depth,
                                         batch_size=n_eval)
    hits = sum(len(set(a) & set(e)) for a, e in zip(ann_ids, exact_ids))
    rec = hits / (args.depth * n_eval)
    print(f"ann candidate recall@{args.depth} vs exact: {rec:.4f} "
          f"(rank {args.rank}, candidates {args.candidates}, "
          f"recall_target {args.recall_target})", flush=True)


if __name__ == "__main__":
    main()
