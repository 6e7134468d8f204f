"""Pin the dense-MIPS MXU utilization bound (VERDICT r4 #6).

bf16 dense scoring measures ~69 TFLOP/s ≈ 35% of v5e peak (~197) and int8
~81 ≈ 21% of ~394. This probe decomposes the production program
(``ops/mips.py``: scores = q @ C.T then ``lax.top_k``) on chip to find
where the time goes:

  matmul+sum   — the matmul with a reduction consumer: XLA fuses the
                 reduce into the matmul epilogue, so the [B, N] scores
                 tile-stream through without a full HBM materialization;
                 this is the pure-MXU floor at the shape.
  matmul-out   — the matmul returning the full [B, N] scores: adds the
                 HBM write of the intermediate (f32: B*N*4 bytes).
  full (topk)  — the production program: adds top_k's read of the same
                 intermediate plus its sort network.

HBM model at 200k docs x 512 d, batch 4096 (f32 scores): the [B, N]
intermediate is 3.28 GB; one write + one read at ~819 GB/s is ~8 ms on
top of the bf16 matmul's ~4.3 ms of MXU time — which is exactly the
measured ~12 ms. If the numbers confirm that split, the "MFU gap" is not
a tuning miss: the program is HBM-bound on the scores intermediate, and
closing it needs a fused matmul+top-k kernel (scores resident in VMEM),
not matmul tiling work.

Usage: python tools/mxu_probe.py [--docs 200000] [--dim 512] [--batch 4096]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from mllm_sparse_retrieval_tpu.cli.common import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax import lax


def _force(out):
    """Force execution with a REAL (tiny) device->host read:
    block_until_ready alone can return at enqueue through relays (the
    dense_ab methodology note) — and fetching a multi-GB intermediate
    would time the ~30 MB/s link, not the device. A 1-element slice
    launches a dependent program and reads 4 bytes."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    idx = (0,) * (leaf.ndim - 1) + (slice(0, 1),) if leaf.ndim else ()
    return np.asarray(leaf[idx] if leaf.ndim else leaf)


def _time(fn, *args, reps=8, pipeline=8):
    """Best per-call seconds over ``reps`` samples of ``pipeline``
    back-to-back dispatches (amortizes the ~30 ms relay dispatch overhead,
    same methodology as tools/dense_ab.py's device-compute legs). The
    pipeline depth is capped so concurrently-live outputs fit HBM (the
    matmul-out leg's [B, N] f32 is 3.3 GB at the default shape — 8 live
    copies RESOURCE_EXHAUSTED a 16 GB v5e)."""
    warm = fn(*args)
    out_bytes = sum(getattr(l, "nbytes", 0)
                    for l in jax.tree_util.tree_leaves(warm))
    pipeline = max(1, min(pipeline, int(8e9 // max(out_bytes, 1))))
    _force(warm)                               # compile + warm
    del warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = [fn(*args) for _ in range(pipeline)]
        _force(out[-1])
        best = min(best, (time.perf_counter() - t0) / pipeline)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    n, d, b, k = args.docs, args.dim, args.batch, args.depth
    flops = 2.0 * b * d * n
    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)

    print(f"shape: {n} docs x {d} d, batch {b}, depth {k}; "
          f"{flops / 1e12:.2f} TFLOP/batch", file=sys.stderr)

    for name, cast, mm_kw in (
            ("f32H", lambda x: x,
             dict(precision=lax.Precision.HIGHEST)),
            ("bf16", lambda x: x.astype(jnp.bfloat16),
             dict(preferred_element_type=jnp.float32)),
            ("int8", None, None)):
        if name == "int8":
            from mllm_sparse_retrieval_tpu.index.dense import DenseFlatIndex
            cq, cs = DenseFlatIndex._quantize_rows(corpus)
            qq, qs = DenseFlatIndex._quantize_rows(q)
            c_dev = jax.device_put(cq)
            q_dev = jax.device_put(qq)
            cs_dev, qs_dev = jax.device_put(cs), jax.device_put(qs)

            @jax.jit
            def mm_sum(qm, cm, qsc, csc):
                s = jnp.matmul(qm, cm.T,
                               preferred_element_type=jnp.int32)
                s = s.astype(jnp.float32) * qsc[:, None] * csc[None, :]
                return jnp.sum(s)

            @jax.jit
            def mm_out(qm, cm, qsc, csc):
                s = jnp.matmul(qm, cm.T,
                               preferred_element_type=jnp.int32)
                return s.astype(jnp.float32) * qsc[:, None] * csc[None, :]

            @jax.jit
            def full(qm, cm, qsc, csc):
                s = jnp.matmul(qm, cm.T,
                               preferred_element_type=jnp.int32)
                s = s.astype(jnp.float32) * qsc[:, None] * csc[None, :]
                return lax.top_k(s, k)

            ts = _time(mm_sum, q_dev, c_dev, qs_dev, cs_dev, reps=args.reps)
            to = _time(mm_out, q_dev, c_dev, qs_dev, cs_dev, reps=args.reps)
            tf = _time(full, q_dev, c_dev, qs_dev, cs_dev, reps=args.reps)
        else:
            c_dev = jax.device_put(cast(jnp.asarray(corpus)))
            q_dev = jax.device_put(cast(jnp.asarray(q)))

            @jax.jit
            def mm_sum(qm, cm):
                return jnp.sum(jnp.matmul(qm, cm.T, **mm_kw))

            @jax.jit
            def mm_out(qm, cm):
                return jnp.matmul(qm, cm.T, **mm_kw)

            @jax.jit
            def full(qm, cm):
                return lax.top_k(jnp.matmul(qm, cm.T, **mm_kw), k)

            ts = _time(mm_sum, q_dev, c_dev, reps=args.reps)
            to = _time(mm_out, q_dev, c_dev, reps=args.reps)
            tf = _time(full, q_dev, c_dev, reps=args.reps)

        print(f"{name}: matmul+sum {ts * 1e3:7.2f} ms "
              f"({flops / ts / 1e12:6.1f} TFLOP/s) | "
              f"matmul-out {to * 1e3:7.2f} ms "
              f"({flops / to / 1e12:6.1f}) | "
              f"full(topk) {tf * 1e3:7.2f} ms "
              f"({flops / tf / 1e12:6.1f}) | "
              f"write+topk overhead {(tf - ts) * 1e3:6.2f} ms")


if __name__ == "__main__":
    main()
