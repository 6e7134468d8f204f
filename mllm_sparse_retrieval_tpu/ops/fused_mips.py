"""Fused MIPS top-k: matmul + running top-k in one Pallas kernel.

Why this exists (measured on the v5e-1, `tools/mxu_probe.py`, BASELINE.md
"Dense MXU utilization bound"): the XLA program `lax.top_k(q @ C.T)` is
bound not by the MXU but by the [B, N] f32 scores intermediate — at
200k docs x 512 d, batch 4096, the bf16 matmul alone runs 7.45 ms
(112.6 TFLOP/s = 57% MFU) while the full program takes 40.27 ms: +9.7 ms
to write the 3.28 GB scores to HBM and +23 ms for `lax.top_k` to re-read
and select over them. This kernel never materializes the scores: each
(query-tile, doc-block) step computes a [Bt, Nc] score tile on the MXU
into VMEM scratch and folds it into a running per-query top-k held in the
tail 128 lanes of the same scratch, so HBM traffic is just the operands
(corpus streamed once per query tile) plus a [B, 128] result.

Replaces the GPU-clone dense path the reference delegates to FAISS
(`/root/reference/src/search.py:254-270`) at large N; `ops/mips.py` stays
the default and the parity oracle.

Semantics: exact top-k. Ties order by ascending doc id, the same stable
rule as `lax.top_k` (the extraction picks the minimum id among maximal
scores each round). Scores accumulate in f32 on the MXU exactly as in
`ops/mips.py`; bf16/f32 operands supported (int8 SQ8 stays on the
unfused path — its scale epilogue wants a different tile plan).

Shape plan: the whole extraction runs on the VPU at ~4 passes over
[Bt, Nc+128] per extracted element, so cost is ~4k * B * N VPU ops total
— small next to the matmul at the shapes where the fused kernel is used
(k <= 128 enforced; use `ops/mips.py` beyond).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mllm_sparse_retrieval_tpu.ops.packing import pack_topk

TAIL = 128          # running-candidate lanes appended to the score tile
_NEG = float("-inf")
_VMEM_BUDGET = 11_796_480   # 11.25 MB: headroom under the ~16 MB core VMEM


def plan_tiles(n_q: int, dim: int, q_bytes: int) -> Tuple[int, int]:
    """Pick (query-tile rows Bt, doc-block rows Nc) under the VMEM budget.

    Accounting (double-buffered corpus block, single-buffered scratch):
      q tile        Bt * dim * q_bytes
      corpus block  2 * Nc * dim * q_bytes
      comb + ids    2 * Bt * (Nc + TAIL) * 4
      ext scratch   2 * Bt * TAIL * 4        (+ the dot's [Bt, Nc] temp)
    """
    nc = 512 if dim <= 1024 else 256
    for bt in (1024, 512, 256, 128, 64, 32, 16, 8):
        if bt > max(n_q, 8):
            continue
        use = (bt * dim * q_bytes + 2 * nc * dim * q_bytes
               + 2 * bt * (nc + TAIL) * 4 + 2 * bt * TAIL * 4
               + bt * nc * 4)
        if use <= _VMEM_BUDGET:
            return bt, nc
    return 8, nc


def _fused_kernel(q_ref, c_ref, vals_ref, idx_ref,
                  comb, ids, ext_vals, ext_idx,
                  *, nc: int, n_blocks: int, n_valid: int, k: int):
    nb = pl.program_id(1)
    bt = comb.shape[0]

    @pl.when(nb == 0)
    def _():                                   # fresh query tile: empty tail
        comb[:, nc:] = jnp.full((bt, TAIL), _NEG, jnp.float32)
        ids[:, nc:] = jnp.zeros((bt, TAIL), jnp.int32)

    col = lax.broadcasted_iota(jnp.int32, (bt, nc), 1)
    gids = col + nb * nc
    # HIGHEST matches ops/mips.py: exact f32 scoring for f32 operands (the
    # TPU default would truncate them to bf16); bf16 operands unaffected.
    scores = lax.dot_general(
        q_ref[:], c_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST)
    # Padding rows (zero vectors) score 0.0, which would beat negative real
    # scores — mask them. Only the final block can contain padding.
    @pl.when(nb == n_blocks - 1)
    def _():
        comb[:, :nc] = jnp.where(gids < n_valid, scores, _NEG)

    @pl.when(nb != n_blocks - 1)
    def _():
        comb[:, :nc] = scores

    ids[:, :nc] = gids

    ext_vals[:] = jnp.full((bt, TAIL), _NEG, jnp.float32)
    ext_idx[:] = jnp.zeros((bt, TAIL), jnp.int32)
    lane = lax.broadcasted_iota(jnp.int32, (bt, TAIL), 1)

    def extract(i, _):
        c = comb[:]
        id_tile = ids[:]
        m = jnp.max(c, axis=1, keepdims=True)                    # [Bt, 1]
        chosen = jnp.min(
            jnp.where(c == m, id_tile, jnp.int32(2**31 - 1)),
            axis=1, keepdims=True)                               # [Bt, 1]
        ext_vals[:] = jnp.where(lane == i, m, ext_vals[:])
        ext_idx[:] = jnp.where(lane == i, chosen, ext_idx[:])
        comb[:] = jnp.where(id_tile == chosen, _NEG, c)
        return 0

    lax.fori_loop(0, k, extract, 0)

    # The k extracted (score-descending) pairs become the running tail for
    # the next block and, on the last block, the output tile.
    comb[:, nc:] = ext_vals[:]
    ids[:, nc:] = ext_idx[:]
    vals_ref[:] = ext_vals[:]
    idx_ref[:] = ext_idx[:]


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def fused_mips_topk(queries: jax.Array, corpus: jax.Array, k: int,
                    *, interpret: bool = False
                    ) -> Tuple[jax.Array, jax.Array]:
    """Exact MIPS top-k without materializing [B, N] scores.

    queries [B, d], corpus [N, d] (same dtype, bf16 or f32); returns
    (scores [B, k] f32, indices [B, k] i32), scores descending.
    """
    n_q, dim = queries.shape
    n_valid = corpus.shape[0]
    if not (0 < k <= min(TAIL, n_valid)):
        raise ValueError(f"fused top-k needs 0 < k <= {min(TAIL, n_valid)}")

    bt, nc = plan_tiles(n_q, dim, queries.dtype.itemsize)
    b_pad = -(-n_q // bt) * bt
    n_pad = -(-n_valid // nc) * nc
    if b_pad != n_q:
        queries = jnp.pad(queries, ((0, b_pad - n_q), (0, 0)))
    if n_pad != n_valid:
        corpus = jnp.pad(corpus, ((0, n_pad - n_valid), (0, 0)))
    n_blocks = n_pad // nc

    kern = functools.partial(_fused_kernel, nc=nc, n_blocks=n_blocks,
                             n_valid=n_valid, k=k)
    vals, idx = pl.pallas_call(
        kern,
        grid=(b_pad // bt, n_blocks),
        in_specs=[
            pl.BlockSpec((bt, dim), lambda qt, nb: (qt, 0)),
            pl.BlockSpec((nc, dim), lambda qt, nb: (nb, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bt, TAIL), lambda qt, nb: (qt, 0)),
            pl.BlockSpec((bt, TAIL), lambda qt, nb: (qt, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, TAIL), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, TAIL), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bt, nc + TAIL), jnp.float32),
            pltpu.VMEM((bt, nc + TAIL), jnp.int32),
            pltpu.VMEM((bt, TAIL), jnp.float32),
            pltpu.VMEM((bt, TAIL), jnp.int32),
        ],
        interpret=interpret,
    )(queries, corpus)
    return vals[:n_q, :k], idx[:n_q, :k]


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def fused_mips_topk_packed(queries: jax.Array, corpus: jax.Array, k: int,
                           *, interpret: bool = False) -> jax.Array:
    """`fused_mips_topk` in the serving wire form: one [B, 2k] int32 array
    (scores bitcast next to ids — `ops.packing.unpack_topk` inverts)."""
    return pack_topk(*fused_mips_topk(queries, corpus, k,
                                      interpret=interpret))
