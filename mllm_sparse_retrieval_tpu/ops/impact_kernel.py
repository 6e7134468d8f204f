"""Pallas TPU kernel: term-at-a-time impact scoring.

The XLA path (index/impact.py) scores a query batch as a dense
``[B, T'] @ [T', N]`` matmul — simple and MXU-fast, but it spends
``T'/Q ≈ 300×`` more FLOPs than the classical impact algorithm, because a
query touches only ``Q ≤ 128`` of the ``T'`` terms. TPUs have no hardware
gather, so the classical algorithm cannot be expressed efficiently in pure
XLA; this kernel implements it with explicit DMA:

for each query-tile (grid dim) the kernel walks the tile's query terms,
DMAs each term's posting row ``matrix[t+1, :]`` from HBM into a
double-buffered VMEM slot (next row's fetch overlaps the current row's
accumulate), and FMAs ``weight × row`` into a VMEM accumulator — HBM
traffic is ``Q × N × 4`` bytes per query (≈ 7 MB at COCO scale) instead of
the matmul's effective ``T' × N`` reads, an ~8× bandwidth win that grows
with vocabulary size.

The query term ids live in SMEM (per-tile BlockSpec), so they are scalar-
readable for DMA addressing. Padding entries must point at row 0 (the dead
zero row) with weight 0.

Layout note: Mosaic requires HBM slices aligned to the (8, 128) f32 tile, so
a term's N-column posting row cannot be DMA'd as a ``[1, N]`` slice. The
matrix is therefore viewed as ``[T+1, 8, N/8]`` — one aligned ``[8, N/8]``
block per term, bit-identical to the flat row under row-major order — and
scores come back as ``[B, 8, N/8]`` reshaped to ``[B, N]``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QUERY_TILE = 8  # queries scored per grid step


def _taat_kernel(qidx_ref, qw_ref, matrix_ref, out_ref, rowbuf, sems,
                 *, num_terms_per_query: int):
    """One grid step: score QUERY_TILE queries against all N doc columns.

    matrix_ref: [T+1, 8, N/8] in HBM; out_ref: [QT, 8, N/8] in VMEM.
    """
    q_count = out_ref.shape[0]
    total = q_count * num_terms_per_query

    def row_dma(slot, step):
        q = step // num_terms_per_query
        j = step % num_terms_per_query
        row = qidx_ref[q, j]
        return pltpu.make_async_copy(
            matrix_ref.at[row], rowbuf.at[slot], sems.at[slot])

    out_ref[:] = jnp.zeros_like(out_ref)
    row_dma(0, 0).start()

    def body(step, _):
        slot = step % 2
        nxt_slot = (step + 1) % 2

        @pl.when(step + 1 < total)
        def _():
            row_dma(nxt_slot, step + 1).start()

        row_dma(slot, step).wait()
        q = step // num_terms_per_query
        j = step % num_terms_per_query
        w = qw_ref[q, j]
        out_ref[q] = out_ref[q] + w * rowbuf[slot]
        return 0

    lax.fori_loop(0, total, body, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("interpret",))
def impact_scores_taat(
    matrix: jax.Array,   # [T+1, N] float32 impact matrix (row 0 = zeros)
    q_idx: jax.Array,    # [B, Q] int32 — term row ids +1 ALREADY APPLIED;
                         #   padding entries must be 0
    q_w: jax.Array,      # [B, Q] float32 — padding entries 0
    interpret: bool = False,
) -> jax.Array:
    """[B, N] impact scores via the term-at-a-time Pallas kernel.

    B must be a multiple of QUERY_TILE and N a multiple of 1024
    (8 sublanes × 128 lanes for the aligned per-term block view).
    """
    b, q = q_idx.shape
    t_rows, n = matrix.shape
    assert b % QUERY_TILE == 0, f"batch {b} % {QUERY_TILE} != 0"
    assert n % 1024 == 0, f"doc columns {n} % 1024 != 0"
    sub = n // 8
    matrix3 = matrix.reshape(t_rows, 8, sub)

    grid = (b // QUERY_TILE,)
    kernel = functools.partial(_taat_kernel, num_terms_per_query=q)
    scores = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((QUERY_TILE, q), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((QUERY_TILE, q), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((QUERY_TILE, 8, sub), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 8, sub), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 8, sub), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(q_idx, q_w, matrix3)
    return scores.reshape(b, n)


def prepare_query_arrays(q_idx, q_w):
    """Shift term ids to matrix rows (+1) and route padding to the dead row.

    Matches the XLA path's `_query_table` indexing (index/impact.py).
    """
    import numpy as np

    q_idx = np.asarray(q_idx)
    q_w = np.asarray(q_w, np.float32)
    safe = np.where(q_w > 0, q_idx + 1, 0).astype(np.int32)
    return safe, np.where(q_w > 0, q_w, 0.0).astype(np.float32)
