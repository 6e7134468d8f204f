"""Symmetric InfoNCE with cross-device global negatives.

Loss semantics match ``DenseEmbTrainer.compute_loss``
(/root/reference/src/trainer.py:22-74): L2-normalized text/image reps, the
similarity of every local item against the *global* batch of the other
modality divided by τ, cross-entropy against the diagonal (offset by the
shard's position), averaged over both directions.

TPU-native difference: there is no manual NCCL ``all_gather`` + rank-slot
reinsertion (/root/reference/src/trainer.py:38-53). In single-controller JAX
the whole global batch lives in one jitted program — ``jit`` over the mesh
partitions the ``[B, B]`` similarity matmul and inserts the ICI collectives,
and gradients flow through gathered negatives by construction. The
``gather_save_gradient=False`` variant (gradients blocked through *remote*
shards' negatives) is expressed with ``shard_map`` + ``stop_gradient`` on the
gathered copies, reinserting the local differentiable slice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from mllm_sparse_retrieval_tpu.models.reps import normalize
from mllm_sparse_retrieval_tpu.parallel.mesh import DATA_AXIS


def _symmetric_ce(i2t_sim: jax.Array, t2i_sim: jax.Array,
                  labels: jax.Array) -> jax.Array:
    def ce(sim):
        logp = jax.nn.log_softmax(sim.astype(jnp.float32), axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))
    return (ce(i2t_sim) + ce(t2i_sim)) / 2.0


def info_nce_loss(text_reps: jax.Array, img_reps: jax.Array,
                  tau: float) -> jax.Array:
    """Global-batch symmetric InfoNCE (the ``gather_save_gradient=True``
    semantics; under jit-over-mesh the batch IS the global batch)."""
    t = normalize(text_reps)
    i = normalize(img_reps)
    i2t = (i @ t.T) / tau
    t2i = (t @ i.T) / tau
    labels = jnp.arange(t.shape[0])
    return _symmetric_ce(i2t, t2i, labels)


def sharded_info_nce_loss(
    mesh: Mesh,
    text_reps: jax.Array,   # [B_global, d], sharded over data axis
    img_reps: jax.Array,
    tau: float,
    gather_save_gradient: bool = True,
) -> jax.Array:
    """shard_map formulation with explicit per-shard locality.

    ``gather_save_gradient=True`` reproduces ``info_nce_loss`` exactly (and
    the two are tested for loss+grad equality); ``False`` stops gradients
    through every remote shard's gathered reps while keeping the local
    shard's differentiable — the reference's detach-and-reinsert trick
    (/root/reference/src/trainer.py:45-53) without the manual bookkeeping.
    """

    def local_loss(t_local, i_local):
        t_local = normalize(t_local)
        i_local = normalize(i_local)
        b_local = t_local.shape[0]
        shard = lax.axis_index(DATA_AXIS)

        t_all = lax.all_gather(t_local, DATA_AXIS, axis=0, tiled=True)
        i_all = lax.all_gather(i_local, DATA_AXIS, axis=0, tiled=True)
        if not gather_save_gradient:
            t_all = lax.dynamic_update_slice_in_dim(
                lax.stop_gradient(t_all), t_local, shard * b_local, axis=0)
            i_all = lax.dynamic_update_slice_in_dim(
                lax.stop_gradient(i_all), i_local, shard * b_local, axis=0)

        labels = jnp.arange(b_local) + shard * b_local
        i2t = (i_local @ t_all.T) / tau
        t2i = (t_local @ i_all.T) / tau
        # mean over local rows, then mean over shards == global mean
        return lax.pmean(_symmetric_ce(i2t, t2i, labels), DATA_AXIS)

    fn = shard_map(
        local_loss, mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None)),
        out_specs=P(),
        check_vma=False,
    )
    return fn(text_reps, img_reps)
