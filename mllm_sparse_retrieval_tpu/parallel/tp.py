"""Tensor-parallel sharding specs for the MLLM parameter tree.

Megatron-style layout over the mesh's ``model`` axis, expressed as GSPMD
shardings (SURVEY.md §2.3: TP is absent in the reference — static layer
placement only, /root/reference/src/utils.py:13-38 — and is provided here as
a mesh axis so larger models/corpora shard over ICI):

- attention q/k/v and MLP gate/up: output-dim sharded  ``P(None, model)``
- attention o and MLP down: input-dim sharded           ``P(model, None)``
- embeddings / norms / heads: replicated

Under ``jit`` XLA inserts the all-reduces after o/down projections
automatically; no manual collectives.
"""

from __future__ import annotations

from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mllm_sparse_retrieval_tpu.parallel.mesh import MODEL_AXIS

_COL_SHARDED = {"q", "k", "v", "gate", "up", "qkv", "fc1"}   # [in, out@model]
_ROW_SHARDED = {"o", "down", "out", "fc2"}                    # [in@model, out]


def _spec_for(path_names, leaf) -> P:
    names = [str(n) for n in path_names]
    if getattr(leaf, "ndim", 0) != 2:
        return P()
    # .../blocks/<i>/<proj>/w
    if len(names) >= 2 and names[-1] == "w":
        proj = names[-2]
        if proj in _COL_SHARDED:
            return P(None, MODEL_AXIS)
        if proj in _ROW_SHARDED:
            return P(MODEL_AXIS, None)
    return P()


def tp_param_shardings(params: Dict, mesh: Mesh):
    """NamedSharding tree for megatron-style TP over the model axis.

    Dimensions that don't divide the axis size fall back to replication
    (GSPMD requires even sharding for these specs).
    """
    n = mesh.shape[MODEL_AXIS]

    def make(path, leaf):
        spec = _spec_for([getattr(p, "key", getattr(p, "idx", p))
                          for p in path], leaf)
        # verify divisibility; replicate otherwise
        for axis, name in enumerate(spec):
            if name == MODEL_AXIS and leaf.shape[axis] % n != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(make, params)


def shard_params_tp(params: Dict, mesh: Mesh) -> Dict:
    """Place a param tree on the mesh with TP shardings."""
    return jax.device_put(params, tp_param_shardings(params, mesh))
