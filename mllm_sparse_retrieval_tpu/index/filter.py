"""Batch-wide document filters: tenant/collection-scoped search.

A production serving capability the reference stack has no equivalent for
(its FAISS flat index and Lucene scripts always search the whole corpus;
Lucene-the-engine restricts *posting traversal* per filter — a
data-dependent walk that does not map to XLA). The TPU-native shape:
the filter is ONE ``[n_docs]`` bool operand per program call; scores of
excluded docs are set to ``-inf`` after the (dense-matmul / TAAT-kernel)
scoring pass and before ``top_k``, so the engines' compiled programs stay
static-shaped and the filter costs one fused ``where`` — no per-query
Python, no posting-list surgery, any filter selectivity.

``DocFilter`` is built once from doc ids (allow- or deny-list) against a
specific index's doc order and CACHES its padded device placement per
(index row order, mesh), so reusing a filter across queries/batches pays
the host->device upload once. Both engines accept ``doc_filter=`` on
their search entry points; filtered-out docs are never returned (they
rank at -inf and the resolve paths drop them), so rows become ragged when
fewer than ``depth`` allowed docs match — exactly the tombstone semantics
of the live layer (index/live.py), applied per request.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional, Tuple

import numpy as np


class DocFilter:
    """An immutable allow-mask over one index's document positions.

    Build with :meth:`from_ids` (against the index the searches will run
    on — positions are index-specific) or directly from a bool mask in the
    index's doc order. Reuse the instance across searches: the padded
    device copy is cached per (n_padded, mesh identity).
    """

    def __init__(self, mask: np.ndarray):
        mask = np.asarray(mask)
        if mask.dtype != np.bool_ or mask.ndim != 1:
            raise ValueError(f"mask must be a 1-D bool array, got "
                             f"{mask.dtype} {mask.shape}")
        self.mask = mask
        self.n_allowed = int(mask.sum())
        self._device: Dict[Tuple[int, Optional[int]], object] = {}

    @classmethod
    def from_ids(cls, doc_ids, ids: Iterable, mode: str = "allow"
                 ) -> "DocFilter":
        """Build from doc-id strings against ``doc_ids`` (an index's doc
        order: ``ImpactIndex.doc_ids`` or ``DenseFlatIndex.lookup``).
        ``mode='allow'`` keeps exactly these ids; ``'deny'`` excludes them.
        Unknown ids are ignored (they match nothing either way)."""
        if mode not in ("allow", "deny"):
            raise ValueError(f"mode must be 'allow' or 'deny', got {mode!r}")
        wanted = {str(i) for i in ids}
        hit = np.fromiter((d in wanted for d in doc_ids), np.bool_,
                          len(doc_ids))
        return cls(hit if mode == "allow" else ~hit)

    def device_mask(self, n_padded: int, mesh=None):
        """The mask padded to ``n_padded`` (pad positions False) on device,
        replicated (single chip) or sharded over the mesh's data axis to
        match the engines' doc sharding. Cached per (n_padded, mesh) —
        keyed on the Mesh OBJECT (hashable), not id(): a reused address
        after GC must not alias a differently-sharded placement."""
        key = (int(n_padded), mesh)
        dev = self._device.get(key)
        if dev is not None:
            return dev
        if n_padded < self.mask.shape[0]:
            raise ValueError(f"filter built for {self.mask.shape[0]} docs; "
                             f"index has {n_padded} padded columns")
        padded = np.zeros(n_padded, np.bool_)
        padded[: self.mask.shape[0]] = self.mask
        import jax
        import jax.numpy as jnp

        if mesh is None:
            dev = jnp.asarray(padded)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from mllm_sparse_retrieval_tpu.parallel.mesh import DATA_AXIS
            dev = jax.device_put(padded,
                                 NamedSharding(mesh, P(DATA_AXIS)))
        self._device[key] = dev
        return dev
