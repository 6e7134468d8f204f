"""Weight quantization for memory-constrained loading (int8 / packed int4).

Capability analogue of the reference's bitsandbytes 4-bit/8-bit load path
(``BitsAndBytesConfig(load_in_4bit, nf4, double_quant)`` +
``prepare_model_for_kbit_training``, /root/reference/src/train.py:91-115):
base-model weights are STORED quantized (per-output-channel symmetric) and
dequantized per use inside ``layers.dense`` — one layer's weight exists in
the compute dtype at a time, so the resident tree is the int8/int4 bytes,
exactly the QLoRA memory model. LoRA adapters stay full precision, so
QLoRA-style fine-tuning = quantized frozen base + fp LoRA tree, which the
trainer supports directly (``cli/train.py --load-kbit {4,8}``).

``QuantizedWeight`` is a registered pytree: ``q``/``scale`` are data leaves
(jit/device_put/shard-transparent), ``bits``/``shape`` are static metadata.
It quacks like an array for the shape probes the codebase uses
(``.shape``/``.ndim``/``.nbytes``), so LoRA init against a quantized tree
still reads the logical [in, out] dims.

int8: one scale per output channel. int4: two values packed per int8 byte
with the same per-channel scaling.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=("q", "scale"),
                   meta_fields=("bits", "logical_shape"))
@dataclass
class QuantizedWeight:
    """A dense [in, out] weight stored quantized.

    ``q``: int8 — [in, out] for 8-bit, [ceil(in/2), out] packed nibbles for
    4-bit; ``scale``: float32 [1, out] per-output-channel scale;
    ``bits``: 4 or 8; ``logical_shape``: the original (in, out).
    """

    q: jax.Array
    scale: jax.Array
    bits: int
    logical_shape: Tuple[int, int]

    @property
    def shape(self) -> Tuple[int, int]:
        return self.logical_shape

    @property
    def ndim(self) -> int:
        return len(self.logical_shape)

    @property
    def nbytes(self) -> int:
        return int(self.q.nbytes) + int(self.scale.nbytes)

    @property
    def dtype(self):
        """Logical (dequantized) dtype — callers probe it to pick the
        activation compute dtype (e.g. patch embeds cast pixels to it)."""
        return self.scale.dtype


def quantize_weight(w: jax.Array, bits: int = 8) -> QuantizedWeight:
    """Per-output-channel symmetric quantization of a [in, out] matrix."""
    if bits not in (4, 8):
        raise ValueError("bits must be 4 or 8")
    w = jnp.asarray(w, jnp.float32)
    qmax = 127.0 if bits == 8 else 7.0
    scale = jnp.max(jnp.abs(w), axis=0, keepdims=True) / qmax
    scale = jnp.where(scale == 0, 1.0, scale)
    q = jnp.clip(jnp.round(w / scale), -qmax, qmax).astype(jnp.int8)
    if bits == 4:
        q = _pack_int4(q)
    return QuantizedWeight(q=q, scale=scale.astype(jnp.float32), bits=bits,
                           logical_shape=tuple(w.shape))


def dequantize_weight(entry: QuantizedWeight, dtype=jnp.float32) -> jax.Array:
    q = entry.q
    if entry.bits == 4:
        q = _unpack_int4(q, entry.logical_shape[0])
    return (q.astype(jnp.float32) * entry.scale).astype(dtype)


def _pack_int4(q: jax.Array) -> jax.Array:
    """[in, out] int8 in [-7,7] -> [ceil(in/2), out] packed nibbles."""
    rows = q.shape[0]
    if rows % 2:
        q = jnp.concatenate([q, jnp.zeros((1, q.shape[1]), jnp.int8)])
    lo = q[0::2] & 0x0F
    hi = (q[1::2] & 0x0F) << 4
    return (lo | hi).astype(jnp.int8)


def _unpack_int4(packed: jax.Array, rows: int) -> jax.Array:
    lo = (packed & 0x0F).astype(jnp.int8)
    hi = ((packed >> 4) & 0x0F).astype(jnp.int8)
    # sign-extend 4-bit two's complement
    lo = jnp.where(lo > 7, lo - 16, lo)
    hi = jnp.where(hi > 7, hi - 16, hi)
    out = jnp.stack([lo, hi], axis=1).reshape(-1, packed.shape[1])
    return out[:rows]


def _is_quantizable(path_names, leaf) -> bool:
    return (not isinstance(leaf, QuantizedWeight) and
            getattr(leaf, "ndim", 0) == 2 and
            str(path_names[-1]) == "w" and leaf.size >= 1024)


def quantize_params(params: Dict, bits: int = 8,
                    skip_embed: bool = True) -> Dict:
    """Quantize every eligible dense weight in a param tree.

    Embeddings/LM head stay full precision by default (the reference's kbit
    path likewise keeps lm_head/embeddings out, src/utils.py:120-134).
    """

    def visit(tree, path=()):
        if isinstance(tree, dict):
            out = {}
            for k, v in tree.items():
                if skip_embed and k in ("embed", "lm_head"):
                    out[k] = v
                    continue
                out[k] = visit(v, path + (k,))
            return out
        if isinstance(tree, list):
            return [visit(v, path + (i,)) for i, v in enumerate(tree)]
        if _is_quantizable(path, tree):
            return quantize_weight(tree, bits)
        return tree

    return visit(params)


def dequantize_params(params: Dict, dtype=jnp.float32) -> Dict:
    """Restore a quantized tree to dense arrays in the compute dtype.

    NOTE: this rematerializes the WHOLE tree — it exists for export paths
    (e.g. merging adapters for artifact interchange). The training/inference
    forward never calls it; ``layers.dense`` dequantizes per use instead so
    the memory saving actually holds at runtime.
    """

    def visit(tree):
        if isinstance(tree, QuantizedWeight):
            return dequantize_weight(tree, dtype)
        if isinstance(tree, dict):
            return {k: visit(v) for k, v in tree.items()}
        if isinstance(tree, list):
            return [visit(v) for v in tree]
        return tree

    return visit(params)


def quantized_bytes(params: Dict) -> int:
    """Total bytes of a (possibly quantized) tree — for memory accounting."""
    return sum(int(leaf.nbytes)
               for leaf in jax.tree_util.tree_leaves(params)
               if hasattr(leaf, "nbytes"))
