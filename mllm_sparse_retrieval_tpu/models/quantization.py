"""Weight quantization for memory-constrained loading (nf4 / int8 / int4).

Capability analogue of the reference's bitsandbytes 4-bit/8-bit load path
(``BitsAndBytesConfig(load_in_4bit, nf4, double_quant)`` +
``prepare_model_for_kbit_training``, /root/reference/src/train.py:91-115):
base-model weights are STORED quantized and dequantized per use inside
``layers.dense`` — one layer's weight exists in the compute dtype at a
time, so the resident tree is the quantized bytes, exactly the QLoRA
memory model. LoRA adapters stay full precision, so QLoRA-style
fine-tuning = quantized frozen base + fp LoRA tree, which the trainer
supports directly (``cli/train.py --load-kbit {4,8}``).

``QuantizedWeight`` is a registered pytree: ``q``/``scale`` (and the nf4
double-quant leaves) are data (jit/device_put/shard-transparent),
``bits``/``shape``/``mode`` are static metadata. It quacks like an array
for the shape probes the codebase uses (``.shape``/``.ndim``/``.nbytes``),
so LoRA init against a quantized tree still reads the logical [in, out]
dims.

Three storage modes:

- ``nf4`` (default on the 4-bit product path, matching the reference's
  bnb_4bit_quant_type='nf4' + double quantization): blockwise absmax over
  64 input rows per output column, 4-bit indices into the 16-value
  NormalFloat codebook (the information-theoretically optimal code for
  N(0,1) weights), and the per-block absmax themselves stored int8 with a
  per-column second-level (scale, offset) — bnb's "double quant" — so the
  scale overhead is ~0.4 bytes per 64 weights instead of 4.
- ``linear`` int4: per-output-channel symmetric, two values per byte.
- int8: per-output-channel symmetric.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

# The 16 NormalFloat-4 code values (bitsandbytes' nf4 table: equal-mass
# quantiles of N(0, 1) rescaled to [-1, 1], with an exact zero). Sorted
# ascending, so nearest-code assignment is a searchsorted over midpoints.
NF4_CODE = (
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0,
)
NF4_BLOCK = 64          # bnb's default 4-bit block size
NF4_SCALE_QMAX = 127.0  # double-quant: absmax stored int8 per column block


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=("q", "scale", "scale_q", "scale_off"),
                   meta_fields=("bits", "logical_shape", "mode"))
@dataclass
class QuantizedWeight:
    """A dense [in, out] weight stored quantized.

    ``q``: int8 — [in, out] for 8-bit, [ceil(in/2), out] packed nibbles
    (linear int4) or packed codebook indices (nf4) for 4-bit.
    ``mode='linear'``: ``scale`` is the float32 [1, out] per-output-channel
    scale; ``scale_q``/``scale_off`` are None.
    ``mode='nf4'``: blockwise absmax over ``NF4_BLOCK`` input rows, double
    quantized — ``scale_q`` int8 [n_blocks, out], ``scale`` f32 [1, out]
    second-level scale, ``scale_off`` f32 [1, out] per-column mean offset;
    absmax = scale_q * scale + scale_off.
    ``bits``: 4 or 8; ``logical_shape``: the original (in, out).
    """

    q: jax.Array
    scale: jax.Array
    bits: int
    logical_shape: Tuple[int, int]
    scale_q: Optional[jax.Array] = None
    scale_off: Optional[jax.Array] = None
    mode: str = "linear"

    @property
    def shape(self) -> Tuple[int, int]:
        return self.logical_shape

    @property
    def ndim(self) -> int:
        return len(self.logical_shape)

    @property
    def nbytes(self) -> int:
        n = int(self.q.nbytes) + int(self.scale.nbytes)
        if self.scale_q is not None:
            n += int(self.scale_q.nbytes)
        if self.scale_off is not None:
            n += int(self.scale_off.nbytes)
        return n

    @property
    def dtype(self):
        """Logical (dequantized) dtype — callers probe it to pick the
        activation compute dtype (e.g. patch embeds cast pixels to it)."""
        return self.scale.dtype


def quantize_weight(w: jax.Array, bits: int = 8,
                    mode: str = "linear") -> QuantizedWeight:
    """Quantize a [in, out] matrix (``mode='linear'`` per-output-channel
    symmetric; ``mode='nf4'`` blockwise NormalFloat codebook, 4-bit only)."""
    if bits not in (4, 8):
        raise ValueError("bits must be 4 or 8")
    if mode == "nf4":
        if bits != 4:
            raise ValueError("nf4 is a 4-bit format (got bits=8)")
        return _quantize_nf4(w)
    if mode != "linear":
        raise ValueError(f"mode must be 'linear' or 'nf4', got {mode!r}")
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
    if entry.mode == "nf4":
        return _dequantize_nf4(entry, dtype)
    q = entry.q
    if entry.bits == 4:
        q = _unpack_int4(q, entry.logical_shape[0])
    return (q.astype(jnp.float32) * entry.scale).astype(dtype)


def _quantize_nf4(w: jax.Array) -> QuantizedWeight:
    """Blockwise nf4 with double-quantized absmax.

    Blocks run along the INPUT axis (64 consecutive rows per output
    column) — the layout equivalent of bnb's flat 64-element blocks that
    keeps every tensor 2-D, which XLA tiles onto the VPU without relayout.
    """
    in_dim, out_dim = w.shape
    w = jnp.asarray(w, jnp.float32)
    pad = (-in_dim) % NF4_BLOCK
    if pad:
        w = jnp.concatenate([w, jnp.zeros((pad, out_dim), jnp.float32)])
    nb = w.shape[0] // NF4_BLOCK
    blocks = w.reshape(nb, NF4_BLOCK, out_dim)
    absmax = jnp.max(jnp.abs(blocks), axis=1)            # [nb, out]
    safe = jnp.where(absmax == 0, 1.0, absmax)
    norm = blocks / safe[:, None, :]                     # in [-1, 1]
    code = jnp.asarray(NF4_CODE, jnp.float32)
    mid = (code[1:] + code[:-1]) / 2.0                   # 15 boundaries
    idx = jnp.searchsorted(mid, norm).astype(jnp.int8)   # nearest code
    idx = idx.reshape(w.shape[0], out_dim)
    # double quant: absmax -> int8 around the per-column mean
    off = jnp.mean(absmax, axis=0, keepdims=True)        # [1, out]
    centered = absmax - off
    s2 = jnp.max(jnp.abs(centered), axis=0, keepdims=True) / NF4_SCALE_QMAX
    s2 = jnp.where(s2 == 0, 1.0, s2)
    scale_q = jnp.clip(jnp.round(centered / s2),
                       -NF4_SCALE_QMAX, NF4_SCALE_QMAX).astype(jnp.int8)
    return QuantizedWeight(
        q=_pack_uint4(idx), scale=s2.astype(jnp.float32), bits=4,
        logical_shape=(in_dim, out_dim), scale_q=scale_q,
        scale_off=off.astype(jnp.float32), mode="nf4")


def _dequantize_nf4(entry: QuantizedWeight, dtype) -> jax.Array:
    in_dim, out_dim = entry.logical_shape
    idx = _unpack_uint4(entry.q)                         # [in_pad, out]
    code = jnp.asarray(NF4_CODE, jnp.float32)
    vals = jnp.take(code, idx.astype(jnp.int32))
    absmax = (entry.scale_q.astype(jnp.float32) * entry.scale
              + entry.scale_off)                         # [nb, out]
    nb = idx.shape[0] // NF4_BLOCK
    w = vals.reshape(nb, NF4_BLOCK, out_dim) * absmax[:, None, :]
    return w.reshape(idx.shape[0], out_dim)[:in_dim].astype(dtype)


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


def _pack_uint4(idx: jax.Array) -> jax.Array:
    """[in, out] values in 0..15 -> [ceil(in/2), out] packed bytes."""
    rows = idx.shape[0]
    if rows % 2:
        idx = jnp.concatenate([idx, jnp.zeros((1, idx.shape[1]), idx.dtype)])
    lo = idx[0::2] & 0x0F
    hi = (idx[1::2] & 0x0F) << 4
    return (lo | hi).astype(jnp.int8)


def _unpack_uint4(packed: jax.Array) -> jax.Array:
    lo = (packed & 0x0F).astype(jnp.uint8)
    hi = ((packed >> 4) & 0x0F).astype(jnp.uint8)
    return jnp.stack([lo, hi], axis=1).reshape(-1, packed.shape[1])


def _is_quantizable(path_names, leaf) -> bool:
    return (not isinstance(leaf, QuantizedWeight) and
            getattr(leaf, "ndim", 0) == 2 and
            str(path_names[-1]) == "w" and leaf.size >= 1024)


def quantize_params(params: Dict, bits: int = 8, skip_embed: bool = True,
                    mode: str = "linear") -> Dict:
    """Quantize every eligible dense weight in a param tree.

    Embeddings/LM head stay full precision by default (the reference's kbit
    path likewise keeps lm_head/embeddings out, src/utils.py:120-134).
    ``mode='nf4'`` (4-bit only) is the reference's bnb format; the train CLI
    uses it by default for ``--load-kbit 4``.
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
            return quantize_weight(tree, bits, mode=mode)
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
