"""Sequence parallelism: ring attention over the model axis.

Long anyres/tiling prompts (~3k tokens, /root/reference/src/utils.py:41-117)
make *activations* — not params — the memory bottleneck of multi-chip
encode. This module shards the sequence dimension over the ``model`` mesh
axis: every per-token op in the decoder block (norms, projections, SwiGLU,
RoPE) is local to its sequence shard, and attention becomes a ring — each
device scores its query chunk against the KV chunk it currently holds,
accumulates flash-style (running max / normalizer / weighted values), and
``ppermute``s the KV chunk one step around the ring. Per-device attention
memory drops from O(T^2) to O((T/N)^2 · N worked serially) and activations
from O(T) to O(T/N), with the KV rotation riding ICI.

Semantics match ``layers.attention`` exactly (f32-min additive masking, f32
softmax accumulation): parity-tested against the sequential decoder in
``tests/test_sequence_parallel.py``. Differentiable end-to-end (``ppermute``
transposes to the reverse rotation) — usable for both encode and training.

Reference capability slot: DeepSpeed/NCCL scale-out
(/root/reference/src/train.py:41-57); sequence parallelism itself exceeds
reference parity (its engine shards only data/params).
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from mllm_sparse_retrieval_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def ring_attention(q, k, v, kv_mask, axis_name: str, n_chunks: int, *,
                   scale: Optional[float] = None):
    """Causal+padding attention with sequence sharded over ``axis_name``.

    Call INSIDE a shard_map whose ``axis_name`` axis carries contiguous
    sequence chunks. ``q``: [B, Tl, Hq, Dh]; ``k``/``v``: [B, Tl, Hkv, Dh]
    (GQA: Hq a multiple of Hkv); ``kv_mask``: [B, Tl] padding mask for the
    local chunk. Returns [B, Tl, Hq, Dh] for the local query chunk.
    """
    b, tl, hq, dh = q.shape
    hkv = k.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(dh)
    if hq != hkv:
        rep = hq // hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    my = lax.axis_index(axis_name)
    neg = jnp.finfo(jnp.float32).min
    qf = q.astype(jnp.float32)
    rows = jnp.arange(tl)

    acc_o = jnp.zeros((b, hq, tl, dh), jnp.float32)
    acc_m = jnp.full((b, hq, tl), neg, jnp.float32)
    acc_l = jnp.zeros((b, hq, tl), jnp.float32)
    perm = [(i, (i + 1) % n_chunks) for i in range(n_chunks)]

    def step(carry, s):
        k_cur, v_cur, m_cur, acc_o, acc_m, acc_l = carry
        kvid = (my - s) % n_chunks
        scores = jnp.einsum("bthd,bshd->bhts", qf,
                            k_cur.astype(jnp.float32),
                            preferred_element_type=jnp.float32) * scale
        causal = (kvid * tl + rows)[None, :] <= (my * tl + rows)[:, None]
        allow = causal[None, None] & m_cur.astype(bool)[:, None, None, :]
        scores = jnp.where(allow, scores, neg)
        s_max = scores.max(axis=-1)
        new_m = jnp.maximum(acc_m, s_max)
        p = jnp.exp(scores - new_m[..., None])
        alpha = jnp.exp(acc_m - new_m)
        acc_l = acc_l * alpha + p.sum(axis=-1)
        acc_o = acc_o * alpha[..., None] + jnp.einsum(
            "bhts,bshd->bhtd", p, v_cur.astype(jnp.float32))
        if n_chunks > 1:
            k_cur = lax.ppermute(k_cur, axis_name, perm)
            v_cur = lax.ppermute(v_cur, axis_name, perm)
            m_cur = lax.ppermute(m_cur, axis_name, perm)
        return (k_cur, v_cur, m_cur, acc_o, new_m, acc_l), None

    carry = (k, v, kv_mask, acc_o, acc_m, acc_l)
    (_, _, _, acc_o, _, acc_l), _ = lax.scan(step, carry,
                                             jnp.arange(n_chunks))
    out = acc_o / jnp.maximum(acc_l, 1e-30)[..., None]
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def apply_sequence_parallel(
    params: Dict,
    inputs_embeds: jax.Array,      # [B, T, H]
    attention_mask: jax.Array,     # [B, T]
    cfg,                           # models.llama.LlamaConfig
    mesh: Mesh,
    lora: Optional[Dict] = None,
    position_ids: Optional[jax.Array] = None,  # [B,T] or [3,B,T] (M-RoPE)
) -> jax.Array:
    """Sequence-parallel equivalent of ``models.llama.apply``.

    The sequence axis shards over ``model``; the batch rides ``data`` when
    divisible. Params (and LoRA adapters) are replicated — this is pure
    activation sharding, the right trade for long-context *encode* where a
    ~3k-token anyres batch's activations dominate HBM, and it composes with
    the data axis the encode pipeline already shards. ``position_ids``
    follows ``llama.apply``'s contract (per-sample or 3-D M-RoPE): the
    [B, T, hd/2] tables shard over (data, model) like the activations.
    """
    from mllm_sparse_retrieval_tpu.models import layers as L
    from mllm_sparse_retrieval_tpu.models import llama

    if cfg.moe is not None:
        raise ValueError("sequence parallelism supports dense-FFN decoders "
                         "only; MoE blocks return (x, aux) — compose "
                         "parallel/ep.py with dp x tp instead")
    b, t, _ = inputs_embeds.shape
    n_sp = mesh.shape[MODEL_AXIS]
    if t % n_sp != 0:
        raise ValueError(f"seq len {t} not divisible by model axis {n_sp}")
    n_data = mesh.shape[DATA_AXIS]
    data_ax = DATA_AXIS if (n_data > 1 and b % n_data == 0) else None
    cos, sin = llama.rope_tables(cfg, t, position_ids)
    cos_spec = P(data_ax, MODEL_AXIS) if cos.ndim == 3 else P(MODEL_AXIS)

    has_lora = lora is not None and lora.get("blocks")

    def body(params_l, lora_l, x, mask, cos_l, sin_l):
        def attn_impl(q, k, v):
            return ring_attention(q, k, v, mask, MODEL_AXIS, n_sp)

        for i, blk in enumerate(params_l["blocks"]):
            blora = lora_l["blocks"][i] if has_lora else None
            if blora is not None and not blora:
                blora = None
            x = llama._block(x, blk, cfg, None, cos_l, sin_l, blora,
                             attn_impl=attn_impl)
        return L.rmsnorm(x, params_l["final_norm"], cfg.rms_eps)

    lora_in = lora if has_lora else {"blocks": ()}
    lora_spec = jax.tree_util.tree_map(lambda _: P(), lora_in)
    from jax import shard_map
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(jax.tree_util.tree_map(lambda _: P(), params),
                  lora_spec,
                  P(data_ax, MODEL_AXIS),
                  P(data_ax, MODEL_AXIS),
                  cos_spec, cos_spec),
        out_specs=P(data_ax, MODEL_AXIS),
        check_vma=False)
    return fn(params, lora_in, inputs_embeds, attention_mask, cos, sin)
