"""Decoder LM: Llama-family architecture (RMSNorm, RoPE, GQA, SwiGLU).

The language backbone for the LLaVA/E5-V families (and, with config deltas,
Qwen2-style backbones: bias on qkv). Functional params, causal+padding
masking, float32 softmax/norms, bf16-friendly matmuls.

The LM head is *not* applied over the sequence here — the sparse head needs
logits only at one position per sample, so full ``[B, T, V]`` logits are
never materialized (SURVEY.md §7.4; the reference materializes them all,
/root/reference/src/model.py:96).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mllm_sparse_retrieval_tpu.models import layers as L


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 128256
    hidden_size: int = 4096
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    intermediate_size: int = 14336
    max_seq_len: int = 4096
    rope_theta: float = 500000.0
    rms_eps: float = 1e-5
    qkv_bias: bool = False       # True for Qwen2-style backbones
    tie_lm_head: bool = False
    # M-RoPE (Qwen2.5-VL): per-frequency-band section sizes over head_dim/2
    # for (temporal, height, width) position components; None = standard RoPE.
    mrope_section: Optional[Tuple[int, ...]] = None
    # Mixture-of-Experts FFN (Qwen-MoE / Mixtral-class backbones): replaces
    # the dense SwiGLU with parallel/ep.py's capacity-bucketed expert layer;
    # ``apply`` then returns ``(hidden, aux_loss)``. None = dense FFN.
    moe: Optional["MoEConfig"] = None  # noqa: F821 (parallel.ep.MoEConfig)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def init_params(key, cfg: LlamaConfig, dtype=jnp.float32) -> Dict:
    keys = jax.random.split(key, 3 + cfg.num_layers)
    params = {
        "embed": jax.random.normal(
            keys[0], (cfg.vocab_size, cfg.hidden_size), dtype) * 0.02,
        "final_norm": L.rmsnorm_init(cfg.hidden_size, dtype),
        "blocks": [],
    }
    if not cfg.tie_lm_head:
        params["lm_head"] = L.dense_init(
            keys[1], cfg.hidden_size, cfg.vocab_size, dtype=dtype)
    h = cfg.hidden_size
    dh = cfg.head_dim
    for i in range(cfg.num_layers):
        bk = jax.random.split(keys[3 + i], 7)
        blk = {
            "attn_norm": L.rmsnorm_init(h, dtype),
            "q": L.dense_init(bk[0], h, cfg.num_heads * dh, dtype=dtype),
            "k": L.dense_init(bk[1], h, cfg.num_kv_heads * dh, dtype=dtype),
            "v": L.dense_init(bk[2], h, cfg.num_kv_heads * dh, dtype=dtype),
            "o": L.dense_init(bk[3], cfg.num_heads * dh, h, dtype=dtype),
            "mlp_norm": L.rmsnorm_init(h, dtype),
        }
        if cfg.moe is not None:
            from mllm_sparse_retrieval_tpu.parallel import ep
            blk["moe"] = ep.moe_init(bk[4], h, cfg.intermediate_size,
                                     cfg.moe, dtype)
        else:
            blk["gate"] = L.dense_init(bk[4], h, cfg.intermediate_size,
                                       dtype=dtype)
            blk["up"] = L.dense_init(bk[5], h, cfg.intermediate_size,
                                     dtype=dtype)
            blk["down"] = L.dense_init(bk[6], cfg.intermediate_size, h,
                                       dtype=dtype)
        if cfg.qkv_bias:
            blk["q"]["b"] = jnp.zeros((cfg.num_heads * dh,), dtype)
            blk["k"]["b"] = jnp.zeros((cfg.num_kv_heads * dh,), dtype)
            blk["v"]["b"] = jnp.zeros((cfg.num_kv_heads * dh,), dtype)
        params["blocks"].append(blk)
    return params


def _block(x, p, cfg: LlamaConfig, mask, cos, sin,
           lora: Optional[Dict] = None, flash_mask=None, lora_rng=None,
           *, lora_dropout: float = 0.0, flash_mesh=None, attn_impl=None):
    """One decoder block. ``attn_impl(q, k, v) -> [B, T, Hq, Dh]`` overrides
    the attention computation (sequence-parallel ring attention passes the
    collective form here, parallel/sp.py); ``mask``/``flash_mask`` are then
    unused — the impl owns masking."""
    b, t, h = x.shape
    dh = cfg.head_dim
    lget = (lambda name: lora.get(name) if lora else None)
    # one dropout subkey per LoRA call site (static salt; distinct masks)
    site = [0]

    def ld(y, pname, name):
        rng = None
        if lora_rng is not None and lora_dropout > 0.0:
            rng = jax.random.fold_in(lora_rng, site[0])
        site[0] += 1
        return L.dense(y, p[pname], lget(name), lora_rng=rng,
                       lora_dropout=lora_dropout)

    y = L.rmsnorm(x, p["attn_norm"], cfg.rms_eps)
    q = ld(y, "q", "q").reshape(b, t, cfg.num_heads, dh)
    k = ld(y, "k", "k").reshape(b, t, cfg.num_kv_heads, dh)
    v = ld(y, "v", "v").reshape(b, t, cfg.num_kv_heads, dh)
    q = L.apply_rope(q, cos, sin)
    k = L.apply_rope(k, cos, sin)
    if attn_impl is not None:
        attn = attn_impl(q, k, v)
    elif flash_mask is not None:
        attn = L.flash_causal_attention(q, k, v, flash_mask,
                                        mesh=flash_mesh)
    else:
        attn = L.attention(q, k, v, mask)
    attn = attn.reshape(b, t, cfg.num_heads * dh)
    x = x + ld(attn, "o", "o")

    y = L.rmsnorm(x, p["mlp_norm"], cfg.rms_eps)
    if cfg.moe is not None:
        # MoE FFN (parallel/ep.py): experts are not LoRA targets; the block
        # additionally returns the Switch load-balance aux loss.
        from mllm_sparse_retrieval_tpu.parallel import ep
        ffn, aux = ep.moe_ffn(y, p["moe"], cfg.moe)
        return x + ffn, aux
    gated = jax.nn.silu(ld(y, "gate", "gate")) * ld(y, "up", "up")
    x = x + ld(gated, "down", "down")
    return x


def rope_tables(cfg: LlamaConfig, seq_len: int,
                position_ids: Optional[jax.Array] = None):
    """cos/sin tables: [T, hd/2] for standard RoPE, [B, T, hd/2] for explicit
    or multimodal (3-D) position ids.

    M-RoPE (HF apply_multimodal_rotary_pos_emb): frequency band d takes the
    position component ``section_of(d)`` — temporal/height/width sections of
    ``mrope_section`` over head_dim/2. Equal components reduce to 1-D RoPE.
    """
    inv = 1.0 / (cfg.rope_theta ** (
        jnp.arange(0, cfg.head_dim, 2, dtype=jnp.float32) / cfg.head_dim))
    if position_ids is None:
        freqs = jnp.outer(jnp.arange(seq_len, dtype=jnp.float32), inv)
        return jnp.cos(freqs), jnp.sin(freqs)
    position_ids = jnp.asarray(position_ids, jnp.float32)
    if position_ids.ndim == 3:
        if cfg.mrope_section is None:
            raise ValueError("3-D position ids need cfg.mrope_section")
        sec_map = np.repeat(np.arange(len(cfg.mrope_section)),
                            cfg.mrope_section)
        assert sec_map.shape[0] == cfg.head_dim // 2, \
            f"mrope_section must sum to head_dim/2 = {cfg.head_dim // 2}"
        # [3, B, T] -> [B, T, hd/2] picking the component per band
        pos_sel = jnp.transpose(position_ids[jnp.asarray(sec_map)], (1, 2, 0))
        freqs = pos_sel * inv[None, None, :]
    else:
        freqs = position_ids[:, :, None] * inv[None, None, :]
    return jnp.cos(freqs), jnp.sin(freqs)


def apply(
    params: Dict,
    inputs_embeds: jax.Array,     # [B, T, H] (embedding/splicing done upstream)
    attention_mask: jax.Array,    # [B, T]
    cfg: LlamaConfig,
    lora: Optional[Dict] = None,
    position_ids: Optional[jax.Array] = None,  # [B,T] or [3,B,T] (M-RoPE)
    remat: bool = False,
    allow_flash: bool = True,
    lora_rng: Optional[jax.Array] = None,
    lora_dropout: float = 0.0,
) -> jax.Array:
    """Run the decoder stack; returns final-norm hidden states [B, T, H] —
    or ``(hidden, moe_aux_loss)`` when ``cfg.moe`` is set (the summed Switch
    load-balance loss across blocks, for the trainer to weight with
    ``cfg.moe.aux_loss_coef``).

    ``remat=True`` checkpoints each block (recompute activations on the
    backward pass) — the standard memory/FLOPs trade for full-finetuning
    large decoders; pair with FSDP param sharding (parallel/fsdp.py).
    ``allow_flash``: ``True`` (single chip), ``False`` (force the masked
    XLA attention), or a ``jax.sharding.Mesh`` — flash allowed inside a
    GSPMD-sharded jit via a data/model-axis shard_map around the kernel
    (layers._sharded_flash; the raw Pallas kernel carries no SPMD rule).
    ``lora_rng`` + ``lora_dropout`` enable train-time dropout on the LoRA
    paths (the reference recipe's ``--lora_dropout 0.1``,
    scripts/train.sh:20); per-block subkeys are folded in here."""
    t = inputs_embeds.shape[1]
    cos, sin = rope_tables(cfg, t, position_ids)
    flash_mesh = None if isinstance(allow_flash, bool) else allow_flash
    # long sequences (anyres image prompts) use the fused flash kernel and
    # never materialize the [B, 1, T, T] mask / [B, H, T, T] logits
    use_flash = (allow_flash is not False) and \
        L.flash_attention_eligible(t, cfg.head_dim)
    flash_mask = attention_mask if use_flash else None
    mask = None if use_flash else L.causal_padding_mask(attention_mask)
    dropout_on = lora_rng is not None and lora_dropout > 0.0 \
        and lora is not None
    block_fn = _block
    if dropout_on or (use_flash and flash_mesh is not None):
        import functools
        block_fn = functools.partial(
            _block, lora_dropout=lora_dropout if dropout_on else 0.0,
            flash_mesh=flash_mesh if use_flash else None)
    if remat:
        block_fn = jax.checkpoint(block_fn, static_argnums=(2,))
    x = inputs_embeds
    moe_aux = jnp.zeros((), jnp.float32) if cfg.moe is not None else None
    for i, blk in enumerate(params["blocks"]):
        blora = None
        if lora is not None and "blocks" in lora and lora["blocks"][i]:
            blora = lora["blocks"][i]
        brng = jax.random.fold_in(lora_rng, i) if dropout_on else None
        x = block_fn(x, blk, cfg, mask, cos, sin, blora, flash_mask, brng)
        if cfg.moe is not None:
            x, aux = x
            moe_aux = moe_aux + aux
    out = L.rmsnorm(x, params["final_norm"], cfg.rms_eps)
    if cfg.moe is not None:
        return out, moe_aux
    return out


def embed_tokens(params: Dict, input_ids: jax.Array) -> jax.Array:
    return jnp.take(params["embed"], input_ids, axis=0)


def lm_head_weight(params: Dict, cfg: LlamaConfig) -> jax.Array:
    """[H, V] head matrix (transposed embedding when tied)."""
    if cfg.tie_lm_head:
        return params["embed"].T
    return params["lm_head"]["w"]
