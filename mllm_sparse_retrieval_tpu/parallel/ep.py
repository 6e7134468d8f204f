"""Expert parallelism: Mixture-of-Experts FFN sharded over the mesh.

The decoder FFN becomes a router + ``num_experts`` independent SwiGLU
experts, each token dispatched to its ``top_k`` experts (Mixtral/GShard
routing). The whole layer is expressed as THREE dense einsums over
capacity-bucketed expert batches — dispatch ``[N,E,C]×[N,H]→[E,C,H]``,
the stacked expert SwiGLU ``[E,C,H]×[E,H,F]``, combine
``[N,E,C]×[E,C,H]→[N,H]`` — which is the TPU-native formulation: static
shapes, every FLOP on the MXU, no gather/scatter in the hot path. Under
GSPMD the expert axis ``E`` shards over a mesh axis (``model`` by
default) and the token axis ``N`` over ``data``; XLA inserts the
all-to-all-equivalent collectives at the two ``n↔e`` einsums, exactly
where a hand-written MoE would place them.

Capacity semantics (GShard): each expert accepts at most
``C = ceil(top_k·N/E · capacity_factor)`` tokens (rounded up to a lane-
friendly multiple of 8); assignment priority is slot-major (every
token's first choice is seated before any second choice) and token-order
within a slot. Overflowing assignments are dropped — the token's output
is then the sum of its surviving experts only (zero if none), the
standard Switch/GShard behavior. The auxiliary load-balance loss
(Switch §2.2 form: ``E · Σ_e f_e · p_e`` over pre-capacity assignment
fractions ``f_e`` and mean router probabilities ``p_e``) is returned for
the trainer to weight with ``aux_loss_coef``.

Reference capability slot: the reference's DeepSpeed engine scales
dense models only (ds_configs/ are ZeRO-only); expert parallelism
exceeds reference parity, provided as the scale-out path for MoE
backbones (Qwen-MoE-class MLLMs) on TPU meshes.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mllm_sparse_retrieval_tpu.parallel.mesh import MODEL_AXIS


@dataclass(frozen=True)
class MoEConfig:
    num_experts: int = 8
    top_k: int = 2
    # capacity = ceil(top_k * tokens / experts * capacity_factor), /8-aligned
    capacity_factor: float = 1.25
    # weight for the Switch load-balance aux loss (trainer multiplies)
    aux_loss_coef: float = 0.01
    # Mixtral renormalizes the top-k gate weights to sum to 1; Switch (k=1)
    # uses the raw softmax probability. True = Mixtral convention.
    normalize_gates: bool = True


def moe_init(key, hidden: int, intermediate: int, cfg: MoEConfig,
             dtype=jnp.float32) -> Dict:
    """Router + stacked expert SwiGLU params.

    ``router``: [H, E] (kept f32 — routing logits are precision-sensitive);
    ``gate``/``up``: [E, H, F]; ``down``: [E, F, H].
    """
    kr, kg, ku, kd = jax.random.split(key, 4)
    e, h, f = cfg.num_experts, hidden, intermediate
    s_in = 1.0 / math.sqrt(h)
    s_mid = 1.0 / math.sqrt(f)
    return {
        "router": jax.random.normal(kr, (h, e), jnp.float32) * s_in,
        "gate": jax.random.normal(kg, (e, h, f), dtype) * s_in,
        "up": jax.random.normal(ku, (e, h, f), dtype) * s_in,
        "down": jax.random.normal(kd, (e, f, h), dtype) * s_mid,
    }


def expert_capacity(n_tokens: int, cfg: MoEConfig) -> int:
    c = math.ceil(cfg.top_k * n_tokens / cfg.num_experts
                  * cfg.capacity_factor)
    return min(max(8 * math.ceil(c / 8), 8), n_tokens)


def _dispatch_combine(probs, cfg: MoEConfig, capacity: int):
    """Routing tensors from router probabilities.

    probs: [N, E] f32 softmax. Returns (dispatch [N,E,C] bool-as-f32,
    combine [N,E,C] f32, aux_loss scalar). Slot-major seating priority;
    per-expert position via cumsum over tokens (static shapes, no sort).
    """
    n, e = probs.shape
    gate_vals, expert_idx = jax.lax.top_k(probs, cfg.top_k)   # [N, k]
    if cfg.normalize_gates:
        gate_vals = gate_vals / jnp.maximum(
            gate_vals.sum(axis=-1, keepdims=True), 1e-9)

    seated_count = jnp.zeros((e,), jnp.int32)
    dispatch = jnp.zeros((n, e, capacity), jnp.float32)
    combine = jnp.zeros((n, e, capacity), jnp.float32)
    assign_frac = jnp.zeros((e,), jnp.float32)
    for s in range(cfg.top_k):                # static, k is 1-2
        onehot = jax.nn.one_hot(expert_idx[:, s], e, dtype=jnp.int32)
        # seat position = tokens already seated at this expert (earlier
        # slots + earlier tokens in this slot)
        pos = jnp.cumsum(onehot, axis=0) - onehot + seated_count[None, :]
        seated_count = seated_count + onehot.sum(axis=0)
        keep = (onehot == 1) & (pos < capacity)
        slot_onehot = jax.nn.one_hot(pos, capacity, dtype=jnp.float32)
        d_s = jnp.where(keep[..., None], slot_onehot, 0.0)    # [N, E, C]
        dispatch = dispatch + d_s
        combine = combine + d_s * gate_vals[:, s, None, None]
        assign_frac = assign_frac + onehot.sum(axis=0).astype(jnp.float32)

    # Switch load-balance loss on PRE-capacity assignments: E * sum f_e p_e
    f_e = assign_frac / (n * cfg.top_k)
    p_e = probs.mean(axis=0)
    aux = e * jnp.sum(f_e * p_e)
    return dispatch, combine, aux


def moe_ffn(x, p: Dict, cfg: MoEConfig) -> Tuple[jax.Array, jax.Array]:
    """MoE SwiGLU FFN. x: [..., H] -> (y [..., H], aux_loss scalar).

    Router math in f32; expert matmuls in x.dtype (bf16 on TPU) with the
    dispatch/combine contractions accumulating in f32
    (preferred_element_type) so dropped-vs-seated token sums stay exact.
    """
    lead = x.shape[:-1]
    h = x.shape[-1]
    xf = x.reshape(-1, h)
    n = xf.shape[0]
    capacity = expert_capacity(n, cfg)

    logits = xf.astype(jnp.float32) @ p["router"]
    probs = jax.nn.softmax(logits, axis=-1)
    dispatch, combine, aux = _dispatch_combine(probs, cfg, capacity)

    xs = jnp.einsum("nec,nh->ech", dispatch.astype(x.dtype), xf,
                    preferred_element_type=jnp.float32).astype(x.dtype)
    hid = jax.nn.silu(jnp.einsum("ech,ehf->ecf", xs, p["gate"])) \
        * jnp.einsum("ech,ehf->ecf", xs, p["up"])
    ys = jnp.einsum("ecf,efh->ech", hid, p["down"])
    y = jnp.einsum("nec,ech->nh", combine.astype(x.dtype), ys,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return y.reshape(*lead, h), aux


def moe_shardings(p: Dict, mesh: Mesh, axis: str = MODEL_AXIS) -> Dict:
    """NamedShardings placing the expert dimension over ``axis``.

    Router stays replicated (it is [H, E] and every token needs it);
    expert weight stacks shard on dim 0 — each device holds
    ``num_experts / axis_size`` experts, and the dispatch/combine einsums
    become the all-to-alls under GSPMD.
    """
    def spec(path_leaf):
        name, leaf = path_leaf
        if name == "router":
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P(axis, *([None] * (leaf.ndim - 1))))
    return {k: spec((k, v)) for k, v in p.items()}


def shard_moe_params(p: Dict, mesh: Mesh, axis: str = MODEL_AXIS) -> Dict:
    if p["gate"].shape[0] % mesh.shape[axis] != 0:
        raise ValueError(
            f"num_experts {p['gate'].shape[0]} not divisible by mesh axis "
            f"'{axis}' of size {mesh.shape[axis]}")
    return jax.device_put(p, moe_shardings(p, mesh, axis))
