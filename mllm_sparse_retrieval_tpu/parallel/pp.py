"""GPipe-style pipeline parallelism over stacked homogeneous decoder blocks.

TPU-native pipelining: the decoder's blocks are stacked along a leading
layer axis and sharded over a ``pipe`` mesh axis, so each device holds a
contiguous stage of ``n_layers / n_stages`` blocks. A ``shard_map`` runs the
classic GPipe schedule — ``n_microbatches + n_stages - 1`` ticks of
(compute stage, ``ppermute`` activations one stage forward) inside a single
``lax.scan`` — and XLA lowers the shifts onto ICI. The whole schedule is
differentiable (``ppermute`` transposes to the reverse shift), so one
``jax.grad`` gives pipelined backprop with the same bubble structure.

The reference outsources pipelining to DeepSpeed's engine (its ds_configs
use ZeRO only, so this exceeds reference parity); the capability slot it
fills is ``/root/reference/ds_configs`` + ``src/train.py:41-57`` scale-out.
Composes with the data axis (microbatches shard over ``data``, stages over
``pipe``): see ``make_pp_mesh`` and the dp x pp leg in
``__graft_entry__.dryrun_multichip``.

Design notes
------------
- Stage order == layer order: a ``P('pipe')`` sharding of the stacked
  ``[L, ...]`` leaves gives device ``s`` rows ``[s*L/S, (s+1)*L/S)``.
- Garbage lanes: at tick ``t`` stage ``s`` computes microbatch ``t - s``;
  out-of-range lanes compute on stale data but their outputs never reach
  the last stage inside the valid output window ``[S-1, S-1+M)``, so they
  only cost bubble FLOPs (the standard GPipe bubble ``(S-1)/(M+S-1)``).
- Per-microbatch constants (attention masks, per-sample RoPE tables) are
  indexed by the *local* microbatch id ``clip(t - stage, 0, M-1)`` so each
  stage applies the mask belonging to the activation it holds.
- The flash-attention kernel is not used inside the schedule (its own
  shard_map cannot nest here); training microbatches are short, so the
  masked XLA attention is the right tool anyway.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mllm_sparse_retrieval_tpu.parallel.mesh import DATA_AXIS

PIPE_AXIS = "pipe"


def make_pp_mesh(
    pipeline_parallel: int,
    data_parallel: int = -1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """2-D ``(data, pipe)`` mesh; ``data_parallel=-1`` takes the rest."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if pipeline_parallel <= 0:
        raise ValueError("pipeline_parallel must be >= 1")
    if data_parallel == -1:
        if n % pipeline_parallel != 0:
            raise ValueError(f"{n} devices not divisible by "
                             f"pipeline_parallel={pipeline_parallel}")
        data_parallel = n // pipeline_parallel
    if data_parallel * pipeline_parallel != n:
        raise ValueError(
            f"data_parallel*pipeline_parallel = "
            f"{data_parallel * pipeline_parallel} != {n} devices")
    dev_array = np.asarray(devices).reshape(data_parallel, pipeline_parallel)
    return Mesh(dev_array, (DATA_AXIS, PIPE_AXIS))


def stack_block_params(blocks: Sequence[Dict]) -> Dict:
    """Stack a homogeneous per-layer param list into ``[L, ...]`` leaves."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


def unstack_block_params(stacked: Dict, n_layers: int) -> list:
    """Inverse of :func:`stack_block_params`."""
    return [jax.tree_util.tree_map(lambda x, i=i: x[i], stacked)
            for i in range(n_layers)]


def pipeline_apply(
    stacked_blocks: Any,
    x_mb: jax.Array,               # [M, mb, ...] microbatched activations
    mb_consts: Any,                # pytree with leading [M, ...] per leaf
    block_fn: Callable,            # (x, blk, consts_m) -> x
    mesh: Mesh,
    *,
    consts_batched: Any = None,    # pytree of bool: leaf axis 1 is batch
    check_divisible: bool = True,
) -> jax.Array:
    """Run the GPipe schedule; returns activations shaped like ``x_mb``.

    ``stacked_blocks``: block params stacked ``[L, ...]`` (layer-major).
    ``mb_consts``: per-microbatch constants (masks, RoPE tables) carried
    alongside — every leaf's axis 0 is the microbatch axis ``M``; leaves
    that are shared across microbatches should be broadcast by the caller.
    ``block_fn(x, blk, consts_m)`` applies ONE block (leaves of ``blk`` have
    the layer axis stripped).
    """
    n_stages = mesh.shape[PIPE_AXIS]
    n_micro = x_mb.shape[0]
    layer_leaves = jax.tree_util.tree_leaves(stacked_blocks)
    n_layers = layer_leaves[0].shape[0]
    if check_divisible and n_layers % n_stages != 0:
        raise ValueError(f"{n_layers} layers not divisible by "
                         f"{n_stages} pipeline stages")

    blocks_spec = jax.tree_util.tree_map(lambda _: P(PIPE_AXIS),
                                         stacked_blocks)
    data_ok = x_mb.shape[1] % mesh.shape[DATA_AXIS] == 0
    data_ax = DATA_AXIS if (mesh.shape[DATA_AXIS] > 1 and data_ok) else None
    x_spec = P(None, data_ax)
    if consts_batched is None:
        # default: a const leaf rides the data axis iff its axis 1 is the
        # microbatch dim — callers with ambiguous shapes pass the map
        consts_batched = jax.tree_util.tree_map(
            lambda c: np.ndim(c) >= 2 and c.shape[1] == x_mb.shape[1],
            mb_consts)
    consts_spec = jax.tree_util.tree_map(
        lambda batched: P(None, data_ax) if batched else P(),
        consts_batched)

    def _mapped(blocks_local, x_local, consts_local):
        stage = lax.axis_index(PIPE_AXIS)

        def stage_fn(x, m):
            consts_m = jax.tree_util.tree_map(
                lambda c: lax.dynamic_index_in_dim(c, m, 0, keepdims=False),
                consts_local)

            def body(carry, blk):
                return block_fn(carry, blk, consts_m), None

            x, _ = lax.scan(body, x, blocks_local)
            return x

        def tick(carry, t):
            x = carry
            m = jnp.clip(t - stage, 0, n_micro - 1)
            y = stage_fn(x, m)
            if n_stages > 1:
                y_next = lax.ppermute(
                    y, PIPE_AXIS, [(i, i + 1) for i in range(n_stages - 1)])
            else:
                y_next = y
            feed = lax.dynamic_index_in_dim(
                x_local, jnp.clip(t + 1, 0, n_micro - 1), 0, keepdims=False)
            x_new = jnp.where(stage == 0, feed, y_next)
            return x_new, y

        ticks = jnp.arange(n_micro + n_stages - 1)
        _, ys = lax.scan(tick, x_local[0], ticks)
        out = ys[n_stages - 1:n_stages - 1 + n_micro]
        if n_stages > 1:
            # broadcast the last stage's outputs to every pipe rank
            out = lax.psum(jnp.where(stage == n_stages - 1, out, 0.0),
                           PIPE_AXIS)
        return out

    from jax import shard_map
    fn = shard_map(_mapped, mesh=mesh,
                   in_specs=(blocks_spec, x_spec, consts_spec),
                   out_specs=x_spec, check_vma=False)
    return fn(stacked_blocks, x_mb, mb_consts)


def make_pp3_mesh(
    data_parallel: int,
    pipeline_parallel: int,
    model_parallel: int,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """3-D ``(data, pipe, model)`` mesh for combined dp x pp x tp."""
    if devices is None:
        devices = jax.devices()
    n = data_parallel * pipeline_parallel * model_parallel
    if n != len(devices):
        raise ValueError(f"dp*pp*tp = {n} != {len(devices)} devices")
    from mllm_sparse_retrieval_tpu.parallel.mesh import MODEL_AXIS
    dev = np.asarray(devices).reshape(data_parallel, pipeline_parallel,
                                      model_parallel)
    return Mesh(dev, (DATA_AXIS, PIPE_AXIS, MODEL_AXIS))


_COL_SHARDED = {"q", "k", "v", "gate", "up", "qkv", "fc1"}   # [in, out@model]
_ROW_SHARDED = {"o", "down", "out", "fc2"}                    # [in@model, out]


def stacked_tp_shardings(stacked: Dict, mesh: Mesh):
    """NamedShardings for STACKED block leaves ``[L, ...]``: layer axis over
    ``pipe``, megatron column/row layout over ``model`` (same name sets as
    parallel/tp.py, which handles the unstacked per-layer tree)."""
    from mllm_sparse_retrieval_tpu.parallel.mesh import MODEL_AXIS

    n_pipe = mesh.shape.get(PIPE_AXIS, 1)
    n_model = mesh.shape.get(MODEL_AXIS, 1)

    def make(path, leaf):
        names = [str(getattr(p, "key", getattr(p, "idx", p))) for p in path]
        spec = [PIPE_AXIS if leaf.shape[0] % n_pipe == 0 else None]
        if leaf.ndim == 3 and names and names[-1] == "w":
            proj = names[-2] if len(names) >= 2 else ""
            if proj in _COL_SHARDED and leaf.shape[2] % n_model == 0:
                spec += [None, MODEL_AXIS]
            elif proj in _ROW_SHARDED and leaf.shape[1] % n_model == 0:
                spec += [MODEL_AXIS, None]
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(make, stacked)


def apply_pipelined_gspmd(
    params: Dict,
    inputs_embeds: jax.Array,      # [B, T, H]
    attention_mask: jax.Array,     # [B, T]
    cfg,                           # models.llama.LlamaConfig
    mesh: Mesh,
    n_microbatches: int,
    stacked: Optional[Dict] = None,
    position_ids: Optional[jax.Array] = None,
    remat: bool = False,
) -> jax.Array:
    """Circular-pipeline decoder in PURE GSPMD — composes with TP for free.

    ``remat=True`` checkpoints each stage's tick (activations recomputed in
    the backward pass) — with pipelining this bounds live activations to
    one microbatch per stage regardless of tick count, the standard memory
    recipe for deep pipelined training.

    The shard_map formulation (:func:`pipeline_apply`) owns its collectives,
    so tensor parallelism inside a stage would need hand-written megatron
    psums. This variant expresses the SAME schedule inside plain ``jit``:
    the per-stage state is a ``[S, mb, T, H]`` tensor sharded ``P('pipe',
    'data')``, every tick vmaps the stage computation over the stage axis
    (GSPMD keeps stage s's compute on its devices), and the stage shift is
    ``jnp.roll`` along the sharded axis — XLA lowers it to a
    ``collective-permute`` on ICI. Because the block compute is ordinary
    traced code, stacked params carrying megatron column/row shardings over
    the ``model`` axis (:func:`stacked_tp_shardings`) get their TP
    all-reduces inserted by GSPMD exactly as in the unpipelined TP path —
    dp x pp x tp on a 3-D mesh with no manual collectives anywhere.
    (This is the scaling-book / MaxText circular-pipeline idiom.)
    """
    from mllm_sparse_retrieval_tpu.models import layers as L
    from mllm_sparse_retrieval_tpu.models import llama

    if getattr(cfg, "moe", None) is not None:
        raise ValueError("pipeline parallelism supports dense-FFN decoders "
                         "only; MoE blocks return (x, aux) which the "
                         "stacked-stage scan does not carry — compose "
                         "parallel/ep.py with dp x tp instead")
    b, t, _ = inputs_embeds.shape
    if b % n_microbatches != 0:
        raise ValueError(f"batch {b} not divisible by "
                         f"n_microbatches={n_microbatches}")
    n_stages = mesh.shape[PIPE_AXIS]
    mb = b // n_microbatches
    if stacked is None:
        stacked = stack_block_params(params["blocks"])
    n_layers = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    if n_layers % n_stages != 0:
        raise ValueError(f"{n_layers} layers not divisible by "
                         f"{n_stages} pipeline stages")
    lp = n_layers // n_stages
    stacked_st = jax.tree_util.tree_map(
        lambda a: a.reshape((n_stages, lp) + a.shape[1:]), stacked)

    cos, sin = llama.rope_tables(cfg, t, position_ids)
    mask = L.causal_padding_mask(attention_mask)
    mask_mb = mask.reshape((n_microbatches, mb) + mask.shape[1:])
    x_mb = inputs_embeds.reshape(n_microbatches, mb, t, -1)
    if cos.ndim == 3:
        cos_mb = cos.reshape((n_microbatches, mb) + cos.shape[1:])
        sin_mb = sin.reshape((n_microbatches, mb) + sin.shape[1:])
    else:
        cos_mb = jnp.broadcast_to(cos, (n_microbatches,) + cos.shape)
        sin_mb = jnp.broadcast_to(sin, (n_microbatches,) + sin.shape)

    data_ax = DATA_AXIS if (mesh.shape[DATA_AXIS] > 1
                            and mb % mesh.shape[DATA_AXIS] == 0) else None
    state_sharding = NamedSharding(mesh, P(PIPE_AXIS, data_ax))

    def one_stage(blk, x, mask_m, cos_m, sin_m):
        def body(c, blk_l):
            return llama._block(c, blk_l, cfg, mask_m, cos_m, sin_m), None

        y, _ = lax.scan(body, x, blk)
        return y

    if remat:
        one_stage = jax.checkpoint(one_stage)
    vstage = jax.vmap(one_stage)
    stage_ids = jnp.arange(n_stages)

    def tick(state, t_idx):
        m = jnp.clip(t_idx - stage_ids, 0, n_microbatches - 1)   # [S]
        y = vstage(stacked_st, state, mask_mb[m], cos_mb[m], sin_mb[m])
        out_t = y[n_stages - 1]
        shifted = jnp.roll(y, 1, axis=0)      # collective-permute over pipe
        feed = lax.dynamic_index_in_dim(
            x_mb, jnp.clip(t_idx + 1, 0, n_microbatches - 1), 0,
            keepdims=False)
        state = shifted.at[0].set(feed)
        state = jax.lax.with_sharding_constraint(state, state_sharding)
        return state, out_t

    state0 = jnp.broadcast_to(x_mb[0], (n_stages, mb, t,
                                        inputs_embeds.shape[-1]))
    state0 = jax.lax.with_sharding_constraint(state0, state_sharding)
    ticks = jnp.arange(n_microbatches + n_stages - 1)
    _, ys = lax.scan(tick, state0, ticks)
    out = ys[n_stages - 1:n_stages - 1 + n_microbatches]
    y = out.reshape(b, t, -1)
    return L.rmsnorm(y, params["final_norm"], cfg.rms_eps)


def apply_pipelined(
    params: Dict,
    inputs_embeds: jax.Array,      # [B, T, H]
    attention_mask: jax.Array,     # [B, T]
    cfg,                           # models.llama.LlamaConfig
    mesh: Mesh,
    n_microbatches: int,
    lora: Optional[Dict] = None,
    stacked: Optional[Dict] = None,
    lora_stacked: Optional[Dict] = None,
    position_ids: Optional[jax.Array] = None,  # [B,T] or [3,B,T] (M-RoPE)
) -> jax.Array:
    """Pipelined equivalent of ``models.llama.apply``.

    ``position_ids`` follows ``llama.apply``'s contract (explicit per-sample
    positions, or 3-D multimodal M-RoPE ids with ``cfg.mrope_section``) —
    the resulting per-sample RoPE tables ride the per-microbatch consts, so
    every family's decoder (incl. Qwen2.5-VL) can pipeline.

    ``B`` must divide into ``n_microbatches`` equal microbatches whose size
    divides the mesh's data axis. Pass ``stacked``/``lora_stacked`` (from
    :func:`stack_block_params`) to differentiate w.r.t. the stacked leaves
    directly — e.g. the full-finetune pipeline training step in
    ``__graft_entry__.dryrun_multichip``; otherwise the per-layer lists in
    ``params['blocks']`` / ``lora['blocks']`` are stacked here.
    """
    from mllm_sparse_retrieval_tpu.models import layers as L
    from mllm_sparse_retrieval_tpu.models import llama

    if getattr(cfg, "moe", None) is not None:
        raise ValueError("pipeline parallelism supports dense-FFN decoders "
                         "only; MoE blocks return (x, aux) which the "
                         "stacked-stage scan does not carry — compose "
                         "parallel/ep.py with dp x tp instead")
    b, t, _ = inputs_embeds.shape
    if b % n_microbatches != 0:
        raise ValueError(f"batch {b} not divisible by "
                         f"n_microbatches={n_microbatches}")
    mb = b // n_microbatches
    cos, sin = llama.rope_tables(cfg, t, position_ids)

    if stacked is None:
        stacked = stack_block_params(params["blocks"])
    if lora_stacked is None and lora is not None and lora.get("blocks"):
        blist = lora["blocks"]
        if all(bl for bl in blist):
            lora_stacked = stack_block_params(blist)
        else:
            # partial-layer adapters can't stack into a homogeneous [L, ...]
            # tree; dropping them silently would train/eval the bare base
            # model — fail loudly instead (sequential llama.apply and
            # parallel/sp.py support per-block adapters if needed)
            raise ValueError(
                "apply_pipelined needs LoRA adapters on EVERY block "
                "(homogeneous stages); got adapters on "
                f"{sum(bool(bl) for bl in blist)}/{len(blist)} blocks")

    mask = L.causal_padding_mask(attention_mask)
    mask_mb = mask.reshape((n_microbatches, mb) + mask.shape[1:])
    x_mb = inputs_embeds.reshape(n_microbatches, mb, t, -1)
    if cos.ndim == 3:
        # per-sample tables ([B, T, hd/2], explicit/M-RoPE positions):
        # microbatch them so each stage applies its activation's own table
        cos_mb = cos.reshape((n_microbatches, mb) + cos.shape[1:])
        sin_mb = sin.reshape((n_microbatches, mb) + sin.shape[1:])
        cos_batched = True
    else:
        cos_mb = jnp.broadcast_to(cos, (n_microbatches,) + cos.shape)
        sin_mb = jnp.broadcast_to(sin, (n_microbatches,) + sin.shape)
        cos_batched = False
    consts = {"mask": mask_mb, "cos": cos_mb, "sin": sin_mb}

    if lora_stacked is not None:
        blocks_in = {"p": stacked, "lora": lora_stacked}

        def block_fn(x, blk, c):
            return llama._block(x, blk["p"], cfg, c["mask"], c["cos"],
                                c["sin"], blk["lora"])
    else:
        blocks_in = stacked

        def block_fn(x, blk, c):
            return llama._block(x, blk, cfg, c["mask"], c["cos"], c["sin"])

    y_mb = pipeline_apply(blocks_in, x_mb, consts, block_fn, mesh,
                          consts_batched={"mask": True, "cos": cos_batched,
                                          "sin": cos_batched})
    y = y_mb.reshape(b, t, -1)
    return L.rmsnorm(y, params["final_norm"], cfg.rms_eps)
