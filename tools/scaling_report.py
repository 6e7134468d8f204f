"""Scaling report: per-device memory + collective census across mesh sizes.

One real chip is available in this environment, so multi-chip *throughput*
can't be measured — but the two things that determine whether a sharded
program scales CAN be verified without hardware:

1. **Per-device bytes** of params / optimizer state under each strategy
   (replicated, ZeRO-1, FSDP, TP, pipeline stages), computed exactly from
   the sharding specs — the memory side of the scaling story.
2. **Collective structure** of the compiled train step (all-reduce /
   all-gather / reduce-scatter / collective-permute counts from the
   post-GSPMD HLO) — what actually rides the ICI each step.

Run on the virtual CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \\
        python tools/scaling_report.py [--devices 8]
"""

import argparse
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

# this report is sharding math + HLO inspection — always force CPU so it
# runs during chip outages and never holds the real device
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all")


def _nbytes(leaf):
    # works for both arrays and jax.eval_shape's ShapeDtypeStructs
    return int(np.prod(leaf.shape)) * np.dtype(leaf.dtype).itemsize


def _bytes_per_device(tree, shardings, n_devices):
    """Exact per-device bytes for a tree placed with the given shardings."""
    total = 0
    for leaf, sh in zip(jax.tree_util.tree_leaves(tree),
                        jax.tree_util.tree_leaves(
                            shardings, is_leaf=lambda x: isinstance(
                                x, NamedSharding))):
        n_shards = 1
        if isinstance(sh, NamedSharding):
            mesh_shape = dict(zip(sh.mesh.axis_names,
                                  sh.mesh.devices.shape))
            for axis in sh.spec:
                if axis is None:
                    continue
                names = axis if isinstance(axis, tuple) else (axis,)
                for nm in names:
                    n_shards *= mesh_shape[nm]
        total += int(np.ceil(_nbytes(leaf) / n_shards))
    return total


def _census(compiled):
    hlo = compiled.as_text()
    return {k: hlo.count(f" {k}") + hlo.count(f"{k}(") + hlo.count(f"{k}-start")
            for k in COLLECTIVES}


def _fmt(b):
    return f"{b / 1e6:8.2f} MB"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    args = ap.parse_args()
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count="
            f"{args.devices}").strip()

    from mllm_sparse_retrieval_tpu.models import llama
    from mllm_sparse_retrieval_tpu.parallel import pp
    from mllm_sparse_retrieval_tpu.parallel.fsdp import fsdp_shardings
    from mllm_sparse_retrieval_tpu.parallel.mesh import make_mesh
    from mllm_sparse_retrieval_tpu.parallel.tp import tp_param_shardings
    from mllm_sparse_retrieval_tpu.train.trainer import zero1_shardings

    n = args.devices
    assert len(jax.devices()) >= n, (len(jax.devices()), n)

    # a mid-size decoder so the byte numbers mean something (~0.5 GB f32)
    cfg = llama.LlamaConfig(vocab_size=32000, hidden_size=1024,
                            num_layers=8, num_heads=16, num_kv_heads=4,
                            intermediate_size=4096)
    params = jax.eval_shape(
        lambda k: llama.init_params(k, cfg), jax.random.PRNGKey(0))
    tx = optax.adam(1e-4)
    opt = jax.eval_shape(tx.init, params)
    p_total = sum(_nbytes(x) for x in jax.tree_util.tree_leaves(params))
    o_total = sum(_nbytes(x) for x in jax.tree_util.tree_leaves(opt))
    print(f"decoder: {p_total / 1e6:.0f} MB params, "
          f"{o_total / 1e6:.0f} MB adam state, {n} devices\n")

    print("per-device bytes by strategy (exact, from sharding specs):")
    mesh_dp = make_mesh(data_parallel=n, model_parallel=1)
    mesh_tp = make_mesh(data_parallel=n // 2, model_parallel=2)
    repl = jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh_dp, P()), params)
    rows = [
        ("replicated (reference DDP)", params,
         repl, n),
        ("FSDP / ZeRO-3 params", params,
         fsdp_shardings(params, mesh_dp), n),
        ("megatron TP (model=2) params", params,
         tp_param_shardings(params, mesh_tp), n),
        ("adam state replicated", opt,
         jax.tree_util.tree_map(lambda _: NamedSharding(mesh_dp, P()), opt),
         n),
        ("adam state ZeRO-1", opt,
         zero1_shardings(opt, mesh_dp), n),
    ]
    stacked = jax.eval_shape(
        lambda p: pp.stack_block_params(p["blocks"]), params)
    if n % 4 == 0:
        mesh3 = pp.make_pp3_mesh(n // 4, 2, 2)
        rows.append(("pp x tp stacked blocks (pipe=2, model=2)", stacked,
                     pp.stacked_tp_shardings(stacked, mesh3), n))
    for name, tree, sh, nd in rows:
        print(f"  {name:42s} {_fmt(_bytes_per_device(tree, sh, nd))}")

    # collective census of ONE compiled training step per strategy
    print("\ncollective ops in the compiled train step (post-GSPMD HLO):")
    B, T = 2 * n, 32
    ids = jnp.zeros((B, T), jnp.int32)
    mask = jnp.ones((B, T), jnp.int32)

    def step_fsdp(p):
        emb = llama.embed_tokens(p, ids)
        y = llama.apply(p, emb, mask, cfg, allow_flash=False)
        return jnp.sum(y * y)

    with mesh_dp:
        c = jax.jit(jax.grad(step_fsdp),
                    in_shardings=(fsdp_shardings(params, mesh_dp),)
                    ).lower(params).compile()
    print(f"  FSDP grad step:              {_census(c)}")

    with mesh_tp:
        c = jax.jit(jax.grad(step_fsdp),
                    in_shardings=(tp_param_shardings(params, mesh_tp),)
                    ).lower(params).compile()
    print(f"  TP (model=2) grad step:      {_census(c)}")

    if n % 4 == 0:
        def step_pp3(st):
            rest = {"final_norm": jax.tree_util.tree_map(
                jnp.zeros_like, params["final_norm"])}
            emb = jnp.zeros((B, T, cfg.hidden_size), jnp.float32)
            y = pp.apply_pipelined_gspmd(rest, emb, mask, cfg, mesh3, 2,
                                         stacked=st)
            return jnp.sum(y * y)

        st = jax.eval_shape(lambda p: pp.stack_block_params(p["blocks"]),
                            params)
        st = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), st)
        with mesh3:
            c = jax.jit(jax.grad(step_pp3),
                        in_shardings=(pp.stacked_tp_shardings(st, mesh3),)
                        ).lower(st).compile()
        print(f"  dp x pp x tp pipeline step:  {_census(c)}")


if __name__ == "__main__":
    main()
