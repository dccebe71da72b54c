"""Tensor parallelism: sharding rules + explicit Megatron-style layers.

Capability parity: ref ch09/tensor_parallel.py — ColumnParallelLinear L15-40
(shard output dim), RowParallelLinear L43-68 (shard input dim, needs
all-reduce), TensorParallelMLP L71-100, compute_tp_memory_savings L103-125.
The reference's layers hold shard-shaped weights but never communicate; here
the reduction is real (lax.psum over the 'model' mesh axis inside shard_map,
riding ICI).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def tp_param_specs():
    """PartitionSpec rule for the stacked transformer param pytree
    (models/transformer.py layout) on a ('data','model') mesh.

    Megatron layout: qkv + gate_up column-sharded (output dim on 'model'),
    o_proj + down row-sharded (input dim on 'model') so each block needs
    exactly two all-reduces, which GSPMD inserts; norms replicated; embedding
    row(vocab)-sharded, lm_head column(vocab)-sharded.
    """
    def spec(path, x) -> P:
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        leaf = names[-1]
        if leaf == "embed":
            return P("model", None)
        if leaf == "lm_head":
            return P(None, "model")
        if leaf in ("wqkv", "w_gate_up", "moe_gate"):
            return P(None, None, "model")   # (L, D, out) column-parallel
        if leaf in ("wo", "w_down"):
            return P(None, "model", None)   # (L, in, D) row-parallel
        return P()                           # norms etc. replicated

    return spec


def column_parallel_linear(x: jnp.ndarray, w_shard: jnp.ndarray) -> jnp.ndarray:
    """Per-shard matmul with the weight split on the OUTPUT dim
    (ref ch09/tensor_parallel.py:15-40). Output stays sharded — no collective,
    exactly as Megatron prescribes (the following row-parallel layer reduces).
    Call inside shard_map."""
    return x @ w_shard


def row_parallel_linear(x_shard: jnp.ndarray, w_shard: jnp.ndarray,
                        axis: str = "model") -> jnp.ndarray:
    """Per-shard partial matmul + the all-reduce the reference only documents
    (ch09/tensor_parallel.py:66-68, docstring :142-147): lax.psum over the
    mesh axis — XLA lowers it to a bidirectional ICI ring. Call inside
    shard_map."""
    partial_out = x_shard @ w_shard
    return jax.lax.psum(partial_out, axis)


def tp_mlp_shardmap(mesh: Mesh, x: jnp.ndarray, w_gate: jnp.ndarray,
                    w_up: jnp.ndarray, w_down: jnp.ndarray) -> jnp.ndarray:
    """Tensor-parallel SwiGLU MLP over the 'model' axis
    (ref TensorParallelMLP ch09/tensor_parallel.py:71-100):
    column(gate), column(up) → silu·mul → row(down) + psum.

    x: (..., D) replicated; w_gate/w_up: (D, F); w_down: (F, D) — full arrays,
    sharded here via shard_map in_specs.
    """
    def mlp(x, wg, wu, wd):
        gate = column_parallel_linear(x, wg)
        up = column_parallel_linear(x, wu)
        hidden = jax.nn.silu(gate) * up
        return row_parallel_linear(hidden, wd)

    fn = shard_map(
        mlp, mesh=mesh,
        in_specs=(P(), P(None, "model"), P(None, "model"), P("model", None)),
        out_specs=P(),
    )
    return fn(x, w_gate, w_up, w_down)


def compute_tp_memory_savings(num_params: int, world_size: int,
                              dtype_bytes: int = 2) -> dict:
    """Params/bytes per device vs world size (ref ch09/tensor_parallel.py:103-125)."""
    per_device = num_params / world_size
    return {
        "total_params": num_params,
        "params_per_device": per_device,
        "bytes_per_device": per_device * dtype_bytes,
        "reduction_factor": world_size,
    }
