"""Tiled matmul Pallas kernel.

The MXU-first counterpart of the reference's native matmul kernels
(ch05/tiled_matmul.cu:22-61 — 16x16 __shared__ tiles + __syncthreads;
ch05/triton_matmul.py:25-64 — block-tiled fp16 with fp32 accumulate). On TPU
the "shared memory tile" is a VMEM block and the sync is the pipeline: a 3D
grid (M/bm, N/bn, K/bk) streams A and B tiles through VMEM while a fp32
scratch accumulates across the K dimension; the MXU consumes 128-aligned
tiles directly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _matmul_kernel(a_ref, b_ref, out_ref, acc_ref):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(a_ref[:], b_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                             "out_dtype", "interpret"))
def tiled_matmul(a: jnp.ndarray, b: jnp.ndarray, block_m: int = 256,
                 block_n: int = 256, block_k: int = 512,
                 out_dtype=None, interpret: bool | None = None) -> jnp.ndarray:
    """C = A @ B with fp32 accumulation. A: (M, K), B: (K, N).

    Dims must divide by the block sizes after clamping (callers pad; the
    model layer shapes are 128-aligned by construction). Default blocks keep
    VMEM residency ~ (bm·bk + bk·bn + 2·bm·bn·4) well under budget.
    """
    if interpret is None:
        interpret = _interpret_default()
    m, k = a.shape
    k2, n = b.shape
    assert k == k2, f"inner dims mismatch {k} vs {k2}"
    bm, bn, bk = min(block_m, m), min(block_n, n), min(block_k, k)
    assert m % bm == 0 and n % bn == 0 and k % bk == 0, (
        f"shape ({m},{k})x({k},{n}) not divisible by blocks ({bm},{bn},{bk})")
    out_dtype = out_dtype or a.dtype

    grid = (m // bm, n // bn, k // bk)
    return pl.pallas_call(
        _matmul_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=a.nbytes + b.nbytes + m * n * jnp.dtype(out_dtype).itemsize,
            transcendentals=0),
        interpret=interpret,
    )(a, b)
