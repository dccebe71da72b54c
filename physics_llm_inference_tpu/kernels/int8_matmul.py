"""INT8 weight-only matmul Pallas kernel.

The TPU replacement for the reference's native GEMM kernels (ch05/*.cu,
ch05/triton_matmul.py) in the framework's native format: activations bf16/f32,
weights int8 with per-output-channel scales. Each weight tile is dequantized
to bf16 *in VMEM* (VPU) and fed to the MXU with fp32 accumulation; scales are
applied once after the K reduction. HBM traffic for weights is halved vs bf16
— decode is weight-bandwidth-bound, so this directly buys tokens/s (the
BASELINE primary metric).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .quant import quantize_int8


def quantize_weights_int8(w: jnp.ndarray):
    """Per-output-channel weight quantization: (K, N) → int8 (K, N) +
    f32 scales (1, N)."""
    return quantize_int8(w, axis=0)


def _int8_matmul_kernel(*refs, stacked):
    if stacked:
        _, x_ref, w_ref, scale_ref, out_ref, acc_ref = refs
    else:
        x_ref, w_ref, scale_ref, out_ref, acc_ref = refs
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w_tile = (w_ref[0] if stacked else w_ref[:]).astype(x_ref.dtype)
    acc_ref[:] += jnp.dot(x_ref[:], w_tile,
                          preferred_element_type=jnp.float32)

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        scale = scale_ref[0] if stacked else scale_ref[:]
        out_ref[:] = (acc_ref[:] * scale).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                             "out_dtype", "interpret"))
def int8_matmul(x: jnp.ndarray, w_q: jnp.ndarray, scale: jnp.ndarray,
                block_m: int = 256, block_n: int = 256, block_k: int = 512,
                out_dtype=None, interpret: bool | None = None,
                layer: jnp.ndarray | None = None) -> jnp.ndarray:
    """out = x @ (w_q * scale). x: (M, K) bf16/f32; w_q: (K, N) int8;
    scale: (1, N) f32.

    With `layer`, w_q/scale are the FULL layer stacks (L, K, N)/(L, 1, N) and
    the kernel's index map addresses the layer directly. This is how a model's
    lax.scan over layers avoids materializing a per-layer weight copy: scanning
    stacked weights through xs makes XLA dynamic-slice (i.e. HBM-copy) every
    layer's weights each step — measured ~1.07 ms/step on the 0.85B decode
    bench, comparable to the whole weight-streaming floor."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m, k = x.shape
    stacked = w_q.ndim == 3
    if stacked:
        assert layer is not None, "stacked weights need a layer index"
        nl, k2, n = w_q.shape
        assert scale.shape == (nl, 1, n)
    else:
        k2, n = w_q.shape
        assert scale.shape == (1, n)
    assert k == k2
    bm, bn, bk = min(block_m, m), min(block_n, n), min(block_k, k)
    assert m % bm == 0 and n % bn == 0 and k % bk == 0, (
        f"({m},{k})x({k},{n}) not divisible by ({bm},{bn},{bk})")
    out_dtype = out_dtype or x.dtype

    grid = (m // bm, n // bn, k // bk)
    kernel = functools.partial(_int8_matmul_kernel, stacked=stacked)
    cost = pl.CostEstimate(
        flops=2 * m * n * k,
        bytes_accessed=x.nbytes + k * n + scale.size * 4
        + m * n * jnp.dtype(out_dtype).itemsize,
        transcendentals=0)

    if stacked:
        lidx = jnp.asarray(layer, jnp.int32).reshape(1)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((bm, bk), lambda i, j, kk, lref: (i, kk)),
                    pl.BlockSpec((1, bk, bn),
                                 lambda i, j, kk, lref: (lref[0], kk, j)),
                    pl.BlockSpec((1, 1, bn),
                                 lambda i, j, kk, lref: (lref[0], 0, j)),
                ],
                out_specs=pl.BlockSpec((bm, bn),
                                       lambda i, j, kk, lref: (i, j)),
                scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            ),
            out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(
                # prefill-sized (bm=1024) x/out double-buffers + the f32
                # accumulator exceed the 16MB default scoped-vmem limit
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(lidx, x, w_q, scale)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, w_q, scale)
