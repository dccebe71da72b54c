"""HBM bandwidth / memory-layout microbenchmarks (Pallas).

TPU counterpart of the reference's coalescing studies (ch05/coalescing.cu
coalesced vs strided kernels; ch05/memory_coalescing.py contiguous vs
stride-32 gather). On TPU the analogous axis is *lane/sublane layout*: the
VPU and DMA engines move (8, 128) fp32 tiles — streaming along the trailing
(lane) dimension is the coalesced case, while gathering rows with a stride
forces strided DMA descriptors (the GPU's uncoalesced-warp analogue).

Results feed the roofline report: stream_copy should approach TPUSpec.hbm
bandwidth; the strided variant quantifies the layout penalty.
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:]


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def _stream_copy(x, block_rows: int = 2048, interpret: bool = False):
    n, lanes = x.shape
    grid = (n // block_rows,)
    return pl.pallas_call(
        _copy_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((block_rows, lanes), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((block_rows, lanes), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x)


@functools.partial(jax.jit, static_argnames=("block_rows", "stride",
                                             "interpret"))
def _strided_copy(x, block_rows: int = 8, stride: int = 32,
                  interpret: bool = False):
    """Reads every `stride`-th block of rows — strided DMA descriptors
    (ref ch05/coalescing.cu strided_read, :17-25)."""
    n, lanes = x.shape
    num_blocks = n // (block_rows * stride)
    return pl.pallas_call(
        _copy_kernel,
        grid=(num_blocks,),
        in_specs=[pl.BlockSpec((block_rows, lanes),
                               lambda i, s=stride: (i * s, 0))],
        out_specs=pl.BlockSpec((block_rows, lanes), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((num_blocks * block_rows, lanes),
                                       x.dtype),
        interpret=interpret,
    )(x)


def _time(fn, *args, iters=10):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def measure_access_patterns(total_mb: int = 256, stride: int = 32,
                            iters: int = 10) -> dict:
    """Contiguous stream vs strided gather bandwidth (ref
    ch05/memory_coalescing.py:25-82 measure_access_pattern)."""
    interpret = jax.default_backend() != "tpu"
    if interpret:
        total_mb = min(total_mb, 8)
    rows = total_mb * (1 << 20) // (128 * 4)
    x = jnp.ones((rows, 128), jnp.float32)

    t_stream = _time(lambda a: _stream_copy(a, interpret=interpret), x,
                     iters=iters)
    stream_gbps = 2 * x.nbytes / t_stream / 1e9  # read + write

    t_strided = _time(lambda a: _strided_copy(a, stride=stride,
                                              interpret=interpret), x,
                      iters=iters)
    touched = 2 * x.nbytes / stride
    strided_gbps = touched / t_strided / 1e9

    return {
        "stream_gbps": stream_gbps,
        "strided_gbps": strided_gbps,
        "stride": stride,
        "slowdown": stream_gbps / strided_gbps if strided_gbps else 0.0,
    }
