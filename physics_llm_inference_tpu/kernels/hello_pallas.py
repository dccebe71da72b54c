"""Hello-world Pallas kernel: vector add (ref ch04/hello_cuda.cu:7-60).

The pedagogical first kernel — where the CUDA version hand-manages
cudaMalloc/memcpy/launch geometry, the TPU version's "launch" is a grid of
VMEM blocks and the runtime handles staging. Kept (with its test) as the
minimal template for new kernels.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _add_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = a_ref[:] + b_ref[:]


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def vector_add(a: jnp.ndarray, b: jnp.ndarray, block_rows: int = 256,
               interpret: bool | None = None) -> jnp.ndarray:
    """Elementwise add over (N, 128)-shaped arrays, blocked over rows."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert a.shape == b.shape and a.ndim == 2
    rows = a.shape[0]
    br = min(block_rows, rows)
    assert rows % br == 0
    return pl.pallas_call(
        _add_kernel,
        grid=(rows // br,),
        in_specs=[pl.BlockSpec((br, a.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((br, a.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        interpret=interpret,
    )(a, b)
