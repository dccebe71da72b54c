"""VMEM budget model for Pallas kernel blocks.

The TPU analogue of the reference's GPU occupancy model
(ref: ch04/gpu_architecture.py:112-141 theoretical_occupancy over
threads/regs/smem; ch05/shared_memory.py:74-88 smem-limited occupancy).
On TPU there are no warps or register files to model: the binding resource for
a Pallas kernel is VMEM residency — the sum of all live input/output blocks and
scratch buffers (x2 when the pipeline double-buffers) must fit in
TPUSpec.vmem_bytes.
"""
from __future__ import annotations

import math

from .tpu import TPUSpec

_BYTES = {"float32": 4, "fp32": 4, "bfloat16": 2, "bf16": 2, "int8": 1,
          "fp8": 1, "int32": 4}

# Minimum (sublane, lane) tile per dtype — arrays are padded up to these.
MIN_TILE = {"float32": (8, 128), "fp32": (8, 128), "bfloat16": (16, 128),
            "bf16": (16, 128), "int8": (32, 128), "fp8": (32, 128)}


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def vmem_block_bytes(shape: tuple[int, ...], dtype: str = "bf16") -> int:
    """Bytes a block occupies in VMEM, honoring sublane/lane tile padding."""
    sub, lane = MIN_TILE[dtype]
    dims = list(shape)
    if len(dims) >= 1:
        dims[-1] = _round_up(dims[-1], lane)
    if len(dims) >= 2:
        dims[-2] = _round_up(dims[-2], sub)
    return math.prod(dims) * _BYTES[dtype]


def vmem_occupancy(
    block_bytes: list[int], spec: TPUSpec, double_buffered: bool = True
) -> float:
    """Fraction of VMEM a kernel's live blocks consume.

    >1.0 means the kernel will not fit (Mosaic will fail or spill); the Pallas
    pipeline keeps two copies of each grid-streamed block in flight, hence the
    double-buffer multiplier.
    """
    total = sum(block_bytes) * (2 if double_buffered else 1)
    return total / spec.vmem_bytes


def max_resident_blocks(
    block_shape: tuple[int, ...], spec: TPUSpec, dtype: str = "bf16",
    double_buffered: bool = True,
) -> int:
    """How many blocks of this shape fit in VMEM simultaneously."""
    per = vmem_block_bytes(block_shape, dtype) * (2 if double_buffered else 1)
    return spec.vmem_bytes // per
