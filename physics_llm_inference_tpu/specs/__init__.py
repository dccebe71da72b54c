"""Hardware model & performance analysis (reference layer L0: ch03, ch04, ch09/nccl).

TPU-native replacement for the reference's GPUSpec/HardwareSpec tables and
roofline/occupancy/NCCL-cost analytics (ch03/roofline.py, ch04/gpu_architecture.py,
ch09/nccl_primitives.py). Pure Python — informs tile/batch choices everywhere else.
"""
from .tpu import (
    TPUSpec,
    TPU_V4,
    TPU_V5E,
    TPU_V5P,
    TPU_V6E,
    TPU_SPECS,
    get_tpu_spec,
)
from .roofline import (
    arithmetic_intensity_gemm,
    arithmetic_intensity_gemv,
    arithmetic_intensity_batched_gemv,
    roofline_throughput,
    ridge_point,
    is_compute_bound,
    find_transition_batch_size,
)
from .vmem import (
    vmem_block_bytes,
    vmem_occupancy,
    max_resident_blocks,
)
from .ici import (
    CollectiveCostModel,
    all_reduce_bytes,
    all_gather_bytes,
    reduce_scatter_bytes,
    all_to_all_bytes,
    ring_all_reduce_time,
    overlap_potential,
)

__all__ = [
    "TPUSpec", "TPU_V4", "TPU_V5E", "TPU_V5P", "TPU_V6E", "TPU_SPECS",
    "get_tpu_spec",
    "arithmetic_intensity_gemm", "arithmetic_intensity_gemv",
    "arithmetic_intensity_batched_gemv", "roofline_throughput", "ridge_point",
    "is_compute_bound", "find_transition_batch_size",
    "vmem_block_bytes", "vmem_occupancy", "max_resident_blocks",
    "CollectiveCostModel", "all_reduce_bytes", "all_gather_bytes",
    "reduce_scatter_bytes", "all_to_all_bytes", "ring_all_reduce_time",
    "overlap_potential",
]
