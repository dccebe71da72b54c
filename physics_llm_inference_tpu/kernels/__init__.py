"""Pallas TPU kernels (reference layer L1: ch05 CUDA/Triton kernels, ch06
flash attention — rebuilt MXU-first).

All kernels run compiled on TPU and fall back to interpret mode on CPU test
platforms (interpret=True), so the same tests cover both. Numerical contract:
every kernel matches its pure-JAX reference in ops/ to tolerance (the
reference repo's equivalence-test idiom, ch05/test_ch05.py:117-136,
ch06/test_ch06.py:169-189).
"""
from .matmul import tiled_matmul
from .int8_matmul import int8_matmul, quantize_weights_int8
from .quant import quantize_int8, dequantize_int8
from .flash_attention import flash_attention, FlashConfig

__all__ = [
    "tiled_matmul", "int8_matmul", "quantize_weights_int8",
    "quantize_int8", "dequantize_int8",
    "flash_attention", "FlashConfig",
]
