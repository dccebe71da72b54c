"""Pure-JAX model ops (reference layer L2: ch01, plus ch06 analysis).

These are the fp32-capable reference implementations that every Pallas kernel
and quantized path must match numerically (SURVEY.md §7 step 2). All ops are
pure functions over explicit weight arrays — no modules, no state — so they
compose with jit/vmap/shard_map and with any sharding of the weights.
"""
from .norms import rms_norm
from .rope import rope_frequencies, apply_rope
from .attention import (
    naive_attention,
    causal_attention,
    multi_head_attention,
    attention_flops,
    attention_memory_bytes,
    attention_arithmetic_intensity,
)
from .gqa import gqa_attention, kv_cache_bytes_per_token
from .ffn import ffn_relu, swiglu, fused_swiglu
from .softmax import online_softmax, online_softmax_with_output
from .sampling import sample_token, greedy_sample, SamplingParams

__all__ = [
    "rms_norm", "rope_frequencies", "apply_rope",
    "naive_attention", "causal_attention", "multi_head_attention",
    "attention_flops", "attention_memory_bytes", "attention_arithmetic_intensity",
    "gqa_attention", "kv_cache_bytes_per_token",
    "ffn_relu", "swiglu", "fused_swiglu",
    "online_softmax", "online_softmax_with_output",
    "sample_token", "greedy_sample", "SamplingParams",
]
