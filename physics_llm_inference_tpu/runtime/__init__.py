"""Generation runtime (reference layers L3/L4: ch02 KV cache + loops,
ch07 paged memory, ch08 fixed-shape step compilation)."""
from .kv_cache import KVCache, calculate_kv_cache_size
from .generate import (
    GenerationOutput, cached_generate, naive_generate, pad_and_stack,
)
from .step_cache import StepCache, bucket_for
from .speculative import speculative_generate, ngram_propose

__all__ = [
    "KVCache", "calculate_kv_cache_size",
    "GenerationOutput", "cached_generate", "naive_generate", "pad_and_stack",
    "StepCache", "bucket_for",
    "speculative_generate", "ngram_propose",
]
