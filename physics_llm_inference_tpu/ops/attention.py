"""Attention ops + memory/FLOPs accounting.

Capability parity with ref ch01/attention.py (naive_attention L8-13,
causal_attention L16-23, MultiHeadAttention L45-72) and the analysis half of
ref ch06/attention_memory.py (bytes L36-61, FLOPs L64-76, AI L79-87).

TPU-first choices: softmax statistics in fp32 with bf16 matmul inputs
(`preferred_element_type=float32` lets the MXU accumulate in fp32); additive
-inf masking via jnp.where so XLA fuses mask+softmax; heads kept as a leading
batch axis so the (S, S) score matmuls tile straight onto the MXU.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
from jax import nn

_NEG_INF = -1e30  # finite large-negative: avoids NaN from (-inf) - (-inf) in softmax


def _sdpa(q, k, v, mask=None, scale=None):
    """Scaled dot-product attention over (..., S, D) with optional bool mask
    (True = keep). Scores/softmax in fp32, output cast back to q.dtype."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    scores = jnp.einsum("...qd,...kd->...qk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        scores = jnp.where(mask, scores, _NEG_INF)
    weights = nn.softmax(scores, axis=-1)
    out = jnp.einsum("...qk,...kd->...qd", weights.astype(q.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def naive_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Unmasked attention (ref ch01/attention.py:8-13; ch06/attention_memory.py:19-33
    uses the same math at (B, H, N, D))."""
    return _sdpa(q, k, v)


def causal_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     offset: int = 0) -> jnp.ndarray:
    """Causal attention (ref ch01/attention.py:16-23).

    `offset` supports the rectangular prefill/decode case where q covers
    positions [offset, offset+Sq) of a K/V of length Sk (ref
    ch02/kv_cache.py:91-94's `diagonal=full-new+1` mask).
    """
    sq, sk = q.shape[-2], k.shape[-2]
    qi = jnp.arange(sq)[:, None] + offset
    ki = jnp.arange(sk)[None, :]
    mask = ki <= qi  # (Sq, Sk), True = attend
    return _sdpa(q, k, v, mask=mask)


def multi_head_attention(
    x: jnp.ndarray,
    wq: jnp.ndarray, wk: jnp.ndarray, wv: jnp.ndarray, wo: jnp.ndarray,
    num_heads: int,
    causal: bool = True,
) -> jnp.ndarray:
    """Full MHA over (B, S, D) with weight matrices (D, D) (ref
    ch01/attention.py:45-72). Thin wrapper over gqa_attention with
    num_kv_heads == num_heads."""
    from .gqa import gqa_attention

    return gqa_attention(x, wq, wk, wv, wo, num_heads, num_heads, causal=causal)


# --- analysis (ref ch06/attention_memory.py) ---------------------------------

def attention_flops(batch: int, heads: int, seq: int, head_dim: int) -> int:
    """FLOPs of the two score/value matmuls: 2 * (2·S²·D) per head (ref :64-76)."""
    return batch * heads * (2 * seq * seq * head_dim) * 2


def attention_memory_bytes(batch: int, heads: int, seq: int, head_dim: int,
                           dtype_bytes: int = 2) -> dict:
    """HBM bytes of naive attention: Q/K/V/O plus the materialized (S, S)
    score + weight matrices that flash attention eliminates (ref :36-61)."""
    qkvo = 4 * batch * heads * seq * head_dim * dtype_bytes
    scores = 2 * batch * heads * seq * seq * dtype_bytes  # scores + softmax weights
    return {"qkvo_bytes": qkvo, "scores_bytes": scores, "total_bytes": qkvo + scores}


def attention_arithmetic_intensity(batch: int, heads: int, seq: int,
                                   head_dim: int, dtype_bytes: int = 2) -> float:
    """FLOP/byte of naive attention (ref :79-87)."""
    flops = attention_flops(batch, heads, seq, head_dim)
    mem = attention_memory_bytes(batch, heads, seq, head_dim, dtype_bytes)
    return flops / mem["total_bytes"]
