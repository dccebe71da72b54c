"""INT8 weight-only model quantization.

Converts a dense parameter pytree (models/transformer.py layout) into one
where every matmul weight is a QuantizedTensor (int8 values + per-output-
channel f32 scales). The forward pass is unchanged — transformer._linear
dispatches on the leaf type, using the Pallas int8 matmul kernel on TPU when
shapes are MXU-tileable and a fused dequant matmul otherwise.

This is the framework's native format (BASELINE north star: INT8 W+KV at
<=0.1 perplexity vs fp32). Norms, embeddings and biases stay high-precision;
per-channel scales are what holds the accuracy budget.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..kernels.quant import quantize_int8


class QuantizedTensor(NamedTuple):
    """int8 values + broadcastable f32 scale. A pytree — scans/shards like a
    plain array; sliced along a leading layer axis inside lax.scan."""

    q: jnp.ndarray   # int8, same shape as original weight
    s: jnp.ndarray   # f32, shape broadcastable (reduction axes = 1)

    @property
    def shape(self):
        return self.q.shape

    def dequantize(self, dtype=jnp.bfloat16) -> jnp.ndarray:
        return (self.q.astype(jnp.float32) * self.s).astype(dtype)


_QUANT_LEAVES = ("wqkv", "wo", "w_gate_up", "w_down",
                 "moe_w1", "moe_w2", "moe_w3")


def _quantize_stacked(w: jnp.ndarray) -> QuantizedTensor:
    """Stacked weight (L, K, N): per-(layer, output-channel) scales (L, 1, N)."""
    q, s = quantize_int8(w, axis=-2)
    return QuantizedTensor(q, s)


def quantize_params_int8(params: dict, quantize_lm_head: bool = True) -> dict:
    """Quantize all block matmul weights (+ optionally lm_head).

    Embeddings and norms stay in the original dtype: embeds are a gather (no
    bandwidth win at decode batch sizes) and norm scales are tiny.
    """
    out = {
        "embed": params["embed"],
        "norm": params["norm"],
        "blocks": {},
    }
    for name, w in params["blocks"].items():
        if name in _QUANT_LEAVES:
            out["blocks"][name] = _quantize_stacked(w)
        else:
            out["blocks"][name] = w
    if quantize_lm_head:
        q, s = quantize_int8(params["lm_head"], axis=0)
        out["lm_head"] = QuantizedTensor(q, s)
    else:
        out["lm_head"] = params["lm_head"]
    return out


def init_params_int8(rng, cfg) -> dict:
    """Initialize a model DIRECTLY in the quantized format.

    For benchmarking models too large to materialize in bf16 first (a
    7B-class model is ~14 GB bf16 + ~7 GB int8 during quantize_params_int8 —
    past a v5e's 16 GB HBM). Matmul weights are sampled as int8 values with
    per-channel scales matching init_params' fan-in scaling; embeds/norms
    init normally."""
    d, f, v = cfg.hidden_dim, cfg.intermediate_dim, cfg.vocab_size
    hd = cfg.head_dim
    L = cfg.num_layers
    qkv_out = (cfg.num_heads + 2 * cfg.num_kv_heads) * hd

    def qw(key, shape, fan_in):
        # generate per layer: randint over the full (L, K, N) stack
        # materializes a 4-byte random-bits transient (~11.5 GB for a 7B
        # w_gate_up) that OOMs a 16 GB v5e; per-layer slices keep the
        # transient at ~1/L of that
        keys = jax.random.split(key, shape[0])
        q = jnp.stack([jax.random.randint(k, shape[1:], -127, 128, jnp.int8)
                       for k in keys])
        # absmax-style scale so dequantized std ≈ fan_in**-0.5
        s = jnp.full(shape[:-2] + (1, shape[-1]),
                     (fan_in ** -0.5) / 73.9, jnp.float32)  # std(unif int8)
        return QuantizedTensor(q, s)

    keys = jax.random.split(rng, 8)
    dtype = jnp.dtype(cfg.dtype)
    blocks = {
        "ln1": jnp.ones((L, d), dtype),
        "wqkv": qw(keys[1], (L, d, qkv_out), d),
        "wo": qw(keys[4], (L, cfg.num_heads * hd, d), d),
        "ln2": jnp.ones((L, d), dtype),
        "w_gate_up": qw(keys[5], (L, d, 2 * f), d),
        "w_down": qw(keys[6], (L, f, d), f),
    }
    emb = (jax.random.normal(keys[0], (v, d)) * (d ** -0.5)).astype(dtype)
    return {
        "embed": emb,
        "blocks": blocks,
        "norm": jnp.ones((d,), dtype),
        "lm_head": qw(keys[7], (d, v), d),
    }


def quantized_param_bytes(params: dict) -> dict:
    """Memory accounting: bytes by precision class (the decode-bandwidth
    denominator for the roofline model)."""
    int8 = 0
    other = 0
    for leaf in jax.tree_util.tree_leaves(
            params, is_leaf=lambda x: isinstance(x, QuantizedTensor)):
        if isinstance(leaf, QuantizedTensor):
            int8 += leaf.q.nbytes + leaf.s.nbytes
        else:
            other += leaf.nbytes
    return {"int8_bytes": int8, "other_bytes": other,
            "total_bytes": int8 + other}
