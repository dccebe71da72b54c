"""Dense transformer model as pure functions over a stacked-parameter pytree.

Capability parity: ref ch01/transformer.py (TransformerBlock L20-44,
TransformerModel L47-100, count_parameters L89-100) and the cached forward of
ref ch02/cached_generation.py:137-187 (CachedTransformerBlock/Model) — here a
single code path serves both, selected by whether a KV cache is threaded in.

TPU-first structure:
- Layer weights are stacked on a leading num_layers axis and the forward pass
  is a jax.lax.scan over layers: one compiled block body, O(1) HLO size in
  depth (the reference's Python loop ch01/transformer.py:82-84 would unroll).
- KV caches are fixed-shape (L, B, max_S, Hkv, hd) arrays updated with
  lax.dynamic_update_slice and masked by position — no dynamic shapes, so a
  single compilation serves every step of decode (the CUDA-graph equivalent,
  ref ch08/cuda_graph.py:18-82).
- Attention masks combine causality and cache-validity in one predicate
  (k_pos <= q_pos), which covers square prefill, rectangular chunked prefill,
  and single-token decode (ref ch02/kv_cache.py:86-94's rectangular mask).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.ffn import fused_swiglu
from ..ops.gqa import grouped_sdpa
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope, rope_frequencies
from .config import ModelConfig


class KVSlice(NamedTuple):
    """Per-call KV threading: stacked caches + the write offset."""

    k: jnp.ndarray  # (L, B, max_S, Hkv, hd)
    v: jnp.ndarray
    start: jnp.ndarray  # scalar int32: first position of this call's tokens


def init_params(rng: jax.Array, cfg: ModelConfig) -> dict:
    """Initialize a stacked-parameter pytree.

    Layout:
      embed:   (V, D)
      blocks:  each leaf has leading dim L —
        ln1 (L, D), wq (L, D, Hq·hd), wk/wv (L, D, Hkv·hd), wo (L, Hq·hd, D),
        ln2 (L, D), w_gate_up (L, D, 2F), w_down (L, F, D)
      norm:    (D,)
      lm_head: (D, V)
    """
    dtype = jnp.dtype(cfg.dtype)
    d, f, v, L = cfg.hidden_dim, cfg.intermediate_dim, cfg.vocab_size, cfg.num_layers
    hd = cfg.head_dim
    keys = jax.random.split(rng, 8)

    def w(key, shape, fan_in):
        return (jax.random.normal(key, shape) * (fan_in ** -0.5)).astype(dtype)

    return {
        "embed": w(keys[0], (v, d), d),
        "blocks": {
            "ln1": jnp.ones((L, d), dtype),
            "wq": w(keys[1], (L, d, cfg.num_heads * hd), d),
            "wk": w(keys[2], (L, d, cfg.num_kv_heads * hd), d),
            "wv": w(keys[3], (L, d, cfg.num_kv_heads * hd), d),
            "wo": w(keys[4], (L, cfg.num_heads * hd, d), d),
            "ln2": jnp.ones((L, d), dtype),
            "w_gate_up": w(keys[5], (L, d, 2 * f), d),
            "w_down": w(keys[6], (L, f, d), f),
        },
        "norm": jnp.ones((d,), dtype),
        "lm_head": w(keys[7], (d, v), d),
    }


def _attend(q, k, v, q_slots, k_slots, valid_from=None):
    """Grouped attention with the unified causal/validity mask.

    q: (B, Hq, Sq, hd); k, v: (B, Hkv, Sk, hd). Slots are *cache slot indices*
    (not RoPE positions — they differ under left-padding).
    mask[b, q, k] = k_slots[k] <= q_slots[b, q] (and k_slots[k] >=
    valid_from[b] when given, masking left-pad garbage) — one predicate covers
    causal prefill, rectangular cached prefill, and decode over a padded cache.
    """
    mask = k_slots[None, None, :] <= q_slots[:, :, None]  # (B, Sq, Sk)
    if valid_from is not None:
        mask = mask & (k_slots[None, None, :] >= valid_from[:, None, None])
    return grouped_sdpa(q, k, v, mask=mask[:, None, None, :, :])


def block_forward(
    bp: dict,
    x: jnp.ndarray,
    cfg: ModelConfig,
    rope_cos: jnp.ndarray | None,
    rope_sin: jnp.ndarray | None,
    positions: jnp.ndarray,
    kv: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    start: jnp.ndarray | None = None,
    slots: jnp.ndarray | None = None,
    valid_from: jnp.ndarray | None = None,
):
    """One transformer block: pre-norm GQA + residual, pre-norm SwiGLU +
    residual (ref ch01/transformer.py:34-44).

    With `kv=(k_cache, v_cache)` of shape (B, max_S, Hkv, hd), new K/V are
    written at offset `start` and attention runs over the whole cache
    (ref ch02/cached_generation.py:52-98 CachedGQA). Returns (x, (k, v)).
    """
    b, s, d = x.shape
    hq, hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    h = rms_norm(x, bp["ln1"], cfg.norm_eps)
    q = (h @ bp["wq"]).reshape(b, s, hq, hd)
    k = (h @ bp["wk"]).reshape(b, s, hkv, hd)
    v = (h @ bp["wv"]).reshape(b, s, hkv, hd)
    if rope_cos is not None:
        q = apply_rope(q, rope_cos, rope_sin, positions)
        k = apply_rope(k, rope_cos, rope_sin, positions)

    if slots is None:
        slots = positions

    if kv is None:
        kq = k.transpose(0, 2, 1, 3)
        vq = v.transpose(0, 2, 1, 3)
        k_slots = jnp.arange(s)
        new_kv = None
    else:
        k_cache, v_cache = kv
        start = jnp.asarray(start)
        if start.ndim == 0:
            k_cache = lax.dynamic_update_slice(
                k_cache, k.astype(k_cache.dtype), (0, start, 0, 0))
            v_cache = lax.dynamic_update_slice(
                v_cache, v.astype(v_cache.dtype), (0, start, 0, 0))
        else:
            # Per-request write offsets (continuous batching: each slot is at
            # a different length). vmap over batch.
            upd = jax.vmap(lambda c, new, off: lax.dynamic_update_slice(
                c, new, (off, 0, 0)))
            k_cache = upd(k_cache, k.astype(k_cache.dtype), start)
            v_cache = upd(v_cache, v.astype(v_cache.dtype), start)
        kq = k_cache.transpose(0, 2, 1, 3).astype(q.dtype)
        vq = v_cache.transpose(0, 2, 1, 3).astype(q.dtype)
        k_slots = jnp.arange(k_cache.shape[1])
        new_kv = (k_cache, v_cache)

    attn = _attend(q.transpose(0, 2, 1, 3), kq, vq, slots, k_slots, valid_from)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, s, hq * hd)
    x = x + attn @ bp["wo"]

    h = rms_norm(x, bp["ln2"], cfg.norm_eps)
    x = x + fused_swiglu(h, bp["w_gate_up"], bp["w_down"])
    return x, new_kv


def forward(
    params: dict,
    input_ids: jnp.ndarray,
    cfg: ModelConfig,
    kv: KVSlice | None = None,
    positions: jnp.ndarray | None = None,
    slots: jnp.ndarray | None = None,
    valid_from: jnp.ndarray | None = None,
    last_only: bool = False,
):
    """Model forward: embed → scan blocks → norm → lm_head
    (ref ch01/transformer.py:80-87; cached: ch02/cached_generation.py:174-187).

    input_ids: (B, S) int32. With `kv`, tokens occupy cache slots
    [kv.start, kv.start+S) and the returned KVSlice has start advanced by S.
    `positions` (B, S) are RoPE positions; `slots` (B, S) are cache slot
    indices for the causal mask (defaults to positions — they differ only for
    left-padded ragged batches); `valid_from` (B,) masks cache slots below it
    (left-pad garbage). `last_only` computes logits for the final position
    only (decode hot path — skips the (S,V) lm_head matmul during
    prefill-and-sample). Returns (logits, new_kv).
    """
    b, s = input_ids.shape
    x = params["embed"][input_ids].astype(jnp.dtype(cfg.dtype))

    if positions is None:
        base = jnp.asarray(kv.start if kv is not None else 0)
        base = base[:, None] if base.ndim == 1 else base
        positions = jnp.broadcast_to(jnp.arange(s)[None, :] + base, (b, s))

    if cfg.use_rope:
        rope_cos, rope_sin = rope_frequencies(cfg.head_dim, cfg.max_seq_len,
                                              cfg.rope_theta)
    else:
        rope_cos = rope_sin = None

    if kv is None:
        def body(carry, bp):
            out, _ = block_forward(bp, carry, cfg, rope_cos, rope_sin,
                                   positions, slots=slots,
                                   valid_from=valid_from)
            return out, None

        x, _ = lax.scan(body, x, params["blocks"])
        new_kv = None
    else:
        def body(carry, layer_in):
            bp, k_l, v_l = layer_in
            out, (k_l, v_l) = block_forward(
                bp, carry, cfg, rope_cos, rope_sin, positions,
                kv=(k_l, v_l), start=kv.start, slots=slots,
                valid_from=valid_from)
            return out, (k_l, v_l)

        x, (k_new, v_new) = lax.scan(body, x, (params["blocks"], kv.k, kv.v))
        new_kv = KVSlice(k_new, v_new, kv.start + s)

    if last_only:
        x = x[:, -1:, :]
    x = rms_norm(x, params["norm"], cfg.norm_eps)
    logits = (x @ params["lm_head"]).astype(jnp.float32)
    return logits, new_kv


def count_parameters(params: dict) -> dict:
    """Per-section parameter counts (ref ch01/transformer.py:89-100)."""
    size = lambda t: sum(x.size for x in jax.tree_util.tree_leaves(t))
    out = {
        "embed_tokens": size(params["embed"]),
        "layers": size(params["blocks"]),
        "norm": size(params["norm"]),
        "lm_head": size(params["lm_head"]),
    }
    out["total"] = sum(out.values())
    return out
