"""Paged-KV transformer step functions.

The model side of true paged serving (BASELINE config 3): KV lives in
per-layer block pools (L, num_blocks, block_size, Hkv, hd) managed by
runtime/paged_kv.py block tables; decode attends through the
paged_decode_attention kernel (block-table-indirect DMA), and chunked
prefill writes blocks with scatter + attends its rectangular window with the
flash kernel over the request's gathered prefix.

Shapes are fully static: (batch, max_blocks_per_request, chunk buckets) are
compile-time; per-request raggedness rides in block tables and lengths.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..kernels.flash_attention import flash_attention
from ..kernels.paged_attention import (paged_decode_attention,
                                       int8_paged_decode_attention)
from ..kernels.quant import quantize_int8
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope, rope_frequencies
from .config import ModelConfig
from .transformer import (QuantKV, _ffn, _linear, _tp_psum, embed_lookup,
                          layer_view, lm_logits)


def _rope_tables(cfg: ModelConfig):
    if not cfg.use_rope:
        return None, None
    return rope_frequencies(cfg.head_dim, cfg.max_seq_len, cfg.rope_theta)


def _paged_fused_ok(params, cfg: ModelConfig, b: int, k_pools,
                    tables) -> bool:
    """Gate for the fused whole-model PAGED decode kernel — the paged twin
    of transformer._fused_decode_ok (same weight/TP/MoE requirements, plus
    the block-fan limits of kernels/fused_decode.fused_paged_decode_ok)."""
    import os

    from ..kernels.fused_decode import fused_paged_decode_ok
    from .quant import QuantizedTensor

    # DEFAULT ON (round 3): the block-table manual-DMA redesign measured
    # 13.2-16.2 ms/step at 7B B=64 (bs>=256 / bs=128) vs the per-op paged
    # path's 17.6 — with in-place pool writes it replaces both the round-2
    # operand fan (36.6 ms) and the +6.8 ms XLA pool-scatter. FUSED_PAGED=0
    # opts back into the per-op path.
    if os.environ.get("FUSED_PAGED", "1") == "0":
        return False
    if not (cfg.fused_decode and cfg.use_rope
            and jax.default_backend() == "tpu"
            and cfg.attention_impl != "dense" and cfg.tp_axis is None):
        return False
    if not (isinstance(k_pools, QuantKV) and k_pools.q.ndim == 5):
        return False
    for name in ("wqkv", "wo", "w_gate_up", "w_down"):
        w = params["blocks"].get(name)
        if not (isinstance(w, QuantizedTensor) and w.q.ndim == 3):
            return False
    bs = k_pools.q.shape[3]
    return fused_paged_decode_ok(cfg, b, tables.shape[1], bs,
                                 NB=k_pools.q.shape[1])


def _paged_decode_step_impl(params, tokens: jnp.ndarray,
                            k_pools, v_pools,
                            tables: jnp.ndarray, lengths: jnp.ndarray,
                            cfg: ModelConfig):
    """One decode step for all requests over paged KV.

    tokens: (B,) current token per request; k_pools/v_pools:
    dense pools (L, num_blocks, bs, Hkv, hd), or the merged QuantKV int8
    pools (K/V pages co-located; see serve/paged_engine.py) with
    v_pools=None; tables: (B, max_blocks) int32;
    lengths: (B,) tokens already in cache (the new token lands at
    position `lengths`). Returns (logits (B, V), k_pools, v_pools).
    """
    b = tokens.shape[0]
    quantized = isinstance(k_pools, QuantKV)
    # quantized pools are MERGED (round 5): k_pools carries the K+V pair
    # (L, NB, 2, BS, flat) / (L, NB, 2, HKV, BS) and v_pools is None —
    # K and V co-located per block so the fused kernel moves both with
    # one DMA descriptor
    bs = k_pools.q.shape[3] if quantized else k_pools.shape[2]
    hq, hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    if _paged_fused_ok(params, cfg, b, k_pools, tables):
        # Fused whole-model paged decode: one Pallas kernel for every
        # layer's matmuls + attention, KV gathered by block-table manual
        # DMA (kernels/fused_decode.fused_paged_decode_step). inplace=True:
        # the kernel writes the new K/V into the pools itself (aliased
        # buffers) — the XLA pool-scatter it replaces measured +6.8 ms/step
        # at 7B B=64. The merged-pool container (k_pools is the KV pair,
        # v_pools is None) carries (L, NB, 2, BS, flat) / (L, NB, 2, HKV,
        # BS) arrays — see serve/paged_engine.py.
        from ..kernels.fused_decode import fused_paged_decode_step

        cos, sin = _rope_tables(cfg)
        x0 = embed_lookup(params, tokens, cfg)
        (x_out, _k_new, _ksc, _v_new, _vsc, kv2, kvs2) = \
            fused_paged_decode_step(
                params["blocks"], x0, k_pools.q, k_pools.s,
                tables, lengths, cos[lengths], sin[lengths],
                cfg=cfg, inplace=True)
        k_pools = QuantKV(q=kv2, s=kvs2)
        logits = lm_logits(x_out[:, None, :], params, cfg)
        return logits[:, 0], k_pools, v_pools

    x = embed_lookup(params, tokens, cfg)[:, None, :]
    cos, sin = _rope_tables(cfg)
    positions = lengths[:, None]
    block_ids = tables[jnp.arange(b), lengths // bs]
    offsets = lengths % bs

    # Pools ride the scan CARRY (one stacked buffer, in-place aliased
    # updates); threading them through xs/ys makes XLA rebuild the whole
    # (L, nb, bs, Hkv, hd) stack every step (same copy tax measured at
    # ~1.3 ms/step on the dense path — models/transformer.py forward).
    def body(carry, l):
        x, k_pools, v_pools = carry
        bp = layer_view(params["blocks"], l)
        h = rms_norm(x, bp["ln1"], cfg.norm_eps)
        qkv = _linear(h, bp["wqkv"])
        q, k, v = jnp.split(qkv, [hq * hd, (hq + hkv) * hd], axis=-1)
        q = q.reshape(b, 1, hq, hd)
        k = k.reshape(b, 1, hkv, hd)
        v = v.reshape(b, 1, hkv, hd)
        if cos is not None:
            q = apply_rope(q, cos, sin, positions)
            k = apply_rope(k, cos, sin, positions)
        if quantized:
            # merged QuantKV pools: flat int8 values + transposed scales,
            # K at dim-2 index 0, V at index 1
            kq8, ksc = quantize_int8(k[:, 0], axis=-1)
            vq8, vsc = quantize_int8(v[:, 0], axis=-1)
            k_pools = QuantKV(
                q=k_pools.q.at[l, block_ids, 0, offsets].set(
                    kq8.reshape(b, hkv * hd)).at[l, block_ids, 1,
                                                 offsets].set(
                    vq8.reshape(b, hkv * hd)),
                s=k_pools.s.at[l, block_ids, 0, :, offsets].set(
                    ksc[..., 0]).at[l, block_ids, 1, :, offsets].set(
                    vsc[..., 0]))
            attn = int8_paged_decode_attention(
                q[:, 0], k_pools.q, k_pools.s,
                tables, lengths + 1, layer=l)
        else:
            k_pools = k_pools.at[l, block_ids, offsets].set(
                k[:, 0].astype(k_pools.dtype))
            v_pools = v_pools.at[l, block_ids, offsets].set(
                v[:, 0].astype(v_pools.dtype))
            attn = paged_decode_attention(q[:, 0], k_pools, v_pools, tables,
                                          lengths + 1, layer=l)
        x = x + _tp_psum(_linear(attn.reshape(b, 1, hq * hd), bp["wo"]), cfg)
        # dense fused SwiGLU or routed MoE (cfg.num_experts > 0) — the same
        # _ffn dispatch as the slot/dense path (transformer.py), so MoE
        # models serve through the paged engine too
        x = x + _ffn(bp, rms_norm(x, bp["ln2"], cfg.norm_eps), cfg)
        return (x, k_pools, v_pools), None

    (x, k_pools, v_pools), _ = lax.scan(
        body, (x, k_pools, v_pools), jnp.arange(cfg.num_layers))
    logits = lm_logits(x, params, cfg)
    return logits[:, 0], k_pools, v_pools


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(2, 3))
def paged_decode_step(params, tokens: jnp.ndarray,
                      k_pools, v_pools,
                      tables: jnp.ndarray, lengths: jnp.ndarray,
                      cfg: ModelConfig):
    """Jitted single decode step (see _paged_decode_step_impl)."""
    return _paged_decode_step_impl(params, tokens, k_pools, v_pools,
                                   tables, lengths, cfg)


def paged_decode_scan_impl(params, tokens: jnp.ndarray,
                           k_pools, v_pools,
                           tables: jnp.ndarray, lengths: jnp.ndarray,
                           rng: jax.Array, temps: jnp.ndarray,
                           top_ps: jnp.ndarray, cfg: ModelConfig,
                           horizon: int = 1, top_ks=None,
                           filtered: bool = True):
    """Multi-step paged decode: `horizon` tokens per dispatch, fully
    in-device (sampling included) — the paged engine's multi-step
    scheduling path (EngineConfig.decode_horizon equivalent). Block tables
    must already cover lengths+horizon (the engine pre-extends). Returns
    (tokens (B, horizon), k_pools, v_pools).

    `filtered=False` statically drops top-k/top-p (no per-step vocab sort);
    `top_ks` (B,) int32 enables per-request top-k when filtered.

    Unjitted: the engine jits this directly (single device) or inside a
    shard_map over the 'model' mesh axis (TP serving)."""
    from ..ops.sampling import sample_token

    def one(carry, _):
        tok, k, v, lens, rng = carry
        logits, k, v = _paged_decode_step_impl(params, tok, k, v, tables,
                                               lens, cfg)
        rng, sub = jax.random.split(rng)
        nxt = sample_token(
            logits, sub, temperature=temps,
            top_k=(top_ks if (filtered and top_ks is not None) else 0),
            top_p=top_ps if filtered else None).astype(jnp.int32)
        return (nxt, k, v, lens + 1, rng), nxt

    (_, k_pools, v_pools, _, _), toks = jax.lax.scan(
        one, (tokens, k_pools, v_pools, lengths, rng), None, length=horizon)
    return jnp.swapaxes(toks, 0, 1), k_pools, v_pools


paged_decode_scan = partial(jax.jit,
                            static_argnames=("cfg", "horizon", "filtered"),
                            donate_argnums=(2, 3))(paged_decode_scan_impl)


def paged_prefill_chunk_impl(params, ids: jnp.ndarray,
                             k_pools: jnp.ndarray, v_pools: jnp.ndarray,
                             table: jnp.ndarray, start: jnp.ndarray,
                             nvalid: jnp.ndarray, cfg: ModelConfig):
    """Prefill one chunk of R requests into their paged blocks, BATCHED.

    ids: (R, C) chunk tokens right-padded; table: (R, max_blocks) block
    tables; start: (R,) each chunk's first global position; nvalid: (R,)
    real tokens per chunk (0 = padding row: no writes, garbage logits the
    caller ignores). Attends over each request's prefix gathered from the
    pool plus the chunk itself via the flash kernel (per-request
    q_offset). Returns (last-valid-position logits (R, V), k_pools,
    v_pools).

    Round 4: batched over requests — the round-3 engine dispatched one
    (1, C) forward PER REQUEST, so prefill cost was dominated by
    per-dispatch overhead (tunnel round-trip + m=C matmuls at ~5% MXU);
    one (R, C) dispatch amortizes both. 1D table / scalar start are
    auto-promoted for back-compat.
    """
    if table.ndim == 1:
        table = table[None]
        start = jnp.asarray(start).reshape(1)
        nvalid = jnp.asarray(nvalid).reshape(1)
    R, c = ids.shape
    quantized = isinstance(k_pools, QuantKV)
    # quantized pools are MERGED: k_pools carries the K+V pair, v_pools
    # is None (see _paged_decode_step_impl)
    bs = k_pools.q.shape[3] if quantized else k_pools.shape[2]
    hq, hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    max_blocks = table.shape[1]
    prefix_cap = max_blocks * bs  # static gather width

    x = embed_lookup(params, ids, cfg)
    cos, sin = _rope_tables(cfg)
    positions = start[:, None] + jnp.arange(c)[None, :]     # (R, C)
    # scatter targets for the chunks' tokens, flattened over (R·C)
    nb = (k_pools.q if quantized else k_pools).shape[1]
    blk = jnp.take_along_axis(table, positions // bs, axis=1)
    blk = jnp.where(jnp.arange(c)[None, :] < nvalid[:, None], blk,
                    nb).reshape(R * c)                      # drop padding
    off = (positions % bs).reshape(R * c)

    # Pools in the scan carry for the same in-place-aliasing reason as the
    # decode step above.
    def body(carry, l):
        x, k_pools, v_pools = carry
        bp = layer_view(params["blocks"], l)
        h = rms_norm(x, bp["ln1"], cfg.norm_eps)
        qkv = _linear(h, bp["wqkv"])
        q, k, v = jnp.split(qkv, [hq * hd, (hq + hkv) * hd], axis=-1)
        q = q.reshape(R, c, hq, hd)
        k = k.reshape(R, c, hkv, hd)
        v = v.reshape(R, c, hkv, hd)
        if cos is not None:
            q = apply_rope(q, cos, sin, positions)
            k = apply_rope(k, cos, sin, positions)
        if quantized:
            kq8, ksc = quantize_int8(k.reshape(R * c, hkv, hd), axis=-1)
            vq8, vsc = quantize_int8(v.reshape(R * c, hkv, hd), axis=-1)
            k_pools = QuantKV(
                q=k_pools.q.at[l, blk, 0, off].set(
                    kq8.reshape(R * c, hkv * hd), mode="drop")
                .at[l, blk, 1, off].set(
                    vq8.reshape(R * c, hkv * hd), mode="drop"),
                s=k_pools.s.at[l, blk, 0, :, off].set(ksc[..., 0],
                                                      mode="drop")
                .at[l, blk, 1, :, off].set(vsc[..., 0], mode="drop"))

            def gather_dq(pools, which):
                pq = lax.dynamic_index_in_dim(pools.q, l, 0, keepdims=False)
                ps = lax.dynamic_index_in_dim(pools.s, l, 0, keepdims=False)
                seq = pq[table][:, :, which].reshape(
                    R, max_blocks, bs, hkv, hd)
                sc = ps[table][:, :, which].transpose(0, 1, 3, 2)[..., None]
                return (seq.astype(jnp.float32)
                        * sc.reshape(R, max_blocks, bs, hkv, 1)).reshape(
                            R, prefix_cap, hkv, hd)

            k_seq, v_seq = gather_dq(k_pools, 0), gather_dq(k_pools, 1)
        else:
            k_pools = k_pools.at[l, blk, off].set(
                k.reshape(R * c, hkv, hd).astype(k_pools.dtype),
                mode="drop")
            v_pools = v_pools.at[l, blk, off].set(
                v.reshape(R * c, hkv, hd).astype(v_pools.dtype),
                mode="drop")
            # gather each request's whole (padded) KV range contiguously:
            # (max_blocks·bs, Hkv, hd) — includes the chunk just written
            k_pool = lax.dynamic_index_in_dim(k_pools, l, 0, keepdims=False)
            v_pool = lax.dynamic_index_in_dim(v_pools, l, 0, keepdims=False)
            k_seq = k_pool[table].reshape(R, prefix_cap, hkv, hd)
            v_seq = v_pool[table].reshape(R, prefix_cap, hkv, hd)
        attn = flash_attention(
            q.transpose(0, 2, 1, 3),
            k_seq.transpose(0, 2, 1, 3).astype(q.dtype),
            v_seq.transpose(0, 2, 1, 3).astype(q.dtype),
            q_offset=start, causal=True)
        attn = attn.transpose(0, 2, 1, 3).reshape(R, c, hq * hd)
        x = x + _tp_psum(_linear(attn, bp["wo"]), cfg)
        x = x + _ffn(bp, rms_norm(x, bp["ln2"], cfg.norm_eps), cfg)
        return (x, k_pools, v_pools), None

    (x, k_pools, v_pools), _ = lax.scan(
        body, (x, k_pools, v_pools), jnp.arange(cfg.num_layers))
    logits = lm_logits(x, params, cfg)
    last = jnp.take_along_axis(
        logits, jnp.maximum(nvalid - 1, 0)[:, None, None], axis=1)
    return last[:, 0], k_pools, v_pools


paged_prefill_chunk = partial(jax.jit, static_argnames=("cfg",),
                              donate_argnums=(2, 3))(paged_prefill_chunk_impl)
