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

from ..ops.gqa import grouped_sdpa, grouped_sdpa_bshd
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope, rope_frequencies
from .config import ModelConfig


def _pick_block(dim: int, candidates=(512, 256, 128, 8)) -> int | None:
    for c in candidates:
        if dim % c == 0:
            return c
    return dim if dim <= 8 else None


class StackedQuant(NamedTuple):
    """A layer's view into FULL-stack quantized weights (L, K, N)/(L, 1, N).

    Handed to _linear instead of a sliced per-layer QuantizedTensor so the
    int8_matmul kernel can index the layer in its DMA descriptor. Scanning
    stacked weights through lax.scan xs instead makes XLA dynamic-slice
    (HBM-copy) every layer's weights each step — measured ~1.07 ms/step on
    the 0.85B decode bench, as much as the entire weight-streaming floor."""

    w: Any               # QuantizedTensor with stacked leaves
    layer: jnp.ndarray   # traced int32 scalar


def layer_view(blocks: dict, l: jnp.ndarray) -> dict:
    """One layer's parameter view for a lax.scan body where only the layer
    INDEX rides xs. Quantized matmul weights become StackedQuant (the int8
    kernel indexes the layer inside its DMA descriptors — no copy); small
    leaves (norm scales) and non-2D quantized stacks (MoE experts) are
    dynamic-sliced, exactly what scanning them as xs would do."""
    from .quant import QuantizedTensor, QuantizedTensor4

    bp = {}
    for name, w in blocks.items():
        if isinstance(w, (QuantizedTensor, QuantizedTensor4)) \
                and w.q.ndim == 3:
            bp[name] = StackedQuant(w, l)
        elif isinstance(w, QuantizedTensor):
            bp[name] = QuantizedTensor(
                lax.dynamic_index_in_dim(w.q, l, 0, keepdims=False),
                lax.dynamic_index_in_dim(w.s, l, 0, keepdims=False))
        else:
            bp[name] = lax.dynamic_index_in_dim(w, l, 0, keepdims=False)
    return bp


def _linear(x: jnp.ndarray, w) -> jnp.ndarray:
    """Matmul dispatch: plain array → x @ w; QuantizedTensor → INT8 path
    (Pallas int8_matmul kernel on TPU when dims tile onto the MXU, fused
    dequant matmul otherwise); StackedQuant → INT8 path with in-kernel layer
    indexing. x: (..., K); returns (..., N)."""
    from .quant import QuantizedTensor, QuantizedTensor4

    layer = None
    if isinstance(w, StackedQuant):
        layer = w.layer
        w = w.w
    if isinstance(w, QuantizedTensor4):
        # INT4 per-op/prefill fallback: unpack + group-scale this layer's
        # weights in XLA and run a dense matmul. Decode never lands here —
        # the fused kernel unpacks int4 tiles in VMEM (fused_decode).
        wd = (w.dequantize_layer(layer, x.dtype) if layer is not None
              else w.dequantize(x.dtype))
        n = wd.shape[-1]
        out = jnp.dot(x.reshape(-1, wd.shape[-2]), wd,
                      preferred_element_type=jnp.float32).astype(x.dtype)
        return out.reshape(*x.shape[:-1], n)
    if not isinstance(w, QuantizedTensor):
        if layer is not None:
            w = lax.dynamic_index_in_dim(w, layer, 0, keepdims=False)
        return x @ w
    if layer is not None:
        _, k, n = w.q.shape
        w_q, scale = w.q, w.s
    else:
        k, n = w.q.shape
        w_q, scale = w.q, w.s.reshape(1, n)
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    # Big weight tiles: decode is weight-streaming-bound, so fewer grid steps
    # with ~2-4 MB weight DMAs keep HBM at full bandwidth. Critically, bm
    # covers ALL of m for decode-sized batches — every extra m-block re-streams
    # the whole weight matrix from HBM (batch 32 with bm=8 cost 4x traffic).
    # PREFILL (m >= 2048): every m-block also re-DEQUANTIZES the whole
    # weight matrix (VPU passes between the MXU dots), so larger bm cuts
    # both the re-stream and the re-dequant (round 4,
    # scripts/probe_prefill.py attribution in docs/PERF.md).
    bm = (m if (m <= 512 and m % 8 == 0)
          else _pick_block(m, (1024, 512, 256, 8) if m >= 2048
                           else (512, 256, 8)))
    bk = _pick_block(k, (2048, 1024, 512, 256, 128))
    bn = _pick_block(n, (1024, 512, 256, 128))
    # PREFILL (m >= 2048) goes to XLA's native dot with on-the-fly int8
    # dequant: at these shapes the matmul is MXU-bound and XLA runs it at
    # ~97% of peak bf16 vs the Pallas kernel's in-VMEM per-tile dequant
    # path at ~69% (round-4 prefill attribution, scripts/probe_prefill.py
    # → docs/PERF.md) — the kernel's halved weight DMA only matters when
    # the stream is memory-bound, i.e. decode-sized m.
    use_kernel = (jax.default_backend() == "tpu" and m < 2048
                  and bm is not None and m % bm == 0
                  and bk is not None and bn is not None)
    if use_kernel:
        from ..kernels.int8_matmul import int8_matmul

        out = int8_matmul(x2, w_q, scale,
                          block_m=bm, block_n=bn, block_k=bk,
                          out_dtype=x.dtype, layer=layer)
    else:
        if layer is not None:
            w_q = lax.dynamic_index_in_dim(w_q, layer, 0, keepdims=False)
            scale = lax.dynamic_index_in_dim(scale, layer, 0, keepdims=False)
        acc = jnp.dot(x2, w_q.astype(x.dtype),
                      preferred_element_type=jnp.float32)
        out = (acc * scale.reshape(1, n)).astype(x.dtype)
    return out.reshape(*x.shape[:-1], n)


class QuantKV(NamedTuple):
    """INT8 KV storage: int8 values + per-token-per-head f32 scales.

    The framework's native KV format (BASELINE north star): halves decode
    HBM traffic for the cache. Per-(token, head) absmax scales keep the
    attention error inside the 0.1-ppl budget.

    Layouts are chosen for the decode kernel (kernels/int8_kv_attention.py)
    and are NOT the logical (..., S, Hkv, hd) shape:
    - values are stored FLAT, (..., S, Hkv·hd): with (Hkv, hd) trailing dims
      the int8 tiling pads Hkv sublanes 8×, and reshaping per step forces a
      full-cache relayout copy (measured ~1 ms/step on the 0.85B bench).
    - scales are stored TRANSPOSED, (..., Hkv, S) — S on the lane axis. The
      natural (..., S, Hkv, 1) layout puts a 1-wide lane dim in the kernel's
      scale blocks, which Mosaic pads 128×.
    """

    q: jnp.ndarray  # int8  (..., S, Hkv·hd)
    s: jnp.ndarray  # f32   (..., Hkv, S)


class KVSlice(NamedTuple):
    """Per-call KV threading: stacked caches + the write offset."""

    k: jnp.ndarray | QuantKV  # (L, B, max_S, Hkv, hd)
    v: jnp.ndarray | QuantKV
    start: jnp.ndarray  # int32 scalar or (B,): first slot of this call's tokens


def _cache_write(cache, new: jnp.ndarray, start: jnp.ndarray,
                 layer: jnp.ndarray | None = None):
    """Write `new` (B, s, H, hd) into the cache at slot offset(s) `start`
    (scalar, or (B,) for per-request offsets). Handles dense and QuantKV.

    With `layer`, the cache is the FULL stacked (L, B, S, H, hd) array and the
    write lands at that layer — the cache then lives in the layer-scan CARRY
    and every update aliases in place. (Threading per-layer caches through
    scan xs/ys instead forces XLA to rebuild the entire cache every step:
    measured ~1.3 ms/step of pure copy traffic on the 0.85B bench.)"""
    def write(buf, val):
        val = val.astype(buf.dtype)
        if layer is None:
            if start.ndim == 0:
                return lax.dynamic_update_slice(buf, val, (0, start, 0, 0))
            return jax.vmap(lambda c, n, off: lax.dynamic_update_slice(
                c, n, (off, 0, 0)))(buf, val, start)
        if start.ndim == 0:
            return lax.dynamic_update_slice(buf, val[None],
                                            (layer, 0, start, 0, 0))
        # vmap over batch (axis 1 of the stacked cache)
        return jax.vmap(
            lambda c, n, off: lax.dynamic_update_slice(
                c, n[None], (layer, off, 0, 0)),
            in_axes=(1, 0, 0), out_axes=1)(buf, val, start)

    def write_flat(buf, val):
        # flat value layout (..., S, Hkv·hd): one rank lower than dense
        val = val.astype(buf.dtype)
        if layer is None:
            if start.ndim == 0:
                return lax.dynamic_update_slice(buf, val, (0, start, 0))
            return jax.vmap(lambda c, n, off: lax.dynamic_update_slice(
                c, n, (off, 0)))(buf, val, start)
        if start.ndim == 0:
            return lax.dynamic_update_slice(buf, val[None],
                                            (layer, 0, start, 0))
        return jax.vmap(
            lambda c, n, off: lax.dynamic_update_slice(
                c, n[None], (layer, off, 0)),
            in_axes=(1, 0, 0), out_axes=1)(buf, val, start)

    def write_scale(buf, val):
        # scale layout is transposed, (..., Hkv, S): val (B, s, H, 1) →
        # (B, H, s), written at lane offset `start`
        val = val[..., 0].transpose(0, 2, 1).astype(buf.dtype)
        if layer is None:
            if start.ndim == 0:
                return lax.dynamic_update_slice(buf, val, (0, 0, start))
            return jax.vmap(lambda c, n, off: lax.dynamic_update_slice(
                c, n, (0, off)))(buf, val, start)
        if start.ndim == 0:
            return lax.dynamic_update_slice(buf, val[None],
                                            (layer, 0, 0, start))
        return jax.vmap(
            lambda c, n, off: lax.dynamic_update_slice(
                c, n[None], (layer, 0, off)),
            in_axes=(1, 0, 0), out_axes=1)(buf, val, start)

    if isinstance(cache, QuantKV):
        from ..kernels.quant import quantize_int8

        qv, sv = quantize_int8(new, axis=-1)
        qv = qv.reshape(*qv.shape[:-2], -1)  # flat (B, s, Hkv·hd)
        return QuantKV(q=write_flat(cache.q, qv), s=write_scale(cache.s, sv))
    return write(cache, new)


def _cache_read_layer(cache, layer, dtype):
    """Layer slice of the stacked cache, dequantized to `dtype`."""
    def idx(buf):
        return lax.dynamic_index_in_dim(buf, layer, 0, keepdims=False)

    if isinstance(cache, QuantKV):
        s = idx(cache.s).transpose(0, 2, 1)[..., None]  # (B, S, Hkv, 1)
        q = idx(cache.q)                                # (B, S, Hkv·hd)
        hkv = s.shape[2]
        q = q.reshape(*q.shape[:-1], hkv, -1)
        return (q.astype(jnp.float32) * s).astype(dtype)
    return idx(cache).astype(dtype)


def _cache_read(cache, dtype) -> jnp.ndarray:
    """Materialize the cache for attention in the compute dtype (dequantizes
    QuantKV; XLA fuses the dequant into the attention matmuls)."""
    if isinstance(cache, QuantKV):
        perm = tuple(range(cache.s.ndim - 2)) + (cache.s.ndim - 1,
                                                 cache.s.ndim - 2)
        s = cache.s.transpose(perm)[..., None]  # (..., S, Hkv, 1)
        hkv = s.shape[-2]
        q = cache.q.reshape(*cache.q.shape[:-1], hkv, -1)
        return (q.astype(jnp.float32) * s).astype(dtype)
    return cache.astype(dtype)


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

    # qkv fused into one projection: a single MXU pass / weight stream per
    # block instead of three (the ch01 fused-projection lesson applied to
    # attention); layout [q | k | v] on the output dim.
    qkv_out = (cfg.num_heads + 2 * cfg.num_kv_heads) * hd
    blocks = {
        "ln1": jnp.ones((L, d), dtype),
        "wqkv": w(keys[1], (L, d, qkv_out), d),
        "wo": w(keys[4], (L, cfg.num_heads * hd, d), d),
        "ln2": jnp.ones((L, d), dtype),
    }
    if cfg.num_experts > 0:
        e = cfg.num_experts
        ks = jax.random.split(keys[5], 4)
        blocks.update({
            "moe_gate": w(ks[0], (L, d, e), d),
            "moe_w1": w(ks[1], (L, e, d, f), d),
            "moe_w3": w(ks[2], (L, e, d, f), d),
            "moe_w2": w(ks[3], (L, e, f, d), f),
        })
    else:
        blocks.update({
            "w_gate_up": w(keys[5], (L, d, 2 * f), d),
            "w_down": w(keys[6], (L, f, d), f),
        })
    return {
        "embed": w(keys[0], (v, d), d),
        "blocks": blocks,
        "norm": jnp.ones((d,), dtype),
        "lm_head": w(keys[7], (d, v), d),
    }


def _tp_psum(y: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """Reduce a row-parallel partial product over the TP axis. Identity in
    single-device semantics; inside a shard_map body (cfg.tp_axis set) this
    is the per-block all-reduce the reference only documents
    (ref ch09/tensor_parallel.py:142-147) — XLA lowers it onto the ICI ring."""
    if cfg.tp_axis is None:
        return y
    return lax.psum(y, cfg.tp_axis)


def embed_lookup(params: dict, input_ids: jnp.ndarray,
                 cfg: ModelConfig) -> jnp.ndarray:
    """Token embedding in the compute dtype. Under TP (cfg.tp_axis) the
    embedding is vocab-ROW-sharded (Megatron layout): each shard looks up
    the ids in its row range, contributes 0 elsewhere, and one psum
    assembles the full embedding."""
    if cfg.tp_axis is None:
        return params["embed"][input_ids].astype(jnp.dtype(cfg.dtype))
    vloc = params["embed"].shape[0]
    idx = lax.axis_index(cfg.tp_axis)
    loc = input_ids - idx * vloc
    ok = (loc >= 0) & (loc < vloc)
    emb = params["embed"][jnp.clip(loc, 0, vloc - 1)]
    x = lax.psum(jnp.where(ok[..., None], emb, 0), cfg.tp_axis)
    return x.astype(jnp.dtype(cfg.dtype))


def lm_logits(x: jnp.ndarray, params: dict, cfg: ModelConfig) -> jnp.ndarray:
    """Final norm + lm_head. Under TP the head is column(vocab)-sharded, so
    the vocab shards are all-gathered — every TP rank then samples from
    identical full logits (rank-consistent next tokens)."""
    x = rms_norm(x, params["norm"], cfg.norm_eps)
    logits = _linear(x, params["lm_head"]).astype(jnp.float32)
    if cfg.tp_axis is not None:
        logits = lax.all_gather(logits, cfg.tp_axis, axis=logits.ndim - 1,
                                tiled=True)
    return logits


def _ffn(bp: dict, h: jnp.ndarray, cfg: ModelConfig,
         valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Block FFN: dense fused SwiGLU, or routed MoE when cfg.num_experts > 0
    (ref ch09/moe_layer.py integrated into the block — the reference never
    wires MoE into its transformer). `valid` masks padding tokens out of MoE
    routing so pads can't claim expert capacity (models/moe.py).

    Under TP (cfg.tp_axis): gate_up is column-sharded and w_down row-sharded,
    so the down projection yields a partial sum that is psum-reduced here.
    MoE expert weights replicate across TP (they shard over the 'expert'
    axis instead — parallel/ep.py), so the routed path needs no reduction."""
    if cfg.num_experts > 0:
        from .config import MoEConfig
        from .moe import moe_layer

        moe_cfg = MoEConfig(num_experts=cfg.num_experts,
                            num_experts_per_tok=cfg.num_experts_per_tok,
                            capacity_factor=cfg.expert_capacity_factor)
        out, _ = moe_layer(h, {"gate": bp["moe_gate"], "w1": bp["moe_w1"],
                               "w3": bp["moe_w3"], "w2": bp["moe_w2"]},
                           moe_cfg, valid=valid)
        return out
    gu = _linear(h, bp["w_gate_up"])
    gate, up = jnp.split(gu, 2, axis=-1)
    return _tp_psum(_linear(jax.nn.silu(gate) * up, bp["w_down"]), cfg)


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


def _attend_bshd(q, k, v, q_slots, k_slots, valid_from=None):
    """_attend over tensors still in projection layout (B, S, H, hd) — same
    mask predicate, no head/seq transposes (ops/gqa.grouped_sdpa_bshd).
    Returns (B, Sq, Hq·hd), ready for the wo projection."""
    mask = k_slots[None, None, :] <= q_slots[:, :, None]
    if valid_from is not None:
        mask = mask & (k_slots[None, None, :] >= valid_from[:, None, None])
    return grouped_sdpa_bshd(q, k, v, mask=mask[:, None, None, :, :])


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
    layer: jnp.ndarray | None = None,
    k_limit: int | None = None,
):
    """One transformer block: pre-norm GQA + residual, pre-norm SwiGLU +
    residual (ref ch01/transformer.py:34-44).

    With `kv=(k_cache, v_cache)` FULL stacked caches (L, B, max_S, Hkv, hd)
    and `layer` (traced index), new K/V are written in place at that layer and
    offset `start`, and attention runs over that layer's cache
    (ref ch02/cached_generation.py:52-98 CachedGQA). Returns (x, (k, v)).
    """
    b, s, d = x.shape
    hq, hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    h = rms_norm(x, bp["ln1"], cfg.norm_eps)
    qkv = _linear(h, bp["wqkv"])
    q, k, v = jnp.split(qkv, [hq * hd, (hq + hkv) * hd], axis=-1)
    q = q.reshape(b, s, hq, hd)
    k = k.reshape(b, s, hkv, hd)
    v = v.reshape(b, s, hkv, hd)
    if rope_cos is not None:
        q = apply_rope(q, rope_cos, rope_sin, positions)
        k = apply_rope(k, rope_cos, rope_sin, positions)

    if slots is None:
        slots = positions

    # token validity for MoE routing: left-pad slots below valid_from must
    # not claim expert capacity
    ffn_valid = None
    if cfg.num_experts > 0 and valid_from is not None:
        ffn_valid = slots >= valid_from[:, None]

    on_tpu = jax.default_backend() == "tpu"
    # "auto": flash for prefill-shaped calls (enough query rows to fill MXU
    # tiles), dense for decode-shaped, int8-KV decode kernel for quantized
    # caches. s is static under jit, so this resolves at trace time.
    impl = cfg.attention_impl
    if impl == "auto":
        # measured crossover (scripts/probe_flash_paged.py, v5e, round-4
        # mask-free-interior kernel): flash beats XLA dense from ~512
        # total context up (1.4-1.6x at 512, 2.5-5.5x beyond — both the
        # B=4 square sweep and the B=64 rectangular prefill shapes);
        # below that the per-grid-step overheads dominate (B=64
        # Sq=128/Sk=256: 0.76x). Dense materializes (B, Hq, Sq, Sk)
        # scores, so force flash once that exceeds a VMEM-friendly budget
        # regardless of the crossover.
        if kv is not None:
            arr = kv[0].q if isinstance(kv[0], QuantKV) else kv[0]
            # stacked caches carry a leading layer dim: (L,B,S,…) / flat
            # QuantKV (L,B,S,Hkv·hd); unstacked drop it
            stacked = arr.ndim == (4 if isinstance(kv[0], QuantKV) else 5)
            sk = arr.shape[2] if stacked else arr.shape[1]
        else:
            sk = s
        score_mb = b * cfg.num_heads * s * sk * 2 / (1 << 20)
        impl = "flash" if (on_tpu and s >= 128
                           and (max(s, sk) >= 512 or score_mb > 512)) \
            else "dense"

    if kv is None:
        kq = k.transpose(0, 2, 1, 3)
        vq = v.transpose(0, 2, 1, 3)
        k_slots = jnp.arange(s)
        new_kv = None
        q_offset = jnp.int32(0)
    else:
        k_cache, v_cache = kv
        start = jnp.asarray(start)
        k_cache = _cache_write(k_cache, k, start, layer=layer)
        v_cache = _cache_write(v_cache, v, start, layer=layer)
        new_kv = (k_cache, v_cache)
        q_offset = start

        if (s == 1 and isinstance(k_cache, QuantKV) and on_tpu
                and cfg.attention_impl != "dense"):
            # INT8-KV decode hot path: fused in-kernel dequant — the cache
            # crosses HBM at 1 byte/element instead of being materialized
            # in bf16 first. With stacked caches the kernel indexes the layer
            # directly (no slice copy).
            from ..kernels.int8_kv_attention import int8_kv_decode_attention

            attn = int8_kv_decode_attention(
                q[:, 0], k_cache.q, k_cache.s, v_cache.q, v_cache.s,
                q_slot=slots[:, 0], valid_from=valid_from, layer=layer)
            x = x + _tp_psum(_linear(attn.reshape(b, 1, hq * hd), bp["wo"]),
                             cfg)
            x = x + _ffn(bp, rms_norm(x, bp["ln2"], cfg.norm_eps), cfg,
                         valid=ffn_valid)
            return x, new_kv

        if k_limit is not None and k_limit == s:
            # One-shot prefill (slots [0, s) were written by THIS call —
            # the only k_limit caller, runtime/generate._prefill, writes at
            # start=0 with k_limit=p=s): attend the freshly computed
            # post-RoPE K/V directly instead of round-tripping through the
            # cache. Skips two dequant passes + the int8 read-back per
            # layer; with a QuantKV cache this also means intra-prompt
            # attention sees pre-quantization values (production-engine
            # semantics — cache noise enters at decode, where the cache is
            # actually the source), which only tightens the accuracy
            # budget. Bit-identical for non-quantized caches.
            # (A transpose-free variant — _attend_bshd, attention directly
            # in the (B, S, H, hd) projection layout — measured TTFT p50
            # 637.8 vs 629.6 ms here: no win; XLA already folds these
            # transposes, and the (b, h) non-adjacent batch dims make
            # dot_general pay its own relayout. Kept as the tested negative
            # result; docs/PERF.md round-5 TTFT section.)
            kq = k.transpose(0, 2, 1, 3)
            vq = v.transpose(0, 2, 1, 3)
            k_slots = jnp.arange(s)
        elif layer is None:
            kq = _cache_read(k_cache, q.dtype).transpose(0, 2, 1, 3)
            vq = _cache_read(v_cache, q.dtype).transpose(0, 2, 1, 3)
        else:
            kq = _cache_read_layer(k_cache, layer, q.dtype).transpose(0, 2, 1, 3)
            vq = _cache_read_layer(v_cache, layer, q.dtype).transpose(0, 2, 1, 3)
        if k_limit is not None and k_limit < kq.shape[2]:
            # STATIC bound on attendable cache slots (e.g. one-shot prefill
            # of P tokens into a P+decode cache): slicing before attention
            # drops the dead tail's dequant + scores + softmax — the mask
            # already excluded it, but masked work still costs MXU/VPU
            # time (~0.5 ms/layer at the 7B headline prefill, round-5
            # prefill attribution)
            kq = kq[:, :, :k_limit]
            vq = vq[:, :, :k_limit]
        k_slots = jnp.arange(kq.shape[2])

    qT = q.transpose(0, 2, 1, 3)
    if impl == "flash":
        # Pallas kernel path. All runtime paths use affine slot layouts
        # (slots = q_offset + arange), which is what the kernel's
        # rectangular-causal mask implements; valid_from masks left padding.
        from ..kernels.flash_attention import flash_attention

        attn = flash_attention(qT, kq, vq, q_offset=q_offset, causal=True,
                               valid_from=valid_from)
    else:
        attn = _attend(qT, kq, vq, slots, k_slots, valid_from)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, s, hq * hd)
    x = x + _tp_psum(_linear(attn, bp["wo"]), cfg)
    x = x + _ffn(bp, rms_norm(x, bp["ln2"], cfg.norm_eps), cfg,
                 valid=ffn_valid)
    return x, new_kv


def _fused_decode_ok(params: dict, cfg: ModelConfig, b: int,
                     kv: "KVSlice") -> bool:
    """Shape/type gate for the fused whole-model decode kernel."""
    from .quant import QuantizedTensor

    if not (cfg.fused_decode and cfg.num_experts == 0 and cfg.use_rope
            and jax.default_backend() == "tpu"
            and cfg.attention_impl != "dense"
            # the megakernel carries the residual stream through all layers
            # in VMEM — row-parallel partial sums can't psum mid-kernel, so
            # TP decode takes the per-op path (psum after wo/down)
            and cfg.tp_axis is None):
        return False
    if not isinstance(kv.k, QuantKV):
        return False
    from .quant import QuantizedTensor4

    blocks = params["blocks"]
    kinds = {type(blocks.get(name))
             for name in ("wqkv", "wo", "w_gate_up", "w_down")}
    # all-int8 or all-int4 stacks (the kernel compiles one weight format)
    if kinds == {QuantizedTensor4}:
        # W4A8 is unsupported in the kernel (act8 forces N-phase tiles while
        # int4 requires K-blocked ones) — route to the per-op path instead of
        # hitting the kernel's trace-time assert
        if getattr(cfg, "act_quant", "none") != "none":
            return False
        if any(blocks[n].q.ndim != 3
               for n in ("wqkv", "wo", "w_gate_up", "w_down")):
            return False
    elif kinds == {QuantizedTensor}:
        if any(blocks[n].q.ndim != 3
               for n in ("wqkv", "wo", "w_gate_up", "w_down")):
            return False
    else:
        return False
    d, f, hd = cfg.hidden_dim, cfg.intermediate_dim, cfg.head_dim
    qo = (cfg.num_heads + 2 * cfg.num_kv_heads) * hd
    s_max = kv.k.q.shape[2]
    # per-phase tile widths (kernels/fused_decode.py): each stream needs a
    # >=128 tile dividing its own output dim
    return (hd % 128 == 0 and b % 8 == 0 and qo % 128 == 0
            and d % 128 == 0 and f % 128 == 0 and s_max % 8 == 0
            and 8 * s_max * cfg.num_kv_heads * hd <= (8 << 20))


def _scatter_new_kv(cache: QuantKV, new_q: jnp.ndarray, new_s: jnp.ndarray,
                    start: jnp.ndarray) -> QuantKV:
    """Write the fused kernel's per-layer new K or V (L, B, Hkv·hd) int8 +
    scales (L, B, Hkv) into the stacked cache at slot(s) `start` — one fused
    update covering all layers."""
    if start.ndim == 0:
        q = lax.dynamic_update_slice(cache.q, new_q[:, :, None, :],
                                     (0, 0, start, 0))
        s = lax.dynamic_update_slice(cache.s, new_s[:, :, :, None],
                                     (0, 0, 0, start))
        return QuantKV(q=q, s=s)
    q = jax.vmap(lambda c, n, off: lax.dynamic_update_slice(
        c, n[:, None, :], (0, off, 0)),
        in_axes=(1, 1, 0), out_axes=1)(cache.q, new_q, start)
    s = jax.vmap(lambda c, n, off: lax.dynamic_update_slice(
        c, n[:, :, None], (0, 0, off)),
        in_axes=(1, 1, 0), out_axes=1)(cache.s, new_s, start)
    return QuantKV(q=q, s=s)


def forward(
    params: dict,
    input_ids: jnp.ndarray,
    cfg: ModelConfig,
    kv: KVSlice | None = None,
    positions: jnp.ndarray | None = None,
    slots: jnp.ndarray | None = None,
    valid_from: jnp.ndarray | None = None,
    last_only: bool = False,
    greedy_head: bool = False,
    k_limit: int | None = None,
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

    `greedy_head` (static): return greedy next-token ids (B,) int32 for the
    last position instead of logits — the INT8 head runs as one fused
    norm+matmul+argmax kernel (kernels/lmhead.py) and the (B, V) logits
    never leave VMEM. Bit-identical to argmax over the logits path.
    """
    b, s = input_ids.shape
    x = embed_lookup(params, input_ids, cfg)

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
        def body(carry, l):
            out, _ = block_forward(layer_view(params["blocks"], l), carry,
                                   cfg, rope_cos, rope_sin, positions,
                                   slots=slots, valid_from=valid_from)
            return out, None

        x, _ = lax.scan(body, x, jnp.arange(cfg.num_layers))
        new_kv = None
    elif s == 1 and _fused_decode_ok(params, cfg, b, kv):
        # Fused whole-model decode: one Pallas kernel runs every layer's
        # matmuls + attention + glue, streaming weights and the INT8 cache
        # through VMEM once (kernels/fused_decode.py). New K/V come back as
        # (L, B, Hkv·hd) and are scattered into the cache in one update.
        from ..kernels.fused_decode import fused_decode_step

        start = jnp.asarray(kv.start)
        q_slot = (slots[:, 0] if slots is not None
                  else jnp.broadcast_to(start.reshape(-1), (b,)))
        pos = positions[:, 0]
        cos_g, sin_g = rope_cos[pos], rope_sin[pos]
        if start.ndim == 0:
            # uniform write slot → the kernel updates the cache IN PLACE
            # (aliased buffers): zero-copy through the decode scan's carry
            x_out, kq2, ks2, vq2, vs2 = fused_decode_step(
                params["blocks"], x[:, 0], kv.k.q, kv.k.s, kv.v.q, kv.v.s,
                q_slot=q_slot, valid_from=valid_from,
                rope_cos_g=cos_g, rope_sin_g=sin_g, cfg=cfg,
                slot=start, write_cache=True)
            k_cache, v_cache = QuantKV(kq2, ks2), QuantKV(vq2, vs2)
        else:
            x_out, k_new, ksc, v_new, vsc = fused_decode_step(
                params["blocks"], x[:, 0], kv.k.q, kv.k.s, kv.v.q, kv.v.s,
                q_slot=q_slot, valid_from=valid_from,
                rope_cos_g=cos_g, rope_sin_g=sin_g, cfg=cfg)
            k_cache = _scatter_new_kv(kv.k, k_new, ksc, start)
            v_cache = _scatter_new_kv(kv.v, v_new, vsc, start)
        x = x_out[:, None, :]
        new_kv = KVSlice(k_cache, v_cache, kv.start + 1)
    else:
        # Caches ride the scan CARRY (not xs/ys): every layer's one-token
        # update aliases the buffers in place instead of rebuilding the whole
        # (L, B, S, H, hd) stack each step.
        def body(carry, l):
            x, k_all, v_all = carry
            out, (k_all, v_all) = block_forward(
                layer_view(params["blocks"], l), x, cfg, rope_cos, rope_sin,
                positions, kv=(k_all, v_all), start=kv.start, slots=slots,
                valid_from=valid_from, layer=l, k_limit=k_limit)
            return (out, k_all, v_all), None

        if s == 1 and cfg.decode_unroll:
            # decode: unrolled layer loop with concrete layer indices —
            # scan-iteration carry bookkeeping costs ~20-40 µs/layer here
            carry = (x, kv.k, kv.v)
            for l in range(cfg.num_layers):
                carry, _ = body(carry, l)
            x, k_new, v_new = carry
        else:
            (x, k_new, v_new), _ = lax.scan(
                body, (x, kv.k, kv.v), jnp.arange(cfg.num_layers))
        new_kv = KVSlice(k_new, v_new, kv.start + s)

    if last_only:
        x = x[:, -1:, :]
    if greedy_head:
        from .quant import QuantizedTensor

        lm = params["lm_head"]
        from ..kernels.lmhead import lmhead_greedy_ok

        if (isinstance(lm, QuantizedTensor) and lm.q.ndim == 2
                and cfg.tp_axis is None
                and lmhead_greedy_ok(x.shape[0], lm.q.shape[0],
                                     lm.q.shape[1], x.dtype.itemsize)):
            from ..kernels.lmhead import lmhead_greedy

            tok = lmhead_greedy(x[:, -1, :], params["norm"], lm.q, lm.s,
                                eps=cfg.norm_eps)
            return tok, new_kv
        logits = lm_logits(x, params, cfg)
        return jnp.argmax(logits[:, -1].astype(jnp.float32), -1).astype(
            jnp.int32), new_kv
    logits = lm_logits(x, params, cfg)
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
