"""Paged decode attention: flash attention over block-table-indirect KV.

The kernel that marries ch06 (flash attention) to ch07 (paged KV): each
request's KV lives in scattered fixed-size blocks of a global pool
(runtime/paged_kv.py manages the tables; ref ch07/paged_memory.py) and the
kernel gathers them *by table lookup in the BlockSpec index_map* — the
scalar-prefetched block table drives the DMA engine directly, so indirection
costs no extra pass (SURVEY.md §7 flagged this as the hard part; same design
as TPU ragged paged attention, PAPERS.md).

Decode-specialized: one query per request (Sq=1), all Hq heads processed in
a single grid step per KV block; per-request context lengths mask the tail
and clamp dead blocks' indices so their DMA is elided.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _paged_kernel(lref, tables_ref, lens_ref, q_ref, k_ref, v_ref, o_ref,
                  m_scr, l_scr, acc_scr, *, block_size, scale, num_kv_heads,
                  group, stacked):
    b = pl.program_id(0)
    j = pl.program_id(1)  # kv block index within the request (sequential)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    ctx = lens_ref[b]
    live = j * block_size < ctx

    @pl.when(live)
    def _():
        hq = q_ref.shape[1]
        d = q_ref.shape[2]
        q = q_ref[0].astype(jnp.float32)                    # (Hq, d)
        k = (k_ref[0, 0] if stacked else k_ref[0]).astype(jnp.float32)
        v = (v_ref[0, 0] if stacked else v_ref[0]).astype(jnp.float32)
        qg = q.reshape(num_kv_heads, group, d)
        kt = k.transpose(1, 0, 2)                           # (Hkv, bs, d)
        vt = v.transpose(1, 0, 2)
        s = jax.lax.dot_general(
            qg, kt, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale     # (Hkv, g, bs)
        s = s.reshape(hq, -1)                               # (Hq, bs)
        kpos = j * block_size + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        s = jnp.where(kpos < ctx, s, _NEG_INF)

        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)                              # (Hq, bs)
        l_scr[:, :1] = l_scr[:, :1] * alpha + jnp.sum(p, -1, keepdims=True)
        pv = jax.lax.dot_general(
            p.reshape(num_kv_heads, group, -1), vt,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)             # (Hkv, g, d)
        acc_scr[:] = acc_scr[:] * alpha + pv.reshape(hq, d)
        m_scr[:, :1] = m_new

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        l = l_scr[:, :1]
        safe_l = jnp.where(l > 0, l, 1.0)
        o_ref[0] = (acc_scr[:] / safe_l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_decode_attention(q: jnp.ndarray, k_pool: jnp.ndarray,
                           v_pool: jnp.ndarray, block_tables: jnp.ndarray,
                           context_lens: jnp.ndarray,
                           layer: jnp.ndarray | None = None,
                           interpret: bool | None = None) -> jnp.ndarray:
    """One decode step of attention over paged KV.

    q: (B, Hq, d) — this step's query per request.
    k_pool/v_pool: (num_blocks, block_size, Hkv, d) — the global block pool;
      or the FULL layer stack (L, num_blocks, block_size, Hkv, d) with
      `layer` given (lets the model's layer scan keep the pools in its carry
      and index them here, instead of slicing a per-layer copy).
    block_tables: (B, max_blocks) int32 physical block ids per request
      (entries beyond the request's length are ignored).
    context_lens: (B,) int32 — tokens valid per request (incl. current).
    Returns (B, Hq, d).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, hq, d = q.shape
    stacked = k_pool.ndim == 5
    if stacked:
        assert layer is not None, "stacked pools need a layer index"
        _, nb, bs, hkv, _ = k_pool.shape
    else:
        nb, bs, hkv, _ = k_pool.shape
    assert hq % hkv == 0
    group = hq // hkv
    max_blocks = block_tables.shape[1]
    scale = 1.0 / math.sqrt(d)
    lidx = jnp.asarray(layer if layer is not None else 0,
                       jnp.int32).reshape(1)

    kernel = functools.partial(_paged_kernel, block_size=bs, scale=scale,
                               num_kv_heads=hkv, group=group, stacked=stacked)

    if stacked:
        def kv_index(bb, j, lref, tables, lens):
            last = jnp.maximum((lens[bb] - 1) // bs, 0)
            jj = jnp.minimum(j, last)
            return (lref[0], tables[bb, jj], 0, 0, 0)
        kv_block = (1, 1, bs, hkv, d)
    else:
        def kv_index(bb, j, lref, tables, lens):
            # clamp dead blocks to the request's last live block → DMA elided
            last = jnp.maximum((lens[bb] - 1) // bs, 0)
            jj = jnp.minimum(j, last)
            return (tables[bb, jj], 0, 0, 0)
        kv_block = (1, bs, hkv, d)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, max_blocks),
            in_specs=[
                pl.BlockSpec((1, hq, d), lambda bb, j, lref, tables, lens:
                             (bb, 0, 0)),
                pl.BlockSpec(kv_block, kv_index),
                pl.BlockSpec(kv_block, kv_index),
            ],
            out_specs=pl.BlockSpec((1, hq, d),
                                   lambda bb, j, lref, tables, lens:
                                   (bb, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((hq, 128), jnp.float32),
                pltpu.VMEM((hq, 128), jnp.float32),
                pltpu.VMEM((hq, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * max_blocks * bs * d,
            bytes_accessed=(k_pool.nbytes + v_pool.nbytes)
            // ((k_pool.shape[0] if stacked else 1) * max(1, nb // max_blocks)),
            transcendentals=b * hq * max_blocks * bs),
        interpret=interpret,
    )(lidx, block_tables.astype(jnp.int32), context_lens.astype(jnp.int32),
      q, k_pool, v_pool)


def _int8_paged_kernel(lref, tables_ref, lens_ref, q_ref, kv_ref, kvs_ref,
                       o_ref, m_scr, l_scr, acc_scr, *,
                       block_size, scale, num_kv_heads, group, d):
    b = pl.program_id(0)
    j = pl.program_id(1)
    hq = num_kv_heads * group

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    ctx = lens_ref[b]
    live = j * block_size < ctx

    @pl.when(live)
    def _():
        q = q_ref[0].astype(jnp.float32)     # (Hq, d)
        kq = kv_ref[0, 0, 0]                 # (bs, Hkv·d) int8 — flat layout
        vq = kv_ref[0, 0, 1]
        ks = kvs_ref[0, 0, 0]                # (Hkv, bs) f32 — transposed
        vs = kvs_ref[0, 0, 1]

        s_parts = []
        for h in range(num_kv_heads):
            kh = kq[:, h * d:(h + 1) * d].astype(jnp.bfloat16)
            qh = q[h * group:(h + 1) * group].astype(jnp.bfloat16)
            sh = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)         # (g, bs)
            s_parts.append(sh * (ks[h][None, :] * scale))
        s = jnp.concatenate(s_parts, axis=0)                # (Hq, bs)
        kpos = j * block_size + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        s = jnp.where(kpos < ctx, s, _NEG_INF)

        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)                              # (Hq, bs)
        l_scr[:, :1] = l_scr[:, :1] * alpha + jnp.sum(p, -1, keepdims=True)
        pv_parts = []
        for h in range(num_kv_heads):
            vh = vq[:, h * d:(h + 1) * d].astype(jnp.bfloat16)
            ph = (p[h * group:(h + 1) * group]
                  * vs[h][None, :]).astype(jnp.bfloat16)
            pv_parts.append(jax.lax.dot_general(
                ph, vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))        # (g, d)
        acc_scr[:] = acc_scr[:] * alpha + jnp.concatenate(pv_parts, axis=0)
        m_scr[:, :1] = m_new

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        l = l_scr[:, :1]
        safe_l = jnp.where(l > 0, l, 1.0)
        o_ref[0] = (acc_scr[:] / safe_l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def int8_paged_decode_attention(q: jnp.ndarray, kv_pool: jnp.ndarray,
                                kvs_pool: jnp.ndarray,
                                block_tables: jnp.ndarray,
                                context_lens: jnp.ndarray,
                                layer: jnp.ndarray | None = None,
                                interpret: bool | None = None) -> jnp.ndarray:
    """Paged decode attention over INT8 pools with in-kernel dequant.

    Same indirection design as paged_decode_attention, in the MERGED
    QuantKV paged layouts (round 5): kv_pool (L, num_blocks, 2, bs,
    Hkv·d) int8 FLAT with each block's K page (dim-2 index 0) and V page
    (index 1) co-located, kvs_pool (L, num_blocks, 2, Hkv, bs) f32
    TRANSPOSED (see models/transformer.py QuantKV + the fused paged
    kernel's descriptor-count rationale). Scales are applied to
    score/probability rows, so pool bytes ride to the MXU as bare
    int8→bf16 casts — the cache crosses HBM at 1 byte/element (the
    SURVEY §2.6 INT8-KV fusion, paged).
    q: (B, Hq, d); returns (B, Hq, d)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, hq, d = q.shape
    if kv_pool.ndim == 4:  # unstacked → stacked L=1
        kv_pool, kvs_pool = kv_pool[None], kvs_pool[None]
        layer = jnp.int32(0)
    assert layer is not None
    L, nb, _two, bs, flat_hd = kv_pool.shape
    assert _two == 2
    hkv = kvs_pool.shape[-2]
    assert flat_hd == hkv * d
    assert hq % hkv == 0
    group = hq // hkv
    max_blocks = block_tables.shape[1]
    scale = 1.0 / math.sqrt(d)
    lidx = jnp.asarray(layer, jnp.int32).reshape(1)

    if not interpret and d % 128 != 0:
        # per-head lane slices need 128-aligned offsets on TPU: dequantize
        # this layer's pool and run the bf16 paged kernel instead
        def dq(which):
            pl_q = jax.lax.dynamic_index_in_dim(kv_pool, layer, 0,
                                                keepdims=False)[:, which]
            pl_s = jax.lax.dynamic_index_in_dim(kvs_pool, layer, 0,
                                                keepdims=False)[:, which]
            vals = pl_q.reshape(nb, bs, hkv, d).astype(jnp.float32)
            return (vals * pl_s.transpose(0, 2, 1)[..., None]).astype(q.dtype)

        return paged_decode_attention(q, dq(0), dq(1), block_tables,
                                      context_lens)

    kernel = functools.partial(_int8_paged_kernel, block_size=bs, scale=scale,
                               num_kv_heads=hkv, group=group, d=d)

    def kv_index(bb, j, lref, tables, lens):
        last = jnp.maximum((lens[bb] - 1) // bs, 0)
        jj = jnp.minimum(j, last)
        return (lref[0], tables[bb, jj], 0, 0, 0)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, max_blocks),
            in_specs=[
                pl.BlockSpec((1, hq, d), lambda bb, j, lref, tables, lens:
                             (bb, 0, 0)),
                pl.BlockSpec((1, 1, 2, bs, flat_hd), kv_index),
                pl.BlockSpec((1, 1, 2, hkv, bs), kv_index),
            ],
            out_specs=pl.BlockSpec((1, hq, d),
                                   lambda bb, j, lref, tables, lens:
                                   (bb, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((hq, 128), jnp.float32),
                pltpu.VMEM((hq, 128), jnp.float32),
                pltpu.VMEM((hq, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * max_blocks * bs * d,
            bytes_accessed=2 * b * max_blocks * bs * flat_hd,
            transcendentals=b * hq * max_blocks * bs),
        interpret=interpret,
    )(lidx, block_tables.astype(jnp.int32), context_lens.astype(jnp.int32),
      q, kv_pool, kvs_pool)


def paged_write(k_pool, v_pool, k_new, v_new, block_ids, offsets):
    """Scatter this step's K/V into the pool.

    k_new/v_new: (B, Hkv, d); block_ids/offsets: (B,) — position of each
    request's current token (block_table[len // bs], len % bs).
    """
    k_pool = k_pool.at[block_ids, offsets].set(k_new.astype(k_pool.dtype))
    v_pool = v_pool.at[block_ids, offsets].set(v_new.astype(v_pool.dtype))
    return k_pool, v_pool


def paged_write_prefill(k_pool, v_pool, k_seq, v_seq, table, length):
    """Scatter a prefilled sequence into the pool.

    k_seq/v_seq: (S, Hkv, d) for one request; table: (max_blocks,) int32;
    length: python int — tokens actually valid (<= S).
    """
    bs = k_pool.shape[1]
    nb = k_pool.shape[0]
    pos = jnp.arange(k_seq.shape[0])
    block_ids = table[pos // bs]
    offsets = pos % bs
    # padding tail (pos >= length) must not clobber other requests' blocks:
    # route it out of bounds and drop the scatter
    block_ids = jnp.where(pos < length, block_ids, nb)
    k_pool = k_pool.at[block_ids, offsets].set(
        k_seq.astype(k_pool.dtype), mode="drop")
    v_pool = v_pool.at[block_ids, offsets].set(
        v_seq.astype(v_pool.dtype), mode="drop")
    return k_pool, v_pool
