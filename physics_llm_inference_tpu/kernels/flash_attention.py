"""Flash attention Pallas kernel (causal, GQA, per-request offsets).

Lowers the reference's pure-Python tiled loop (ch06/flash_attention.py:14-74,
online-softmax math ch06/online_softmax.py:28-53) into a single TPU kernel,
adding what the reference lacks (SURVEY.md §2.6): causal masking, GQA head
sharing (Hq queries read Hkv cached heads without expansion), per-request
query offsets (rectangular attention for chunked prefill and cached decode),
and per-request valid-from masking (left-padded ragged batches).

Structure: grid (B, Hkv, Sq/bq, Sk/bk) — one grid step processes the WHOLE
GQA group (g·bq query rows) against one KV block, so each KV DMA feeds g×
the MXU work and the grid is g× shorter than a per-Hq layout. The KV-block
dimension is innermost and sequential — per-row max m, normalizer l, and
output accumulator acc live in VMEM scratch across KV steps (the
reference's inner loop :49-68), with the rescale-on-new-max recurrence;
finalize divides by l on the last KV block. Causally-dead KV blocks clamp
their index map to the last live block — consecutive equal indices make the
Pallas pipeline skip the DMA — and the body predicates them off.

Numerics: softmax statistics are fp32; QK^T and PV take bf16 MXU inputs
with fp32 accumulate — f32 MXU inputs run at half the bf16 rate on v5e,
which is exactly the prefill-compute bar this kernel must clear.
"""
from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


@dataclass(frozen=True)
class FlashConfig:
    """Tile sizes (ref FlashAttentionConfig ch06/flash_attention.py:6-11,
    MXU-aligned; sizes clamp down to divisors of the sequence lengths)."""

    block_q: int = 512
    block_k: int = 1024


def _flash_kernel(qoff_ref, vfrom_ref, q_ref, k_ref, v_ref, o_ref,
                  m_scr, l_scr, acc_scr, *, block_q, block_k, scale, causal,
                  kv_len, group):
    bb = pl.program_id(0)
    i = pl.program_id(2)       # q block
    kk = pl.program_id(3)      # kv block (sequential)
    rows = group * block_q

    @pl.when(kk == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q_start = qoff_ref[bb] + i * block_q
    k_start = kk * block_k
    # causal skip: block is live iff its first kv position <= last q position
    live = (k_start <= q_start + block_q - 1) if causal else True

    @pl.when(live)
    def _():
        # whole GQA group per step: (g, bq, D) → (g·bq, D) rows share the
        # one KV block. MXU inputs stay in the MODEL dtype (bf16 serving →
        # full MXU rate; f32 models keep exact math), f32 accumulate.
        q = q_ref[0, 0].reshape(rows, q_ref.shape[-1])
        k = k_ref[0, 0]                                  # (bk, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (g·bq, bk)
        # row r of s is query position (r mod bq); positions are f32-exact
        # for any realistic context (< 2^24)
        qpos = q_start + jax.lax.rem(
            jax.lax.broadcasted_iota(jnp.int32, (rows, block_k), 0),
            block_q)
        kpos = k_start + jax.lax.broadcasted_iota(
            jnp.int32, (rows, block_k), 1)
        mask = (kpos < kv_len) & (kpos >= vfrom_ref[bb])
        if causal:
            mask = mask & (kpos <= qpos)
        s = jnp.where(mask, s, _NEG_INF)

        m_prev = m_scr[:, :1]                        # (g·bq, 1)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)                       # (g·bq, bk)
        l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0, 0]
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[:, :1] = m_new
        l_scr[:, :1] = l_new

    @pl.when(kk == pl.num_programs(3) - 1)
    def _():
        l = l_scr[:, :1]
        safe_l = jnp.where(l > 0, l, 1.0)  # fully-masked rows → 0 output
        o_ref[0, 0] = (acc_scr[:] / safe_l).reshape(
            o_ref.shape[2], o_ref.shape[3], o_ref.shape[4]).astype(
                o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "config", "interpret",
                                             "kv_len"))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    q_offset: jnp.ndarray | int = 0,
                    causal: bool = True,
                    kv_len: int | None = None,
                    valid_from: jnp.ndarray | None = None,
                    config: FlashConfig = FlashConfig(),
                    interpret: bool | None = None) -> jnp.ndarray:
    """Flash attention over (B, Hq, Sq, D) queries and (B, Hkv, Sk, D) KV.

    q_offset: global position of q[:, :, 0] relative to the KV sequence —
    scalar or per-request (B,) (rectangular causal attention for chunked
    prefill / decode over per-slot lengths, ref ch02/kv_cache.py:91-94
    semantics). valid_from: per-request (B,) first valid KV slot (left-pad
    masking). kv_len: static valid KV prefix (<= Sk) for padded caches.
    Returns (B, Hq, Sq, D) in q.dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, hq, sq, d = q.shape
    _, hkv, sk, _ = k.shape
    assert hq % hkv == 0
    group = hq // hkv

    def fit(block, seq):
        # largest divisor of seq <= block: prefer big tiles, never fail on
        # oddly-bucketed lengths
        block = min(block, seq)
        while seq % block:
            block = max(1, block - (1 if block <= 128 else 128))
        return block

    # cap grouped rows: s/p are (g·bq, bk) f32 in VMEM — keep them ~8 MB
    bq = fit(min(config.block_q, max(128, 2048 // group)), sq)
    bk = fit(config.block_k, sk)
    scale = 1.0 / math.sqrt(d)
    kv_len = sk if kv_len is None else kv_len
    qoff = jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (b,))
    vfrom = (jnp.zeros((b,), jnp.int32) if valid_from is None
             else jnp.asarray(valid_from, jnp.int32))

    # queries regrouped (B, Hkv, g, Sq, D): one grid step = one GQA group ×
    # one q block × one KV block
    qg = q.reshape(b, hkv, group, sq, d)

    kernel = functools.partial(_flash_kernel, block_q=bq, block_k=bk,
                               scale=scale, causal=causal, kv_len=kv_len,
                               group=group)
    grid = (b, hkv, sq // bq, sk // bk)

    def kv_index(bb, h, i, kk, qoff, vfrom):
        if causal:
            last_live = jax.lax.div(qoff[bb] + (i + 1) * bq - 1, bk)
            kk = jnp.minimum(kk, last_live)
        return (bb, h, kk, 0)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, group, bq, d),
                             lambda bb, h, i, kk, qoff, vfrom:
                             (bb, h, 0, i, 0)),
                pl.BlockSpec((1, 1, bk, d), kv_index),
                pl.BlockSpec((1, 1, bk, d), kv_index),
            ],
            out_specs=pl.BlockSpec((1, 1, group, bq, d),
                                   lambda bb, h, i, kk, qoff, vfrom:
                                   (bb, h, 0, i, 0)),
            scratch_shapes=[
                pltpu.VMEM((group * bq, 128), jnp.float32),
                pltpu.VMEM((group * bq, 128), jnp.float32),
                pltpu.VMEM((group * bq, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, group, sq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * sq * sk * d,
            bytes_accessed=q.nbytes + k.nbytes + v.nbytes + q.nbytes,
            transcendentals=b * hq * sq * sk),
        interpret=interpret,
    )(qoff, vfrom, qg, k, v)
    return out.reshape(b, hq, sq, d)
