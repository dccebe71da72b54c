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
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


@dataclass(frozen=True)
class FlashConfig:
    """Tile sizes (ref FlashAttentionConfig ch06/flash_attention.py:6-11,
    MXU-aligned; sizes clamp down to divisors of the sequence lengths).

    block_q=1024 (round 5): the round-2 tile study picked 512, but the
    round-4 mask-free interior path changed the economics — wider q
    tiles amortize the per-block softmax chain over 2× the MXU work.
    Measured (B=4, 32q/8kv, causal): S=8192 21.4 → 19.7 ms, S=4096
    6.5 → 5.6, S=2048 1.8 → 1.0. bq=2048 collapses (45 TF — VMEM
    thrash; negative result). The grouped-row cap in flash_attention
    keeps g·bq ≤ 4096 rows so small-group configs don't blow VMEM."""

    block_q: int = 1024
    block_k: int = 1024


def _flash_kernel_v3(qoff_ref, vfrom_ref, q_ref, k_ref, v_ref, o_ref,
                     m_scr, l_scr, acc_scr, *, block_q, block_k,
                     scale, causal, kv_len, sk, group, has_vfrom,
                     use_exp2=False):
    """Round-4 rewrite of the flash body: INTERIOR blocks (fully live —
    causally below the diagonal, inside the kv_len prefix, past every
    request's valid_from) take a MASK-FREE fast path: no iotas, no
    compares, no where. At bq=512/bk=1024 the r2 mask machinery was ~5
    full VPU passes over the (g·bq, bk) tile sitting serially between the
    two MXU dots of every block; measured 2.1× at S=512 and flash now
    beats XLA dense at every S >= 512 (docs/PERF.md round-4 flash
    section). Masked blocks keep the r2 monolithic body.
    """
    bb = pl.program_id(0)
    i = pl.program_id(2)       # q block
    kk = pl.program_id(3)      # kv block (sequential)
    rows = group * block_q
    d = q_ref.shape[-1]

    @pl.when(kk == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q_start = qoff_ref[bb] + i * block_q
    k_start = kk * block_k
    # causal skip: block is live iff its first kv position <= last q position
    live = (k_start <= q_start + block_q - 1) if causal else True

    def update(s):
        """One online-softmax step on full-width s (g·bq, bk).

        use_exp2 (FLASH_EXP2=1 experiment): the caller folds log2(e)
        into `scale`, so the whole softmax chain runs in base 2 —
        exp2 is the VPU's native transcendental (exp costs an extra
        multiply per element inside the chain). Denominator and output
        are unchanged (p/l consistent in either base)."""
        ex = jnp.exp2 if use_exp2 else jnp.exp
        m_prev = m_scr[:, :1]                        # (g·bq, 1)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = ex(m_prev - m_new)
        p = ex(s - m_new)                            # (g·bq, bk)
        l_scr[:, :1] = l_scr[:, :1] * alpha + jnp.sum(p, -1, keepdims=True)
        m_scr[:, :1] = m_new
        v = v_ref[0, 0]
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def fast_body():
        # whole GQA group per step: (g, bq, D) → (g·bq, D) rows share the
        # one KV block. MXU inputs stay in the MODEL dtype (bf16 serving →
        # full MXU rate; f32 models keep exact math), f32 accumulate.
        q = q_ref[0, 0].reshape(rows, d)
        s = jax.lax.dot_general(
            q, k_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (g·bq, bk)
        update(s)

    # which mask terms can apply AT ALL is static; a block needing none of
    # them takes the fast path
    tail_possible = kv_len < sk
    if not causal and not tail_possible and not has_vfrom:
        fast_body()
        return

    terms = []
    if causal:
        terms.append(k_start + block_k - 1 <= q_start)   # fully below diag
    if tail_possible:
        terms.append(k_start + block_k <= kv_len)
    if has_vfrom:
        terms.append(vfrom_ref[bb] <= k_start)
    fast = functools.reduce(jnp.logical_and, terms)
    if causal:
        fast = jnp.logical_and(fast, live)

    @pl.when(fast)
    def _():
        fast_body()

    @pl.when(jnp.logical_and(live, jnp.logical_not(fast))
             if causal else jnp.logical_not(fast))
    def _():
        # masked (diagonal / tail / vfrom-clipped) blocks: the r2 body —
        # single full-width dot + mask. (A sub-tiled variant that skipped
        # the MXU on causally-dead bk/nsub slices measured NET SLOWER at
        # S=4096: with bq=512 < bk=1024 most masked blocks have no fully
        # dead sub-tile, and the s-scratch round-trip + per-sub-tile
        # bookkeeping cost more than the saved MXU time. The fast path
        # above is where the round-4 win lives.)
        q = q_ref[0, 0].reshape(rows, d)
        s = jax.lax.dot_general(
            q, k_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        kpos = k_start + jax.lax.broadcasted_iota(
            jnp.int32, (rows, block_k), 1)
        mask = None
        if tail_possible:
            mask = kpos < kv_len
        if has_vfrom:
            vm = kpos >= vfrom_ref[bb]
            mask = vm if mask is None else mask & vm
        if causal:
            # row r of s is query position (r mod bq); positions are
            # f32-exact for any realistic context (< 2^24)
            qpos = q_start + jax.lax.rem(
                jax.lax.broadcasted_iota(jnp.int32, (rows, block_k), 0),
                block_q)
            cm = kpos <= qpos
            mask = cm if mask is None else mask & cm
        update(jnp.where(mask, s, _NEG_INF))


def _flash_kernel_v4p(qoff_ref, vfrom_ref, q_ref, k_ref, v_ref, o_ref,
                      m_scr, l_scr, acc_scr, s0_scr, s1_scr, *, block_q,
                      block_k, scale, causal, kv_len, sk, group, has_vfrom):
    """Software-PIPELINED flash body (round 4): the VPU softmax of every
    KV block sits serially between its two MXU dots in the v3 schedule,
    capping the kernel at ~52% of peak MXU. Here grid step kk PRODUCES
    s = Q·K^T for block kk into a ping-pong buffer (MXU) and then CONSUMES
    block kk-1's s from the other buffer (softmax VPU + PV dot) — the
    producer dot has no data dependence on the consumer, so the MXU's
    matmul latency overlaps the previous block's softmax. One extra grid
    step on the KV dimension drains the last block.

    s is staged RAW (pre-scale, pre-mask); the consumer applies
    scale/mask — it knows its own block index. Stats/accum math is
    identical to v3, so outputs match bit-for-bit per block.
    """
    bb = pl.program_id(0)
    i = pl.program_id(2)
    kk = pl.program_id(3)               # 0 .. nk (nk+1 steps)
    nk = pl.num_programs(3) - 1
    rows = group * block_q
    d = q_ref.shape[-1]

    @pl.when(kk == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q_start = qoff_ref[bb] + i * block_q
    tail_possible = kv_len < sk

    def consume(cons_buf):
        """softmax + PV for block kk-1 (staged in cons_buf)."""
        c_start = (kk - 1) * block_k
        s = cons_buf[...] * scale
        terms = []
        if causal:
            terms.append(c_start + block_k - 1 <= q_start)
        if tail_possible:
            terms.append(c_start + block_k <= kv_len)
        if has_vfrom:
            terms.append(vfrom_ref[bb] <= c_start)
        if terms:
            # masked path: one fused where; fast blocks skip it via the
            # outer pl.when split below being too coarse to matter here —
            # the producer/consumer overlap is the win in this variant, so
            # the mask is applied unconditionally (measured within noise
            # of a branched version at S>=2048)
            kpos = c_start + jax.lax.broadcasted_iota(
                jnp.int32, (rows, block_k), 1)
            mask = None
            if tail_possible:
                mask = kpos < kv_len
            if has_vfrom:
                vm = kpos >= vfrom_ref[bb]
                mask = vm if mask is None else mask & vm
            if causal:
                qpos = q_start + jax.lax.rem(
                    jax.lax.broadcasted_iota(jnp.int32, (rows, block_k), 0),
                    block_q)
                cm = kpos <= qpos
                mask = cm if mask is None else mask & cm
            fast = functools.reduce(jnp.logical_and, terms)
            s = jnp.where(jnp.logical_or(fast, mask), s, _NEG_INF)
        m_prev = m_scr[:, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_scr[:, :1] = l_scr[:, :1] * alpha + jnp.sum(p, -1, keepdims=True)
        m_scr[:, :1] = m_new
        v = v_ref[0, 0]                  # index map already points at kk-1
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    p_start = kk * block_k
    produce_live = kk < nk
    if causal:
        produce_live = jnp.logical_and(
            produce_live, p_start <= q_start + block_q - 1)
    consume_live = kk >= 1
    if causal:
        consume_live = jnp.logical_and(
            consume_live, (kk - 1) * block_k <= q_start + block_q - 1)

    for par in (0, 1):
        prod_buf = (s0_scr, s1_scr)[par]
        cons_buf = (s0_scr, s1_scr)[1 - par]

        @pl.when(kk % 2 == par)
        def _(prod_buf=prod_buf, cons_buf=cons_buf):
            # producer FIRST in program order: its MXU dot is independent
            # of the consumer's VPU chain, so it fills the MXU while the
            # softmax runs
            @pl.when(produce_live)
            def _():
                q = q_ref[0, 0].reshape(rows, d)
                prod_buf[...] = jax.lax.dot_general(
                    q, k_ref[0, 0], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)

            @pl.when(consume_live)
            def _():
                consume(cons_buf)


def _flash_finalize(l_scr, acc_scr, o_ref):
    l = l_scr[:, :1]
    safe_l = jnp.where(l > 0, l, 1.0)  # fully-masked rows → 0 output
    o_ref[0, 0] = (acc_scr[:] / safe_l).reshape(
        o_ref.shape[2], o_ref.shape[3], o_ref.shape[4]).astype(
            o_ref.dtype)


def _flash_kernel(qoff_ref, vfrom_ref, q_ref, k_ref, v_ref, o_ref,
                  m_scr, l_scr, acc_scr, **kw):
    _flash_kernel_v3(qoff_ref, vfrom_ref, q_ref, k_ref, v_ref, o_ref,
                     m_scr, l_scr, acc_scr, **kw)

    @pl.when(pl.program_id(3) == pl.num_programs(3) - 1)
    def _():
        _flash_finalize(l_scr, acc_scr, o_ref)


def _flash_kernel_pipe(qoff_ref, vfrom_ref, q_ref, k_ref, v_ref, o_ref,
                       m_scr, l_scr, acc_scr, s0_scr, s1_scr, **kw):
    _flash_kernel_v4p(qoff_ref, vfrom_ref, q_ref, k_ref, v_ref, o_ref,
                      m_scr, l_scr, acc_scr, s0_scr, s1_scr, **kw)

    @pl.when(pl.program_id(3) == pl.num_programs(3) - 1)
    def _():
        _flash_finalize(l_scr, acc_scr, o_ref)


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

    # cap grouped rows at 4096: s/p are (g·bq, bk) f32 in VMEM (16 MB at
    # the cap). FLASH_BQ overrides the q-tile for sweep experiments.
    bq_target = int(os.environ.get("FLASH_BQ", "0")) or \
        min(config.block_q, max(128, 4096 // group))
    bq = fit(bq_target, sq)
    bk = fit(config.block_k, sk)
    if not interpret and ((bq % 8 and bq != sq) or (bk % 8 and bk != sk)):
        # Mosaic requires sublane-divisible (8) block dims; an oddly-sized
        # sequence (e.g. a 1036-slot cache) can force `fit` onto a
        # non-8-multiple tile. Fall back to XLA dense with the same mask
        # semantics rather than fail to compile (caught by the round-5
        # verify drive on a 600-token prompt).
        from ..ops.gqa import grouped_sdpa

        qoff_ = jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (b,))
        iq = qoff_[:, None] + jnp.arange(sq)[None, :]        # (B, Sq)
        ik = jnp.arange(sk)
        mask = ik[None, None, :] <= iq[:, :, None] if causal else \
            jnp.ones((b, sq, sk), bool)
        if kv_len is not None:
            mask = mask & (ik[None, None, :] < kv_len)
        if valid_from is not None:
            mask = mask & (ik[None, None, :]
                           >= jnp.asarray(valid_from)[:, None, None])
        return grouped_sdpa(q, k, v, mask=mask[:, None, None])
    scale = 1.0 / math.sqrt(d)
    kv_len = sk if kv_len is None else kv_len
    qoff = jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (b,))
    vfrom = (jnp.zeros((b,), jnp.int32) if valid_from is None
             else jnp.asarray(valid_from, jnp.int32))

    # queries regrouped (B, Hkv, g, Sq, D): one grid step = one GQA group ×
    # one q block × one KV block
    qg = q.reshape(b, hkv, group, sq, d)

    # software-pipelined schedule (producer/consumer ping-pong — see
    # _flash_kernel_v4p): one extra drain step on the KV grid dim; K feeds
    # the producer (block kk), V the consumer (block kk-1). OFF by
    # default: measured SLOWER than the v3 body at every S (e.g. 21.4 →
    # 23.2 ms at S=8192, docs/PERF.md round-4 flash section) — Mosaic
    # schedules the producer dot and the consumer softmax sequentially
    # (no MXU/VPU overlap materializes) and the staged-s VMEM round-trip
    # is pure added cost. Kept behind FLASH_PIPE=1 as the committed
    # experiment for the %-of-MXU bar writeup. Read at trace time — flip
    # in a fresh process like the FUSED_* knobs.
    pipeline = (sk // bk >= 2 and os.environ.get("FLASH_PIPE") == "1")
    # base-2 softmax, DEFAULT ON (round 5): log2(e) folds into the QK
    # scale and exp2 replaces exp — the VPU's native transcendental (exp
    # spends an extra multiply per element in the chain). Measured ~+2%
    # at S>=4096 on top of the bq=1024 win; FLASH_EXP2=0 opts back into
    # natural-base exp.
    use_exp2 = os.environ.get("FLASH_EXP2", "1") != "0" and not pipeline
    nk = sk // bk
    if pipeline:
        kernel = functools.partial(_flash_kernel_pipe, block_q=bq,
                                   block_k=bk, scale=scale, causal=causal,
                                   kv_len=kv_len, sk=sk, group=group,
                                   has_vfrom=valid_from is not None)
        grid = (b, hkv, sq // bq, nk + 1)
    else:
        kernel = functools.partial(_flash_kernel, block_q=bq, block_k=bk,
                                   scale=scale * (1.4426950408889634
                                                  if use_exp2 else 1.0),
                                   causal=causal,
                                   kv_len=kv_len, sk=sk, group=group,
                                   has_vfrom=valid_from is not None,
                                   use_exp2=use_exp2)
        grid = (b, hkv, sq // bq, nk)

    def clamp_live(bb, i, kk, qoff):
        kk = jnp.minimum(kk, nk - 1)
        if causal:
            last_live = jax.lax.div(qoff[bb] + (i + 1) * bq - 1, bk)
            kk = jnp.minimum(kk, last_live)
        return kk

    def k_index(bb, h, i, kk, qoff, vfrom):
        return (bb, h, clamp_live(bb, i, kk, qoff), 0)

    def v_index(bb, h, i, kk, qoff, vfrom):
        kv = jnp.maximum(kk - 1, 0) if pipeline else kk
        return (bb, h, clamp_live(bb, i, kv, qoff), 0)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, group, bq, d),
                             lambda bb, h, i, kk, qoff, vfrom:
                             (bb, h, 0, i, 0)),
                pl.BlockSpec((1, 1, bk, d), k_index),
                pl.BlockSpec((1, 1, bk, d), v_index),
            ],
            out_specs=pl.BlockSpec((1, 1, group, bq, d),
                                   lambda bb, h, i, kk, qoff, vfrom:
                                   (bb, h, 0, i, 0)),
            scratch_shapes=[
                pltpu.VMEM((group * bq, 128), jnp.float32),
                pltpu.VMEM((group * bq, 128), jnp.float32),
                pltpu.VMEM((group * bq, d), jnp.float32),
                *([pltpu.VMEM((group * bq, bk), jnp.float32),
                   pltpu.VMEM((group * bq, bk), jnp.float32)]
                  if pipeline else []),
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
