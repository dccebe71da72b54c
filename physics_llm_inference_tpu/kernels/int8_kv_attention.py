"""Decode attention over INT8 KV with in-kernel dequantization.

The decode hot path for the framework's native format (INT8 KV,
runtime/kv_cache.py QuantKV): one query per request attends over the whole
padded cache. Each int8 tile is dequantized in VMEM on its way to the MXU
(the INT8-KV fusion SURVEY.md §2.6 calls for), so the cache crosses HBM once,
at 1 byte/element, instead of being materialized in bf16 by XLA.

Grid layout: one grid step per KV block, processing the WHOLE batch — the
scores/PV contractions batch over (B·Hkv) on the MXU (a per-request grid
wastes ~B× in step overhead at decode shapes). Masking matches the model's
unified predicate (models/transformer.py): valid_from[b] <= k_slot <=
q_slot[b]; KV blocks beyond max(q_slot) clamp their index map so their DMA
is elided.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _kernel(maxslot_ref, q_ref, qslot_ref, vfrom_ref, kq_ref, ks_ref,
            vq_ref, vs_ref, o_ref, m_scr, l_scr, acc_scr, *, block_size,
            scale, num_kv_heads, group):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    live = j * block_size <= maxslot_ref[0]

    @pl.when(live)
    def _():
        b, hq, d = q_ref.shape
        q = q_ref[:].astype(jnp.float32)                      # (B, Hq, d)
        k = kq_ref[:].astype(jnp.float32) * ks_ref[:]         # (B, bs, Hkv, d)
        v = vq_ref[:].astype(jnp.float32) * vs_ref[:]
        qg = q.reshape(b * num_kv_heads, group, d)
        kt = k.transpose(0, 2, 1, 3).reshape(b * num_kv_heads, -1, d)
        vt = v.transpose(0, 2, 1, 3).reshape(b * num_kv_heads, -1, d)
        s = jax.lax.dot_general(
            qg, kt, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # (B·Hkv, g, bs)
        kpos = j * block_size + jax.lax.broadcasted_iota(
            jnp.int32, (b, 1, block_size), 2)
        mask = (kpos <= qslot_ref[:].reshape(b, 1, 1)) \
            & (kpos >= vfrom_ref[:].reshape(b, 1, 1))
        mask = jnp.broadcast_to(mask, (b, num_kv_heads * group, block_size))
        mask = mask.reshape(b * num_kv_heads, group, block_size)
        s = jnp.where(mask, s, _NEG_INF)

        s2 = s.reshape(b * hq, -1)
        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s2, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s2 - m_new)
        l_scr[:, :1] = l_scr[:, :1] * alpha + jnp.sum(p, -1, keepdims=True)
        pv = jax.lax.dot_general(
            p.reshape(b * num_kv_heads, group, -1), vt,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (B·Hkv, g, d)
        acc_scr[:] = acc_scr[:] * alpha + pv.reshape(b * hq, d)
        m_scr[:, :1] = m_new

    @pl.when(j == pl.num_programs(0) - 1)
    def _():
        b, hq, d = q_ref.shape
        l = l_scr[:, :1]
        safe_l = jnp.where(l > 0, l, 1.0)
        o_ref[:] = (acc_scr[:] / safe_l).reshape(b, hq, d).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_size", "interpret"))
def int8_kv_decode_attention(q: jnp.ndarray,
                             k_q: jnp.ndarray, k_s: jnp.ndarray,
                             v_q: jnp.ndarray, v_s: jnp.ndarray,
                             q_slot: jnp.ndarray,
                             valid_from: jnp.ndarray | None = None,
                             block_size: int = 128,
                             interpret: bool | None = None) -> jnp.ndarray:
    """q: (B, Hq, d); k_q/v_q: (B, S, Hkv, d) int8; k_s/v_s: (B, S, Hkv, 1)
    f32 scales; q_slot: (B,) current position per request (mask k <= q_slot);
    valid_from: (B,) first valid slot (left padding). Returns (B, Hq, d)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, hq, d = q.shape
    _, s, hkv, _ = k_q.shape
    assert hq % hkv == 0
    group = hq // hkv

    bs = min(block_size, s)
    while s % bs:
        bs = max(1, bs - (1 if bs <= 128 else 128))
    qslot = jnp.asarray(q_slot, jnp.int32).reshape(b, 1)
    vfrom = (jnp.zeros((b, 1), jnp.int32) if valid_from is None
             else jnp.asarray(valid_from, jnp.int32).reshape(b, 1))
    max_slot = jnp.max(qslot).reshape(1)
    scale = 1.0 / math.sqrt(d)

    kernel = functools.partial(_kernel, block_size=bs, scale=scale,
                               num_kv_heads=hkv, group=group)

    def kv_index(j, maxslot):
        last = jnp.maximum(maxslot[0] // bs, 0)
        return (0, jnp.minimum(j, last), 0, 0)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(s // bs,),
            in_specs=[
                pl.BlockSpec((b, hq, d), lambda j, ms: (0, 0, 0)),
                pl.BlockSpec((b, 1), lambda j, ms: (0, 0)),
                pl.BlockSpec((b, 1), lambda j, ms: (0, 0)),
                pl.BlockSpec((b, bs, hkv, d), kv_index),
                pl.BlockSpec((b, bs, hkv, 1), kv_index),
                pl.BlockSpec((b, bs, hkv, d), kv_index),
                pl.BlockSpec((b, bs, hkv, 1), kv_index),
            ],
            out_specs=pl.BlockSpec((b, hq, d), lambda j, ms: (0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((b * hq, 128), jnp.float32),
                pltpu.VMEM((b * hq, 128), jnp.float32),
                pltpu.VMEM((b * hq, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            # whole-batch f32 dequant intermediates exceed the default 16MB
            # scoped-vmem budget; v5e has 128MB VMEM — raise the cap
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * s * d,
            bytes_accessed=k_q.nbytes + v_q.nbytes + k_s.nbytes + v_s.nbytes,
            transcendentals=b * hq * s),
        interpret=interpret,
    )(max_slot, q, qslot, vfrom, k_q, k_s, v_q, v_s)
