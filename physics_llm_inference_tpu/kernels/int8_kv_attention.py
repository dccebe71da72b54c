"""Decode attention over INT8 KV with in-kernel dequantization.

The decode hot path for the framework's native format (INT8 KV,
runtime/kv_cache.py QuantKV): one query per request attends over the whole
padded cache. Without this kernel, XLA materializes a bf16 copy of the cache
every step (dequant + attention as separate HLOs) — tripling KV traffic; here
each int8 tile is dequantized in VMEM on its way to the MXU (the INT8-KV
fusion SURVEY.md §2.6 calls for), so the cache crosses HBM once, at 1
byte/element.

Accepts the cache either per-layer (B, S, Hkv, d) or as the FULL layer stack
(L, B, S, Hkv, d) with a traced `layer` index — the latter lets the model's
layer scan keep the cache in its carry and the kernel's index map address the
layer directly, avoiding a 2×cache-slice copy per layer per step (measured
~1.3 ms/step of copy traffic on the 0.85B bench before this).

Masking matches the model's unified predicate (models/transformer.py):
valid_from[b] <= k_slot <= q_slot[b]; causally-dead blocks clamp their index
map so their DMA is elided.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _kernel(lref, qslot_ref, vfrom_ref, q_ref, kq_ref, ks_ref, vq_ref,
            vs_ref, o_ref, m_scr, l_scr, acc_scr, *, block_size, scale,
            num_kv_heads, group, stacked):
    b = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    qslot = qslot_ref[b]
    vfrom = vfrom_ref[b]
    live = j * block_size <= qslot

    def kv(ref):
        return ref[0, 0] if stacked else ref[0]

    @pl.when(live)
    def _():
        hq = q_ref.shape[1]
        d = q_ref.shape[2]
        q = q_ref[0].astype(jnp.float32)                      # (Hq, d)
        k = kv(kq_ref).astype(jnp.float32) * kv(ks_ref)       # (bs, Hkv, d)
        v = kv(vq_ref).astype(jnp.float32) * kv(vs_ref)
        qg = q.reshape(num_kv_heads, group, d)
        kt = k.transpose(1, 0, 2)                             # (Hkv, bs, d)
        vt = v.transpose(1, 0, 2)
        s = jax.lax.dot_general(
            qg, kt, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale       # (Hkv, g, bs)
        s = s.reshape(hq, -1)
        kpos = j * block_size + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        s = jnp.where((kpos <= qslot) & (kpos >= vfrom), s, _NEG_INF)

        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_scr[:, :1] = l_scr[:, :1] * alpha + jnp.sum(p, -1, keepdims=True)
        pv = jax.lax.dot_general(
            p.reshape(num_kv_heads, group, -1), vt,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        acc_scr[:] = acc_scr[:] * alpha + pv.reshape(hq, d)
        m_scr[:, :1] = m_new

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        l = l_scr[:, :1]
        safe_l = jnp.where(l > 0, l, 1.0)
        o_ref[0] = (acc_scr[:] / safe_l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_size", "interpret"))
def int8_kv_decode_attention(q: jnp.ndarray,
                             k_q: jnp.ndarray, k_s: jnp.ndarray,
                             v_q: jnp.ndarray, v_s: jnp.ndarray,
                             q_slot: jnp.ndarray,
                             valid_from: jnp.ndarray | None = None,
                             layer: jnp.ndarray | None = None,
                             block_size: int = 256,
                             interpret: bool | None = None) -> jnp.ndarray:
    """q: (B, Hq, d); k_q/v_q: (B, S, Hkv, d) int8 — or (L, B, S, Hkv, d)
    with `layer` given; k_s/v_s: matching scales (..., S, Hkv, 1) f32;
    q_slot: (B,) current position per request (mask k <= q_slot);
    valid_from: (B,) first valid slot (left padding). Returns (B, Hq, d)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, hq, d = q.shape
    stacked = k_q.ndim == 5
    if stacked:
        assert layer is not None, "stacked caches need a layer index"
        _, _, s, hkv, _ = k_q.shape
    else:
        _, s, hkv, _ = k_q.shape
    assert hq % hkv == 0
    group = hq // hkv

    bs = min(block_size, s)
    while s % bs:
        bs = max(1, bs - (1 if bs <= 128 else 128))
    qslot = jnp.asarray(q_slot, jnp.int32).reshape(b)
    vfrom = (jnp.zeros((b,), jnp.int32) if valid_from is None
             else jnp.asarray(valid_from, jnp.int32).reshape(b))
    lidx = jnp.asarray(layer if layer is not None else 0,
                       jnp.int32).reshape(1)
    scale = 1.0 / math.sqrt(d)

    kernel = functools.partial(_kernel, block_size=bs, scale=scale,
                               num_kv_heads=hkv, group=group, stacked=stacked)

    if stacked:
        def kv_spec(width):
            def index(bb, j, lref, qslot, vfrom):
                last = jnp.maximum(qslot[bb] // bs, 0)
                return (lref[0], bb, jnp.minimum(j, last), 0, 0)
            return pl.BlockSpec((1, 1, bs, hkv, width), index)
    else:
        def kv_spec(width):
            def index(bb, j, lref, qslot, vfrom):
                last = jnp.maximum(qslot[bb] // bs, 0)
                return (bb, jnp.minimum(j, last), 0, 0)
            return pl.BlockSpec((1, bs, hkv, width), index)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, s // bs),
            in_specs=[
                pl.BlockSpec((1, hq, d),
                             lambda bb, j, lref, qs, vf: (bb, 0, 0)),
                kv_spec(d),
                kv_spec(1),
                kv_spec(d),
                kv_spec(1),
            ],
            out_specs=pl.BlockSpec((1, hq, d),
                                   lambda bb, j, lref, qs, vf: (bb, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((hq, 128), jnp.float32),
                pltpu.VMEM((hq, 128), jnp.float32),
                pltpu.VMEM((hq, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * s * d,
            bytes_accessed=(k_q.nbytes + v_q.nbytes + k_s.nbytes
                            + v_s.nbytes) // (k_q.shape[0] if stacked else 1),
            transcendentals=b * hq * s),
        interpret=interpret,
    )(lidx, qslot, vfrom, q, k_q, k_s, v_q, v_s)