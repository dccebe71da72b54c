"""Decode attention over INT8 KV with in-kernel dequantization.

The decode hot path for the framework's native format (INT8 KV,
runtime/kv_cache.py QuantKV): one query per request attends over the whole
padded cache. Without this kernel, XLA materializes a bf16 copy of the cache
every step (dequant + attention as separate HLOs) — tripling KV traffic; here
the cache crosses HBM once, at 1 byte/element (the INT8-KV fusion SURVEY.md
§2.6 calls for).

TPU-native layout decisions (each measured on chip, docs/PERF.md):
- KV blocks are viewed as (S, Hkv·d) — with (Hkv, d) as the trailing dims,
  Mosaic pads the Hkv sublanes (4 → 32 for int8), inflating VMEM 8×. The
  flat view tiles cleanly; per-head lanes are sliced at aligned offsets.
- Scales are stored TRANSPOSED, (…, Hkv, S): the natural (…, S, Hkv, 1)
  layout makes a 1-lane block that Mosaic pads 128×. The scale is applied to
  the (group, S) score matrix, not the (S, d) K block — 128× less VPU work
  than dequantizing K, and K/V feed the MXU as bare int8→bf16 casts.
- Each grid step processes a BLOCK of requests (block_b), not one: per-request
  grid steps at decode sizes are DMA-descriptor-bound (~260 KB each measured
  9-15% of HBM bandwidth; request-blocked ~2 MB steps reach 22%+, and the
  same body with all layers in one invocation reaches ~100% — see exp notes).

Accepts the cache either per-layer (B, S, Hkv, d) or as the FULL layer stack
(L, B, S, Hkv, d) with a traced `layer` index — the latter lets the model's
layer scan keep the cache in its carry and the kernel's index map address the
layer directly, avoiding a 2×cache-slice copy per layer per step.

Masking matches the model's unified predicate (models/transformer.py):
valid_from[b] <= k_slot <= q_slot[b]; KV blocks beyond max(q_slot) clamp
their index map so their DMA is elided.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _kernel(lref, qmax_ref, qslot_ref, vfrom_ref, q_ref, kq_ref, ks_ref,
            vq_ref, vs_ref, o_ref, m_scr, l_scr, acc_scr, *,
            bs, rb, scale, hkv, group, d):
    j = pl.program_id(1)
    hq = hkv * group

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(j * bs <= qmax_ref[0])
    def _():
        q = q_ref[...]                      # (rb, hq, d)
        kq = kq_ref[0]                      # (rb, bs, hkv·d) int8
        vq = vq_ref[0]
        ks = ks_ref[0]                      # (rb, hkv, bs) f32
        vs = vs_ref[0]
        qslot = qslot_ref[...]              # (rb, 1) int32
        vfrom = vfrom_ref[...]

        kpos = j * bs + lax.broadcasted_iota(jnp.int32, (rb, 1, bs), 2)
        mask = (kpos <= qslot[:, :, None]) & (kpos >= vfrom[:, :, None])

        # scores per kv head: q-group GEMV against the int8 K lanes of that
        # head; the quant scale lands on the (g, bs) score matrix
        parts = []
        for h in range(hkv):
            kh = kq[:, :, h * d:(h + 1) * d].astype(jnp.bfloat16)
            qh = q[:, h * group:(h + 1) * group, :].astype(jnp.bfloat16)
            sh = lax.dot_general(
                qh, kh, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)        # (rb, g, bs)
            parts.append(sh * (ks[:, h, :][:, None, :] * scale))
        s = jnp.concatenate(parts, axis=1)                 # (rb, hq, bs)
        s = jnp.where(mask, s, _NEG_INF)
        s2 = s.reshape(rb * hq, bs)

        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s2, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s2 - m_new)
        l_scr[:, :1] = l_scr[:, :1] * alpha + jnp.sum(p, -1, keepdims=True)
        p3 = p.reshape(rb, hq, bs)
        pv_parts = []
        for h in range(hkv):
            vh = vq[:, :, h * d:(h + 1) * d].astype(jnp.bfloat16)
            # V's quant scale folds into p (per key position), so V also
            # rides to the MXU as a bare cast
            ph = (p3[:, h * group:(h + 1) * group, :]
                  * vs[:, h, :][:, None, :]).astype(jnp.bfloat16)
            pv_parts.append(lax.dot_general(
                ph, vh, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32))       # (rb, g, d)
        pv = jnp.concatenate(pv_parts, axis=1)
        acc_scr[:] = acc_scr[:] * alpha + pv.reshape(rb * hq, d)
        m_scr[:, :1] = m_new

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        l = l_scr[:, :1]
        safe_l = jnp.where(l > 0, l, 1.0)
        o_ref[...] = (acc_scr[:] / safe_l).reshape(rb, hq, d).astype(
            o_ref.dtype)


def _pick_block_b(b: int, bs: int, hkv: int, d: int,
                  target_bytes: int = 1 << 20) -> int:
    """Largest request-block: (rb, 1) int32 blocks need rb % 8 == 0 (or
    rb == b), K/V blocks should stay ~2 MB for clean DMA pipelining."""
    best = b
    for rb in range(b, 0, -1):
        if b % rb:
            continue
        if rb % 8 and rb != b:
            continue
        best = rb
        if rb * bs * hkv * d <= target_bytes:
            break
    return best


def _dense_fallback(q, k_q, k_s, v_q, v_s, qslot, vfrom, scale):
    """Pure-XLA path for shapes the TPU kernel can't tile (d % 128 != 0)."""
    k = k_q.astype(jnp.float32) * k_s.transpose(0, 2, 1)[..., None]
    v = v_q.astype(jnp.float32) * v_s.transpose(0, 2, 1)[..., None]
    b, s, hkv, d = k.shape
    hq = q.shape[1]
    group = hq // hkv
    qg = q.astype(jnp.float32).reshape(b, hkv, group, d)
    sc = jnp.einsum("bhgd,bshd->bhgs", qg, k) * scale
    kpos = jnp.arange(s)
    mask = (kpos[None, :] <= qslot[:, None]) & (kpos[None, :] >= vfrom[:, None])
    sc = jnp.where(mask[:, None, None, :], sc, _NEG_INF)
    p = jax.nn.softmax(sc, axis=-1)
    out = jnp.einsum("bhgs,bshd->bhgd", p, v)
    return out.reshape(b, hq, d).astype(q.dtype)


@functools.partial(jax.jit, static_argnames=("block_size", "block_b",
                                             "interpret"))
def int8_kv_decode_attention(q: jnp.ndarray,
                             k_q: jnp.ndarray, k_s: jnp.ndarray,
                             v_q: jnp.ndarray, v_s: jnp.ndarray,
                             q_slot: jnp.ndarray,
                             valid_from: jnp.ndarray | None = None,
                             layer: jnp.ndarray | None = None,
                             block_size: int = 256,
                             block_b: int | None = None,
                             interpret: bool | None = None) -> jnp.ndarray:
    """q: (B, Hq, d); k_q/v_q: FLAT int8 values (B, S, Hkv·d) — or
    (L, B, S, Hkv·d) with `layer` given; k_s/v_s: matching scales
    (…, Hkv, S) f32 (transposed layout); q_slot: (B,) current position per
    request (mask k <= q_slot); valid_from: (B,) first valid slot (left
    padding). Returns (B, Hq, d)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, hq, d = q.shape
    stacked = k_q.ndim == 4
    if not stacked:
        k_q, v_q = k_q[None], v_q[None]
        k_s, v_s = k_s[None], v_s[None]
        layer = jnp.int32(0)
    assert layer is not None, "stacked caches need a layer index"
    L, _, s, flat_hd = k_q.shape
    hkv = k_s.shape[-2]
    assert flat_hd == hkv * d, (
        f"flat KV lane dim {flat_hd} != Hkv·d = {hkv}·{d}")
    assert hq % hkv == 0
    group = hq // hkv

    qslot = jnp.asarray(q_slot, jnp.int32).reshape(b)
    vfrom = (jnp.zeros((b,), jnp.int32) if valid_from is None
             else jnp.asarray(valid_from, jnp.int32).reshape(b))
    scale = 1.0 / math.sqrt(d)

    if not interpret and d % 128 != 0:
        lv = lambda a: lax.dynamic_index_in_dim(a, layer, 0, keepdims=False)
        return _dense_fallback(q, lv(k_q).reshape(b, s, hkv, d), lv(k_s),
                               lv(v_q).reshape(b, s, hkv, d), lv(v_s),
                               qslot, vfrom, scale)

    bs = min(block_size, s)
    while s % bs:
        bs = max(1, bs - (1 if bs <= 128 else 128))
    rb = block_b if block_b is not None else _pick_block_b(b, bs, hkv, d)
    assert b % rb == 0

    kq_flat, vq_flat = k_q, v_q
    lidx = jnp.asarray(layer, jnp.int32).reshape(1)
    qmax = jnp.max(qslot).reshape(1)

    kernel = functools.partial(_kernel, bs=bs, rb=rb, scale=scale,
                               hkv=hkv, group=group, d=d)

    def kv_index(bb, j, lref, qmaxref):
        last = jnp.maximum(qmaxref[0] // bs, 0)
        return (lref[0], bb, jnp.minimum(j, last), 0)

    def scale_index(bb, j, lref, qmaxref):
        last = jnp.maximum(qmaxref[0] // bs, 0)
        return (lref[0], bb, 0, jnp.minimum(j, last))

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b // rb, s // bs),
            in_specs=[
                pl.BlockSpec((rb, 1), lambda bb, j, lr, qm: (bb, 0)),
                pl.BlockSpec((rb, 1), lambda bb, j, lr, qm: (bb, 0)),
                pl.BlockSpec((rb, hq, d), lambda bb, j, lr, qm: (bb, 0, 0)),
                pl.BlockSpec((1, rb, bs, hkv * d), kv_index),
                pl.BlockSpec((1, rb, hkv, bs), scale_index),
                pl.BlockSpec((1, rb, bs, hkv * d), kv_index),
                pl.BlockSpec((1, rb, hkv, bs), scale_index),
            ],
            out_specs=pl.BlockSpec((rb, hq, d),
                                   lambda bb, j, lr, qm: (bb, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((rb * hq, 128), jnp.float32),
                pltpu.VMEM((rb * hq, 128), jnp.float32),
                pltpu.VMEM((rb * hq, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * s * d,
            bytes_accessed=(kq_flat.nbytes + vq_flat.nbytes
                            + k_s.nbytes + v_s.nbytes) // L,
            transcendentals=b * hq * s),
        interpret=interpret,
    )(lidx, qmax, jnp.reshape(qslot, (b, 1)), jnp.reshape(vfrom, (b, 1)),
      q, kq_flat, k_s, vq_flat, v_s)
