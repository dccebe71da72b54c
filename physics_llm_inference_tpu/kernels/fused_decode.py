"""Fused whole-model INT8 decode step — one Pallas kernel per token.

The decode step of a dense INT8 W+KV transformer is memory-bound: its floor
is (weight bytes + live KV bytes) / HBM bandwidth. Split across ~80
pallas_call invocations per step (16 layers × 4 matmuls + attention), each
invocation pays pipeline prologue/epilogue and XLA op boundaries — measured
~0.3-0.6 ms/step of pure overhead on v5e (docs/PERF.md), a third of the
whole budget. The same attention body that reaches 22% of HBM bandwidth as
16 per-layer invocations reaches ~100% as ONE invocation whose grid covers
all layers.

So this kernel runs the ENTIRE decode step — all layers: RMSNorm → fused
QKV matmul → RoPE → KV quantize → attention over the INT8 cache → output
projection → RMSNorm → SwiGLU FFN — in one pallas_call with grid
(num_layers, tiles_per_layer). Weights and KV stream through VMEM in ~1-2MB
blocks, double-buffered by the Pallas pipeline across phase boundaries and
layer boundaries alike; activations never leave VMEM. Per-phase tile windows
share one grid axis; outside its window a stream's index map clamps so its
DMA is elided.

The grid's second axis t covers, per layer l:
  [0, nq)            QKV:   qkv += h @ wqkv[:, tile]            (int8 tiles)
  t == nq            glue:  RoPE(q,k), quantize k/v  (same step as ATTN 0)
  [nq, nq+na)        ATTN:  per request-block flash over INT8 KV + current
  [nq+na, +nwo)      WO:    x += attn @ wo[:, tile]
  t == P_GU          glue:  h2 = RMSNorm(x)·ln2      (same step as GU 0)
  [P_GU, +ngu)       GU:    gu[tile] = h2 @ w_gate_up[:, tile]
  t == P_DN          glue:  ff = silu(gate)·up       (same step as DOWN 0)
  [P_DN, +ndn)       DOWN:  x += ff[ktile] @ w_down[ktile, :]

Attention takes the current token's K/V from VMEM (dequantized from the same
int8+scale values the cache will hold, so numerics match the write-then-read
path exactly). The new K/V reach the cache one of two ways:

- `slot` given (uniform write slot — the generate path, where left-padding
  aligns all requests): the cache buffers are ALIASED input→output and the
  kernel writes the updated slot window in place — an 8-slot int8 window and
  the scale lane-plane per request block, composed from the (pre-update)
  input block. The caller's decode scan then carries the cache with zero
  copies (an XLA-side dynamic_update_slice after the kernel measured
  ~0.27 ms/step of copy on the 0.85B bench; this path makes it free).
- per-request slots: new K/V are RETURNED (L, B, Hkv·hd) and the caller
  scatters them (models/transformer.py _scatter_new_kv).

Cache layouts are the QuantKV native ones (flat int8 values, transposed
scales — models/transformer.py). Reference capability: this kernel replaces
the per-op CUDA-graph replay of ref ch08/cuda_graph.py:18-82 with something
stronger — a single compiled unit for the whole step.
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
INT8_MAX = 127.0


def _rms(x_f32, w_row, eps):
    ms = jnp.mean(x_f32 * x_f32, axis=-1, keepdims=True)
    return x_f32 * lax.rsqrt(ms + eps) * w_row.astype(jnp.float32)


def _kernel(slot_ref, x0_ref, ln1_ref, ln2_ref, wqkv_ref, sqkv_ref, wo_ref,
            swo_ref, wgu_ref, sgu_ref, wdn_ref, sdn_ref, kq_ref, ks_ref,
            vq_ref, vs_ref, cos_ref, sin_ref, qslot_ref, vfrom_ref,
            xout_ref, ko1_ref, ko2_ref, vo1_ref, vo2_ref,
            x_scr, h_scr, qkv_scr, q_scr, kcur_scr, vcur_scr, attn_scr,
            gu_scr, k8_scr, v8_scr, kscl_scr, vscl_scr, a8_scr, asc_scr,
            *kvp_scr, cfgk):
    (L, B, S, D, F, HQ, HKV, HD, QO, TNQ, TNW, TNG, TK, RB, nq, na, nwo,
     ngu, ndn, eps, write_cache, act8, wmajor, silu_spread, kblock,
     w4, kvp, G) = cfgk
    if kvp:
        # deep-lookahead KV prefetch (see _fused_decode_step docstring):
        # ring buffers + staging windows + DMA semaphore arrays
        (kqb, vqb, ksb, vsb, kstage, vstage, rsem, wsem) = kvp_scr

    def _w(ref):
        """Weight tile → MXU operand. INT4: two arithmetic shifts recover
        the nibbles (low = channels [0, N/2), high = [N/2, N) — the pack
        order makes the concat come out in natural channel order).
        Shifts run in int32: Mosaic on this stack fails to legalize
        arith.shli on int8 vectors ("failed to legalize operation
        'arith.shli'"), and int8→int32 sign-extension is what the
        arithmetic-shift recovery needs anyway."""
        t = ref[0]
        if not w4:
            return t
        t32 = t.astype(jnp.int32)
        lo = jnp.right_shift(jnp.left_shift(t32, 28), 28)
        hi = jnp.right_shift(t32, 4)
        return jnp.concatenate([lo, hi], axis=-1).astype(jnp.bfloat16)
    l = pl.program_id(0)
    t = pl.program_id(1)
    P_ATTN, P_WO = nq, nq + na
    P_GU, P_DN = P_WO + nwo, P_WO + nwo + ngu
    group = HQ // HKV
    hd2 = HD // 2
    sm_scale = 1.0 / math.sqrt(HD)

    @pl.when((l == 0) & (t == 0))
    def _():
        x_scr[:] = x0_ref[...].astype(jnp.float32)

    if kvp:
        # Manual KV streaming with one-LAYER lookahead. The auto-pipeline
        # only prefetches one grid step ahead, so the attention phase's KV
        # DMA (~1 GB/step at 7B B=64 S=256) serializes behind it while the
        # MXU idles; here layer l+1's blocks are issued during layer l's
        # DOWN phase — where the MXU (M<=128 rows) is the bottleneck and
        # the DMA queue has slack — and waited at l+1's attention steps.
        def kv_read_dmas(lx, i):
            # value rings rotate through G slots (G == na → one slot per
            # group, full-layer lookahead); scale rings are na-deep (they
            # double as the in-place write planes)
            rows = pl.ds(i * RB, RB)
            return (
                pltpu.make_async_copy(kq_ref.at[lx, rows], kqb.at[i % G],
                                      rsem.at[i, 0]),
                pltpu.make_async_copy(ks_ref.at[lx, rows], ksb.at[i],
                                      rsem.at[i, 1]),
                pltpu.make_async_copy(vq_ref.at[lx, rows], vqb.at[i % G],
                                      rsem.at[i, 2]),
                pltpu.make_async_copy(vs_ref.at[lx, rows], vsb.at[i],
                                      rsem.at[i, 3]),
            )

        def kv_write_dmas(i):
            rows = pl.ds(i * RB, RB)
            base = (slot_ref[0] // 8) * 8
            return (
                pltpu.make_async_copy(kstage.at[i],
                                      ko1_ref.at[l, rows, pl.ds(base, 8)],
                                      wsem.at[i, 0]),
                pltpu.make_async_copy(vstage.at[i],
                                      vo1_ref.at[l, rows, pl.ds(base, 8)],
                                      wsem.at[i, 1]),
                pltpu.make_async_copy(ksb.at[i], ko2_ref.at[l, rows],
                                      wsem.at[i, 2]),
                pltpu.make_async_copy(vsb.at[i], vo2_ref.at[l, rows],
                                      wsem.at[i, 3]),
            )

        @pl.when((l == 0) & (t == 0))
        def _():
            # layer 0 has no earlier slack window: issue its first G
            # groups now; they complete during the QKV phase (G == na:
            # all of them — the full-ring schedule)
            for i in range(G):
                for d in kv_read_dmas(0, i):
                    d.start(priority=1)

        @pl.when(t == P_GU)  # kvp implies write_cache (eligibility gate)
        def _():
            # all of this layer's cache writes were issued during the
            # attention phase; drain them before their staging buffers and
            # scale planes are reused (next layer's prefetch can land in
            # ksb/vsb starting this same step — this block is emitted
            # BEFORE the issue blocks below, so in-step order is safe)
            for i in range(na):
                for d in kv_write_dmas(i):
                    d.wait()

        if G == na:
            # full rings: issue layer l+1's blocks as early as their ring
            # slots are free (the P_GU drain above): the GU phase, when
            # long enough, gives the background queue the largest slack
            # window before the deadline. (Issuing the value rings one
            # phase earlier still, at P_WO — legal, their last read is the
            # attention step — hung Mosaic's compiler on this stack;
            # measured 9.40→9.32 ms came from the P_DN→P_GU move alone.)
            issue_base = P_GU if ngu >= na else P_DN
            for i_ in range(na):
                @pl.when((l < L - 1) & (t == issue_base + i_))
                def _(i=i_):
                    # background priority: the weight pipeline only has one
                    # grid step of lookahead, so a foreground 4MB KV copy
                    # ahead of the next weight tile stalls the MXU; at
                    # priority 1 the DMA engine services weight fetches
                    # first and fills the matmul phases' DMA slack with KV
                    for d in kv_read_dmas(l + 1, i):
                        d.start(priority=1)
        else:
            # rotating rings (na % G == 0): slot j % G frees right after
            # its previous occupant's attention step, so each group's
            # refill is issued ONE step after that — G-1 attention steps
            # of slack instead of a full layer. Consumption order of slot
            # s within a layer: groups s, s+G, ..., na-G+s.
            for j_ in range(G, na):
                # same-layer groups >= G: previous occupant is group j-G
                @pl.when(t == P_ATTN + (j_ - G) + 1)
                def _(j=j_):
                    for d in kv_read_dmas(l, j):
                        d.start(priority=1)
            for j_ in range(G):
                # next layer's first G groups: slot j's last occupant this
                # layer is group na-G+j
                @pl.when((l < L - 1) & (t == P_ATTN + (na - G + j_) + 1))
                def _(j=j_):
                    for d in kv_read_dmas(l + 1, j):
                        d.start(priority=1)

    def _qrow(x_f32, width):
        # dynamic per-row (per-token) activation quantization for the W8A8
        # path: int8×int8 runs the MXU at 2× the bf16 rate
        amax = jnp.max(jnp.abs(x_f32), axis=-1, keepdims=True)
        sc = jnp.maximum(amax, 1e-8) / INT8_MAX
        q = jnp.clip(jnp.round(x_f32 / sc), -127, 127).astype(jnp.int8)
        a8_scr[:, :width] = q
        asc_scr[:] = sc

    def _mm(a_bf16_or_none, w_tile, width):
        # one matmul tile: bf16 activations, or int8 activations from
        # a8_scr/asc_scr when act8 (returns f32 with act scale applied).
        # wmajor: weight tiles are stored N-major (TN, K) so each tile's
        # HBM read is ONE contiguous block instead of K rows of TN-byte
        # segments — contract over the tile's LAST dim.
        wdims = ((1,), (1,)) if wmajor else ((1,), (0,))
        if act8:
            acc = lax.dot_general(a8_scr[:, :width], w_tile,
                                  ((wdims[0], wdims[1]), ((), ())),
                                  preferred_element_type=jnp.int32)
            return acc.astype(jnp.float32) * asc_scr[...]
        return lax.dot_general(a_bf16_or_none, w_tile,
                               ((wdims[0], wdims[1]), ((), ())),
                               preferred_element_type=jnp.float32)

    @pl.when(t == 0)
    def _():
        hf = _rms(x_scr[...], ln1_ref[0], eps)
        if act8:
            _qrow(hf, D)
        else:
            h_scr[:] = hf.astype(h_scr.dtype)
        if kblock:
            qkv_scr[:] = jnp.zeros_like(qkv_scr)

    # ---- QKV ----
    # kblock: tiles window the CONTRACTION dim and span full N — every
    # weight DMA is one contiguous (TK·N)-byte read from the canonical
    # (L, K, N) layout (N-windowed tiles are K strided segments of TN
    # bytes; at TN=512 those 512-byte runs stream well under peak HBM
    # rate). Per-output-channel scales commute with the K-sum, so each
    # partial is scaled and accumulated: qkv += (h[:,ktile] @ w[ktile,:])·s.
    if kblock:
        @pl.when(t < nq)
        def _():
            j = t
            a = h_scr[:, pl.ds(j * TNQ, TNQ)]
            acc = lax.dot_general(a, _w(wqkv_ref), (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
            qkv_scr[:] += acc * sqkv_ref[0]
    else:
        # qkv[:, j·TNQ:(j+1)·TNQ] = h @ wqkv_tile · scale
        @pl.when(t < nq)
        def _():
            j = t
            acc = _mm(h_scr[...], wqkv_ref[0], D)
            qkv_scr[:, pl.ds(j * TNQ, TNQ)] = (acc * sqkv_ref[0]).astype(
                qkv_scr.dtype)

    # ---- glue: RoPE + KV quantize, folded into the first ATTN step ----
    @pl.when(t == P_ATTN)
    def _():
        if kblock:
            # the per-op path materializes qkv in bf16 before rope; round
            # the f32 K-accumulator the same way so cache int8 values (and
            # engine parity) match the unfused path bit-for-bit
            qkv_scr[:] = qkv_scr[...].astype(jnp.bfloat16).astype(
                qkv_scr.dtype)
        cos = cos_ref[...].astype(jnp.float32)[:, None, :]  # (B, 1, hd/2)
        sin = sin_ref[...].astype(jnp.float32)[:, None, :]

        def rope(flat, heads):
            x3 = flat.astype(jnp.float32).reshape(B, heads, HD)
            x1, x2 = x3[..., :hd2], x3[..., hd2:]
            return jnp.concatenate([x1 * cos - x2 * sin,
                                    x2 * cos + x1 * sin], axis=-1)

        def quant(x3):  # per-head absmax over hd, matching quantize_int8
            amax = jnp.max(jnp.abs(x3), axis=-1, keepdims=True)
            s = jnp.maximum(amax, 1e-8) / INT8_MAX
            q = jnp.clip(jnp.round(x3 / s), -127, 127).astype(jnp.int8)
            return q, s

        q = rope(qkv_scr[:, :HQ * HD], HQ)
        # the unfused path rounds rope output to bf16 (ops/rope.py returns
        # the input dtype) before quantizing — match it bit-exactly
        k = rope(qkv_scr[:, HQ * HD:(HQ + HKV) * HD],
                 HKV).astype(jnp.bfloat16).astype(jnp.float32)
        v = qkv_scr[:, (HQ + HKV) * HD:].astype(jnp.float32).reshape(
            B, HKV, HD)
        q_scr[:] = q.reshape(B, HQ * HD).astype(q_scr.dtype)
        kq8, ksc = quant(k)
        vq8, vsc = quant(v)
        k8_scr[:] = kq8.reshape(B, HKV * HD)
        v8_scr[:] = vq8.reshape(B, HKV * HD)
        kscl_scr[:] = ksc[..., 0]
        vscl_scr[:] = vsc[..., 0]
        if not write_cache:
            ko1_ref[0] = kq8.reshape(B, HKV * HD)
            vo1_ref[0] = vq8.reshape(B, HKV * HD)
            ko2_ref[0] = ksc[..., 0]
            vo2_ref[0] = vsc[..., 0]
        # current-token K/V for attention: dequantized from the SAME int8
        # values the cache will hold — numerics identical to write-then-read
        kcur_scr[:] = (kq8.astype(jnp.float32) * ksc).reshape(
            B, HKV * HD).astype(kcur_scr.dtype)
        vcur_scr[:] = (vq8.astype(jnp.float32) * vsc).reshape(
            B, HKV * HD).astype(vcur_scr.dtype)

    # ---- ATTN: flash over the INT8 cache + current token, RB requests ----
    def _attn_body(i):
        rows = pl.ds(i * RB, RB)
        q = q_scr[rows, :].astype(jnp.float32).reshape(RB, HQ, HD)
        kcur = kcur_scr[rows, :].astype(jnp.float32).reshape(RB, HKV, HD)
        vcur = vcur_scr[rows, :].astype(jnp.float32).reshape(RB, HKV, HD)
        if kvp:
            # drain the prefetch issued one layer ago, then read the ring
            for d in kv_read_dmas(l, i):
                d.wait()
            kq = kqb[i % G]                  # (RB, S, HKV·HD) int8
            vq = vqb[i % G]
            ks = ksb[i]                      # (RB, HKV, S) f32
            vs = vsb[i]
        else:
            kq = kq_ref[0]                   # (RB, S, HKV·HD) int8
            vq = vq_ref[0]
            ks = ks_ref[0]                   # (RB, HKV, S) f32
            vs = vs_ref[0]
        qslot = qslot_ref[rows, :]                        # (RB, 1)
        vfrom = vfrom_ref[rows, :]
        kpos = lax.broadcasted_iota(jnp.int32, (RB, 1, S), 2)
        # cache holds tokens strictly BEFORE the current slot
        mask = (kpos < qslot[:, :, None]) & (kpos >= vfrom[:, :, None])

        s_parts, cur_parts = [], []
        for h in range(HKV):
            kh = kq[:, :, h * HD:(h + 1) * HD].astype(jnp.bfloat16)
            qh = q[:, h * group:(h + 1) * group, :].astype(jnp.bfloat16)
            sh = lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
            s_parts.append(sh * (ks[:, h, :][:, None, :] * sm_scale))
            # current-token score: (RB, g, 1)
            kc_h = kcur[:, h, :][:, None, :]
            cur = jnp.sum(q[:, h * group:(h + 1) * group, :] * kc_h,
                          axis=-1, keepdims=True)
            cur_parts.append(cur * sm_scale)
        s = jnp.concatenate(s_parts, axis=1)              # (RB, HQ, S)
        s = jnp.where(mask, s, _NEG_INF)
        s_cur = jnp.concatenate(cur_parts, axis=1)        # (RB, HQ, 1)

        m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), s_cur)
        p = jnp.exp(s - m)                                # (RB, HQ, S)
        p_cur = jnp.exp(s_cur - m)
        denom = jnp.sum(p, -1, keepdims=True) + p_cur
        o_parts = []
        for h in range(HKV):
            vh = vq[:, :, h * HD:(h + 1) * HD].astype(jnp.bfloat16)
            ph = (p[:, h * group:(h + 1) * group, :]
                  * vs[:, h, :][:, None, :]).astype(jnp.bfloat16)
            pv = lax.dot_general(ph, vh, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
            vc_h = vcur[:, h, :][:, None, :]
            pv = pv + (p_cur[:, h * group:(h + 1) * group, :] * vc_h)
            o_parts.append(pv)
        o = jnp.concatenate(o_parts, axis=1) / denom       # (RB, HQ, HD)
        attn_scr[rows, :] = o.reshape(RB, HQ * HD).astype(attn_scr.dtype)

        if write_cache and kvp:
            # in-place cache write via manual DMA: compose the 8-slot int8
            # window from the prefetched (pre-update) block + the new token,
            # update the scale plane's slot lane in the ring, then DMA both
            # back to the aliased HBM buffers (drained at P_GU)
            slot = slot_ref[0]
            base = (slot // 8) * 8
            win_k = kqb[i % G, :, pl.ds(base, 8), :]      # (RB, 8, HKV·HD)
            win_v = vqb[i % G, :, pl.ds(base, 8), :]
            sel = (lax.broadcasted_iota(jnp.int32, (RB, 8, 1), 1) + base
                   == slot)
            k8 = k8_scr[rows, :][:, None, :]              # (RB, 1, HKV·HD)
            v8 = v8_scr[rows, :][:, None, :]
            kstage[i] = jnp.where(sel, k8, win_k)
            vstage[i] = jnp.where(sel, v8, win_v)
            lane = lax.broadcasted_iota(jnp.int32, (RB, HKV, S), 2)
            ksl = kscl_scr[rows, :][:, :, None]           # (RB, HKV, 1)
            vsl = vscl_scr[rows, :][:, :, None]
            ksb[i] = jnp.where(lane == slot, ksl, ks)
            vsb[i] = jnp.where(lane == slot, vsl, vs)
            for d in kv_write_dmas(i):
                d.start(priority=1)  # don't jump the weight-tile queue
        elif write_cache:
            # write the current token into the cache IN PLACE (the cache
            # buffers are aliased input→output): an 8-slot int8 window and
            # the scale lane-plane, composed from the pre-update input block
            slot = slot_ref[0]
            base = (slot // 8) * 8
            win_k = kq_ref[0, :, pl.ds(base, 8), :]       # (RB, 8, HKV·HD)
            win_v = vq_ref[0, :, pl.ds(base, 8), :]
            sel = (lax.broadcasted_iota(jnp.int32, (RB, 8, 1), 1) + base
                   == slot)
            k8 = k8_scr[rows, :][:, None, :]              # (RB, 1, HKV·HD)
            v8 = v8_scr[rows, :][:, None, :]
            ko1_ref[0] = jnp.where(sel, k8, win_k)
            vo1_ref[0] = jnp.where(sel, v8, win_v)
            lane = lax.broadcasted_iota(jnp.int32, (RB, HKV, S), 2)
            ksl = kscl_scr[rows, :][:, :, None]           # (RB, HKV, 1)
            vsl = vscl_scr[rows, :][:, :, None]
            ko2_ref[0] = jnp.where(lane == slot, ksl, ks)
            vo2_ref[0] = jnp.where(lane == slot, vsl, vs)

    @pl.when((t >= P_ATTN) & (t < P_WO))
    def _():
        _attn_body(t - P_ATTN)

    if act8:
        @pl.when(t == P_WO)
        def _():
            _qrow(attn_scr[...].astype(jnp.float32), HQ * HD)

    # ---- WO ----
    if kblock:
        @pl.when((t >= P_WO) & (t < P_GU))
        def _():
            j = t - P_WO
            a = attn_scr[:, pl.ds(j * TNW, TNW)]
            acc = lax.dot_general(a, _w(wo_ref), (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
            # x_scr carries the residual: K-partials accumulate directly
            x_scr[:] += acc * swo_ref[0]
    else:
        # x[:, tile] += attn @ wo_tile · scale
        @pl.when((t >= P_WO) & (t < P_GU))
        def _():
            j = t - P_WO
            acc = _mm(attn_scr[...], wo_ref[0], HQ * HD)
            x_scr[:, pl.ds(j * TNW, TNW)] += acc * swo_ref[0]

    @pl.when(t == P_GU)
    def _():
        hf = _rms(x_scr[...], ln2_ref[0], eps)
        if act8:
            _qrow(hf, D)
        else:
            h_scr[:] = hf.astype(h_scr.dtype)
        if kblock:
            gu_scr[:] = jnp.zeros_like(gu_scr)

    # ---- GU ----
    if kblock:
        @pl.when((t >= P_GU) & (t < P_DN))
        def _():
            j = t - P_GU
            a = h_scr[:, pl.ds(j * TNG, TNG)]
            acc = lax.dot_general(a, _w(wgu_ref), (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
            gu_scr[:] += acc * sgu_ref[0]
    else:
        # gu[:, tile] = h2 @ w_gate_up_tile · scale
        # (a variant spreading silu/multiply across the GU tiles measured
        # 4% SLOWER at B=128 — the batched one-pass silu wins)
        @pl.when((t >= P_GU) & (t < P_DN))
        def _():
            j = t - P_GU
            acc = _mm(h_scr[...], wgu_ref[0], D)
            gu_scr[:, pl.ds(j * TNG, TNG)] = (acc * sgu_ref[0]).astype(
                gu_scr.dtype)

    if not (silu_spread and not act8):
        @pl.when(t == P_DN)
        def _():
            # f32 silu: a bf16 variant fails Mosaic lowering (f32 constants
            # broadcast into bf16 vectors inside the logistic)
            def rd(v):  # kblock: bf16 round-trip matches per-op numerics
                return (v.astype(jnp.bfloat16).astype(jnp.float32)
                        if kblock else v.astype(jnp.float32))
            gate = rd(gu_scr[:, :F])
            up = rd(gu_scr[:, F:])
            ff = jax.nn.silu(gate) * up
            if act8:
                _qrow(ff, F)
            else:
                # reuse the gate half of gu_scr as the ff buffer
                gu_scr[:, :F] = ff.astype(gu_scr.dtype)

    # ---- DOWN: x += ff[:, ktile] @ w_down_tile · scale ----
    @pl.when(t >= P_DN)
    def _():
        j = t - P_DN
        if act8:
            acc = lax.dot_general(a8_scr[:, pl.ds(j * TK, TK)], wdn_ref[0],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
            acc = acc.astype(jnp.float32) * asc_scr[...]
        else:
            if silu_spread:
                # compute this tile's slice of silu(gate)·up inline: the
                # one-pass silu glue step stalls the weight DMA stream for
                # its whole VPU duration (only one grid step of lookahead
                # is prefetched); per-tile slices hide under each DOWN
                # tile's DMA instead. bf16 round-trip on the (possibly
                # f32-accumulated) gate/up matches the per-op numerics.
                gate = gu_scr[:, pl.ds(j * TK, TK)].astype(
                    jnp.bfloat16).astype(jnp.float32)
                up = gu_scr[:, pl.ds(F + j * TK, TK)].astype(
                    jnp.bfloat16).astype(jnp.float32)
                ff = (jax.nn.silu(gate) * up).astype(jnp.bfloat16)
            else:
                ff = gu_scr[:, pl.ds(j * TK, TK)].astype(jnp.bfloat16)
            acc = lax.dot_general(ff, _w(wdn_ref), (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        x_scr[:] += acc * sdn_ref[0]

    @pl.when((l == L - 1) & (t == P_DN + ndn - 1))
    def _():
        xout_ref[...] = x_scr[...].astype(xout_ref.dtype)


def _paged_kernel_r5(tables_ref, lens_sp_ref, x0_ref, ln1_ref, ln2_ref,
                  wqkv_ref, sqkv_ref, wo_ref, swo_ref, wgu_ref, sgu_ref,
                  wdn_ref, sdn_ref, cos_ref, sin_ref, lens_ref,
                  kv_any, kvs_any,
                  xout_ref, ko1_ref, ko2_ref, vo1_ref, vo2_ref, *rest,
                  cfgk):
    """Fused whole-model decode over PAGED KV pools.

    Same phase structure as _kernel. The attention phase reads each
    request's scattered VALUE blocks via MANUAL block-table DMA with
    one-layer lookahead: the kernel walks the scalar-prefetched block
    table (SMEM) and issues one HBM→VMEM copy per (request, live table
    column) into request-block ring buffers; the attention steps wait on
    them. This replaces the round-2 operand FAN (RBP×MB auto-pipelined
    windows), which measured 3.8× slower than the slot kernel: 130+
    operands fragmented Mosaic's pipelining and dead columns re-fetched
    resident blocks.

    VALUE RINGS ROTATE (round 5): the rings hold G <= na request-block
    slots — request block i reads slot i % G, refilled one step after the
    slot's previous occupant's attention step (the dense kvp rotation
    scheme applied to the paged path). Ring VMEM is therefore
    G·RBP·capacity·flat per stream, INDEPENDENT of na — which is what
    lets the fused path cover production contexts (capacity 1024+ at
    B=64; the r4 full-depth rings capped capacity at 512). G == na is the
    full-ring schedule (small geometries / tests).

    SCALES are LAYER-RESIDENT (round 4): each layer's whole (NB, 2, HKV,
    BS) scale pool arrives in ONE copy (1 descriptor/layer instead of 2
    per (request, column)) and the attention step gathers blocks by
    table index with in-VMEM page loads. Measured motivation: the paged
    premium is per-descriptor-slot SCALAR cost (~0.27 µs per
    check+start+wait triple — bs=128/MB=4 at 16.0 ms vs bs=256/MB=2 at
    11.5 with identical live bytes), so halving the slots is worth ~4
    ms/step at MB=4 — and the production geometry keeps descriptor count
    low with LARGE blocks (bs=512, MB=2 at B=64).

    K AND V ARE CO-LOCATED PER BLOCK (round 5): the pools are
    (L, NB, 2, BS, flat) int8 / (L, NB, 2, HKV, BS) f32 — logical block
    idx holds its K page (index 0 on dim 2) and V page (index 1)
    adjacently, so ONE descriptor moves both (B·MB value descriptors per
    layer instead of 2·B·MB). The ring slot is (2, RBP, SC, flat):
    slicing dim 1 at 0/1 yields CONTIGUOUS (RBP, SC, flat) K and V
    views, so the monolithic attention body (and its numerics) is
    unchanged — the merge is purely a descriptor-count optimization.
    Since descriptors, not bytes, are the measured premium, a "page" in
    this framework is the K+V pair.
    """
    (L, B, S, D, F, HQ, HKV, HD, QO, TNQ, TNW, TNG, TK, RBP, MB, BS, nq,
     na, nwo, ngu, ndn, eps, wmajor, silu_spread, inplace, G) = cfgk
    if inplace:
        (kvp_out, kvsp_out,
         x_scr, h_scr, qkv_scr, q_scr, kcur_scr, vcur_scr, attn_scr,
         gu_scr, k8_scr, v8_scr, kscl_scr, vscl_scr,
         kvb, svl, kvwst, kvsst,
         rsem, ssem, wsem) = rest
    else:
        (x_scr, h_scr, qkv_scr, q_scr, kcur_scr, vcur_scr, attn_scr,
         gu_scr, k8_scr, v8_scr, kscl_scr, vscl_scr,
         kvb, svl, rsem, ssem) = rest

    l = pl.program_id(0)
    t = pl.program_id(1)
    P_ATTN, P_WO = nq, nq + na
    P_GU, P_DN = P_WO + nwo, P_WO + nwo + ngu
    group = HQ // HKV
    hd2 = HD // 2
    sm_scale = 1.0 / math.sqrt(HD)
    SC = MB * BS  # per-request KV capacity covered by the ring

    def pool_write_dmas(i):
        """In-place cache writes for request block i: per request, ONE
        descriptor for the (2, 8, flat) K+V int8 window of its CURRENT
        pool block (composed in kvwst) and ONE for that block's (2, HKV,
        BS) scale planes (composed in kvsst from the layer-resident
        buffer) go back to the aliased pool buffers at the
        table-resolved block index."""
        dmas = []
        for rr in range(RBP):
            r = i * RBP + rr
            off = lens_sp_ref[r]
            c = off // BS
            blk = tables_ref[r, c]
            base8 = ((off % BS) // 8) * 8
            dmas.extend([
                pltpu.make_async_copy(
                    kvwst.at[i, rr],
                    kvp_out.at[l, blk, :, pl.ds(base8, 8)],
                    wsem.at[i, 0]),
                pltpu.make_async_copy(
                    kvsst.at[i, rr], kvsp_out.at[l, blk],
                    wsem.at[i, 1]),
            ])
        return dmas

    def scale_layer_dmas(lx):
        """Layer lx's WHOLE (merged K|V) scale pool → the layer-resident
        buffer: 1 descriptor regardless of B/MB."""
        return (
            pltpu.make_async_copy(kvs_any.at[lx], svl, ssem.at[0, 0]),
        )

    def kv_block_dmas(lx, i):
        """KV copies for request block i of layer lx: RBP requests ×
        LIVE table columns, each ONE (2, BS, flat) descriptor moving the
        block's co-located K and V pages into ring slot i % G. Returns
        (live, dma) pairs — a column is live iff c <= the destination
        block index (lens // BS; tables cover lengths+1, and at a block
        boundary the write path composes its 8-slot window from ring
        region lens // BS, which must hold the DESTINATION block's real
        content). Dead columns (c > last) are SKIPPED at both start and
        wait — their ring regions hold stale int8 bytes, which only ever
        meet masked/zero p (scales are layer-resident and always real,
        so no NaN path exists) — saving up to MB× re-fetch at partial
        occupancy."""
        dmas = []
        for rr in range(RBP):
            r = i * RBP + rr
            last = lens_sp_ref[r] // BS
            for c in range(MB):
                live = c <= last
                idx = tables_ref[r, jnp.minimum(c, last)]
                cols = pl.ds(c * BS, BS)
                dmas.append((live, pltpu.make_async_copy(
                    kv_any.at[lx, idx], kvb.at[i % G, :, rr, cols],
                    rsem.at[i % G, 0])))
        return dmas

    @pl.when((l == 0) & (t == 0))
    def _():
        x_scr[:] = x0_ref[...].astype(jnp.float32)
        # layer 0 has no earlier slack window: issue its first G request
        # blocks now (G == na: all of them)
        for d in scale_layer_dmas(0):
            d.start(priority=1)
        for i in range(G):
            for live, d in kv_block_dmas(0, i):
                @pl.when(live)
                def _(d=d):
                    d.start(priority=1)

    if inplace:
        @pl.when(t == P_GU)
        def _():
            # drain this layer's pool writes before their staging buffers
            # and scale-ring columns are reused (emitted BEFORE the issue
            # blocks below — in-step program order)
            for i in range(na):
                for d in pool_write_dmas(i):
                    d.wait()

    # next layer's scale pools: issue right after this layer's last
    # attention step has read the resident buffer (2 descriptors; the
    # in-flight write-back of THIS layer's scale planes targets layer l
    # rows — disjoint from the l+1 read)
    @pl.when((l < L - 1) & (t == P_WO))
    def _():
        for d in scale_layer_dmas(l + 1):
            d.start(priority=1)

    # Rotating-ring refill schedule (round 5; mirrors the dense kvp
    # rotation): ring slot i % G frees right after its previous occupant's
    # attention step, so each block's refill is issued ONE step after
    # that. Consumption order of slot s: blocks s, s+G, ..., na-G+s within
    # a layer, then the next layer's block s. All at background priority —
    # foreground copies would delay the 1-step-lookahead weight tiles and
    # stall the MXU (see the dense kvp path).
    for i_ in range(G, na):
        # same-layer blocks >= G: previous occupant of slot i % G is
        # block i - G, consumed at attention step P_ATTN + (i - G)
        @pl.when(t == P_ATTN + (i_ - G) + 1)
        def _(i=i_):
            for live, d in kv_block_dmas(l, i):
                @pl.when(live)
                def _(d=d):
                    d.start(priority=1)
    for j_ in range(G):
        # next layer's first G blocks: slot j's last occupant this layer
        # is block na - G + j
        @pl.when((l < L - 1) & (t == P_ATTN + (na - G + j_) + 1))
        def _(j=j_):
            for live, d in kv_block_dmas(l + 1, j):
                @pl.when(live)
                def _(d=d):
                    d.start(priority=1)

    def _mm(a, w_tile):
        wdims = ((1,), (1,)) if wmajor else ((1,), (0,))
        return lax.dot_general(a, w_tile, ((wdims[0], wdims[1]), ((), ())),
                               preferred_element_type=jnp.float32)

    @pl.when(t == 0)
    def _():
        h_scr[:] = _rms(x_scr[...], ln1_ref[0], eps).astype(h_scr.dtype)

    @pl.when(t < nq)
    def _():
        j = t
        acc = _mm(h_scr[...], wqkv_ref[0])
        qkv_scr[:, pl.ds(j * TNQ, TNQ)] = (acc * sqkv_ref[0]).astype(
            qkv_scr.dtype)

    # ---- glue: RoPE + KV quantize; new K/V exit via the scatter outputs
    @pl.when(t == P_ATTN)
    def _():
        cos = cos_ref[...].astype(jnp.float32)[:, None, :]
        sin = sin_ref[...].astype(jnp.float32)[:, None, :]

        def rope(flat, heads):
            x3 = flat.astype(jnp.float32).reshape(B, heads, HD)
            x1, x2 = x3[..., :hd2], x3[..., hd2:]
            return jnp.concatenate([x1 * cos - x2 * sin,
                                    x2 * cos + x1 * sin], axis=-1)

        def quant(x3):
            amax = jnp.max(jnp.abs(x3), axis=-1, keepdims=True)
            s = jnp.maximum(amax, 1e-8) / INT8_MAX
            q8 = jnp.clip(jnp.round(x3 / s), -127, 127).astype(jnp.int8)
            return q8, s

        q = rope(qkv_scr[:, :HQ * HD], HQ)
        k = rope(qkv_scr[:, HQ * HD:(HQ + HKV) * HD],
                 HKV).astype(jnp.bfloat16).astype(jnp.float32)
        v = qkv_scr[:, (HQ + HKV) * HD:].astype(jnp.float32).reshape(
            B, HKV, HD)
        q_scr[:] = q.reshape(B, HQ * HD).astype(q_scr.dtype)
        kq8, ksc = quant(k)
        vq8, vsc = quant(v)
        ko1_ref[0] = kq8.reshape(B, HKV * HD)
        vo1_ref[0] = vq8.reshape(B, HKV * HD)
        ko2_ref[0] = ksc[..., 0]
        vo2_ref[0] = vsc[..., 0]
        kcur_scr[:] = (kq8.astype(jnp.float32) * ksc).reshape(
            B, HKV * HD).astype(kcur_scr.dtype)
        vcur_scr[:] = (vq8.astype(jnp.float32) * vsc).reshape(
            B, HKV * HD).astype(vcur_scr.dtype)
        if inplace:
            # the in-place pool writes compose from these at ATTN steps
            k8_scr[:] = kq8.reshape(B, HKV * HD)
            v8_scr[:] = vq8.reshape(B, HKV * HD)
            kscl_scr[:] = ksc[..., 0]
            vscl_scr[:] = vsc[..., 0]

    # ---- ATTN: RBP requests per step, each over its ring-gathered blocks
    @pl.when((t >= P_ATTN) & (t < P_WO))
    def _():
        i = t - P_ATTN
        rows = pl.ds(i * RBP, RBP)
        q = q_scr[rows, :].astype(jnp.float32).reshape(RBP, HQ, HD)
        kcur = kcur_scr[rows, :].astype(jnp.float32).reshape(RBP, HKV, HD)
        vcur = vcur_scr[rows, :].astype(jnp.float32).reshape(RBP, HKV, HD)
        # drain the block-table prefetch issued one layer ago (same live
        # predicates as the issue site — lens are step-constant); the
        # layer-resident scale fetch is waited once, at the first
        # attention step
        @pl.when(t == P_ATTN)
        def _():
            for d in scale_layer_dmas(l):
                d.wait()
        for live, d in kv_block_dmas(l, i):
            @pl.when(live)
            def _(d=d):
                d.wait()
        kq = kvb[i % G, 0]                                # (RBP, SC, flat)
        vq = kvb[i % G, 1]
        # gather each request's scale blocks from the layer-resident pool
        # by table index (in-VMEM page loads — no descriptors); dead
        # columns clamp to the last live block, masked below
        ks_rows, vs_rows = [], []
        for rr in range(RBP):
            r = i * RBP + rr
            last = lens_sp_ref[r] // BS
            kparts, vparts = [], []
            for c in range(MB):
                idx = tables_ref[r, jnp.minimum(c, last)]
                kparts.append(svl[idx, 0])                # (HKV, BS)
                vparts.append(svl[idx, 1])
            ks_rows.append(jnp.concatenate(kparts, axis=-1))
            vs_rows.append(jnp.concatenate(vparts, axis=-1))
        ks = jnp.stack(ks_rows)                           # (RBP, HKV, SC)
        vs = jnp.stack(vs_rows)
        lens = lens_ref[rows, :]                          # (RBP, 1)
        kpos = lax.broadcasted_iota(jnp.int32, (RBP, 1, SC), 2)
        # dead columns were clamped to a live block at issue time — their
        # duplicate content is masked off here
        mask = kpos < lens[:, :, None]

        s_parts, cur_parts = [], []
        for h in range(HKV):
            kh = kq[:, :, h * HD:(h + 1) * HD].astype(jnp.bfloat16)
            qh = q[:, h * group:(h + 1) * group, :].astype(jnp.bfloat16)
            sh = lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
            s_parts.append(sh * (ks[:, h, :][:, None, :] * sm_scale))
            kc_h = kcur[:, h, :][:, None, :]
            cur = jnp.sum(q[:, h * group:(h + 1) * group, :] * kc_h,
                          axis=-1, keepdims=True)
            cur_parts.append(cur * sm_scale)
        s = jnp.concatenate(s_parts, axis=1)              # (RBP, HQ, SC)
        s = jnp.where(mask, s, _NEG_INF)
        s_cur = jnp.concatenate(cur_parts, axis=1)

        m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), s_cur)
        p = jnp.exp(s - m)
        p_cur = jnp.exp(s_cur - m)
        denom = jnp.sum(p, -1, keepdims=True) + p_cur
        o_parts = []
        for h in range(HKV):
            vh = vq[:, :, h * HD:(h + 1) * HD].astype(jnp.bfloat16)
            ph = (p[:, h * group:(h + 1) * group, :]
                  * vs[:, h, :][:, None, :]).astype(jnp.bfloat16)
            pv = lax.dot_general(ph, vh, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
            vc_h = vcur[:, h, :][:, None, :]
            pv = pv + (p_cur[:, h * group:(h + 1) * group, :] * vc_h)
            o_parts.append(pv)
        o = jnp.concatenate(o_parts, axis=1) / denom
        attn_scr[rows, :] = o.reshape(RBP, HQ * HD).astype(attn_scr.dtype)

        if inplace:
            # in-place pool writes: per request, compose the 8-slot int8
            # window of its current block from the (pre-update) ring + the
            # new token, update the scale plane's slot lane in the ring,
            # and DMA both back to the aliased pool buffers (drained at
            # P_GU). Kills the XLA pool-scatter that measured +6.8 ms/step
            # at 7B. The new-token rows/scales are loaded as ONE
            # (RBP, ...) group block at offset i·RBP — a multiple of 8, so
            # Mosaic can prove sublane alignment; single-row loads at the
            # dynamic per-request index r failed to compile on device
            # ("cannot statically prove that index in dimension 0 is a
            # multiple of 8", caught by the round-4 verify drive — the
            # interpret-mode tests never see Mosaic's tiling rules).
            rows_g = pl.ds(i * RBP, RBP)
            k8g = k8_scr[rows_g, :]                       # (RBP, flat)
            v8g = v8_scr[rows_g, :]
            kslg = kscl_scr[rows_g, :]                    # (RBP, HKV)
            vslg = vscl_scr[rows_g, :]
            for rr in range(RBP):
                r = i * RBP + rr
                off = lens_sp_ref[r]
                c = off // BS
                base8 = ((off % BS) // 8) * 8
                ring0 = c * BS + base8
                win_k = kvb[i % G, 0, rr, pl.ds(ring0, 8), :]  # (8, flat)
                win_v = kvb[i % G, 1, rr, pl.ds(ring0, 8), :]
                sel = (lax.broadcasted_iota(jnp.int32, (8, 1), 0) + base8
                       == off % BS)
                k8r = k8g[rr:rr + 1, :]                   # (1, flat)
                v8r = v8g[rr:rr + 1, :]
                kvwst[i, rr, 0] = jnp.where(sel, k8r, win_k)
                kvwst[i, rr, 1] = jnp.where(sel, v8r, win_v)
                lane = lax.broadcasted_iota(jnp.int32, (HKV, BS), 1)
                ksl = kslg[rr:rr + 1, :].reshape(HKV, 1)
                vsl = vslg[rr:rr + 1, :].reshape(HKV, 1)
                # compose the current block's scale planes from the
                # layer-resident buffer + the new token's lane into the
                # write staging (DMA'd back to the pool at P_GU)
                cur_blk = tables_ref[r, c]
                kvsst[i, rr, 0] = jnp.where(lane == off % BS, ksl,
                                            svl[cur_blk, 0])
                kvsst[i, rr, 1] = jnp.where(lane == off % BS, vsl,
                                            svl[cur_blk, 1])
            for d in pool_write_dmas(i):
                d.start(priority=1)

    @pl.when((t >= P_WO) & (t < P_GU))
    def _():
        j = t - P_WO
        acc = _mm(attn_scr[...], wo_ref[0])
        x_scr[:, pl.ds(j * TNW, TNW)] += acc * swo_ref[0]

    @pl.when(t == P_GU)
    def _():
        h_scr[:] = _rms(x_scr[...], ln2_ref[0], eps).astype(h_scr.dtype)

    @pl.when((t >= P_GU) & (t < P_DN))
    def _():
        j = t - P_GU
        acc = _mm(h_scr[...], wgu_ref[0])
        gu_scr[:, pl.ds(j * TNG, TNG)] = (acc * sgu_ref[0]).astype(
            gu_scr.dtype)

    if not silu_spread:
        @pl.when(t == P_DN)
        def _():
            gate = gu_scr[:, :F].astype(jnp.float32)
            up = gu_scr[:, F:].astype(jnp.float32)
            gu_scr[:, :F] = (jax.nn.silu(gate) * up).astype(gu_scr.dtype)

    @pl.when(t >= P_DN)
    def _():
        j = t - P_DN
        if silu_spread:
            gate = gu_scr[:, pl.ds(j * TK, TK)].astype(jnp.float32)
            up = gu_scr[:, pl.ds(F + j * TK, TK)].astype(jnp.float32)
            ff = (jax.nn.silu(gate) * up).astype(gu_scr.dtype)
        else:
            ff = gu_scr[:, pl.ds(j * TK, TK)]
        acc = lax.dot_general(ff, wdn_ref[0], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
        x_scr[:] += acc * sdn_ref[0]

    @pl.when((l == L - 1) & (t == P_DN + ndn - 1))
    def _():
        xout_ref[...] = x_scr[...].astype(xout_ref.dtype)


def _paged_ring_slots(B: int, MB: int, BS: int, flat: int, NB: int,
                      hkv: int) -> int | None:
    """Ring depth G for the paged value rings: the largest divisor of
    na = B/RBP whose rotating rings (+ the layer-resident scale pools +
    write staging) fit the VMEM ring budget. G == na is the full-depth
    schedule (every request block owns a slot — maximal prefetch slack);
    smaller G trades slack (G-1 attention steps of refill lead instead
    of a full layer) for rings whose size is INDEPENDENT of na — which
    is what lets the fused path cover production KV capacities (round
    5; the r4 full-depth rings capped capacity at 512 tokens at B=64).
    G >= 2 whenever na > 1 so every refill has at least one step of
    lead."""
    RBP = _paged_rbp(B, MB)
    if RBP is None:
        return None
    na = B // RBP
    fixed = (2 * NB * hkv * BS * 4          # layer-resident scale pools
             + 2 * B * 8 * flat             # int8 write staging
             + 2 * B * hkv * BS * 4)        # scale write staging
    budget = (68 << 20) - fixed
    # stretch budget for G=2 only: a 64 MB ring pair compiled and ran at
    # capacity-1024/G=4 (slower than G=2 there — VMEM pressure — but
    # functional), so minimal-depth rings may exceed the comfortable
    # budget when the alternative is no fused path at all
    budget2 = (78 << 20) - fixed
    slot = 2 * RBP * MB * BS * flat         # K+V ring bytes per slot
    for g in sorted((d for d in range(1, na + 1) if na % d == 0),
                    reverse=True):
        if g == 1 and na > 1:
            continue  # zero refill lead — the gate treats it as no-fit
        if g * slot <= (budget if g > 2 else budget2):
            return g
    return None


def fused_paged_decode_ok(cfg, B: int, MB: int, BS: int,
                          NB: int | None = None) -> bool:
    """Static eligibility of the fused paged path (mirrors the dense
    _fused_decode_ok gates): INT8 pools with TPU-tileable shapes and a
    rotating-ring depth (+ layer-resident scale pools) that fits VMEM.
    NB: total pool rows (incl. trash block); defaults to a B·MB+spares
    estimate when the caller doesn't know the pool yet."""
    if getattr(cfg, "num_experts", 0) > 0 or cfg.act_quant != "none":
        return False
    if cfg.head_dim % 128 != 0 or cfg.hidden_dim % 128 != 0:
        return False
    # value-ring regions are sliced per BS column — manual DMA slices
    # must be lane-aligned (128)
    if BS % 128 != 0:
        return False
    flat = cfg.num_kv_heads * cfg.head_dim
    if NB is None:
        NB = B * MB + 33
    return _paged_ring_slots(B, MB, BS, flat, NB,
                             cfg.num_kv_heads) is not None


def _paged_rbp(B: int, MB: int) -> int | None:
    """Requests per attention grid step. 8 exactly: scratch row slices
    (q/attn at rows [i·RBP, (i+1)·RBP)) must start on a sublane multiple
    of 8 for Mosaic's vector loads. MB is no longer bounded — KV blocks
    arrive via manual block-table DMA into ring buffers, not an operand
    fan, so capacity is limited only by ring VMEM (fused_paged_decode_ok)."""
    return 8 if B % 8 == 0 else None


@functools.partial(jax.jit, static_argnames=("cfg", "interpret", "tn_target",
                                             "wmajor", "silu_spread",
                                             "inplace", "ring_slots"))
def fused_paged_decode_step(params, x, kv_pool, kvs_pool,
                            tables, lengths, rope_cos_g, rope_sin_g, cfg,
                            interpret: bool | None = None,
                            tn_target: int = 512, wmajor: bool = False,
                            silu_spread: bool = False,
                            inplace: bool = False,
                            ring_slots: int | None = None):
    """One full decode step over all layers, KV in paged INT8 pools.

    kv_pool: (L, NB, 2, BS, Hkv·hd) int8 — each block's K page (dim-2
    index 0) and V page (index 1) co-located so ONE DMA descriptor moves
    both (descriptors, not bytes, are the measured paged premium);
    kvs_pool: (L, NB, 2, Hkv, BS) f32 scales, same pairing (merged
    QuantKV paged layouts, serve/paged_engine.py).
    tables: (B, MB) int32; lengths: (B,) tokens already cached (the new
    token lands at `lengths`). Block tables must cover lengths+1.

    Returns (x_out, k_new (L,B,Hkv·hd) int8, ksc (L,B,Hkv), v_new, vsc) —
    the caller scatters new K/V into the pools (models/paged_transformer).

    inplace=True: the kernel ALSO writes the new K/V into the pools itself
    (aliased buffers, manual window DMAs at the attention steps) and
    additionally returns (kv_pool', kvs_pool') — the caller uses those
    directly and skips the XLA scatter, which measured +6.8 ms/step at
    7B B=64 (docs/PERF.md round-3 paged section).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, D = x.shape
    L, NB, _two, BS, flat_hd = kv_pool.shape
    assert _two == 2 and kvs_pool.shape[2] == 2
    MB = tables.shape[1]
    HQ, HKV, HD = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    F = cfg.intermediate_dim
    QO = (HQ + 2 * HKV) * HD
    assert flat_hd == HKV * HD
    RBP = _paged_rbp(B, MB)
    assert RBP is not None, f"no RBP for B={B} MB={MB}"
    # rotating value-ring depth (see _paged_ring_slots); ring_slots
    # overrides for tests exercising rotation at interpret-mode shapes
    G = ring_slots or _paged_ring_slots(B, MB, BS, flat_hd, NB, HKV)
    assert G is not None and (B // RBP) % G == 0, \
        f"no ring depth for B={B} MB={MB} BS={BS} (VMEM)"

    TNQ = _pick_tile(QO, tn_target)
    TNW = _pick_tile(D, tn_target)
    TNG = _pick_tile(2 * F, tn_target)
    TK = _pick_tile(F, tn_target)
    nq, na, nwo = QO // TNQ, B // RBP, D // TNW
    ngu, ndn = 2 * F // TNG, F // TK
    T = nq + na + nwo + ngu + ndn
    P_ATTN, P_WO = nq, nq + na
    P_GU, P_DN = P_WO + nwo, P_WO + nwo + ngu

    wqkv, wo = params["wqkv"], params["wo"]
    wgu, wdn = params["w_gate_up"], params["w_down"]

    # S slot in the tuple is unused by the paged kernel (capacity = MB·BS)
    cfgk = (L, B, 0, D, F, HQ, HKV, HD, QO, TNQ, TNW, TNG, TK, RBP, MB, BS,
            nq, na, nwo, ngu, ndn, cfg.norm_eps, wmajor, silu_spread,
            inplace, G)
    kernel = functools.partial(_paged_kernel_r5, cfgk=cfgk)

    def win(lo, hi, maker):
        return lambda l, t, tb, ln: maker(l, jnp.clip(t - lo, 0, hi - lo - 1))

    w_spec = lambda K, TN, lo, hi: (
        pl.BlockSpec((1, TN, K), win(lo, hi, lambda l, j: (l, j, 0)))
        if wmajor else
        pl.BlockSpec((1, K, TN), win(lo, hi, lambda l, j: (l, 0, j))))
    in_specs = [
        pl.BlockSpec((B, D), lambda l, t, tb, ln: (0, 0)),            # x0
        pl.BlockSpec((1, 1, D), lambda l, t, tb, ln: (l, 0, 0)),      # ln1
        pl.BlockSpec((1, 1, D), lambda l, t, tb, ln: (l, 0, 0)),      # ln2
        w_spec(D, TNQ, 0, nq),                                        # wqkv
        pl.BlockSpec((1, 1, TNQ), win(0, nq, lambda l, j: (l, 0, j))),
        w_spec(HQ * HD, TNW, P_WO, P_GU),                             # wo
        pl.BlockSpec((1, 1, TNW), win(P_WO, P_GU, lambda l, j: (l, 0, j))),
        w_spec(D, TNG, P_GU, P_DN),                                   # wgu
        pl.BlockSpec((1, 1, TNG), win(P_GU, P_DN, lambda l, j: (l, 0, j))),
        pl.BlockSpec((1, TK, D), win(P_DN, P_DN + ndn,                # wdn
                                     lambda l, j: (l, j, 0))),
        pl.BlockSpec((1, 1, D), lambda l, t, tb, ln: (l, 0, 0)),      # sdn
        pl.BlockSpec((B, HD // 2), lambda l, t, tb, ln: (0, 0)),      # cos
        pl.BlockSpec((B, HD // 2), lambda l, t, tb, ln: (0, 0)),      # sin
        pl.BlockSpec((B, 1), lambda l, t, tb, ln: (0, 0)),            # lens
        # KV pools: raw HBM refs read by the kernel's block-table DMA
        pl.BlockSpec(memory_space=pl.ANY),                            # kv
        pl.BlockSpec(memory_space=pl.ANY),                            # kvs
    ]

    out_specs = [
        pl.BlockSpec((B, D), lambda l, t, tb, ln: (0, 0)),
        pl.BlockSpec((1, B, HKV * HD), lambda l, t, tb, ln: (l, 0, 0)),
        pl.BlockSpec((1, B, HKV), lambda l, t, tb, ln: (l, 0, 0)),
        pl.BlockSpec((1, B, HKV * HD), lambda l, t, tb, ln: (l, 0, 0)),
        pl.BlockSpec((1, B, HKV), lambda l, t, tb, ln: (l, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, D), x.dtype),
        jax.ShapeDtypeStruct((L, B, HKV * HD), jnp.int8),
        jax.ShapeDtypeStruct((L, B, HKV), jnp.float32),
        jax.ShapeDtypeStruct((L, B, HKV * HD), jnp.int8),
        jax.ShapeDtypeStruct((L, B, HKV), jnp.float32),
    ]
    aliases = {}
    if inplace:
        out_specs += [pl.BlockSpec(memory_space=pl.ANY)] * 2
        out_shape += [
            jax.ShapeDtypeStruct(kv_pool.shape, jnp.int8),
            jax.ShapeDtypeStruct(kvs_pool.shape, jnp.float32),
        ]
        # input indices include the 2 scalar-prefetch args; pools are the
        # last two inputs -> in-place aliased to outputs 5-6
        aliases = {16: 5, 17: 6}

    bf = jnp.bfloat16
    lens2 = jnp.asarray(lengths, jnp.int32).reshape(B, 1)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(L, T),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((B, D), jnp.float32),        # x
                pltpu.VMEM((B, D), bf),                 # h / h2
                pltpu.VMEM((B, QO), bf),                # qkv
                pltpu.VMEM((B, HQ * HD), bf),           # q (post-rope)
                pltpu.VMEM((B, HKV * HD), bf),          # k current
                pltpu.VMEM((B, HKV * HD), bf),          # v current
                pltpu.VMEM((B, HQ * HD), bf),           # attn out
                pltpu.VMEM((B, 2 * F), bf),             # gate|up → ff
                pltpu.VMEM((B, HKV * HD), jnp.int8),    # k current int8
                pltpu.VMEM((B, HKV * HD), jnp.int8),    # v current int8
                pltpu.VMEM((B, HKV), jnp.float32),      # k scale
                pltpu.VMEM((B, HKV), jnp.float32),      # v scale
                # K+V co-located ring: slicing dim 1 at 0/1 yields
                # contiguous (RBP, SC, flat) K / V views
                pltpu.VMEM((G, 2, RBP, MB * BS, flat_hd), jnp.int8),
                # layer-resident merged scale pool (1 descriptor/layer)
                pltpu.VMEM((NB, 2, HKV, BS), jnp.float32),
                *([
                    pltpu.VMEM((na, RBP, 2, 8, flat_hd), jnp.int8),  # kv st
                    pltpu.VMEM((na, RBP, 2, HKV, BS), jnp.float32),  # s st
                ] if inplace else []),
                pltpu.SemaphoreType.DMA((G, 1)),        # block-read sems
                pltpu.SemaphoreType.DMA((1, 1)),        # layer-scale sem
                *([pltpu.SemaphoreType.DMA((na, 2))]    # pool-write sems
                  if inplace else []),
            ],
        ),
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=108 * 1024 * 1024,  # v5e has 128 MB; stretch-G=2 rings need ~101
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (L * (D * QO + HQ * HD * D + 2 * D * F + F * D)
                           + 2 * HQ * HD * MB * BS * L),
            bytes_accessed=(wqkv.q.nbytes + wo.q.nbytes + wgu.q.nbytes
                            + wdn.q.nbytes
                            + 2 * L * B * MB * BS * flat_hd),
            transcendentals=B * HQ * MB * BS * L),
        interpret=interpret,
    )(tables.astype(jnp.int32), jnp.asarray(lengths, jnp.int32),
      x, params["ln1"][:, None], params["ln2"][:, None],
      wqkv.q, wqkv.s, wo.q, wo.s, wgu.q, wgu.s, wdn.q, wdn.s,
      rope_cos_g, rope_sin_g, lens2, kv_pool, kvs_pool)
    return tuple(out)


def _pick_tile(dim: int, target: int) -> int:
    for c in (target, 512, 256, 128):
        if c <= target and dim % c == 0:
            return c
    return dim


def _pick_ktile(k: int, row_bytes: int, cap: int = 3 << 20) -> int:
    """Largest power-of-2 K-tile dividing k whose (tile × N-row) block
    stays under `cap` bytes (double-buffered tiles; int8 rows)."""
    for c in (1024, 512, 256, 128, 64, 32, 16, 8):
        if k % c == 0 and c * row_bytes <= cap:
            return c
    return k


def int4_group_size(k: int, n: int) -> int:
    """The K-tile the kernel uses for an INT4 (K, N) matrix — and therefore
    the scale GROUP size (models/quant.QuantizedTensor4: one scale row per
    kernel tile, so group-wise scales factor out of each tile's matmul).
    Packed rows are n//2 bytes."""
    return _pick_ktile(k, n // 2)


def fused_decode_step(params, x, k_q, k_s, v_q, v_s, q_slot, valid_from,
                      rope_cos_g, rope_sin_g, cfg, slot=None,
                      write_cache: bool = False,
                      interpret: bool | None = None):
    """Entry point: reads the tile-tuning env vars OUTSIDE the jit so they
    participate in the compile cache key (changing FUSED_TN/FUSED_RB_BYTES
    after a first compile takes effect instead of being silently ignored)."""
    import os

    from ..models.quant import QuantizedTensor4

    tn_target = int(os.environ.get("FUSED_TN", "512"))
    rb_bytes = int(os.environ.get("FUSED_RB_BYTES", str(1 << 20)))
    silu_spread = os.environ.get("FUSED_SILU", "spread") == "spread"
    kblock = os.environ.get("FUSED_WL", "kblock") == "kblock"
    kv_prefetch = os.environ.get("FUSED_KVP", "1") != "0"
    w4 = isinstance(params["wqkv"], QuantizedTensor4)
    # N-major weights: auto-detected from the wqkv orientation (see
    # to_nmajor) so callers holding either layout hit the right kernel
    QO = (cfg.num_heads + 2 * cfg.num_kv_heads) * cfg.head_dim
    wmajor = (not w4 and params["wqkv"].q.shape[1] == QO
              and QO != cfg.hidden_dim)
    kvp_slots = int(os.environ.get("FUSED_KVP_SLOTS", "0")) or None
    return _fused_decode_step(params, x, k_q, k_s, v_q, v_s, q_slot,
                              valid_from, rope_cos_g, rope_sin_g, cfg=cfg,
                              slot=slot, write_cache=write_cache,
                              interpret=interpret, tn_target=tn_target,
                              rb_bytes=rb_bytes, wmajor=wmajor,
                              silu_spread=silu_spread,
                              kblock=(kblock and not wmajor) or w4, w4=w4,
                              kv_prefetch=kv_prefetch, kvp_slots=kvp_slots)


def to_nmajor(blocks: dict) -> dict:
    """Transpose the stacked matmul weights to N-major storage.

    The kernel's weight tiles are windows over the output (N) dimension;
    with the natural (L, K, N) layout each (K, TN) tile is K strided
    segments of TN bytes — at TN=512 that's 512-byte DMA runs, well under
    the size where HBM streams at full rate. Stored (L, N, K), every tile
    is ONE contiguous (TN·K)-byte read. w_down already contracts over its
    leading (F) dim so its tiles are contiguous either way — left as is.
    Scales are per-output-channel (L, 1, N): unchanged.
    """
    out = dict(blocks)
    for name in ("wqkv", "wo", "w_gate_up"):
        t = blocks[name]
        out[name] = type(t)(q=jnp.swapaxes(t.q, 1, 2), s=t.s)
    return out


@functools.partial(jax.jit, static_argnames=("cfg", "write_cache",
                                             "interpret", "tn_target",
                                             "rb_bytes", "wmajor",
                                             "silu_spread", "kblock", "w4",
                                             "kv_prefetch", "kvp_slots"))
def _fused_decode_step(params, x, k_q, k_s, v_q, v_s, q_slot, valid_from,
                       rope_cos_g, rope_sin_g, cfg, slot=None,
                       write_cache: bool = False,
                       interpret: bool | None = None,
                       tn_target: int = 512, rb_bytes: int = 1 << 20,
                       wmajor: bool = False, silu_spread: bool = True,
                       kblock: bool = False, w4: bool = False,
                       kv_prefetch: bool = False,
                       kvp_slots: int | None = None):
    """One full decode step over all layers.

    params: the model's quantized "blocks" dict (stacked QuantizedTensors:
      wqkv (L,D,QO), wo (L,Hq·hd,D), w_gate_up (L,D,2F), w_down (L,F,D),
      ln1/ln2 (L,D)).
    x: (B, D) current hidden states (embedded token).
    k_q/v_q: (L, B, S, Hkv·hd) int8; k_s/v_s: (L, B, Hkv, S) f32.
    q_slot/valid_from: (B,) int32 — current cache slot / first valid slot.
    rope_cos_g/rope_sin_g: (B, hd/2) f32 — rope tables pre-gathered at each
      request's position.
    slot + write_cache=True: uniform write slot (scalar int32) — the cache
      is updated IN PLACE (aliased buffers) and returned.

    Returns (x_out, k_q', k_s', v_q', v_s') with write_cache (updated cache
    buffers), else (x_out, k_new (L,B,Hkv·hd) int8, ksc (L,B,Hkv) f32,
    v_new, vsc) for the caller to scatter.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, D = x.shape
    L, _, S, flat_hd = k_q.shape
    HQ, HKV, HD = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    F = cfg.intermediate_dim
    QO = (HQ + 2 * HKV) * HD
    assert flat_hd == HKV * HD
    assert (slot is not None) == write_cache

    act8 = getattr(cfg, "act_quant", "none") == "int8"
    if act8:
        kblock = False  # the a8 row buffer is N-phase shaped; rarely-used knob
    assert not (w4 and not kblock), "int4 weights require K-blocked tiles"
    if w4:
        # INT4: packed rows are N/2 bytes; K-tiles == scale groups by
        # construction (int4_group_size — the quantizer uses the same fn),
        # so each tile's single scale row factors out of its matmul
        TNQ = int4_group_size(D, QO)
        TNW = int4_group_size(HQ * HD, D)
        TNG = int4_group_size(D, 2 * F)
        TK = int4_group_size(F, D)
        nq, nwo, ngu = D // TNQ, HQ * HD // TNW, D // TNG
    elif kblock:
        # K-blocked tiles: window the contraction dim, span full N — every
        # weight tile is ONE contiguous HBM read from the canonical
        # (L, K, N) layout (an N-windowed tile is K strided segments of TN
        # bytes; 512-byte runs stream well under peak rate — measured
        # ~14% of the step lost to it at 7B, docs/PERF.md). Partial sums
        # accumulate in f32 scratch; per-output-channel scales commute
        # with the K-sum so each partial is scaled independently.
        TNQ = _pick_ktile(D, QO)
        TNW = _pick_ktile(HQ * HD, D)
        TNG = _pick_ktile(D, 2 * F)
        TK = _pick_tile(F, tn_target)
        nq, nwo, ngu = D // TNQ, HQ * HD // TNW, D // TNG
    else:
        # Per-PHASE tile widths: each matmul stream picks the largest
        # target-bounded tile dividing ITS OWN output dim. A single global
        # gcd-based width collapses to 128-256 whenever F has an odd factor
        # (Llama F=11008 = 2^8·43 forces TN=256 → 177 grid steps/layer at
        # 7B, each paying pipeline prologue/epilogue); per-phase widths
        # keep QKV/WO at 512+ regardless. GU tiles may cross the gate/up
        # boundary inside gu_scr — the silu step reads the halves by
        # offset, not by tile, so only 2F-divisibility matters. TK must
        # divide F (the DOWN phase re-reads ff from the gate half).
        TNQ = _pick_tile(QO, tn_target)
        TNW = _pick_tile(D, tn_target)
        TNG = _pick_tile(2 * F, tn_target)
        TK = _pick_tile(F, tn_target)
        nq, nwo = QO // TNQ, D // TNW
        ngu = 2 * F // TNG
    RB = B
    for rb in range(8, B + 1, 8):
        if B % rb == 0 and rb * S * flat_hd >= rb_bytes:
            RB = rb
            break
    na, ndn = B // RB, F // TK
    T = nq + na + nwo + ngu + ndn

    # kvp: manual KV streaming with one-layer lookahead (see _kernel).
    # Requires the uniform-slot in-place write path, issue slots in the
    # DOWN phase (ndn >= na), and a WHOLE working set (rings + staging +
    # activation scratch + weight double-buffers) under the scoped-VMEM
    # limit — the ring alone passing cost a 104 MB > 100 MB compile OOM at
    # B=128/w4. When full na-deep value rings don't fit (B=128: 67 MB),
    # the rings ROTATE through G < na slots (round 4): group j reads slot
    # j % G, refilled as soon as its previous occupant's attention step
    # has consumed it — shallower lookahead (G-1 attention steps instead
    # of a full layer) in exchange for na/G× less ring VMEM. Scale rings
    # and staging windows stay na-deep (they also carry the in-place
    # cache-write planes for the whole attention phase).
    act_vmem = (B * D * 6                        # x f32 + h bf16
                + B * QO * (4 if (kblock or w4) else 2)   # qkv acc
                + B * 2 * F * (4 if (kblock or w4) else 2)  # gate|up acc
                + B * HQ * HD * 4                # q + attn bf16
                + B * flat_hd * 7                # kcur/vcur bf16 + int8
                + B * max(D, HQ * HD, F))        # act8 row
    kvp, G = False, na
    if kv_prefetch and write_cache and not act8 and ndn >= na \
            and S % 128 == 0:
        # default: FULL rings or nothing. Rotation (G < na) was measured
        # NET SLOWER where it would engage (INT4 B=128: 16.4 vs the v1
        # path's 15.4 ms/step, round 4): at B=128 the step is MXU-bound
        # (M rows full), so the prefetch hides no stall while its
        # per-descriptor scalar cost (~0.27 µs × 4 streams × na groups
        # per layer ≈ 1 ms/step) is pure overhead. FUSED_KVP_SLOTS opts
        # rotation in for memory-bound geometries that exceed VMEM.
        slot_opts = (kvp_slots,) if kvp_slots else (na,)
        for g in slot_opts:
            # g == na is the full-ring schedule (any na, incl. 1);
            # rotation needs >= 2 slots and a slot count dividing na
            if g != na and (g < 2 or na % g):
                continue
            kvp_vmem = (2 * g * RB * S * flat_hd      # int8 value rings
                        + 2 * na * RB * HKV * S * 4   # f32 scale rings
                        + 2 * na * RB * 8 * flat_hd)  # int8 staging
            if kvp_vmem + act_vmem + (20 << 20) <= (98 << 20):
                kvp, G = True, g
                break

    wqkv, wo = params["wqkv"], params["wo"]
    wgu, wdn = params["w_gate_up"], params["w_down"]

    cfgk = (L, B, S, D, F, HQ, HKV, HD, QO, TNQ, TNW, TNG, TK, RB, nq, na,
            nwo, ngu, ndn, cfg.norm_eps, write_cache, act8, wmajor,
            silu_spread, kblock, w4, kvp, G)
    kernel = functools.partial(_kernel, cfgk=cfgk)

    P_ATTN, P_WO = nq, nq + na
    P_GU, P_DN = P_WO + nwo, P_WO + nwo + ngu

    def win(lo, hi, maker):
        # clamp t into [lo, hi) so out-of-window steps repeat an index
        # (their DMA is elided)
        return lambda l, t, sr: maker(l, jnp.clip(t - lo, 0, hi - lo - 1))

    qslot2 = jnp.asarray(q_slot, jnp.int32).reshape(B, 1)
    vfrom2 = (jnp.zeros((B, 1), jnp.int32) if valid_from is None
              else jnp.asarray(valid_from, jnp.int32).reshape(B, 1))
    slot_arr = jnp.asarray(slot if slot is not None else 0,
                           jnp.int32).reshape(1)

    def attn_win(maker):
        return win(P_ATTN, P_WO, maker)

    if write_cache and kvp:
        # cache outputs are written by the kernel's manual DMA (aliased
        # in-place HBM buffers) — no pipelined blocks
        out_specs = [
            pl.BlockSpec((B, D), lambda l, t, sr: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((B, D), x.dtype),
            jax.ShapeDtypeStruct(k_q.shape, jnp.int8),
            jax.ShapeDtypeStruct(k_s.shape, jnp.float32),
            jax.ShapeDtypeStruct(v_q.shape, jnp.int8),
            jax.ShapeDtypeStruct(v_s.shape, jnp.float32),
        ]
        aliases = {12: 1, 13: 2, 14: 3, 15: 4}
    elif write_cache:
        out_specs = [
            pl.BlockSpec((B, D), lambda l, t, sr: (0, 0)),
            pl.BlockSpec((1, RB, 8, flat_hd),
                         lambda l, t, sr: (
                             l, jnp.clip(t - P_ATTN, 0, na - 1),
                             sr[0] // 8, 0)),
            pl.BlockSpec((1, RB, HKV, S),
                         lambda l, t, sr: (
                             l, jnp.clip(t - P_ATTN, 0, na - 1), 0, 0)),
            pl.BlockSpec((1, RB, 8, flat_hd),
                         lambda l, t, sr: (
                             l, jnp.clip(t - P_ATTN, 0, na - 1),
                             sr[0] // 8, 0)),
            pl.BlockSpec((1, RB, HKV, S),
                         lambda l, t, sr: (
                             l, jnp.clip(t - P_ATTN, 0, na - 1), 0, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((B, D), x.dtype),
            jax.ShapeDtypeStruct(k_q.shape, jnp.int8),
            jax.ShapeDtypeStruct(k_s.shape, jnp.float32),
            jax.ShapeDtypeStruct(v_q.shape, jnp.int8),
            jax.ShapeDtypeStruct(v_s.shape, jnp.float32),
        ]
        # input indices INCLUDE the scalar-prefetch slot arg: slot=0, x0=1,
        # … kq=12 ks=13 vq=14 vs=15 → outputs 1-4: the cache updates in place
        aliases = {12: 1, 13: 2, 14: 3, 15: 4}
    else:
        out_specs = [
            pl.BlockSpec((B, D), lambda l, t, sr: (0, 0)),
            pl.BlockSpec((1, B, HKV * HD), lambda l, t, sr: (l, 0, 0)),
            pl.BlockSpec((1, B, HKV), lambda l, t, sr: (l, 0, 0)),
            pl.BlockSpec((1, B, HKV * HD), lambda l, t, sr: (l, 0, 0)),
            pl.BlockSpec((1, B, HKV), lambda l, t, sr: (l, 0, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((B, D), x.dtype),
            jax.ShapeDtypeStruct((L, B, HKV * HD), jnp.int8),
            jax.ShapeDtypeStruct((L, B, HKV), jnp.float32),
            jax.ShapeDtypeStruct((L, B, HKV * HD), jnp.int8),
            jax.ShapeDtypeStruct((L, B, HKV), jnp.float32),
        ]
        aliases = {}

    bf = jnp.bfloat16
    if w4:
        # group-wise scales (L, K//G, N) flattened to (L·(K//G), 1, N):
        # the per-tile scale row rides the untiled leading dim (Mosaic
        # rejects a (1,1,N) block over a second-minor dim not % 8)
        def _s3(t):
            l_, g_, n_ = t.s.shape
            return t.s.reshape(l_ * g_, 1, n_)

        sqkv_a, swo_a, sgu_a, sdn_a = map(_s3, (wqkv, wo, wgu, wdn))
    else:
        sqkv_a, swo_a, sgu_a, sdn_a = wqkv.s, wo.s, wgu.s, wdn.s
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(L, T),
            in_specs=[
                pl.BlockSpec((B, D), lambda l, t, sr: (0, 0)),          # x0
                pl.BlockSpec((1, 1, D), lambda l, t, sr: (l, 0, 0)),    # ln1
                pl.BlockSpec((1, 1, D), lambda l, t, sr: (l, 0, 0)),    # ln2
                # weight tiles — four layouts:
                #   w4: K-windowed over nibble-packed (L,K,N/2) storage;
                #     scales per (K-group == tile, channel) → windowed (l,j)
                #   kblock (default): K-windowed, full-N rows → contiguous
                #     reads from the canonical (L,K,N) storage; scales span
                #     full N (constant per layer within the phase)
                #   wmajor: N-windowed over transposed (L,N,K) storage
                #   legacy: N-windowed over (L,K,N) (strided segments)
                (pl.BlockSpec((1, TNQ, QO // 2), win(0, nq,             # wqkv
                                                     lambda l, j: (l, j, 0)))
                 if w4 else
                 pl.BlockSpec((1, TNQ, QO), win(0, nq,
                                                lambda l, j: (l, j, 0)))
                 if kblock else
                 pl.BlockSpec((1, TNQ, D), win(0, nq,
                                               lambda l, j: (l, j, 0)))
                 if wmajor else
                 pl.BlockSpec((1, D, TNQ), win(0, nq,
                                               lambda l, j: (l, 0, j)))),
                (pl.BlockSpec((1, 1, QO), win(0, nq,
                                              lambda l, j: (l * nq + j,
                                                            0, 0)))
                 if w4 else
                 pl.BlockSpec((1, 1, QO), lambda l, t, sr: (l, 0, 0))
                 if kblock else
                 pl.BlockSpec((1, 1, TNQ), win(0, nq,
                                               lambda l, j: (l, 0, j)))),
                (pl.BlockSpec((1, TNW, D // 2), win(P_WO, P_GU,         # wo
                                                    lambda l, j: (l, j, 0)))
                 if w4 else
                 pl.BlockSpec((1, TNW, D), win(P_WO, P_GU,
                                               lambda l, j: (l, j, 0)))
                 if kblock else
                 pl.BlockSpec((1, TNW, HQ * HD), win(P_WO, P_GU,
                                                     lambda l, j: (l, j, 0)))
                 if wmajor else
                 pl.BlockSpec((1, HQ * HD, TNW), win(P_WO, P_GU,
                                                     lambda l, j: (l, 0, j)))),
                (pl.BlockSpec((1, 1, D), win(P_WO, P_GU,
                                             lambda l, j: (l * nwo + j,
                                                           0, 0)))
                 if w4 else
                 pl.BlockSpec((1, 1, D), lambda l, t, sr: (l, 0, 0))
                 if kblock else
                 pl.BlockSpec((1, 1, TNW), win(P_WO, P_GU,
                                               lambda l, j: (l, 0, j)))),
                (pl.BlockSpec((1, TNG, F), win(P_GU, P_DN,              # wgu
                                               lambda l, j: (l, j, 0)))
                 if w4 else
                 pl.BlockSpec((1, TNG, 2 * F), win(P_GU, P_DN,
                                                   lambda l, j: (l, j, 0)))
                 if kblock else
                 pl.BlockSpec((1, TNG, D), win(P_GU, P_DN,
                                               lambda l, j: (l, j, 0)))
                 if wmajor else
                 pl.BlockSpec((1, D, TNG), win(P_GU, P_DN,
                                               lambda l, j: (l, 0, j)))),
                (pl.BlockSpec((1, 1, 2 * F), win(P_GU, P_DN,
                                                 lambda l, j: (l * ngu + j,
                                                               0, 0)))
                 if w4 else
                 pl.BlockSpec((1, 1, 2 * F), lambda l, t, sr: (l, 0, 0))
                 if kblock else
                 pl.BlockSpec((1, 1, TNG), win(P_GU, P_DN,
                                               lambda l, j: (l, 0, j)))),
                (pl.BlockSpec((1, TK, D // 2), win(P_DN, P_DN + ndn,    # wdn
                                                   lambda l, j: (l, j, 0)))
                 if w4 else
                 pl.BlockSpec((1, TK, D), win(P_DN, P_DN + ndn,
                                              lambda l, j: (l, j, 0)))),
                (pl.BlockSpec((1, 1, D), win(P_DN, P_DN + ndn,
                                             lambda l, j: (l * ndn + j,
                                                           0, 0)))
                 if w4 else
                 pl.BlockSpec((1, 1, D), lambda l, t, sr: (l, 0, 0))),  # sdn
                # KV streams: auto-pipelined blocks, or raw HBM refs read
                # by the kernel's own deep-lookahead DMA when kvp
                *([pl.BlockSpec(memory_space=pl.ANY)] * 4 if kvp else [
                    pl.BlockSpec((1, RB, S, flat_hd),                   # kq
                                 attn_win(lambda l, i: (l, i, 0, 0))),
                    pl.BlockSpec((1, RB, HKV, S),
                                 attn_win(lambda l, i: (l, i, 0, 0))),
                    pl.BlockSpec((1, RB, S, flat_hd),                   # vq
                                 attn_win(lambda l, i: (l, i, 0, 0))),
                    pl.BlockSpec((1, RB, HKV, S),
                                 attn_win(lambda l, i: (l, i, 0, 0))),
                ]),
                pl.BlockSpec((B, HD // 2), lambda l, t, sr: (0, 0)),    # cos
                pl.BlockSpec((B, HD // 2), lambda l, t, sr: (0, 0)),    # sin
                pl.BlockSpec((B, 1), lambda l, t, sr: (0, 0)),          # qslot
                pl.BlockSpec((B, 1), lambda l, t, sr: (0, 0)),          # vfrom
            ],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((B, D), jnp.float32),        # x
                pltpu.VMEM((B, D), bf),                 # h / h2
                # kblock accumulates K-partials → f32 accumulators
                pltpu.VMEM((B, QO), jnp.float32 if kblock else bf),  # qkv
                pltpu.VMEM((B, HQ * HD), bf),           # q (post-rope)
                pltpu.VMEM((B, HKV * HD), bf),          # k current
                pltpu.VMEM((B, HKV * HD), bf),          # v current
                pltpu.VMEM((B, HQ * HD), bf),           # attn out
                pltpu.VMEM((B, 2 * F),
                           jnp.float32 if kblock else bf),  # gate|up → ff
                pltpu.VMEM((B, HKV * HD), jnp.int8),    # k current int8
                pltpu.VMEM((B, HKV * HD), jnp.int8),    # v current int8
                pltpu.VMEM((B, HKV), jnp.float32),      # k scale
                pltpu.VMEM((B, HKV), jnp.float32),      # v scale
                pltpu.VMEM((B, max(D, HQ * HD, F)), jnp.int8),  # act int8
                pltpu.VMEM((B, 1), jnp.float32),        # act row scale
                *([
                    pltpu.VMEM((G, RB, S, flat_hd), jnp.int8),    # kq ring
                    pltpu.VMEM((G, RB, S, flat_hd), jnp.int8),    # vq ring
                    pltpu.VMEM((na, RB, HKV, S), jnp.float32),    # ks ring
                    pltpu.VMEM((na, RB, HKV, S), jnp.float32),    # vs ring
                    pltpu.VMEM((na, RB, 8, flat_hd), jnp.int8),   # k stage
                    pltpu.VMEM((na, RB, 8, flat_hd), jnp.int8),   # v stage
                    pltpu.SemaphoreType.DMA((na, 4)),             # read sems
                    pltpu.SemaphoreType.DMA((na, 4)),             # write sems
                ] if kvp else []),
            ],
        ),
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (L * (D * QO + HQ * HD * D + 2 * D * F + F * D)
                           + 2 * HQ * HD * S * L),
            bytes_accessed=(wqkv.q.nbytes + wo.q.nbytes + wgu.q.nbytes
                            + wdn.q.nbytes + k_q.nbytes + v_q.nbytes
                            + k_s.nbytes + v_s.nbytes),
            transcendentals=B * HQ * S * L),
        interpret=interpret,
    )(slot_arr, x, params["ln1"][:, None], params["ln2"][:, None],
      wqkv.q, sqkv_a, wo.q, swo_a, wgu.q, sgu_a, wdn.q, sdn_a,
      k_q, k_s, v_q, v_s, rope_cos_g, rope_sin_g, qslot2, vfrom2)
    return tuple(out)
