"""Prefill (TTFT) attribution at the 7B headline shape.

TTFT p50 at the headline bench = one batched prefill of 64x128 tokens
(~97 TFLOP) — measured ~64% of peak bf16 MXU in round 2 with no breakdown.
This probe splits the gap:

  1. full prefill forward (the real path: int8 weights dequantized inside
     kernels/int8_matmul.py per tile)
  2. matmul-only replica with the SAME int8 weights (isolates attention +
     glue from the matmul stream)
  3. matmul-only with pre-dequantized bf16 weights via jnp.dot (isolates
     the in-kernel dequant + tiling overhead vs XLA's native path)
  4. physics: FLOP / peak-bf16

Usage: python scripts/probe_prefill.py [--batch 64] [--prompt 128]
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--prompt", type=int, default=128)
    ap.add_argument("--layers", type=int, default=8,
                    help="timed layers (scaled up to 32 in the report; "
                         "8 keeps compile+run short)")
    ap.add_argument("--arms", default="full,int8,bf16",
                    help="comma list of arms to run (the m=8192 Pallas "
                         "int8 arm took a 40-min remote compile that "
                         "broke the relay transport in round 4 — skip it "
                         "with --arms full,bf16)")
    args = ap.parse_args()
    arms = set(args.arms.split(","))

    from physics_llm_inference_tpu.models import ModelConfig
    from physics_llm_inference_tpu.models.quant import init_params_int8
    from physics_llm_inference_tpu.models.transformer import (KVSlice,
                                                              forward)
    from physics_llm_inference_tpu.runtime import KVCache
    from physics_llm_inference_tpu.specs import get_tpu_spec
    from physics_llm_inference_tpu.utils.timing import readout_timed

    L = args.layers
    cfg = ModelConfig(vocab_size=32000, max_seq_len=1024, dtype="bfloat16",
                      hidden_dim=4096, num_layers=L, num_heads=32,
                      num_kv_heads=8, intermediate_dim=11008)
    B, P = args.batch, args.prompt
    params = init_params_int8(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (B, P)), jnp.int32)

    spec = get_tpu_spec()
    T = B * P
    D, F, QO = cfg.hidden_dim, cfg.intermediate_dim, 6144
    mm_flops = 2 * T * L * (D * QO + 4096 * D + 2 * D * F + F * D)
    lm_flops = 2 * B * D * cfg.vocab_size
    attn_flops = 2 * 2 * B * cfg.num_heads * P * P * cfg.head_dim * L
    peak = spec.peak_flops

    # 1. full prefill
    cache = KVCache.create(cfg, B, P + 8, dtype=jnp.int8)

    @jax.jit
    def full(params, ids, kv):
        logits, kvs = forward(params, ids, cfg, kv=kv, last_only=True)
        return logits

    kvs = cache.as_slice()
    import time as _t
    t0 = _t.time()
    full(params, ids, kvs)  # compile
    print(f"[full] compile {_t.time()-t0:.0f}s", flush=True)
    t_full = min(readout_timed(lambda: full(params, ids, kvs))[1]
                 for _ in range(3))
    print(f"[full] {t_full*1e3:.1f} ms", flush=True)

    # 2. matmul-only with the engine's int8 path
    from physics_llm_inference_tpu.models.transformer import _linear
    bl = params["blocks"]

    @jax.jit
    def mm_int8(params, x):
        def body(h, l):
            from physics_llm_inference_tpu.models.transformer import \
                StackedQuant

            qkv = _linear(h, StackedQuant(bl["wqkv"], l))
            o = _linear(qkv[:, :4096], StackedQuant(bl["wo"], l))
            gu = _linear(h + o, StackedQuant(bl["w_gate_up"], l))
            dn = _linear(jax.nn.silu(gu[:, :F]) * gu[:, F:],
                         StackedQuant(bl["w_down"], l))
            return h + dn, None

        h, _ = jax.lax.scan(body, x, jnp.arange(L))
        return h

    x = jax.random.normal(jax.random.PRNGKey(1), (T, D)).astype(jnp.bfloat16)
    t0 = _t.time()
    try:
        if "int8" not in arms:
            raise RuntimeError("skipped (--arms)")
        mm_int8(params, x)
        print(f"[mm_int8] compile {_t.time()-t0:.0f}s", flush=True)
        t_mm8 = min(readout_timed(lambda: mm_int8(params, x))[1]
                    for _ in range(3))
        print(f"[mm_int8] {t_mm8*1e3:.1f} ms", flush=True)
    except Exception as e:
        print(f"[mm_int8] FAILED: {str(e)[:120]}", flush=True)
        t_mm8 = float("nan")

    # 3. matmul-only, pre-dequantized bf16 via plain jnp.dot — ONE layer's
    # weights (32 layers of bf16 don't fit HBM at 7B), scanned L times with
    # a salt so XLA can't hoist
    wq = bl["wqkv"].q[0].astype(jnp.bfloat16)
    wo_ = bl["wo"].q[0].astype(jnp.bfloat16)
    wg = bl["w_gate_up"].q[0].astype(jnp.bfloat16)
    wd = bl["w_down"].q[0].astype(jnp.bfloat16)

    @jax.jit
    def mm_bf16(x, wq, wo_, wg, wd):
        def body(h, l):
            h = h + l.astype(jnp.bfloat16) * 1e-8
            qkv = h @ wq
            o = qkv[:, :4096] @ wo_
            gu = (h + o) @ wg
            dn = (jax.nn.silu(gu[:, :F]) * gu[:, F:]) @ wd
            return h + dn, None

        h, _ = jax.lax.scan(body, x, jnp.arange(L))
        return h

    t0 = _t.time()
    try:
        if "bf16" not in arms:
            raise RuntimeError("skipped (--arms)")
        mm_bf16(x, wq, wo_, wg, wd)
        print(f"[mm_bf16] compile {_t.time()-t0:.0f}s", flush=True)
        t_mmb = min(readout_timed(lambda: mm_bf16(x, wq, wo_, wg, wd))[1]
                    for _ in range(3))
    except Exception as e:
        print(f"[mm_bf16] FAILED: {str(e)[:120]}", flush=True)
        t_mmb = float("nan")

    # 4. component arm (round 5): the non-matmul residue priced piece by
    # piece — chained reps of each glue op at the exact prefill shapes.
    if "parts" in arms:
        from physics_llm_inference_tpu.ops.gqa import grouped_sdpa
        from physics_llm_inference_tpu.ops.norms import rms_norm
        from physics_llm_inference_tpu.ops.rope import (apply_rope,
                                                        rope_frequencies)
        from physics_llm_inference_tpu.kernels.quant import quantize_int8
        from physics_llm_inference_tpu.kernels.flash_attention import \
            flash_attention

        key = jax.random.PRNGKey(2)
        HQ, HKV, HD = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        SK = P * 2
        q4 = jax.random.normal(key, (B, HQ, P, HD)).astype(jnp.bfloat16)
        k4 = jax.random.normal(key, (B, HKV, SK, HD)).astype(jnp.bfloat16)
        v4 = jax.random.normal(key, (B, HKV, SK, HD)).astype(jnp.bfloat16)
        iq, ik = jnp.arange(P), jnp.arange(SK)
        mask = (ik[None, :] <= (iq + P)[:, None])[None, None, None]
        h2 = jax.random.normal(key, (T, D)).astype(jnp.bfloat16)
        gu2 = jax.random.normal(key, (T, 2 * F)).astype(jnp.bfloat16)
        kv3 = jax.random.normal(key, (B, P, HKV, HD)).astype(jnp.bfloat16)
        cos_t, sin_t = rope_frequencies(HD, cfg.max_seq_len, cfg.rope_theta)
        pos = jnp.broadcast_to(jnp.arange(P)[None], (B, P))
        ln_w = jnp.ones((D,), jnp.bfloat16)

        def timed(name, fn, *a, reps=64):
            @jax.jit
            def run(*a):
                def step(carry, i):
                    out = fn(carry, i, *a)
                    return out, None
                c0 = a[0]
                c, _ = jax.lax.scan(step, c0, jnp.arange(reps))
                return c
            run(*a)
            dt = min(readout_timed(lambda: run(*a))[1] for _ in range(3))
            print(f"[parts] {name:28s} {dt*1e3:7.2f} ms /{reps} reps "
                  f"= {dt/reps*1e3:6.3f} ms/layer-instance", flush=True)
            return dt

        # attention (dense XLA, the auto choice at Sk=256)
        timed("attn dense (Sq128,Sk256)",
              lambda c, i, q4, k4, v4: grouped_sdpa(
                  c * (1 + i * 1e-8), k4, v4, mask=mask).astype(c.dtype),
              q4, k4, v4)
        timed("attn flash (Sq128,Sk256)",
              lambda c, i, q4, k4, v4: flash_attention(
                  c * (1 + i * 1e-8), k4, v4, q_offset=P,
                  causal=True).astype(c.dtype),
              q4, k4, v4)
        # rope on q in the forward pass's NATIVE layout (B, P, H, hd) —
        # no transposes (the first version of this arm transposed to
        # head-major and back, two 67 MB relayouts that the real path
        # never pays)
        q_nat = jax.random.normal(key, (B, P, HQ, HD)).astype(jnp.bfloat16)
        timed("rope q (B,P,32,128)",
              lambda c, i, _q: apply_rope(
                  c * (1 + i * 1e-8), cos_t, sin_t, pos).astype(c.dtype),
              q_nat)
        # KV quantize (k and v per layer)
        timed("kv quantize x2 (B,P,8,128)",
              lambda c, i, _kv: (lambda qq, ss: (qq.astype(jnp.float32)
                                                 * ss + c * 1e-8).astype(
                  c.dtype))(*quantize_int8(c * (1 + i * 1e-8), axis=-1)),
              kv3)
        timed("rms_norm x2 (8192,4096)",
              lambda c, i, _h: rms_norm(rms_norm(c * (1 + i * 1e-8), ln_w,
                                                 1e-6), ln_w,
                                        1e-6).astype(c.dtype), h2)
        timed("silu*up (8192,11008)",
              lambda c, i, _g: (c * (1 + i * 1e-8)).at[:, :F].set(
                  (jax.nn.silu(c[:, :F].astype(jnp.float32))
                   * c[:, F:].astype(jnp.float32)).astype(c.dtype)), gu2)

    # 5. glue OPTIMIZATION candidates (round 5): measured against the
    # "parts" baselines above.
    if "glue2" in arms:
        from physics_llm_inference_tpu.ops.rope import (apply_rope,
                                                        rope_frequencies)
        from physics_llm_inference_tpu.utils.timing import readout_timed as _rt

        key = jax.random.PRNGKey(2)
        HQ, HD = cfg.num_heads, cfg.head_dim
        cos_t, sin_t = rope_frequencies(HD, cfg.max_seq_len, cfg.rope_theta)
        pos = jnp.broadcast_to(jnp.arange(P)[None], (B, P))
        q_nat = jax.random.normal(key, (B, P, HQ, HD)).astype(jnp.bfloat16)
        gu2 = jax.random.normal(key, (T, 2 * F)).astype(jnp.bfloat16)
        wd_b = jax.random.normal(key, (F, D)).astype(jnp.bfloat16)

        def rope_v2(x, cos, sin, positions):
            # full-lane-width formulation: no 64-lane half slices (those
            # relayout on TPU); one roll + sign-folded sin table
            dtype = x.dtype
            c = cos[positions][:, :, None, :]
            s = sin[positions][:, :, None, :]
            cf = jnp.concatenate([c, c], -1)            # (B,S,1,D)
            sf = jnp.concatenate([-s, s], -1)
            xf = x.astype(jnp.float32)
            rot = jnp.roll(xf, x.shape[-1] // 2, axis=-1)
            return (xf * cf + rot * sf).astype(dtype)

        def timed2(name, fn, *a, reps=64):
            @jax.jit
            def run(*a):
                def step(carry, i):
                    return fn(carry, i, *a), None
                c, _ = jax.lax.scan(step, a[0], jnp.arange(reps))
                return c
            run(*a)
            dt = min(_rt(lambda: run(*a))[1] for _ in range(3))
            print(f"[glue2] {name:28s} {dt/reps*1e3:6.3f} ms/inst",
                  flush=True)
            return dt / reps

        timed2("rope v1 (half-slices)",
               lambda c, i, _q: apply_rope(c * (1 + i * 1e-8), cos_t,
                                           sin_t, pos).astype(c.dtype),
               q_nat)
        timed2("rope v2 (roll+sign)",
               lambda c, i, _q: rope_v2(c * (1 + i * 1e-8), cos_t,
                                        sin_t, pos).astype(c.dtype), q_nat)

        def rope_v3(x, cos, sin, positions):
            # full-width FMA form with ONE concat: out = x·cosf +
            # rot_half(x)·sinf, rot built from the two half slices
            dtype = x.dtype
            c = cos[positions][:, :, None, :]
            s = sin[positions][:, :, None, :]
            cf = jnp.concatenate([c, c], -1)
            sf = jnp.concatenate([-s, s], -1)
            xf = x.astype(jnp.float32)
            d2 = x.shape[-1] // 2
            rot = jnp.concatenate([xf[..., d2:], xf[..., :d2]], -1)
            return (xf * cf + rot * sf).astype(dtype)

        timed2("rope v3 (1-concat FMA)",
               lambda c, i, _q: rope_v3(c * (1 + i * 1e-8), cos_t,
                                        sin_t, pos).astype(c.dtype), q_nat)
        a3 = apply_rope(q_nat, cos_t, sin_t, pos)
        b3 = rope_v3(q_nat, cos_t, sin_t, pos)
        print(f"[glue2] rope v1-v3 max abs diff: "
              f"{float(jnp.max(jnp.abs(a3.astype(jnp.float32) - b3.astype(jnp.float32)))):.2e}",
              flush=True)
        # numerics check v1 vs v2
        a = apply_rope(q_nat, cos_t, sin_t, pos)
        bb = rope_v2(q_nat, cos_t, sin_t, pos)
        print(f"[glue2] rope v1-v2 max abs diff: "
              f"{float(jnp.max(jnp.abs(a.astype(jnp.float32) - bb.astype(jnp.float32)))):.2e}",
              flush=True)
        # silu: real shape (fresh output, no .at.set copy), f32 vs bf16
        timed2("silu*up f32 -> bf16 out",
               lambda c, i, _g: jnp.concatenate([
                   (jax.nn.silu(c[:, :F].astype(jnp.float32) * (1 + i * 1e-8))
                    * c[:, F:].astype(jnp.float32)).astype(c.dtype),
                   c[:, F:]], -1), gu2)
        # does XLA fuse silu into the down dot? dot alone vs silu+dot —
        # if they cost the same, the silu pass above is already hidden in
        # the real forward and there is nothing to recover
        timed2("down dot alone (m=8192)",
               lambda c, i, _g, w: jnp.concatenate([
                   jnp.dot(c[:, :F] * (1 + i * 1e-8), w,
                           preferred_element_type=jnp.float32
                           ).astype(c.dtype),
                   c[:, D:]], -1), gu2, wd_b)
        timed2("silu+down dot fused?",
               lambda c, i, _g, w: jnp.concatenate([
                   jnp.dot((jax.nn.silu(c[:, :F].astype(jnp.float32)
                                        * (1 + i * 1e-8))
                            * c[:, F:].astype(jnp.float32)
                            ).astype(jnp.bfloat16), w,
                           preferred_element_type=jnp.float32
                           ).astype(c.dtype),
                   c[:, D:]], -1), gu2, wd_b)

    print(f"shapes: B={B} P={P} L={L} (report scales are per-{L}-layer)")
    print(f"matmul FLOP {mm_flops/1e12:.1f} TF, attn {attn_flops/1e12:.2f} "
          f"TF, physics floor {mm_flops/peak*1e3:.0f} ms")
    print(f"1. full prefill:        {t_full*1e3:7.1f} ms  "
          f"({(mm_flops+attn_flops+lm_flops)/t_full/1e12:.0f} TF/s, "
          f"{(mm_flops+attn_flops+lm_flops)/t_full/peak*100:.0f}% MXU)")
    print(f"2. matmuls int8 path:   {t_mm8*1e3:7.1f} ms  "
          f"({mm_flops/t_mm8/1e12:.0f} TF/s, "
          f"{mm_flops/t_mm8/peak*100:.0f}% MXU)")
    print(f"3. matmuls bf16 jnp:    {t_mmb*1e3:7.1f} ms  "
          f"({mm_flops/t_mmb/1e12:.0f} TF/s, "
          f"{mm_flops/t_mmb/peak*100:.0f}% MXU)")
    print(f"attention+glue+lm_head = full - int8 matmuls: "
          f"{(t_full-t_mm8)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
