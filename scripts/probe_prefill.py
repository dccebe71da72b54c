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
