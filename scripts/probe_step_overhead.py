"""Isolate the decode-step cost OUTSIDE the fused megakernel.

bench.py's step = embed → megakernel → final RMSNorm → lm_head → sample.
The kernel-only probe measures the megakernel; this probe adds the other
pieces one at a time inside the same chained lax.scan, so their marginal
cost is measured on device (docs/PERF.md measurement rules apply: carry
chaining defeats CSE, value-readout timing, readout cost calibrated out).

Usage: JAX_PLATFORMS=axon python scripts/probe_step_overhead.py
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="7b", choices=["7b", "0.85b"])
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--start", type=int, default=128)
    args = ap.parse_args()

    from physics_llm_inference_tpu.models import ModelConfig
    from physics_llm_inference_tpu.models.quant import init_params_int8
    from physics_llm_inference_tpu.models.transformer import (embed_lookup,
                                                              lm_logits)
    from physics_llm_inference_tpu.kernels.fused_decode import \
        fused_decode_step
    from physics_llm_inference_tpu.ops.norms import rms_norm
    from physics_llm_inference_tpu.ops.rope import rope_frequencies
    from physics_llm_inference_tpu.ops.sampling import sample_token
    from physics_llm_inference_tpu.utils.timing import readout_timed

    shapes = {
        "0.85b": dict(hidden_dim=2048, num_layers=16, num_heads=16,
                      num_kv_heads=4, intermediate_dim=5632),
        "7b": dict(hidden_dim=4096, num_layers=32, num_heads=32,
                   num_kv_heads=8, intermediate_dim=11008),
    }[args.model]
    cfg = ModelConfig(vocab_size=32000, max_seq_len=2048, dtype="bfloat16",
                      **shapes)
    B, S, L = args.batch, args.seq, cfg.num_layers
    flat = cfg.num_kv_heads * cfg.head_dim

    params = init_params_int8(jax.random.PRNGKey(0), cfg)
    blocks = params["blocks"]
    rng0 = jax.random.PRNGKey(1)
    kq = jax.random.randint(rng0, (L, B, S, flat), -127, 128, jnp.int8)
    vq = jax.random.randint(rng0, (L, B, S, flat), -127, 128, jnp.int8)
    ks = jnp.full((L, B, cfg.num_kv_heads, S), 0.05, jnp.float32)
    vs = jnp.full((L, B, cfg.num_kv_heads, S), 0.05, jnp.float32)
    x0 = jax.random.normal(rng0, (B, cfg.hidden_dim)).astype(jnp.bfloat16)
    tok0 = jnp.zeros((B,), jnp.int32)
    cos_t, sin_t = rope_frequencies(cfg.head_dim, cfg.max_seq_len,
                                    cfg.rope_theta)
    vfrom = jnp.zeros((B,), jnp.int32)
    temps = jnp.zeros((B,), jnp.float32)   # greedy via where

    def kernel_step(bl, x, kq, ks, vq, vs, i):
        # bl passed through the jit args — closing over it would bake
        # 5.7 GB of constants into the jaxpr (docs/PERF.md)
        slot = args.start + i
        q_slot = jnp.broadcast_to(slot, (B,)).astype(jnp.int32)
        cos_g = jnp.broadcast_to(cos_t[slot][None], (B, cfg.head_dim // 2))
        sin_g = jnp.broadcast_to(sin_t[slot][None], (B, cfg.head_dim // 2))
        return fused_decode_step(bl, x, kq, ks, vq, vs, q_slot=q_slot,
                                 valid_from=vfrom, rope_cos_g=cos_g,
                                 rope_sin_g=sin_g, cfg=cfg, slot=slot,
                                 write_cache=True)

    def renorm(x_out):
        xf = x_out.astype(jnp.float32)
        return (xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True)
                                   + 1e-6)).astype(jnp.bfloat16)

    variants = {}

    @jax.jit
    def v_kernel(blocks, x0, kq, ks, vq, vs):
        def step(carry, i):
            x, kq, ks, vq, vs = carry
            x_out, kq, ks, vq, vs = kernel_step(blocks, x, kq, ks, vq, vs, i)
            return (renorm(x_out), kq, ks, vq, vs), None
        carry, _ = jax.lax.scan(step, (x0, kq, ks, vq, vs),
                                jnp.arange(args.steps))
        return carry[0]
    variants["kernel only"] = lambda: v_kernel(blocks, x0, kq, ks, vq, vs)

    @jax.jit
    def v_lmhead(params, x0, kq, ks, vq, vs):
        def step(carry, i):
            x, kq, ks, vq, vs = carry
            x_out, kq, ks, vq, vs = kernel_step(params["blocks"], x, kq, ks,
                                                vq, vs, i)
            # lm_logits includes the final rms_norm
            logits = lm_logits(x_out[:, None, :], params, cfg)[:, 0]
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            # chain: fold the argmax back into x so nothing is elided
            x = renorm(x_out) + (nxt[:, None] % 3).astype(jnp.bfloat16) * 0
            return (x, kq, ks, vq, vs), None
        carry, _ = jax.lax.scan(step, (x0, kq, ks, vq, vs),
                                jnp.arange(args.steps))
        return carry[0]
    variants["+ norm/lm_head/argmax"] = lambda: v_lmhead(params, x0, kq, ks,
                                                         vq, vs)

    @jax.jit
    def v_full(params, tok0, kq, ks, vq, vs, rng):
        def step(carry, i):
            tok, kq, ks, vq, vs, rng = carry
            x = embed_lookup(params, tok, cfg)
            x_out, kq, ks, vq, vs = kernel_step(params["blocks"], x, kq, ks,
                                                vq, vs, i)
            logits = lm_logits(x_out[:, None, :], params, cfg)[:, 0]
            rng, sub = jax.random.split(rng)
            nxt = sample_token(logits, sub, temperature=temps,
                               top_p=None).astype(jnp.int32)
            return (nxt, kq, ks, vq, vs, rng), None
        carry, _ = jax.lax.scan(step, (tok0, kq, ks, vq, vs, rng0),
                                jnp.arange(args.steps))
        return carry[0]
    variants["full step (embed+sample)"] = lambda: v_full(
        params, tok0, kq, ks, vq, vs, rng0)

    for name, fn in variants.items():
        t0 = time.time()
        out, _ = readout_timed(fn)
        c = time.time() - t0
        times = []
        for _ in range(3):
            out, dt = readout_timed(fn)
            times.append(dt)
        per = min(times) / args.steps
        print(f"{name:28s} compile {c:5.1f}s  per-step {per*1e3:7.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
