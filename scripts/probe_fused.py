"""Kernel-only probe for the fused whole-model decode megakernel.

Isolates kernels/fused_decode.py from the full generate graph so perf
iterations compile in ~seconds instead of the ~6 min full-model compile
(docs/PERF.md). The probe runs the kernel in a lax.scan with the cache as
the carry and x chained step-to-step — the same dataflow as the real decode
loop — so nothing gets CSE'd/hoisted (docs/PERF.md measurement rules).

Usage:
  JAX_PLATFORMS=axon python scripts/probe_fused.py --model 7b --batch 64
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
    ap.add_argument("--act8", action="store_true")
    ap.add_argument("--wmajor", action="store_true",
                    help="transpose matmul weights to N-major (contiguous "
                         "tile DMA) before the run")
    args = ap.parse_args()

    from physics_llm_inference_tpu.models import ModelConfig
    from physics_llm_inference_tpu.models.quant import init_params_int8
    from physics_llm_inference_tpu.models.transformer import QuantKV
    from physics_llm_inference_tpu.kernels.fused_decode import (
        fused_decode_step, to_nmajor)
    from physics_llm_inference_tpu.ops.rope import rope_frequencies
    from physics_llm_inference_tpu.specs import get_tpu_spec
    from physics_llm_inference_tpu.utils.timing import readout_timed

    shapes = {
        "0.85b": dict(hidden_dim=2048, num_layers=16, num_heads=16,
                      num_kv_heads=4, intermediate_dim=5632),
        "7b": dict(hidden_dim=4096, num_layers=32, num_heads=32,
                   num_kv_heads=8, intermediate_dim=11008),
    }[args.model]
    cfg = ModelConfig(vocab_size=256, max_seq_len=2048, dtype="bfloat16",
                      act_quant="int8" if args.act8 else "none", **shapes)
    B, S, L = args.batch, args.seq, cfg.num_layers
    flat = cfg.num_kv_heads * cfg.head_dim

    params = init_params_int8(jax.random.PRNGKey(0), cfg)
    blocks = params["blocks"]
    del params  # embed/lm_head not needed
    if args.wmajor:
        nm = to_nmajor(blocks)
        for name in ("wqkv", "wo", "w_gate_up"):
            nm[name].q.block_until_ready()
        blocks = nm
        del nm

    rng = jax.random.PRNGKey(1)
    kq = jax.random.randint(rng, (L, B, S, flat), -127, 128, jnp.int8)
    vq = jax.random.randint(rng, (L, B, S, flat), -127, 128, jnp.int8)
    ks = jnp.full((L, B, cfg.num_kv_heads, S), 0.05, jnp.float32)
    vs = jnp.full((L, B, cfg.num_kv_heads, S), 0.05, jnp.float32)
    x0 = jax.random.normal(rng, (B, cfg.hidden_dim)).astype(jnp.bfloat16)
    cos_t, sin_t = rope_frequencies(cfg.head_dim, cfg.max_seq_len,
                                    cfg.rope_theta)
    cos_g = jnp.broadcast_to(cos_t[args.start][None], (B, cfg.head_dim // 2))
    sin_g = jnp.broadcast_to(sin_t[args.start][None], (B, cfg.head_dim // 2))
    vfrom = jnp.zeros((B,), jnp.int32)

    @jax.jit
    def run(blocks, x0, kq, ks, vq, vs):
        # blocks as an ARGUMENT: closing over them bakes 5.7 GB of weights
        # into the jaxpr as captured constants — massive lowering + transfer
        # over the tunnel
        def step(carry, i):
            x, kq, ks, vq, vs = carry
            slot = args.start + i
            q_slot = jnp.broadcast_to(slot, (B,)).astype(jnp.int32)
            x_out, kq, ks, vq, vs = fused_decode_step(
                blocks, x, kq, ks, vq, vs, q_slot=q_slot,
                valid_from=vfrom, rope_cos_g=cos_g, rope_sin_g=sin_g,
                cfg=cfg, slot=slot, write_cache=True)
            # renormalize so 64 chained steps of random weights stay finite
            x = (x_out.astype(jnp.float32) *
                 jax.lax.rsqrt(jnp.mean(x_out.astype(jnp.float32) ** 2,
                                        -1, keepdims=True) + 1e-6)
                 ).astype(x.dtype)
            return (x, kq, ks, vq, vs), None

        carry, _ = jax.lax.scan(step, (x0, kq, ks, vq, vs),
                                jnp.arange(args.steps))
        return carry[0]

    t0 = time.time()
    out, _ = readout_timed(lambda: run(blocks, x0, kq, ks, vq, vs))
    print(f"compile+first: {time.time()-t0:.1f}s", flush=True)

    times = []
    for _ in range(3):
        out, dt = readout_timed(lambda: run(blocks, x0, kq, ks, vq, vs))
        times.append(dt)
    dt = min(times)
    per_step = dt / args.steps

    # floor: block weights + live KV cross HBM once per step
    wb = sum(t.q.nbytes + t.s.nbytes for t in
             (blocks["wqkv"], blocks["wo"], blocks["w_gate_up"],
              blocks["w_down"]))
    kvb = kq.nbytes + vq.nbytes + ks.nbytes + vs.nbytes
    spec = get_tpu_spec()
    floor = (wb + kvb) / spec.hbm_bandwidth
    print(f"model {args.model} B={B} S={S} steps={args.steps} "
          f"act8={args.act8}")
    print(f"per-step: {per_step*1e3:.3f} ms  floor: {floor*1e3:.3f} ms  "
          f"-> {floor/per_step*100:.1f}% of SoL "
          f"({B/per_step:.0f} tok/s)", flush=True)


if __name__ == "__main__":
    main()
