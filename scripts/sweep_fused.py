"""One-process sweep over fused-decode kernel variants.

Each config gets its OWN jitted scan closure (the tile/variant env vars are
read at trace time inside fused_decode_step's entry — a shared jit object
would silently reuse the first config; see docs/PERF.md measurement rules).

Usage:
  JAX_PLATFORMS=axon python scripts/sweep_fused.py --model 7b --batch 64
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


CONFIGS = [
    # (tag, env overrides, wmajor)
    ("base-512-onepass", {}, False),
    ("nmajor-512-onepass", {}, True),
    ("spread-512", {"FUSED_SILU": "spread"}, False),
    ("nmajor-spread-512", {"FUSED_SILU": "spread"}, True),
    ("nmajor-spread-rb2m", {"FUSED_SILU": "spread",
                            "FUSED_RB_BYTES": str(2 << 20)}, True),
    # round 2: contiguous tiles may like bigger TN; RB=16 needs >2MB at 7B
    ("nm-sp-tn1024", {"FUSED_SILU": "spread", "FUSED_TN": "1024"}, True),
    ("nm-sp-tn2048", {"FUSED_SILU": "spread", "FUSED_TN": "2048"}, True),
    ("nm-sp-rb4m", {"FUSED_SILU": "spread",
                    "FUSED_RB_BYTES": str(4 << 20)}, True),
    ("nm-sp-tn1024-rb4m", {"FUSED_SILU": "spread", "FUSED_TN": "1024",
                           "FUSED_RB_BYTES": str(4 << 20)}, True),
    # round 3: K-blocked tiles (contiguous DMA, canonical layout)
    ("kblock-sp", {"FUSED_SILU": "spread", "FUSED_WL": "kblock"}, False),
    ("kblock-onepass", {"FUSED_WL": "kblock"}, False),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="7b", choices=["7b", "0.85b"])
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--start", type=int, default=128)
    ap.add_argument("--only", default="",
                    help="comma-separated tag substrings to run")
    ap.add_argument("--wbits", type=int, default=8, choices=[4, 8])
    args = ap.parse_args()

    from physics_llm_inference_tpu.models import ModelConfig
    from physics_llm_inference_tpu.models.quant import (init_params_int4,
                                                        init_params_int8)
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
                      **shapes)
    B, S, L = args.batch, args.seq, cfg.num_layers
    flat = cfg.num_kv_heads * cfg.head_dim

    init = init_params_int4 if args.wbits == 4 else init_params_int8
    params = init(jax.random.PRNGKey(0), cfg)
    blocks_km = params["blocks"]
    del params
    configs = [c for c in CONFIGS
               if not args.only or any(s in c[0]
                                       for s in args.only.split(","))]
    need_nm = any(c[2] for c in configs)
    blocks_nm = to_nmajor(blocks_km) if need_nm else None

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

    wb = sum(t.q.nbytes + t.s.nbytes for t in
             (blocks_km["wqkv"], blocks_km["wo"], blocks_km["w_gate_up"],
              blocks_km["w_down"]))
    kvb = kq.nbytes + vq.nbytes + ks.nbytes + vs.nbytes
    spec = get_tpu_spec()
    floor = (wb + kvb) / spec.hbm_bandwidth
    print(f"model {args.model} B={B} S={S} steps={args.steps} "
          f"floor {floor*1e3:.3f} ms", flush=True)

    def make_run():
        # fresh jit per config: env vars are read at trace time
        @jax.jit
        def run(blocks, x0, kq, ks, vq, vs):
            def step(carry, i):
                x, kq, ks, vq, vs = carry
                slot = args.start + i
                q_slot = jnp.broadcast_to(slot, (B,)).astype(jnp.int32)
                x_out, kq, ks, vq, vs = fused_decode_step(
                    blocks, x, kq, ks, vq, vs, q_slot=q_slot,
                    valid_from=vfrom, rope_cos_g=cos_g, rope_sin_g=sin_g,
                    cfg=cfg, slot=slot, write_cache=True)
                x = (x_out.astype(jnp.float32) *
                     jax.lax.rsqrt(jnp.mean(x_out.astype(jnp.float32) ** 2,
                                            -1, keepdims=True) + 1e-6)
                     ).astype(x.dtype)
                return (x, kq, ks, vq, vs), None

            carry, _ = jax.lax.scan(step, (x0, kq, ks, vq, vs),
                                    jnp.arange(args.steps))
            return carry[0]
        return run

    for tag, env, wmajor in configs:
        for k in ("FUSED_TN", "FUSED_RB_BYTES", "FUSED_SILU", "FUSED_WL"):
            os.environ.pop(k, None)
        os.environ.setdefault("FUSED_WL", "nk")   # legacy unless stated
        os.environ.update(env)
        blocks = blocks_nm if wmajor else blocks_km
        run = make_run()
        t0 = time.time()
        out, _ = readout_timed(lambda: run(blocks, x0, kq, ks, vq, vs))
        compile_s = time.time() - t0
        times = []
        for _ in range(3):
            out, dt = readout_timed(lambda: run(blocks, x0, kq, ks, vq, vs))
            times.append(dt)
        per_step = min(times) / args.steps
        print(f"{tag:24s} compile {compile_s:5.1f}s  "
              f"per-step {per_step*1e3:7.3f} ms  "
              f"{floor/per_step*100:5.1f}% of SoL  "
              f"({B/per_step:7.0f} tok/s)", flush=True)


if __name__ == "__main__":
    main()
