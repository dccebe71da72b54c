"""Serving-level benchmark: 7B INT8 through the PAGED engine (radix on,
decode horizon, fused paged megakernel) at the PRODUCTION geometry — the
DEFAULT PagedEngineConfig (1024-token capacity, 512-token blocks, B=64)
— measured with the ch10-comparable harness (ref ch10/benchmark.py:86-169:
closed-loop load at fixed concurrency, TTFT & E2E percentiles,
requests/s, tokens/s).

A quarter of the requests share a block-sized (512-token) prefix so the
radix cache sees realistic prefix reuse (system-prompt pattern) at the
production geometry's sharing grain; prompts default to 576 tokens so
shared prefixes span one full block.

Usage: python scripts/bench_serving7b.py [--requests 192] [--concurrency 64]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=192)
    ap.add_argument("--concurrency", type=int, default=64)
    ap.add_argument("--prompt", type=int, default=576)
    ap.add_argument("--decode", type=int, default=64)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--horizon", type=int, default=8)
    args = ap.parse_args()

    from physics_llm_inference_tpu.bench.harness import (BenchmarkConfig,
                                                         run_benchmark)
    from physics_llm_inference_tpu.models import ModelConfig
    from physics_llm_inference_tpu.models.quant import init_params_int8
    from physics_llm_inference_tpu.serve.engine import GenerationRequest
    from physics_llm_inference_tpu.serve.http_server import ServingLoop
    from physics_llm_inference_tpu.serve.paged_engine import (
        PagedEngineConfig, PagedInferenceEngine)

    cfg = ModelConfig(vocab_size=32000, max_seq_len=1024, dtype="bfloat16",
                      hidden_dim=4096, num_layers=32, num_heads=32,
                      num_kv_heads=8, intermediate_dim=11008)
    print("[serving7b] init 7B int8 params...", file=sys.stderr, flush=True)
    params = init_params_int8(jax.random.PRNGKey(0), cfg)

    # the DEFAULT paged geometry (1024-token capacity, fused megakernel
    # ON — round 5); for_fused presets remain for explicit control
    pc = PagedEngineConfig(
        max_batch=args.batch, kv_dtype="int8",
        decode_horizon=args.horizon, enable_radix=True,
        prefill_tokens_per_iter=2048)
    engine = PagedInferenceEngine(params, cfg, pc)
    loop = ServingLoop(engine)

    rng = np.random.default_rng(0)
    # shared prefixes span ONE FULL BLOCK (radix grain = block_size);
    # warmup covers 2 rounds of every prefix so the radix-HIT chunk shape
    # (prompt minus matched block) compiles before the timed run
    shared = [list(rng.integers(1, cfg.vocab_size, pc.block_size))
              for _ in range(8)]

    def prompt_fn(i):
        # every 4th request shares one of 8 block-sized prefixes
        if i % 4 == 0 and args.prompt > pc.block_size:
            pre = shared[(i // 4) % len(shared)]
            return pre + list(rng.integers(1, cfg.vocab_size,
                                           args.prompt - len(pre)))
        return list(rng.integers(1, cfg.vocab_size, args.prompt))

    def generate_fn(prompt_tokens, max_tokens):
        rid = engine.submit_request(GenerationRequest(
            prompt_tokens=prompt_tokens, max_tokens=max_tokens,
            temperature=0.0))
        loop.notify()
        # condition-variable wait, not a 2 ms poll: at concurrency 64 the
        # polling version cost 32k GIL wakeups/s next to the engine loop.
        # Generous timeout so a dead ServingLoop thread surfaces as a
        # diagnostic instead of a silent hang (r4 advisor finding).
        res = engine.wait_result(rid, timeout=900.0)
        if res is None:
            raise RuntimeError(
                f"request {rid} not finished after 900 s — engine loop "
                f"dead? scheduler: {engine.scheduler.stats()}")
        return {"tokens": res.tokens, "ttft_s": res.ttft_s}

    def measure_rtt(n=20):
        # Host->device dispatch + scalar readout round-trip: the serving
        # loop pays this once per engine iteration, so on the tunneled dev
        # TPU it GOVERNS serving throughput (measured 2 ms on a quiet
        # relay, 40-1300 ms under congestion — a 2-4x swing in tok/s at
        # identical engine config). Recorded in the JSON so every serving
        # artifact carries the tunnel state it was measured under.
        import jax.numpy as jnp
        g = jax.jit(lambda a: a + 1)
        y = jnp.zeros((8,), jnp.float32)
        float(g(y)[0])  # compile
        t0 = time.time()
        for _ in range(n):
            y = g(y)
            float(y[0])
        return (time.time() - t0) / n

    bc = BenchmarkConfig(num_requests=args.requests,
                         concurrency=args.concurrency,
                         warmup_requests=0,
                         prompt_len=args.prompt, max_tokens=args.decode)
    t0 = time.time()
    print("[serving7b] warmup (compiles prefill buckets + decode)...",
          file=sys.stderr, flush=True)
    # FULL CONCURRENT warm wave first (unmeasured): the harness's own
    # warmup is sequential, but half the compiled shapes only appear
    # under concurrency — batched-prefill row counts (rb=2..16), the
    # h=1 decode dispatched while requests wait, radix-hit chunk
    # buckets. Measuring run 1 times those compiles (P90 latency was
    # 150 s of compile stall); run 2 is the steady-state number.
    warm = BenchmarkConfig(num_requests=args.requests,
                           concurrency=args.concurrency,
                           warmup_requests=2,
                           prompt_len=args.prompt, max_tokens=args.decode)
    run_benchmark(warm, generate_fn, prompt_fn)
    print(f"[serving7b] concurrent warm wave done at {time.time()-t0:.0f}s "
          f"— timed wave starts", file=sys.stderr, flush=True)
    rtt_before = measure_rtt()
    print(f"[serving7b] tunnel dispatch RTT before timed wave: "
          f"{rtt_before*1e3:.1f} ms", file=sys.stderr, flush=True)
    # snapshot so radix_hit_tokens reports the TIMED wave only (the r4
    # artifact's counter included the warm wave and overstated hits)
    radix_hits_before = engine.stats()["radix_hit_tokens"]
    result = run_benchmark(bc, generate_fn, prompt_fn)
    rtt_after = measure_rtt()
    print(f"[serving7b] total wall (incl warmup/compile) "
          f"{time.time()-t0:.0f}s; RTT after: {rtt_after*1e3:.1f} ms",
          file=sys.stderr, flush=True)
    loop.shutdown()

    stats = engine.stats()
    out = result.to_dict()
    out.update({
        "metric": "serving_7b_int8_paged",
        "radix_hit_tokens": stats["radix_hit_tokens"] - radix_hits_before,
        "radix_hit_tokens_incl_warm": stats["radix_hit_tokens"],
        "preemptions": stats["scheduler"].get("preemptions", 0),
        "tunnel_rtt_ms": {"before": round(rtt_before * 1e3, 1),
                          "after": round(rtt_after * 1e3, 1)},
        "config": {"batch": args.batch, "block_size": pc.block_size,
                   "horizon": args.horizon,
                   "concurrency": args.concurrency,
                   "requests": args.requests, "prompt": args.prompt,
                   "decode": args.decode},
    })
    print(json.dumps(out))
    print(result.summary(), file=sys.stderr)


if __name__ == "__main__":
    main()
