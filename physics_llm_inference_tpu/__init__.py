"""physics_llm_inference_tpu — a TPU-native quantized LLM inference engine.

A from-scratch JAX/XLA/Pallas/pjit framework covering the full capability arc
of the reference codebase (Infatoshi/physics-llm-inference): transformer ops,
KV-cached generation, roofline analysis, Pallas flash attention, continuous
batching with paged KV + radix prefix cache, chunked prefill, MoE routing,
tensor parallelism over a device mesh, and an OpenAI-compatible serving layer.

Subpackages (capability <-> reference chapter mapping in SURVEY.md §7):
  specs     TPU chip specs, roofline, ICI/DCN collective cost models (ch03/ch04/ch09)
  ops       pure-JAX model ops: attention, GQA, FFN, norms, RoPE, sampling (ch01)
  kernels   Pallas TPU kernels: matmul, INT8 matmul, flash attention, quant (ch05/ch06)
  models    transformer/MoE model definitions, configs, quantization (ch01/ch09)
  runtime   KV caches (dense/paged/INT8), generation loops, decode step cache (ch02/ch07/ch08)
  sched     batchers, schedulers, chunked prefill, mixed batches (ch07/ch08)
  parallel  mesh construction, TP/EP sharding rules, collectives (ch09)
  serve     inference engine, tokenizer pool, OpenAI-compatible API (ch10)
  bench     benchmark harness with TTFT/latency percentiles (ch10)
  utils     timing/benchmark helpers
"""

__version__ = "0.1.0"
