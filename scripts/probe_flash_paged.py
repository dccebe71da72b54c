"""One TPU session: flash-vs-XLA attention sweep + paged-megakernel probe.

1. flash_attention vs XLA dense (grouped_sdpa) at 7B attention shapes
   across sequence lengths — the VERDICT bar is flash >= XLA at S>=1024
   with a %-of-roofline number (bench/micro.bench_attention does the
   arithmetic).
2. fused_paged_decode_step at 7B serving shapes (B=64, bs=64, MB=8) in a
   chained scan — first time the block-table fan compiles on real
   hardware; compared against the slot megakernel's number.

Usage: JAX_PLATFORMS=axon python scripts/probe_flash_paged.py
"""
from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def flash_sweep(reps=8):
    """Chained in-jit reps + calibrated value readout: a host loop around
    single calls measures the ~25 ms relay round-trip, not the kernel
    (docs/PERF.md measurement rules)."""
    from physics_llm_inference_tpu.kernels.flash_attention import \
        flash_attention
    from physics_llm_inference_tpu.ops.gqa import grouped_sdpa
    from physics_llm_inference_tpu.utils.timing import readout_timed

    print("== flash vs XLA dense (B=4, 32q/8kv heads, d=128, causal) ==",
          flush=True)
    B, HQ, HKV, D = 4, 32, 8, 128
    for seq in (512, 1024, 2048, 4096, 8192):
        # short sequences need more chained reps to clear the ~25 ms relay
        # readout overhead (division hit 0 at S=512 with reps=8, round 4)
        reps = max(8, (2048 * 8) // seq)
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, HQ, seq, D), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, HKV, seq, D), jnp.bfloat16)
        v = jax.random.normal(ks[2], (B, HKV, seq, D), jnp.bfloat16)
        idx = jnp.arange(seq)
        mask = (idx[None, :] <= idx[:, None])[None, None, None]

        def chained(fn):
            @jax.jit
            def run(q, k, v):
                def step(qq, i):
                    o = fn(qq, k, v)
                    # feed output back so no rep can be elided
                    return (o * 1e-3 + qq * 0.999).astype(qq.dtype), None
                qq, _ = jax.lax.scan(step, q, jnp.arange(reps))
                return qq
            return run

        flops = 4.0 * B * HQ * seq * seq * D * 0.5
        row = {}
        for name, fn in (("flash", lambda q, k, v:
                          flash_attention(q, k, v, causal=True)),
                         ("xla", lambda q, k, v:
                          grouped_sdpa(q, k, v, mask=mask))):
            if name == "xla" and seq > 4096:
                continue  # dense materializes (B,H,S,S) past the budget
            run = chained(fn)
            out, _ = readout_timed(lambda: run(q, k, v))   # compile
            times = []
            for _ in range(3):
                out, dt = readout_timed(lambda: run(q, k, v))
                times.append(dt)
            per = max(min(times) / reps, 1e-9)
            row[name] = (per, flops / per / 1e12)
        f_ms, f_tf = row["flash"]
        msg = f"S={seq:5d}  flash {f_ms*1e3:7.2f} ms ({f_tf:5.1f} TF)"
        if "xla" in row:
            x_ms, x_tf = row["xla"]
            msg += (f"   xla {x_ms*1e3:7.2f} ms ({x_tf:5.1f} TF)  "
                    f"speedup {x_ms/f_ms:4.2f}x")
        print(msg, flush=True)


def prefill_attn_probe(reps=16):
    """Flash vs XLA dense at the HEADLINE PREFILL attention shape —
    B=64, Sq=128 new tokens attending a 256-slot cache at q_offset=128
    (rectangular causal). The round-2 crossover (max(Sq,Sk) >= 1024) was
    tuned on square B=4 shapes; at B=64 the dense path materializes
    B·Hq·Sq·Sk scores = 128 MB/layer, which flash keeps in VMEM."""
    from physics_llm_inference_tpu.kernels.flash_attention import \
        flash_attention
    from physics_llm_inference_tpu.ops.gqa import grouped_sdpa
    from physics_llm_inference_tpu.utils.timing import readout_timed

    B, HQ, HKV, D = 64, 32, 8, 128
    print("== prefill-shaped attention (B=64, rect causal) ==", flush=True)
    for sq, sk in ((128, 256), (128, 512), (512, 512)):
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, HQ, sq, D), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, HKV, sk, D), jnp.bfloat16)
        v = jax.random.normal(ks[2], (B, HKV, sk, D), jnp.bfloat16)
        qoff = sk - sq
        iq = qoff + jnp.arange(sq)
        ik = jnp.arange(sk)
        mask = (ik[None, :] <= iq[:, None])[None, None]

        def chained(fn):
            @jax.jit
            def run(q, k, v):
                def step(qq, i):
                    o = fn(qq, k, v)
                    return (o * 1e-3 + qq * 0.999).astype(qq.dtype), None
                qq, _ = jax.lax.scan(step, q, jnp.arange(reps))
                return qq
            return run

        row = {}
        for name, fn in (
                ("flash", lambda q, k, v: flash_attention(
                    q, k, v, q_offset=qoff, causal=True)),
                ("xla", lambda q, k, v: grouped_sdpa(
                    q, k, v, mask=mask[:, :, None]))):
            run = chained(fn)
            readout_timed(lambda: run(q, k, v))
            times = [readout_timed(lambda: run(q, k, v))[1]
                     for _ in range(3)]
            row[name] = min(times) / reps
        print(f"Sq={sq:4d} Sk={sk:4d}  flash {row['flash']*1e3:6.3f} ms  "
              f"xla {row['xla']*1e3:6.3f} ms  "
              f"speedup {row['xla']/row['flash']:4.2f}x", flush=True)


def paged_probe(B=64, BS=128, MB=4, steps=32, lens=128, slots=None,
                modes=("kernel", "inplace", "scatter")):
    from physics_llm_inference_tpu.models import ModelConfig
    from physics_llm_inference_tpu.models.quant import init_params_int8
    from physics_llm_inference_tpu.kernels.fused_decode import \
        fused_paged_decode_step
    from physics_llm_inference_tpu.ops.rope import rope_frequencies
    from physics_llm_inference_tpu.specs import get_tpu_spec
    from physics_llm_inference_tpu.utils.timing import readout_timed
    import numpy as np

    cfg = ModelConfig(vocab_size=256, max_seq_len=2048, dtype="bfloat16",
                      hidden_dim=4096, num_layers=32, num_heads=32,
                      num_kv_heads=8, intermediate_dim=11008)
    L = cfg.num_layers
    flat = cfg.num_kv_heads * cfg.head_dim
    NB = B * MB + 1
    params = init_params_int8(jax.random.PRNGKey(0), cfg)
    blocks = params["blocks"]
    del params

    rng = jax.random.PRNGKey(1)
    # MERGED int8 pools (round 5: K and V pages co-located per block),
    # built by broadcasting one random block: randint over the full pool
    # shape materializes a uint32 temp (4x the int8 pool — 8.5 GB at
    # capacity-1024 geometries, OOM next to the 6 GB of weights); content
    # only has to be bounded, not unique, for a perf probe
    tile = jax.random.randint(rng, (2, BS, flat), -127, 128, jnp.int8)
    kv = jnp.broadcast_to(tile, (L, NB, 2, BS, flat))
    kvs = jnp.full((L, NB, 2, cfg.num_kv_heads, BS), 0.05, jnp.float32)
    tables = jnp.asarray(
        np.random.default_rng(0).permutation(B * MB).reshape(B, MB) + 1,
        jnp.int32)
    lens0 = jnp.full((B,), lens, jnp.int32)
    x0 = jax.random.normal(rng, (B, cfg.hidden_dim)).astype(jnp.bfloat16)
    cos_t, sin_t = rope_frequencies(cfg.head_dim, cfg.max_seq_len,
                                    cfg.rope_theta)

    def make_run(mode: str):
        scatter = mode == "scatter"

        # donate the pools: at capacity-1024 geometries an undonated pool
        # pair costs an extra 4.2 GB of HLO temps (input + carry copies)
        # next to 6 GB of weights — HBM OOM on the 16 GB chip
        @functools.partial(jax.jit, donate_argnums=(2, 3))
        def run(blocks, x0, kv, kvs):
            def step(carry, i):
                x, kv, kvs = carry
                lens = lens0 + (i if mode != "kernel" else 0)
                cos_g, sin_g = cos_t[lens], sin_t[lens]
                if mode == "inplace":
                    (x_out, k_new, ksc, v_new, vsc, kv,
                     kvs) = fused_paged_decode_step(
                        blocks, x, kv, kvs, tables, lens, cos_g,
                        sin_g, cfg=cfg, inplace=True, ring_slots=slots)
                else:
                    x_out, k_new, ksc, v_new, vsc = fused_paged_decode_step(
                        blocks, x, kv, kvs, tables, lens, cos_g,
                        sin_g, cfg=cfg, ring_slots=slots)
                if scatter:
                    blk = tables[jnp.arange(B), lens // BS]
                    off = lens % BS
                    kv = kv.at[:, blk, 0, off].set(k_new) \
                           .at[:, blk, 1, off].set(v_new)
                    kvs = kvs.at[:, blk, 0, :, off].set(
                        ksc.transpose(1, 0, 2)).at[:, blk, 1, :, off].set(
                        vsc.transpose(1, 0, 2))
                else:
                    # fold outputs into x so the kernel can't be elided,
                    # but leave the pools untouched (isolates kernel time
                    # from the XLA pool-scatter time)
                    x_out = x_out + (k_new[0, :, :1] + v_new[0, :, :1]
                                     ).astype(x_out.dtype)
                xf = x_out.astype(jnp.float32)
                x = (xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True)
                                        + 1e-6)).astype(jnp.bfloat16)
                return (x, kv, kvs), None

            carry, _ = jax.lax.scan(step, (x0, kv, kvs),
                                    jnp.arange(steps))
            return carry[0], *carry[1:]  # pools returned: donated buffers
        return run                       # are rebound by the caller

    wb = sum(t.q.nbytes + t.s.nbytes for t in
             (blocks["wqkv"], blocks["wo"], blocks["w_gate_up"],
              blocks["w_down"]))
    # live KV bytes actually attended PER STEP (avg over the chained
    # steps): 2 streams x B x live-tokens x flat, for EVERY layer — the
    # r4 version of this line dropped the xL factor, understating the
    # floor ~40% at production occupancy
    kvb = 2 * B * (lens + steps // 2) * flat * L
    floor = (wb + kvb) / get_tpu_spec().hbm_bandwidth
    print(f"== paged megakernel 7B B={B} bs={BS} MB={MB} lens={lens} "
          f"slots={slots or 'auto'} ==", flush=True)
    for mode in modes:
        run = make_run(mode)
        pools = (kv, kvs)
        t0 = time.time()

        def call():
            nonlocal pools
            out = run(blocks, x0, *pools)
            pools = out[1:]
            return out[0]

        out, _ = readout_timed(call)
        c = time.time() - t0
        times = []
        for _ in range(3):
            out, dt = readout_timed(call)
            times.append(dt)
        # re-materialize pristine pools for the next mode (donation
        # consumed the originals)
        kv = jnp.broadcast_to(tile, (L, NB, 2, BS, flat))
        kvs = jnp.full((L, NB, 2, cfg.num_kv_heads, BS), 0.05, jnp.float32)
        per = min(times) / steps
        print(f"mode={mode:8s} compile {c:5.1f}s  "
              f"per-step {per*1e3:.3f} ms  (floor ~{floor*1e3:.3f} ms -> "
              f"{floor/per*100:.1f}% of SoL, {B/per:.0f} tok/s)", flush=True)




def paged_perop_probe(B=64, BS=128, MB=4, steps=16, horizon=8, lens=128):
    """The paged engine's PRODUCTION decode dispatch (per-op path:
    paged_decode_scan → int8 paged attention + layer-indexed int8 matmuls)
    at 7B serving shapes — the paged-vs-slot throughput comparison."""
    import numpy as np

    from physics_llm_inference_tpu.models import ModelConfig
    from physics_llm_inference_tpu.models.quant import init_params_int8
    from physics_llm_inference_tpu.models.transformer import QuantKV
    from physics_llm_inference_tpu.models.paged_transformer import \
        paged_decode_scan
    from physics_llm_inference_tpu.specs import get_tpu_spec
    from physics_llm_inference_tpu.utils.timing import readout_timed

    cfg = ModelConfig(vocab_size=32000, max_seq_len=2048, dtype="bfloat16",
                      hidden_dim=4096, num_layers=32, num_heads=32,
                      num_kv_heads=8, intermediate_dim=11008)
    L = cfg.num_layers
    flat = cfg.num_kv_heads * cfg.head_dim
    NB = B * MB + 1
    params = init_params_int8(jax.random.PRNGKey(0), cfg)

    rng = jax.random.PRNGKey(1)
    tile = jax.random.randint(rng, (2, BS, flat), -127, 128, jnp.int8)
    k_pools = QuantKV(
        q=jnp.broadcast_to(tile, (L, NB, 2, BS, flat)),
        s=jnp.full((L, NB, 2, cfg.num_kv_heads, BS), 0.05, jnp.float32))
    v_pools = None
    tables = jnp.asarray(
        np.random.default_rng(0).permutation(B * MB).reshape(B, MB) + 1,
        jnp.int32)
    lens0 = jnp.full((B,), lens, jnp.int32)
    toks = jnp.ones((B,), jnp.int32)
    temps = jnp.zeros((B,), jnp.float32)
    tks = jnp.zeros((B,), jnp.int32)
    tps = jnp.ones((B,), jnp.float32)

    # donate the pools — an undonated merged pool pair is an extra 4.8 GB
    # of HLO temps next to 6 GB of weights (HBM OOM)
    fn = jax.jit(lambda p, t, k, v, lens, r: paged_decode_scan(
        p, t, k, v, tables, lens, r, temps, tps, cfg, horizon=horizon,
        top_ks=tks, filtered=False), donate_argnums=(2, 3))

    print(f"== paged PER-OP decode 7B B={B} bs={BS} MB={MB} "
          f"horizon={horizon} ==", flush=True)
    t0 = time.time()

    def call():
        # rebind the donated pools each call
        nonlocal k_pools, v_pools
        toks2, k_pools, v_pools = fn(params, toks, k_pools, v_pools,
                                     lens0, jax.random.PRNGKey(2))
        return toks2

    out, _ = readout_timed(call)
    print(f"compile+first: {time.time()-t0:.1f}s", flush=True)
    times = []
    for _ in range(3):
        out, dt = readout_timed(call)
        times.append(dt)
    per = min(times) / horizon
    wb = sum(t.q.nbytes + t.s.nbytes
             for t in jax.tree.leaves(
                 params, is_leaf=lambda x: hasattr(x, "q"))
             if hasattr(t, "q"))
    floor = (wb + 2 * B * (lens + horizon * steps // 2) * flat * L) \
        / get_tpu_spec().hbm_bandwidth
    print(f"per-step {per*1e3:.3f} ms  (floor ~{floor*1e3:.3f} ms -> "
          f"{floor/per*100:.1f}% of SoL, {B/per:.0f} tok/s)", flush=True)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="",
                    choices=["", "flash", "paged", "perop", "prefill"])
    ap.add_argument("--bs", type=int, default=128, help="paged block size")
    ap.add_argument("--mb", type=int, default=4, help="blocks per request")
    ap.add_argument("--lens", type=int, default=128,
                    help="initial per-request KV length (occupancy = "
                         "lens / (bs*mb))")
    ap.add_argument("--slots", type=int, default=0,
                    help="force the paged ring depth G (0 = auto)")
    ap.add_argument("--modes", default="kernel,inplace,scatter")
    a = ap.parse_args()
    if a.only in ("", "flash"):
        flash_sweep()
    if a.only in ("", "prefill"):
        prefill_attn_probe()
    if a.only in ("", "paged"):
        paged_probe(BS=a.bs, MB=a.mb, lens=a.lens, slots=a.slots or None,
                    modes=tuple(a.modes.split(",")))
    if a.only in ("", "perop"):
        paged_perop_probe(BS=a.bs, MB=a.mb, lens=a.lens)
