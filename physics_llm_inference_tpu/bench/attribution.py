"""Decode-step cost attribution on real hardware.

The headline bench (bench.py) measures the full decode step; this bench
re-times the step's components in isolation — each as a lax.scan over many
steps inside one jit (the only honest instrument on a tunneled TPU, see
docs/PERF.md) — so the gap to the HBM roofline floor can be attributed:

  matmuls   : the 4 per-layer INT8 matmuls (stacked-layer indexed, exactly
              the model's _linear path) + lm_head. Lower bound = weight
              bytes / HBM bandwidth.
  attention : the fused INT8-KV decode kernel over full stacked caches.
              Lower bound = live KV bytes / HBM bandwidth.
  glue      : everything else (norms, rope, KV quantize+write, splits,
              silu, residuals, sampling) — by subtraction from the full
              step, cross-checked with a direct glue-only scan.

Methodology per ref ch03 (roofline attribution) and ch04 (launch overhead):
warmup compile, then timed steady-state runs, per-step means.
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
from jax import lax


def _time_scan(step_fn, carry, steps: int, repeats: int = 3,
               consts=None) -> float:
    """Seconds per step of `step_fn` scanned `steps` times inside one jit.

    `consts` (a pytree) is threaded through as a jit *argument* rather than a
    closure so large weights/caches become device buffers, not HLO constants
    (the tunneled TPU's remote_compile rejects multi-hundred-MB uploads).
    """

    @jax.jit
    def run(carry, consts, salt):
        xs = jnp.arange(steps, dtype=jnp.float32) + salt * steps
        out, _ = lax.scan(lambda c, t: step_fn(c, t, consts), carry, xs)
        return out

    # Chain repeats (each consumes the previous output) AND salt every step
    # with a unique scalar the step mixes into its state: identical repeated
    # dispatches get elided by the tunnel relay and measure ~0, and chained
    # runs alone converge to a fixed point of the step map (docs/PERF.md).
    def sync(c):
        # On the tunnel relay block_until_ready alone does not drain the
        # pipeline — only an actual value readout does. Pull one scalar.
        leaf = jax.tree_util.tree_leaves(c)[0]
        float(leaf.reshape(-1)[0])

    from ..utils.timing import sync_overhead_s

    ovh = sync_overhead_s()  # the readout itself costs a fixed ~25 ms
    carry = run(carry, consts, jnp.float32(0))
    sync(carry)
    times = []
    for i in range(repeats + 1):
        t0 = time.perf_counter()
        carry = run(carry, consts, jnp.float32(i + 1))
        sync(carry)
        times.append(max(0.0, time.perf_counter() - t0 - ovh) / steps)
    # first timed repeat right after warmup can still read fast (one-deep
    # pipelining) — discard it and take the median of the rest.
    times = sorted(times[1:])
    return times[len(times) // 2]


def attribute_decode(cfg=None, batch: int = 32, cache_len: int = 256,
                     steps: int = 64) -> dict:
    from ..models import ModelConfig, init_params, quantize_params_int8
    from ..models.transformer import layer_view, _linear
    from ..kernels.int8_kv_attention import int8_kv_decode_attention
    from ..kernels.quant import quantize_int8
    from ..ops.norms import rms_norm
    from ..ops.rope import apply_rope, rope_frequencies
    from ..specs import get_tpu_spec

    if cfg is None:
        cfg = ModelConfig(vocab_size=32000, hidden_dim=2048, num_layers=16,
                          num_heads=16, num_kv_heads=4, intermediate_dim=5632,
                          max_seq_len=2048, dtype="bfloat16")
    params = quantize_params_int8(init_params(jax.random.PRNGKey(0), cfg))
    L, d, f = cfg.num_layers, cfg.hidden_dim, cfg.intermediate_dim
    hq, hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    B, S = batch, cache_len
    dt = jnp.dtype(cfg.dtype)

    key = jax.random.PRNGKey(1)
    x0 = jax.random.normal(key, (B, d), dt)

    # --- matmuls only: the model's exact _linear path over stacked weights ---
    def matmul_step(x, t, params):
        x = x + (t * 1e-3).astype(dt)

        def body(x, l):
            bp = layer_view(params["blocks"], l)
            qkv = _linear(x, bp["wqkv"])
            x = x + _linear(qkv[:, : hq * hd], bp["wo"])
            gu = _linear(x, bp["w_gate_up"])
            x = x + _linear(gu[:, :f], bp["w_down"])
            return x, None

        for l in range(L):  # unrolled, mirroring ModelConfig.decode_unroll
            x, _ = body(x, l)
        y = _linear(x, params["lm_head"])
        x = x + y[:, :d].astype(dt) * 1e-6  # keep lm_head live
        # renormalize once per step: unbounded matmul chains hit bf16 inf/NaN
        # within a few steps, and NaN buffers are value-identical across
        # chained repeats (eliding risk, docs/PERF.md)
        x = x * lax.rsqrt(jnp.mean(jnp.square(x.astype(jnp.float32))) + 1e-6)
        return x.astype(dt), None

    t_matmul = _time_scan(matmul_step, x0, steps, consts=params)

    # --- attention only: fused INT8-KV kernel over full stacked caches ---
    kq = jax.random.randint(key, (L, B, S, hkv * hd), -127, 127, jnp.int8)
    ks = jnp.full((L, B, hkv, S), 0.05, jnp.float32)
    vq = jax.random.randint(key, (L, B, S, hkv * hd), -127, 127, jnp.int8)
    vs = jnp.full((L, B, hkv, S), 0.05, jnp.float32)
    qslot = jnp.full((B,), S - 1, jnp.int32)
    q0 = jax.random.normal(key, (B, hq, hd), dt)

    def attn_step(q, t, caches):
        kq, ks, vq, vs = caches
        q = q + (t * 1e-3).astype(q.dtype)

        def body(q, l):
            o = int8_kv_decode_attention(q, kq, ks, vq, vs, q_slot=qslot,
                                         layer=l)
            return o.astype(q.dtype), None

        for l in range(L):  # unrolled, mirroring ModelConfig.decode_unroll
            q, _ = body(q, l)
        return q, None

    t_attn = _time_scan(attn_step, q0, steps, consts=(kq, ks, vq, vs))

    # --- glue only: norms/rope/quantize+write/silu/residuals/sampling with
    # matmuls and attention replaced by shape-preserving broadcasts ---
    rope_cos, rope_sin = rope_frequencies(hd, cfg.max_seq_len, cfg.rope_theta)
    kcache = jnp.zeros((L, B, S, hkv, hd), jnp.int8)
    kscale = jnp.zeros((L, B, hkv, S), jnp.float32)
    pos = jnp.full((B, 1), S - 1, jnp.int32)

    def glue_step(carry, t, params):
        x, kc, kc_s = carry
        x = x + (t * 1e-3).astype(dt)

        def body(carry, l):
            x, kc, kcs = carry
            h = rms_norm(x[:, None], lax.dynamic_index_in_dim(
                params["blocks"]["ln1"], l, 0, keepdims=False), cfg.norm_eps)
            q = jnp.broadcast_to(h[:, :, None, :hd], (B, 1, hq, hd))
            k = h[:, :, None, :hd] * jnp.ones((B, 1, hkv, hd), dt)
            q = apply_rope(q, rope_cos, rope_sin, pos)
            k = apply_rope(k, rope_cos, rope_sin, pos)
            knew, ksnew = quantize_int8(k, axis=-1)
            kc = lax.dynamic_update_slice(kc, knew[None],
                                          (l, 0, S - 1, 0, 0))
            kcs = lax.dynamic_update_slice(
                kcs, ksnew[..., 0].transpose(0, 2, 1)[None],
                (l, 0, 0, S - 1))
            attn = q.reshape(B, hq * hd)[:, :d]
            x = x + attn
            h2 = rms_norm(x[:, None], lax.dynamic_index_in_dim(
                params["blocks"]["ln2"], l, 0, keepdims=False), cfg.norm_eps)
            gate = jnp.broadcast_to(h2[:, 0, :, None], (B, d, 2)).reshape(B, -1)[:, :f]
            x = x + (jax.nn.silu(gate) * gate)[:, :d]
            return (x, kc, kcs), None

        carry = (x, kc, kc_s)
        for l in range(L):  # unrolled, mirroring ModelConfig.decode_unroll
            carry, _ = body(carry, l)
        (x, kc, kc_s2) = carry
        logits = jnp.broadcast_to(x[:, :1], (B, cfg.vocab_size)).astype(
            jnp.float32)
        tok = jnp.argmax(logits, -1)
        return (x + tok[:, None].astype(dt) * 0, kc, kc_s2), None

    t_glue = _time_scan(glue_step, (x0, kcache, kscale), steps, consts=params)

    # --- roofline floors ---
    spec = get_tpu_spec()
    wbytes = sum(t.size for t in jax.tree_util.tree_leaves(params["blocks"])
                 if t.dtype == jnp.int8)
    wbytes += params["lm_head"].q.size if hasattr(params["lm_head"], "q") \
        else params["lm_head"].size
    kv_bytes = 2 * (kq.nbytes + ks.nbytes)
    return {
        "matmul_s": t_matmul,
        "matmul_floor_s": wbytes / spec.hbm_bandwidth,
        "matmul_eff": wbytes / spec.hbm_bandwidth / t_matmul,
        "attn_s": t_attn,
        "attn_floor_s": kv_bytes / spec.hbm_bandwidth,
        "attn_eff": kv_bytes / spec.hbm_bandwidth / t_attn,
        "glue_s": t_glue,
        "sum_s": t_matmul + t_attn + t_glue,
        "weight_bytes": wbytes,
        "kv_bytes": kv_bytes,
    }


def main():
    r = attribute_decode()
    print(f"{'component':<12}{'ms/step':>10}{'floor ms':>10}{'% of BW':>9}")
    for name in ("matmul", "attn"):
        print(f"{name:<12}{r[name + '_s'] * 1e3:>10.3f}"
              f"{r[name + '_floor_s'] * 1e3:>10.3f}"
              f"{r[name + '_eff'] * 100:>8.1f}%")
    print(f"{'glue':<12}{r['glue_s'] * 1e3:>10.3f}{'—':>10}{'—':>9}")
    print(f"{'sum':<12}{r['sum_s'] * 1e3:>10.3f}")
    print(f"weights {r['weight_bytes'] / 1e6:.0f} MB, "
          f"KV {r['kv_bytes'] / 1e6:.0f} MB")


if __name__ == "__main__":
    main()
