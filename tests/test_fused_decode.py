"""Fused whole-model decode kernel (kernels/fused_decode.py) parity tests.

The kernel runs every layer's matmuls + attention + glue in one pallas_call;
these tests check it against the per-op decode path (interpret mode on CPU;
the same comparison is driven on real TPU by the verify flow)."""
import numpy as np
import jax
import pytest

_slow = pytest.mark.slow
import jax.numpy as jnp

from physics_llm_inference_tpu.models import (ModelConfig, init_params,
                                              quantize_params_int8, forward)
from physics_llm_inference_tpu.models.transformer import (_linear,
                                                          _scatter_new_kv)
from physics_llm_inference_tpu.ops.norms import rms_norm
from physics_llm_inference_tpu.ops.rope import rope_frequencies
from physics_llm_inference_tpu.runtime import KVCache
from physics_llm_inference_tpu.kernels.fused_decode import fused_decode_step

CFG = ModelConfig(vocab_size=256, hidden_dim=512, num_layers=2,
                  num_heads=4, num_kv_heads=2, intermediate_dim=768,
                  max_seq_len=64, dtype="bfloat16")


def _setup(B=8, P=12, S=32):
    params = quantize_params_int8(init_params(jax.random.PRNGKey(0), CFG))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 256, (B, P)), jnp.int32)
    cache = KVCache.create(CFG, B, S, dtype=jnp.int8)
    logits_p, kv = forward(params, ids, CFG, kv=cache.as_slice(),
                           last_only=True)
    tok = jnp.argmax(logits_p[:, 0], -1)[:, None].astype(jnp.int32)
    return params, kv, tok, P


def _fused(params, kv, tok, P, B):
    x = params["embed"][tok[:, 0]].astype(jnp.dtype(CFG.dtype))
    pos = jnp.full((B,), P, jnp.int32)
    cos_t, sin_t = rope_frequencies(CFG.head_dim, CFG.max_seq_len,
                                    CFG.rope_theta)
    return fused_decode_step(
        params["blocks"], x, kv.k.q, kv.k.s, kv.v.q, kv.v.s,
        q_slot=pos, valid_from=None, rope_cos_g=cos_t[pos],
        rope_sin_g=sin_t[pos], cfg=CFG), pos


class TestFusedShapes:
    """The kernel must hold parity across head/batch/cache-shape variants."""

    import pytest as _pytest

    @_pytest.mark.parametrize("hq,hkv,B,S", [
        (4, 4, 8, 32),     # MHA (group 1)
        (8, 1, 8, 32),     # MQA (single kv head)
        (4, 2, 16, 64),    # bigger batch, deeper cache
        (4, 2, 24, 32),    # batch not a power of two (RB=8 blocks)
    ])
    def test_parity(self, hq, hkv, B, S):
        import dataclasses
        cfg = dataclasses.replace(CFG, num_heads=hq, num_kv_heads=hkv,
                                  hidden_dim=128 * hq)
        P = 12
        params = quantize_params_int8(init_params(jax.random.PRNGKey(1), cfg))
        rng = np.random.default_rng(1)
        ids = jnp.asarray(rng.integers(1, 256, (B, P)), jnp.int32)
        cache = KVCache.create(cfg, B, S, dtype=jnp.int8)
        logits_p, kv = forward(params, ids, cfg, kv=cache.as_slice(),
                               last_only=True)
        tok = jnp.argmax(logits_p[:, 0], -1)[:, None].astype(jnp.int32)
        logits_ref, _ = forward(params, tok, cfg, kv=kv, last_only=True)

        x = params["embed"][tok[:, 0]].astype(jnp.dtype(cfg.dtype))
        pos = jnp.full((B,), P, jnp.int32)
        cos_t, sin_t = rope_frequencies(cfg.head_dim, cfg.max_seq_len,
                                        cfg.rope_theta)
        x_out, *_ = fused_decode_step(
            params["blocks"], x, kv.k.q, kv.k.s, kv.v.q, kv.v.s,
            q_slot=pos, valid_from=None, rope_cos_g=cos_t[pos],
            rope_sin_g=sin_t[pos], cfg=cfg)
        xn = rms_norm(x_out[:, None], params["norm"], cfg.norm_eps)
        logits_f = _linear(xn, params["lm_head"]).astype(jnp.float32)
        rel = float(jnp.linalg.norm(logits_f[:, 0] - logits_ref[:, 0])
                    / jnp.linalg.norm(logits_ref[:, 0]))
        assert rel < 0.03, (hq, hkv, B, S, rel)


class TestFusedDecodeParity:
    def test_logits_match_per_op_path(self):
        B = 8
        params, kv, tok, P = _setup(B=B)
        logits_ref, _ = forward(params, tok, CFG, kv=kv, last_only=True)
        (x_out, *_), _ = _fused(params, kv, tok, P, B)
        xn = rms_norm(x_out[:, None], params["norm"], CFG.norm_eps)
        logits_f = _linear(xn, params["lm_head"]).astype(jnp.float32)
        rel = float(jnp.linalg.norm(logits_f[:, 0] - logits_ref[:, 0])
                    / jnp.linalg.norm(logits_ref[:, 0]))
        # the fused kernel keeps the residual stream in f32 (per-op path
        # rounds to bf16 every residual add) so tiny drift is expected;
        # argmax agreement is only meaningful where the reference top-2
        # margin exceeds that drift (random-init logits are near-flat)
        assert rel < 0.03, rel
        top2 = jnp.sort(logits_ref[:, 0], axis=-1)[:, -2:]
        decisive = (top2[:, 1] - top2[:, 0]) > 0.05
        match = jnp.argmax(logits_f[:, 0], -1) == jnp.argmax(
            logits_ref[:, 0], -1)
        assert bool(jnp.all(jnp.where(decisive, match, True))), (
            np.asarray(match), np.asarray(decisive))

    def test_new_kv_matches_cache_write(self):
        B = 8
        params, kv, tok, P = _setup(B=B)
        _, kv_ref = forward(params, tok, CFG, kv=kv, last_only=True)
        (x_out, k_new, ksc, v_new, vsc), pos = _fused(params, kv, tok, P, B)
        # layer 0 sees identical inputs on both paths → bit-exact int8
        np.testing.assert_array_equal(np.asarray(kv_ref.k.q[0, :, P, :]),
                                      np.asarray(k_new[0]))
        np.testing.assert_array_equal(np.asarray(kv_ref.v.q[0, :, P, :]),
                                      np.asarray(v_new[0]))
        np.testing.assert_allclose(np.asarray(kv_ref.k.s[0, :, :, P]),
                                   np.asarray(ksc[0]), rtol=1e-6)
        # deeper layers: f32-vs-bf16 residual stream → ±1 int8 code
        kd = np.mean(np.abs(np.asarray(kv_ref.k.q[:, :, P, :], np.int32)
                            - np.asarray(k_new, np.int32)) <= 1)
        assert kd > 0.99, kd

    def test_w8a8_close_to_w8a16(self):
        """act_quant='int8' (dynamic W8A8) stays close to bf16 activations."""
        import dataclasses
        B = 8
        params, kv, tok, P = _setup(B=B)
        (x16, *_), pos = _fused(params, kv, tok, P, B)
        cfg8 = dataclasses.replace(CFG, act_quant="int8")
        x = params["embed"][tok[:, 0]].astype(jnp.dtype(CFG.dtype))
        cos_t, sin_t = rope_frequencies(CFG.head_dim, CFG.max_seq_len,
                                        CFG.rope_theta)
        x8, *_ = fused_decode_step(
            params["blocks"], x, kv.k.q, kv.k.s, kv.v.q, kv.v.s,
            q_slot=pos, valid_from=None, rope_cos_g=cos_t[pos],
            rope_sin_g=sin_t[pos], cfg=cfg8)
        rel = float(jnp.linalg.norm((x8 - x16).astype(jnp.float32))
                    / jnp.linalg.norm(x16.astype(jnp.float32)))
        assert rel < 0.05, rel

    def test_write_cache_mode_matches_scatter(self):
        """In-place aliased cache writes ≡ returned-KV + outside scatter."""
        B = 8
        params, kv, tok, P = _setup(B=B)
        (x_ret, k_new, ksc, v_new, vsc), pos = _fused(params, kv, tok, P, B)
        k_ref = _scatter_new_kv(kv.k, k_new, ksc, jnp.int32(P))
        v_ref = _scatter_new_kv(kv.v, v_new, vsc, jnp.int32(P))

        x = params["embed"][tok[:, 0]].astype(jnp.dtype(CFG.dtype))
        cos_t, sin_t = rope_frequencies(CFG.head_dim, CFG.max_seq_len,
                                        CFG.rope_theta)
        x_w, kq2, ks2, vq2, vs2 = fused_decode_step(
            params["blocks"], x, kv.k.q, kv.k.s, kv.v.q, kv.v.s,
            q_slot=pos, valid_from=None, rope_cos_g=cos_t[pos],
            rope_sin_g=sin_t[pos], cfg=CFG,
            slot=jnp.int32(P), write_cache=True)
        np.testing.assert_array_equal(np.asarray(x_w), np.asarray(x_ret))
        np.testing.assert_array_equal(np.asarray(kq2), np.asarray(k_ref.q))
        np.testing.assert_array_equal(np.asarray(vq2), np.asarray(v_ref.q))
        np.testing.assert_allclose(np.asarray(ks2), np.asarray(k_ref.s),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(vs2), np.asarray(v_ref.s),
                                   rtol=1e-6)

    def test_scatter_new_kv_roundtrip(self):
        B = 8
        params, kv, tok, P = _setup(B=B)
        (x_out, k_new, ksc, v_new, vsc), pos = _fused(params, kv, tok, P, B)
        # per-request offsets (all equal here) and scalar offset must agree
        per_req = _scatter_new_kv(kv.k, k_new, ksc, pos)
        scalar = _scatter_new_kv(kv.k, k_new, ksc, jnp.int32(P))
        np.testing.assert_array_equal(np.asarray(per_req.q),
                                      np.asarray(scalar.q))
        np.testing.assert_array_equal(np.asarray(per_req.s),
                                      np.asarray(scalar.s))
        assert bool(jnp.all(per_req.q[:, :, P, :] == k_new))


class TestFusedPagedParity:
    """The paged megakernel (block-table fan) must agree with the slot
    megakernel on identical KV content, and with the kernel's variant
    flags (wmajor / silu_spread) active."""

    def _paged_setup(self, B=8, BS=8, MB=4, seed=0):
        from physics_llm_inference_tpu.models.quant import init_params_int8

        cfg = ModelConfig(vocab_size=64, hidden_dim=256, num_layers=2,
                          num_heads=4, num_kv_heads=2, intermediate_dim=512,
                          max_seq_len=64, dtype="bfloat16")
        L = cfg.num_layers
        S = BS * MB
        flat = cfg.num_kv_heads * cfg.head_dim
        params = init_params_int8(jax.random.PRNGKey(seed), cfg)
        rng = np.random.default_rng(seed)
        lens = rng.integers(1, S - 1, (B,)).astype(np.int32)

        kq_s = rng.integers(-127, 128, (L, B, S, flat)).astype(np.int8)
        vq_s = rng.integers(-127, 128, (L, B, S, flat)).astype(np.int8)
        ks_s = (np.abs(rng.normal(size=(L, B, cfg.num_kv_heads, S)))
                * 0.05 + 0.01).astype(np.float32)
        vs_s = (np.abs(rng.normal(size=(L, B, cfg.num_kv_heads, S)))
                * 0.05 + 0.01).astype(np.float32)
        for i, ln in enumerate(lens):
            kq_s[:, i, ln:] = 0
            vq_s[:, i, ln:] = 0

        NB = B * MB + 3
        tables = (rng.permutation(B * MB) + 2).reshape(B, MB).astype(np.int32)
        # MERGED pools (round 5): each block's K page (dim-2 index 0) and
        # V page (index 1) co-located — one DMA descriptor per block
        kv_p = np.zeros((L, NB, 2, BS, flat), np.int8)
        kvs_p = np.ones((L, NB, 2, cfg.num_kv_heads, BS), np.float32)
        for i in range(B):
            for c in range(MB):
                blk = tables[i, c]
                kv_p[:, blk, 0] = kq_s[:, i, c * BS:(c + 1) * BS]
                kv_p[:, blk, 1] = vq_s[:, i, c * BS:(c + 1) * BS]
                kvs_p[:, blk, 0] = ks_s[:, i, :, c * BS:(c + 1) * BS]
                kvs_p[:, blk, 1] = vs_s[:, i, :, c * BS:(c + 1) * BS]

        x0 = jnp.asarray(rng.normal(size=(B, cfg.hidden_dim)), jnp.bfloat16)
        cos_t, sin_t = rope_frequencies(cfg.head_dim, cfg.max_seq_len,
                                        cfg.rope_theta)
        cos_g = jnp.asarray(np.asarray(cos_t)[lens])
        sin_g = jnp.asarray(np.asarray(sin_t)[lens])
        slot = dict(kq=jnp.asarray(kq_s), ks=jnp.asarray(ks_s),
                    vq=jnp.asarray(vq_s), vs=jnp.asarray(vs_s))
        paged = dict(kv=jnp.asarray(kv_p), kvs=jnp.asarray(kvs_p))
        return (cfg, params["blocks"], x0, lens, tables, cos_g, sin_g,
                slot, paged)

    @_slow
    def test_paged_matches_slot_megakernel(self):
        from physics_llm_inference_tpu.kernels.fused_decode import (
            _fused_decode_step, fused_paged_decode_step)

        (cfg, blocks, x0, lens, tables, cos_g, sin_g,
         slot, paged) = self._paged_setup()
        B = x0.shape[0]
        ref = _fused_decode_step(
            blocks, x0, slot["kq"], slot["ks"], slot["vq"], slot["vs"],
            q_slot=jnp.asarray(lens), valid_from=jnp.zeros(B, jnp.int32),
            rope_cos_g=cos_g, rope_sin_g=sin_g, cfg=cfg, slot=None,
            write_cache=False, tn_target=128, rb_bytes=1)
        for wmajor, spread in ((False, False), (True, True)):
            blk = blocks
            if wmajor:
                from physics_llm_inference_tpu.kernels.fused_decode import \
                    to_nmajor
                blk = to_nmajor(blocks)
            got = fused_paged_decode_step(
                blk, x0, paged["kv"], paged["kvs"],
                jnp.asarray(tables), jnp.asarray(lens), cos_g, sin_g,
                cfg=cfg, tn_target=128, wmajor=wmajor, silu_spread=spread)
            for name, a, b in zip(("x", "k_new", "ksc", "v_new", "vsc"),
                                  ref, got):
                np.testing.assert_allclose(
                    np.asarray(a, np.float32), np.asarray(b, np.float32),
                    rtol=2e-2, atol=2e-2,
                    err_msg=f"wmajor={wmajor} {name}")

    @_slow
    def test_rotating_rings_match_full_rings(self):
        """Round 5: the rotating value rings (G < na slots — what makes
        ring VMEM independent of KV capacity, and the fused paged path
        viable at production contexts) must be BIT-identical to the
        full-ring schedule: rotation only changes the DMA refill
        schedule, never the attention math."""
        from physics_llm_inference_tpu.kernels.fused_decode import \
            fused_paged_decode_step

        (cfg, blocks, x0, lens, tables, cos_g, sin_g,
         slot, paged) = self._paged_setup(B=32, seed=3)   # na = 4
        tb, ln = jnp.asarray(tables), jnp.asarray(lens)
        full = fused_paged_decode_step(
            blocks, x0, paged["kv"], paged["kvs"],
            tb, ln, cos_g, sin_g, cfg=cfg, tn_target=128, inplace=True,
            ring_slots=4)
        for g in (2, 1):
            rot = fused_paged_decode_step(
                blocks, x0, paged["kv"], paged["kvs"],
                tb, ln, cos_g, sin_g, cfg=cfg, tn_target=128,
                inplace=True, ring_slots=g)
            for name, a, b in zip(("x", "k", "ks", "v", "vs",
                                   "kv2", "kvs2"), full, rot):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                              err_msg=f"G={g} {name}")

    def test_default_engine_config_is_fused_capable_at_7b(self):
        """The round-4 verdict's top gap: the DEFAULT PagedEngineConfig
        (1024-token capacity, B=64) silently ran the per-op path because
        full-depth rings capped fused capacity at 512. With rotating
        rings + the 512-token block geometry it must pass the gate."""
        from physics_llm_inference_tpu.kernels.fused_decode import \
            fused_paged_decode_ok
        from physics_llm_inference_tpu.models import ModelConfig
        from physics_llm_inference_tpu.serve.paged_engine import \
            PagedEngineConfig

        cfg7 = ModelConfig(vocab_size=32000, hidden_dim=4096, num_layers=32,
                           num_heads=32, num_kv_heads=8,
                           intermediate_dim=11008, max_seq_len=2048)
        pc = PagedEngineConfig()
        assert pc.block_size * pc.max_blocks_per_request >= 1024
        assert fused_paged_decode_ok(cfg7, pc.max_batch,
                                     pc.max_blocks_per_request,
                                     pc.block_size,
                                     NB=pc.num_blocks + 1)

    @_slow
    def test_paged_step_impl_scatter_layout(self):
        """The fused branch's pool scatter must land new K/V exactly where
        the per-op path writes them (advanced-indexing axis order)."""
        from physics_llm_inference_tpu.models.transformer import QuantKV
        from physics_llm_inference_tpu.kernels.fused_decode import \
            fused_paged_decode_step

        (cfg, blocks, x0, lens, tables, cos_g, sin_g,
         slot, paged) = self._paged_setup(seed=1)
        B = x0.shape[0]
        BS = paged["kv"].shape[3]
        _, k_new, ksc, v_new, vsc = fused_paged_decode_step(
            blocks, x0, paged["kv"], paged["kvs"],
            jnp.asarray(tables), jnp.asarray(lens), cos_g, sin_g,
            cfg=cfg, tn_target=128)
        blk = jnp.asarray(tables)[jnp.arange(B), jnp.asarray(lens) // BS]
        off = jnp.asarray(lens) % BS
        q2 = paged["kv"].at[:, blk, 0, off].set(k_new)
        s2 = paged["kvs"].at[:, blk, 0, :, off].set(ksc.transpose(1, 0, 2))
        for r in range(B):
            np.testing.assert_array_equal(
                np.asarray(q2[:, blk[r], 0, off[r]]),
                np.asarray(k_new[:, r]))
            np.testing.assert_allclose(
                np.asarray(s2[:, blk[r], 0, :, off[r]]),
                np.asarray(ksc[:, r]), rtol=1e-6)


class TestFusedInt4:
    """W4A16: nibble-packed weights with kernel-tile-aligned group scales
    through BOTH paths — the fused kernel (in-VMEM unpack) and the per-op
    _linear fallback (XLA dequant) share the same QuantizedTensor4 params,
    so they must agree."""

    def _setup4(self, B=8, P=12, S=32):
        from physics_llm_inference_tpu.models.quant import (
            QuantizedTensor4, quantize_params_int4)

        fp = init_params(jax.random.PRNGKey(0), CFG)
        params = quantize_params_int4(fp)
        assert isinstance(params["blocks"]["wqkv"], QuantizedTensor4)
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(1, 256, (B, P)), jnp.int32)
        cache = KVCache.create(CFG, B, S, dtype=jnp.int8)
        logits_p, kv = forward(params, ids, CFG, kv=cache.as_slice(),
                               last_only=True)
        tok = jnp.argmax(logits_p[:, 0], -1)[:, None].astype(jnp.int32)
        return params, kv, tok, P

    @_slow
    def test_int4_fused_matches_per_op(self):
        B = 8
        params, kv, tok, P = self._setup4(B=B)
        logits_ref, _ = forward(params, tok, CFG, kv=kv, last_only=True)
        (x_out, *_), _ = _fused(params, kv, tok, P, B)
        xn = rms_norm(x_out[:, None], params["norm"], CFG.norm_eps)
        logits_f = _linear(xn, params["lm_head"]).astype(jnp.float32)
        rel = float(jnp.linalg.norm(logits_f[:, 0] - logits_ref[:, 0])
                    / jnp.linalg.norm(logits_ref[:, 0]))
        assert rel < 0.03, rel

    def test_int4_dequant_roundtrip(self):
        from physics_llm_inference_tpu.models.quant import (
            _quantize_stacked_int4)

        w = jax.random.normal(jax.random.PRNGKey(3), (2, 256, 128),
                              jnp.float32) * 0.05
        t4 = _quantize_stacked_int4(w, group=128)
        deq = t4.dequantize(jnp.float32)
        assert deq.shape == w.shape
        # int4 RTN with group-128 absmax scales: bounded relative error
        rel = float(jnp.linalg.norm(deq - w) / jnp.linalg.norm(w))
        assert rel < 0.12, rel
        # per-layer slice agrees with the full dequant
        np.testing.assert_allclose(
            np.asarray(t4.dequantize_layer(1, jnp.float32)),
            np.asarray(deq[1]), rtol=1e-6, atol=1e-6)

    def test_int4_group_matches_kernel_tiles(self):
        from physics_llm_inference_tpu.kernels.fused_decode import \
            int4_group_size

        params, *_ = self._setup4()
        for name in ("wqkv", "wo", "w_gate_up", "w_down"):
            t4 = params["blocks"][name]
            l, k, n = t4.shape
            assert t4.group == int4_group_size(k, n), name

    def test_int4_generate_end_to_end(self):
        from physics_llm_inference_tpu.models.quant import \
            quantize_params_int4
        from physics_llm_inference_tpu.runtime import cached_generate

        fp = init_params(jax.random.PRNGKey(0), CFG)
        p4 = quantize_params_int4(fp)
        out = cached_generate(p4, CFG, [[5, 9, 2, 7]], 6, temperature=0.0,
                              kv_dtype=jnp.int8)
        assert out.tokens.shape == (1, 6)
        # int4 vs fp weights: same model family, tokens may diverge but the
        # run must be finite and in-vocab
        assert int(out.tokens.max()) < CFG.vocab_size


class TestKvPrefetch:
    """The manual deep-lookahead KV prefetch path (kvp) must stay
    bit-identical to the auto-pipelined write_cache path."""

    def test_kvp_bit_identical_to_v1(self):
        from physics_llm_inference_tpu.kernels.fused_decode import \
            _fused_decode_step

        B, S = 16, 32
        params, kv, tok, P = _setup(B=B, S=S)
        x = params["embed"][tok[:, 0]].astype(jnp.dtype(CFG.dtype))
        pos = jnp.full((B,), P, jnp.int32)
        cos_t, sin_t = rope_frequencies(CFG.head_dim, CFG.max_seq_len,
                                        CFG.rope_theta)

        def run(kvp):
            return _fused_decode_step(
                params["blocks"], x, kv.k.q, kv.k.s, kv.v.q, kv.v.s,
                pos, None, cos_t[pos], sin_t[pos], cfg=CFG,
                slot=jnp.int32(P), write_cache=True, interpret=True,
                kblock=True, kv_prefetch=kvp)

        a, b = run(False), run(True)
        for name, xa, xb in zip(["x", "kq", "ks", "vq", "vs"], a, b):
            assert np.array_equal(np.asarray(xa), np.asarray(xb)), name

    def test_kvp_rotating_slots_bit_identical(self):
        """Rotating value rings (G < na, round 4 — the B=128 VMEM shape)
        must produce the same step as full rings and the v1 path. S=128
        satisfies the kvp gate's lane-alignment; rb_bytes=1 forces RB=8 so
        na=4 groups rotate through G=2 slots."""
        from physics_llm_inference_tpu.kernels.fused_decode import \
            _fused_decode_step

        B, S = 32, 128
        params, kv, tok, P = _setup(B=B, S=S)
        x = params["embed"][tok[:, 0]].astype(jnp.dtype(CFG.dtype))
        pos = jnp.full((B,), P, jnp.int32)
        cos_t, sin_t = rope_frequencies(CFG.head_dim, CFG.max_seq_len,
                                        CFG.rope_theta)

        def run(kvp, slots=None):
            return _fused_decode_step(
                params["blocks"], x, kv.k.q, kv.k.s, kv.v.q, kv.v.s,
                pos, None, cos_t[pos], sin_t[pos], cfg=CFG,
                slot=jnp.int32(P), write_cache=True, interpret=True,
                kblock=True, kv_prefetch=kvp, rb_bytes=1,
                kvp_slots=slots)

        ref = run(False)
        for slots in (4, 2):  # full rings, then 2-slot rotation
            got = run(True, slots)
            for name, xa, xb in zip(["x", "kq", "ks", "vq", "vs"],
                                    ref, got):
                assert np.array_equal(np.asarray(xa), np.asarray(xb)), \
                    (slots, name)


class TestLmHeadGreedy:
    def test_eligibility_gate(self):
        """The forward() fast-path gate must reject geometries the kernel
        would assert on (D not divisible by the selected K-tile) and
        VMEM-overflowing batches, instead of crashing at trace time."""
        from physics_llm_inference_tpu.kernels.lmhead import lmhead_greedy_ok

        assert lmhead_greedy_ok(16, 512, 32000)          # normal
        assert lmhead_greedy_ok(64, 4096, 32000)         # 7B headline
        assert not lmhead_greedy_ok(16, 320, 32000)      # D % TK != 0
        assert not lmhead_greedy_ok(16, 512, 32000 + 64)  # V not lane-mult
        assert not lmhead_greedy_ok(512, 4096, 32000)    # (B,V) f32 > VMEM

    def test_ineligible_geometry_falls_back(self):
        """forward(greedy_head=True) on a D%128!=0 model must take the
        argmax fallback, not crash inside lmhead_greedy (ADVICE r3)."""
        from physics_llm_inference_tpu.models import (ModelConfig,
                                                      init_params,
                                                      quantize_params_int8)
        from physics_llm_inference_tpu.models.transformer import (KVSlice,
                                                                  forward)

        cfg = ModelConfig(vocab_size=256, hidden_dim=320, num_layers=1,
                          num_heads=5, num_kv_heads=5, intermediate_dim=512,
                          max_seq_len=32)
        params = quantize_params_int8(init_params(jax.random.PRNGKey(0), cfg))
        B, S = 2, 8
        k = jnp.zeros((cfg.num_layers, B, S, cfg.num_kv_heads, cfg.head_dim),
                      jnp.bfloat16)
        kv = KVSlice(k, k, 0)
        tok_ids = jnp.ones((B, 4), jnp.int32)
        tok, _ = forward(params, tok_ids, cfg, kv=kv, greedy_head=True)
        assert tok.shape == (B,) and tok.dtype == jnp.int32

    def test_matches_argmax_over_per_op_logits(self):
        from physics_llm_inference_tpu.kernels.lmhead import lmhead_greedy

        B = 16
        params, kv, tok, P = _setup(B=B)
        # per-op tail on a random hidden state
        x = jax.random.normal(jax.random.PRNGKey(5), (B, CFG.hidden_dim)
                              ).astype(jnp.bfloat16)
        lm = params["lm_head"]
        got = np.asarray(lmhead_greedy(x, params["norm"], lm.q, lm.s,
                                       eps=CFG.norm_eps, interpret=True))
        xn = rms_norm(x[:, None], params["norm"], CFG.norm_eps)
        logits = _linear(xn, lm).astype(jnp.float32)
        ref = np.asarray(jnp.argmax(logits[:, 0], -1))
        assert np.array_equal(got, ref)

    def test_greedy_decode_path_matches_sampled_t0(self):
        """cached_generate at T=0 (greedy fast path) must emit the same
        tokens as a near-zero-temperature sampled run."""
        from physics_llm_inference_tpu.runtime import cached_generate

        params = quantize_params_int8(init_params(jax.random.PRNGKey(0), CFG))
        prompts = [[5, 9, 2, 7, 11], [3, 4]]
        a = cached_generate(params, CFG, prompts, 8, temperature=0.0,
                            kv_dtype=jnp.int8)
        b = cached_generate(params, CFG, prompts, 8, temperature=1e-6,
                            kv_dtype=jnp.int8)
        assert np.array_equal(a.tokens, b.tokens)


class TestPagedInplaceWrites:
    @_slow
    def test_inplace_pools_match_xla_scatter(self):
        """inplace=True: the kernel's own pool writes must produce pools
        bit-identical to the returned-new-KV + XLA scatter path."""
        from physics_llm_inference_tpu.kernels.fused_decode import \
            fused_paged_decode_step

        setup = TestFusedPagedParity()
        (cfg, blocks, x0, lens, tables, cos_g, sin_g,
         slot, paged) = setup._paged_setup(seed=2)
        B = x0.shape[0]
        BS = paged["kv"].shape[3]
        tb, ln = jnp.asarray(tables), jnp.asarray(lens)

        x_ref, k_new, ksc, v_new, vsc = fused_paged_decode_step(
            blocks, x0, paged["kv"], paged["kvs"],
            tb, ln, cos_g, sin_g, cfg=cfg, tn_target=128)
        blk = tb[jnp.arange(B), ln // BS]
        off = ln % BS
        kv_ref = paged["kv"].at[:, blk, 0, off].set(k_new) \
                            .at[:, blk, 1, off].set(v_new)
        kvs_ref = paged["kvs"].at[:, blk, 0, :, off].set(
            ksc.transpose(1, 0, 2)).at[:, blk, 1, :, off].set(
            vsc.transpose(1, 0, 2))

        out = fused_paged_decode_step(
            blocks, x0, paged["kv"], paged["kvs"],
            tb, ln, cos_g, sin_g, cfg=cfg, tn_target=128, inplace=True)
        x_ip, kv2, kvs2 = out[0], out[5], out[6]
        np.testing.assert_array_equal(np.asarray(x_ip), np.asarray(x_ref))
        for name, a, b in (("kv", kv_ref, kv2), ("kvs", kvs_ref, kvs2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=name)
