"""Pallas kernel tests (interpret mode on CPU) — the reference's
equivalence-test idiom: kernel vs pure-JAX reference (ch05/test_ch05.py:117-136
Triton-vs-torch, ch06/test_ch06.py:169-189 flash-vs-naive)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physics_llm_inference_tpu.kernels import (
    tiled_matmul, int8_matmul, quantize_weights_int8,
    quantize_int8, dequantize_int8, flash_attention, FlashConfig,
)
from physics_llm_inference_tpu.kernels.quant import quantization_error
from physics_llm_inference_tpu.ops import causal_attention, naive_attention


def rand(*shape, key=0, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


class TestTiledMatmul:
    def test_matches_xla(self):
        a, b = rand(512, 1024, key=1), rand(1024, 768, key=2)
        np.testing.assert_allclose(tiled_matmul(a, b), a @ b, atol=1e-4)

    def test_single_block(self):
        a, b = rand(128, 128, key=3), rand(128, 128, key=4)
        np.testing.assert_allclose(tiled_matmul(a, b), a @ b, atol=1e-4)

    def test_k_accumulation_across_blocks(self):
        # K=2048 → 4 K-blocks at bk=512: exercises the accumulator path
        a, b = rand(256, 2048, key=5), rand(2048, 256, key=6)
        np.testing.assert_allclose(tiled_matmul(a, b), a @ b, atol=1e-3)

    def test_indivisible_raises(self):
        with pytest.raises(AssertionError):
            tiled_matmul(rand(100, 128), rand(128, 128), block_m=64)


class TestQuantization:
    def test_roundtrip_small_error(self):
        x = rand(256, 512, key=7)
        q, s = quantize_int8(x, axis=-1)
        assert q.dtype == jnp.int8
        err = quantization_error(x, axis=-1)
        assert err["rms_rel_error"] < 0.01

    def test_per_channel_scale_shape(self):
        x = rand(128, 64, key=8)
        q, s = quantize_int8(x, axis=0)
        assert s.shape == (1, 64)

    def test_range_clipped(self):
        q, _ = quantize_int8(rand(64, 64, key=9) * 100)
        assert int(jnp.max(q)) <= 127 and int(jnp.min(q)) >= -127

    def test_dequantize_inverts_scale(self):
        x = jnp.ones((8, 8)) * 3.0
        q, s = quantize_int8(x, axis=-1)
        np.testing.assert_allclose(dequantize_int8(q, s), x, rtol=0.01)


class TestInt8Matmul:
    def test_matches_dequant_reference(self):
        x = rand(256, 512, key=10)
        w = rand(512, 256, key=11)
        wq, s = quantize_weights_int8(w)
        out = int8_matmul(x, wq, s)
        ref = x @ (wq.astype(jnp.float32) * s)
        np.testing.assert_allclose(out, ref, atol=1e-3)

    def test_close_to_fp32_matmul(self):
        x = rand(128, 256, key=12)
        w = rand(256, 128, key=13)
        wq, s = quantize_weights_int8(w)
        out = int8_matmul(x, wq, s)
        rel = float(jnp.linalg.norm(out - x @ w) / jnp.linalg.norm(x @ w))
        assert rel < 0.01  # per-channel int8 weight error budget

    def test_gemv_shape(self):
        # decode-shaped M=8
        x = rand(8, 512, key=14)
        w = rand(512, 256, key=15)
        wq, s = quantize_weights_int8(w)
        out = int8_matmul(x, wq, s, block_m=8)
        ref = x @ (wq.astype(jnp.float32) * s)
        np.testing.assert_allclose(out, ref, atol=1e-3)


class TestFlashAttention:
    def _qkv(self, b=2, hq=4, hkv=2, s=256, d=64, key=20):
        ks = jax.random.split(jax.random.PRNGKey(key), 3)
        q = jax.random.normal(ks[0], (b, hq, s, d))
        k = jax.random.normal(ks[1], (b, hkv, s, d))
        v = jax.random.normal(ks[2], (b, hkv, s, d))
        return q, k, v

    def _expand(self, k, hq):
        return jnp.repeat(k, hq // k.shape[1], axis=1)

    def test_causal_gqa_matches_reference(self):
        q, k, v = self._qkv()
        out = flash_attention(q, k, v, causal=True)
        ref = causal_attention(q, self._expand(k, 4), self._expand(v, 4))
        np.testing.assert_allclose(out, ref, atol=2e-5)

    def test_noncausal_matches_reference(self):
        # ref ch06 tests flash only non-causally (test_ch06.py:169-189)
        q, k, v = self._qkv(key=21)
        out = flash_attention(q, k, v, causal=False)
        ref = naive_attention(q, self._expand(k, 4), self._expand(v, 4))
        np.testing.assert_allclose(out, ref, atol=2e-5)

    def test_mha_no_groups(self):
        q, k, v = self._qkv(hq=2, hkv=2, key=22)
        out = flash_attention(q, k, v, causal=True)
        ref = causal_attention(q, k, v)
        np.testing.assert_allclose(out, ref, atol=2e-5)

    def test_q_offset_rectangular(self):
        """Chunked-prefill case: q covers positions [128, 256) of the KV."""
        q, k, v = self._qkv(s=256, key=23)
        q_tail = q[:, :, 128:]
        out = flash_attention(q_tail, k, v, q_offset=128, causal=True)
        full = causal_attention(q, self._expand(k, 4), self._expand(v, 4))
        np.testing.assert_allclose(out, full[:, :, 128:], atol=2e-5)

    def test_decode_single_query(self):
        """Sq=1 decode over a long KV with q_offset = kv_len-1."""
        q, k, v = self._qkv(s=256, key=24)
        out = flash_attention(q[:, :, -1:], k, v, q_offset=255, causal=True)
        full = causal_attention(q, self._expand(k, 4), self._expand(v, 4))
        np.testing.assert_allclose(out[:, :, 0], full[:, :, -1], atol=2e-5)

    def test_kv_len_masks_padding(self):
        """Padded cache: only the first kv_len slots are real."""
        q, k, v = self._qkv(s=256, key=25)
        out = flash_attention(q[:, :, :128], k, v, kv_len=128, causal=True)
        ref = causal_attention(q[:, :, :128], self._expand(k[:, :, :128], 4),
                               self._expand(v[:, :, :128], 4))
        np.testing.assert_allclose(out, ref, atol=2e-5)

    def test_pipelined_body_matches(self, monkeypatch):
        """The software-pipelined producer/consumer body (FLASH_PIPE=1,
        round 4) must match the v3 body and the dense reference — incl.
        rectangular offsets, kv_len tails and valid_from (the consume-side
        mask covers all three)."""
        monkeypatch.setenv("FLASH_PIPE", "1")
        jax.clear_caches()
        cfg = FlashConfig(block_q=64, block_k=64)
        q, k, v = self._qkv(s=256, key=28)
        out = flash_attention(q, k, v, causal=True, config=cfg)
        ref = causal_attention(q, self._expand(k, 4), self._expand(v, 4))
        np.testing.assert_allclose(out, ref, atol=2e-5)
        vf = jnp.asarray([0, 17])
        out = flash_attention(q[:, :, 128:], k, v, q_offset=128,
                              kv_len=224, valid_from=vf, causal=True,
                              config=cfg)
        mask = ((jnp.arange(256)[None, :] <= (128 + jnp.arange(128))[:, None])
                [None, None]
                & (jnp.arange(256)[None, :] < 224)
                & (jnp.arange(256)[None, None, None, :] >= vf[:, None, None,
                                                             None]))
        s = jnp.einsum("bhqd,bhkd->bhqk", q[:, :, 128:],
                       self._expand(k, 4)) / np.sqrt(q.shape[-1])
        s = jnp.where(mask, s, -1e30)
        ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1),
                         self._expand(v, 4))
        np.testing.assert_allclose(out, ref, atol=2e-5)
        monkeypatch.delenv("FLASH_PIPE")
        jax.clear_caches()

    def test_online_softmax_stability(self):
        # large logits must not overflow (ref ch06/test_ch06.py:96-100)
        q, k, v = self._qkv(key=26)
        out = flash_attention(q * 30.0, k * 30.0, v, causal=True)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_smaller_blocks_same_result(self):
        q, k, v = self._qkv(s=256, key=27)
        a = flash_attention(q, k, v, causal=True, config=FlashConfig(64, 64))
        b = flash_attention(q, k, v, causal=True, config=FlashConfig(128, 128))
        np.testing.assert_allclose(a, b, atol=2e-5)


class TestQuantizedModel:
    def test_int8_model_close_to_fp32(self):
        from physics_llm_inference_tpu.models import (ModelConfig, init_params,
                                                      forward)
        from physics_llm_inference_tpu.models.quant import (
            quantize_params_int8, quantized_param_bytes)

        cfg = ModelConfig(vocab_size=100, hidden_dim=64, num_layers=2,
                          num_heads=4, num_kv_heads=2, intermediate_dim=128,
                          max_seq_len=64, dtype="float32")
        params = init_params(jax.random.PRNGKey(0), cfg)
        qparams = quantize_params_int8(params)
        ids = jnp.arange(16).reshape(2, 8) % 100
        ref, _ = forward(params, ids, cfg)
        out, _ = forward(qparams, ids, cfg)
        # logits stay close; argmax (greedy tokens) should rarely flip
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        assert rel < 0.05
        agree = float(jnp.mean(jnp.argmax(out, -1) == jnp.argmax(ref, -1)))
        assert agree >= 0.9
        mem = quantized_param_bytes(qparams)
        assert mem["int8_bytes"] > 0

    def test_quantized_generation_runs(self):
        from physics_llm_inference_tpu.models import (ModelConfig, init_params)
        from physics_llm_inference_tpu.models.quant import quantize_params_int8
        from physics_llm_inference_tpu.runtime import cached_generate

        cfg = ModelConfig(vocab_size=100, hidden_dim=64, num_layers=2,
                          num_heads=4, num_kv_heads=2, intermediate_dim=128,
                          max_seq_len=64, dtype="float32")
        qparams = quantize_params_int8(
            init_params(jax.random.PRNGKey(0), cfg))
        out = cached_generate(qparams, cfg, [[1, 2, 3]], 6, temperature=0.0)
        assert out.tokens.shape == (1, 6)


class TestMembench:
    def test_access_pattern_mechanics(self):
        from physics_llm_inference_tpu.kernels.membench import (
            measure_access_patterns)

        out = measure_access_patterns(total_mb=2, stride=8, iters=2)
        assert out["stream_gbps"] > 0
        assert out["strided_gbps"] > 0
        assert out["stride"] == 8
