"""Perplexity harness: the quantization accuracy budget check.

BASELINE.md: quantized outputs must be within 0.1 perplexity of the fp32
reference at the same bit-width. The reference repo has no eval at all; this
supplies it: windowed next-token NLL over a token stream, computed with one
jitted forward per window, plus the fp32-vs-quantized delta report.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.transformer import forward


@partial(jax.jit, static_argnames=("cfg",))
def _window_nll(params, cfg: ModelConfig, ids: jnp.ndarray):
    """Sum of next-token negative log-likelihoods over one (B, S) window."""
    logits, _ = forward(params, ids[:, :-1], cfg)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = ids[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.sum(nll), nll.size


def perplexity(params, cfg: ModelConfig, token_ids, window: int = 256,
               batch: int = 1) -> float:
    """exp(mean NLL) over non-overlapping windows of the token stream."""
    ids = np.asarray(token_ids, dtype=np.int32)
    n_win = len(ids) // window
    assert n_win >= 1, "token stream shorter than one window"
    ids = ids[:n_win * window].reshape(n_win, window)
    total, count = 0.0, 0
    for i in range(0, n_win, batch):
        chunk = jnp.asarray(ids[i:i + batch])
        s, c = _window_nll(params, cfg, chunk)
        total += float(s)
        count += int(c)
    return float(np.exp(total / count))


def quantization_ppl_report(params_fp, params_q, cfg: ModelConfig,
                            token_ids, window: int = 256) -> dict:
    """fp vs quantized perplexity + the 0.1-budget verdict (BASELINE.md)."""
    ppl_fp = perplexity(params_fp, cfg, token_ids, window)
    ppl_q = perplexity(params_q, cfg, token_ids, window)
    delta = ppl_q - ppl_fp
    return {
        "ppl_fp": ppl_fp,
        "ppl_quantized": ppl_q,
        "delta": delta,
        "within_budget": abs(delta) <= 0.1,
    }


@partial(jax.jit, static_argnames=("cfg", "kv_dtype"))
def _decode_path_nll(params, cfg: ModelConfig, ids: jnp.ndarray,
                     kv_dtype=None):
    """Teacher-forced NLL computed through the DECODE path — the exact
    machinery serving uses (KV cache, INT8-KV attention kernel, fused
    whole-model decode kernel when eligible) — not the parallel forward.

    Prefills token 0, then scans one decode step per position, scoring the
    next token each time. This is the honest accuracy check for the
    quantized serving path (bench.py's configuration)."""
    from ..models.transformer import KVSlice
    from ..runtime.kv_cache import KVCache

    b, n = ids.shape
    cache = KVCache.create(cfg, b, n, dtype=kv_dtype)
    logits0, kv = forward(params, ids[:, :1], cfg, kv=cache.as_slice(),
                          last_only=True)

    def nll_of(logits, tgt):
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.take_along_axis(logp, tgt[:, None], axis=-1)[:, 0]

    def step(carry, i):
        kv, total = carry
        tok = jax.lax.dynamic_slice_in_dim(ids, i, 1, axis=1)
        logits, kv = forward(params, tok, cfg, kv=kv._replace(start=i),
                             last_only=True)
        tgt = jax.lax.dynamic_slice_in_dim(ids, i + 1, 1, axis=1)[:, 0]
        return (kv, total + jnp.sum(nll_of(logits[:, 0], tgt))), None

    total = jnp.sum(nll_of(logits0[:, 0], ids[:, 1]))
    (kv, total), _ = jax.lax.scan(step, (kv._replace(start=jnp.int32(1)),
                                         total),
                                  jnp.arange(1, n - 1))
    return total, b * (n - 1)


def decode_path_perplexity(params, cfg: ModelConfig, token_ids,
                           window: int = 256, kv_dtype=None) -> float:
    """exp(mean NLL) through the decode path (see _decode_path_nll)."""
    ids = np.asarray(token_ids, dtype=np.int32)
    n_win = len(ids) // window
    assert n_win >= 1, "token stream shorter than one window"
    ids = jnp.asarray(ids[:n_win * window].reshape(n_win, window))
    s, c = _decode_path_nll(params, cfg, ids, kv_dtype=kv_dtype)
    return float(np.exp(float(s) / int(c)))
