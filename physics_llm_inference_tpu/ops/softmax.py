"""Online softmax — the recurrence flash attention is built on.

Capability parity: ref ch06/online_softmax.py (online_softmax L13-25,
online_softmax_with_output L28-53). Kept as a jax.lax.scan over chunks — both
a numerically-exact reference for the Pallas flash kernel's tile loop and an
executable spec for its rescale-on-new-max accumulator math.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def online_softmax(x: jnp.ndarray, chunk: int = 128) -> jnp.ndarray:
    """Softmax over the last axis via the streaming (m, d) recurrence.

    Processes `x` in chunks; maintains running max m and running normalizer d,
    rescaling d by exp(m_old - m_new) when a new max appears (ref :13-25).
    Numerically identical to standard softmax.
    """
    n = x.shape[-1]
    pad = (-n) % chunk
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)],
                 constant_values=-jnp.inf)
    chunks = xp.reshape(*x.shape[:-1], -1, chunk)
    chunks = jnp.moveaxis(chunks, -2, 0)  # (num_chunks, ..., chunk)

    def step(carry, c):
        m, d = carry
        m_new = jnp.maximum(m, jnp.max(c, axis=-1))
        d_new = d * jnp.exp(m - m_new) + jnp.sum(jnp.exp(c - m_new[..., None]), axis=-1)
        return (m_new, d_new), None

    init_m = jnp.full(x.shape[:-1], -jnp.inf, dtype=x.dtype)
    init_d = jnp.zeros(x.shape[:-1], dtype=x.dtype)
    (m, d), _ = jax.lax.scan(step, (init_m, init_d), chunks)
    return jnp.exp(x - m[..., None]) / d[..., None]


def online_softmax_with_output(scores: jnp.ndarray, v: jnp.ndarray,
                               chunk: int = 128) -> jnp.ndarray:
    """Fused softmax(scores) @ v without materializing the weights.

    scores: (..., N), v: (N, D) — also maintains the output accumulator o,
    rescaled on every new max (ref :28-53). This is, verbatim, the math the
    flash-attention kernel runs per KV tile.
    """
    n = scores.shape[-1]
    pad = (-n) % chunk
    sp = jnp.pad(scores, [(0, 0)] * (scores.ndim - 1) + [(0, pad)],
                 constant_values=-jnp.inf)
    vp = jnp.pad(v, [(0, pad), (0, 0)])
    s_chunks = jnp.moveaxis(sp.reshape(*scores.shape[:-1], -1, chunk), -2, 0)
    v_chunks = vp.reshape(-1, chunk, v.shape[-1])

    def step(carry, inputs):
        m, d, o = carry
        s, vc = inputs
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[..., None])
        d_new = d * alpha + jnp.sum(p, axis=-1)
        o_new = o * alpha[..., None] + p @ vc
        return (m_new, d_new, o_new), None

    init = (
        jnp.full(scores.shape[:-1], -jnp.inf, dtype=scores.dtype),
        jnp.zeros(scores.shape[:-1], dtype=scores.dtype),
        jnp.zeros((*scores.shape[:-1], v.shape[-1]), dtype=scores.dtype),
    )
    (m, d, o), _ = jax.lax.scan(step, init, (s_chunks, v_chunks))
    return o / d[..., None]
