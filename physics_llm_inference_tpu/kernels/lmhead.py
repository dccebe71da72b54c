"""Fused greedy LM head: RMSNorm → INT8 lm_head matmul → argmax, one kernel.

The decode tail after the fused whole-model kernel is norm + lm_head +
argmax as separate XLA ops — measured ~0.24 ms/step at 7B B=64 against a
0.16 ms weight-stream floor (docs/PERF.md step anatomy). This kernel runs
the whole greedy tail as ONE pallas_call:

- grid over K-blocks of the (D, V) int8 head: every weight tile is a
  contiguous (TK·V)-byte HBM read (the same K-blocked layout lesson as
  kernels/fused_decode.py), double-buffered by the pipeline;
- f32 accumulator (B, V) in VMEM across K-blocks — numerically identical
  to kernels/int8_matmul.py (one f32 accumulate, one bf16 round at the
  end), so greedy tokens match the per-op path bit-for-bit;
- final step: per-channel scale, bf16 round-trip, argmax (first-max index,
  matching jnp.argmax) → (B, 1) int32 tokens. Logits never leave VMEM.

Reference capability: the sampling tail of ref ch10/engine.py:96-115
(greedy branch) + ch02/cached_generation.py:245-247, fused TPU-side.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lmhead_kernel(x_ref, nw_ref, w_ref, s_ref, tok_ref, xn_scr, acc_scr, *,
            B, D, V, TK, nk, eps):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        xf = x_ref[...].astype(jnp.float32)
        ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
        xn = xf * lax.rsqrt(ms + eps) * nw_ref[...].astype(jnp.float32)
        # the per-op path feeds the head in the model dtype (bf16)
        xn_scr[:] = xn.astype(xn_scr.dtype)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    a = xn_scr[:, pl.ds(j * TK, TK)]
    acc_scr[:] += lax.dot_general(a, w_ref[...], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _():
        logits = acc_scr[...] * s_ref[...].astype(jnp.float32)
        # int8_matmul writes bf16 output; match its rounding before argmax
        logits = logits.astype(jnp.bfloat16).astype(jnp.float32)
        m = jnp.max(logits, axis=-1, keepdims=True)           # (B, 1)
        idx = lax.broadcasted_iota(jnp.int32, (B, V), 1)
        big = jnp.int32(2 ** 30)
        tok = jnp.min(jnp.where(logits == m, idx, big), axis=-1,
                      keepdims=True)                          # first max
        tok_ref[...] = tok


def _pick_tk(D: int, V: int) -> int:
    """K-tile for the (TK, V) weight blocks: largest of {512,256,128} whose
    int8 tile stays under ~5MB so double-buffering fits scoped VMEM."""
    TK = 512
    while TK > 128 and TK * V > (5 << 20):
        TK //= 2
    return TK


def lmhead_greedy_ok(B: int, D: int, V: int, itemsize: int = 2) -> bool:
    """Static eligibility for lmhead_greedy — callers (the forward() greedy
    fast path, models/transformer.py) must check this BEFORE tracing the
    kernel, since lmhead_greedy asserts its geometry at trace time.

    Mirrors the kernel's constraints: D divisible by the selected K-tile
    (lane-dim activation windows), V lane-aligned, and the scratch
    footprint — (B, D) normalized activations + (B, V) f32 logits
    accumulator + double-buffered (TK, V) int8 weight tiles + the (B, D)
    input block — inside the kernel's 64MB scoped-vmem budget.
    """
    if V % 128 != 0:
        return False
    TK = _pick_tk(D, V)
    if D % TK != 0:
        return False
    scratch = B * D * itemsize + B * V * 4          # xn + logits acc
    operands = B * D * itemsize + 2 * TK * V + 4 * V  # x + 2x weight + scales
    return scratch + operands <= (60 << 20)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def lmhead_greedy(x, norm_w, lm_q, lm_s, eps: float = 1e-5,
                  interpret: bool | None = None):
    """Greedy next-token ids from the final hidden state.

    x: (B, D) model dtype; norm_w: (D,); lm_q: (D, V) int8; lm_s: (V,) f32.
    Returns (B,) int32 — bit-identical to
    argmax(rms_norm(x) @ dequant(lm_head)) on the per-op path.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, D = x.shape
    V = lm_q.shape[1]
    # contiguous K-blocks: tile rows are full (V,) int8 rows. TK must be a
    # lane multiple (128) — the activation slice xn[:, j·TK:(j+1)·TK] is a
    # lane-dim window
    TK = _pick_tk(D, V)
    assert D % TK == 0, (D, TK)
    nk = D // TK

    tok = pl.pallas_call(
        functools.partial(_lmhead_kernel, B=B, D=D, V=V, TK=TK, nk=nk, eps=eps),
        grid=(nk,),
        in_specs=[
            pl.BlockSpec((B, D), lambda j: (0, 0)),
            pl.BlockSpec((1, D), lambda j: (0, 0)),
            pl.BlockSpec((TK, V), lambda j: (j, 0)),
            pl.BlockSpec((1, V), lambda j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((B, 1), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((B, D), x.dtype),
            pltpu.VMEM((B, V), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # the (B, V) f32 logits accumulator + double-buffered 4-5MB
            # weight tiles exceed the 16MB default scoped-vmem limit
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * V,
            bytes_accessed=D * V + 4 * V + 2 * B * D,
            transcendentals=0),
        interpret=interpret,
    )(x, norm_w[None, :], lm_q, lm_s.reshape(1, V))
    return tok[:, 0]
