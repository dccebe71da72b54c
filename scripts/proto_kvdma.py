"""Prototype: cross-grid-step manual KV DMA (the fused_decode v2 pattern).

Validates on a tiny shape that, inside one pallas_call with a sequential
grid:
  1. a manual HBM->VMEM copy STARTED at grid step t0 can be WAITED at a
     later grid step t1 (deep lookahead the auto-pipeline can't express),
  2. an ANY-space input aliased to an ANY-space output can be updated in
     place with a VMEM->HBM slot-lane write,
  3. dynamic (traced) buffer indices into a VMEM ring + DMA semaphore
     arrays work.

Run: python scripts/proto_kvdma.py   (TPU or interpret mode)
"""
import sys

sys.path.insert(0, ".")

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L, NB, RB, S, FLAT = 3, 2, 8, 32, 256  # layers, blocks, rows/block, slots


def kernel(slot_ref, x_ref, kq_ref, out_ref, ko_ref, kbuf, stage, rsem, wsem):
    l = pl.program_id(0)
    t = pl.program_id(1)
    # phases per layer: t=0 issue-prefetch for layer l+1 (or all of layer 0
    # at l==0), t in [1, 1+NB) consume block t-1, t=1+NB wait writes
    slot = slot_ref[0]

    def read_dma(lx, i):
        return pltpu.make_async_copy(
            kq_ref.at[lx, pl.ds(i * RB, RB)], kbuf.at[i], rsem.at[i])

    @pl.when((l == 0) & (t == 0))
    def _():
        for i in range(NB):
            read_dma(0, i).start()

    @pl.when((t == 0) & (l < L - 1))
    def _():
        for i in range(NB):
            read_dma(l + 1, i).start()

    @pl.when((t >= 1) & (t < 1 + NB))
    def _():
        i = t - 1
        # wait the read issued one layer ago (deep lookahead)
        pltpu.make_async_copy(
            kq_ref.at[l, pl.ds(i * RB, RB)], kbuf.at[i], rsem.at[i]).wait()
        rows = pl.ds(i * RB, RB)
        blk = kbuf[i]                      # (RB, S, FLAT) dynamic index
        acc = jnp.sum(blk.astype(jnp.float32), axis=(1, 2))      # (RB,)
        out_ref[rows, 0:1] += acc[:, None] * (l + 1)
        # in-place cache write: slot lane gets 100+l (explicit dims — a
        # squeezed 2D slice of a 4D ref crashes Mosaic layout inference)
        stage[rows, :, :] = jnp.full((RB, 1, FLAT), 100 + l, jnp.int8)
        pltpu.make_async_copy(
            stage.at[rows], ko_ref.at[l, rows, pl.ds(slot, 1)],
            wsem.at[i]).start()

    @pl.when(t == 1 + NB)
    def _():
        for i in range(NB):
            rows = pl.ds(i * RB, RB)
            pltpu.make_async_copy(
                stage.at[rows], ko_ref.at[l, rows, pl.ds(slot, 1)],
                wsem.at[i]).wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def run(kq, slot, interpret=False):
    B = NB * RB
    T = 1 + NB + 1
    out, ko = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(L, T),
            in_specs=[
                pl.BlockSpec((B, 128), lambda l, t, sr: (0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec((B, 128), lambda l, t, sr: (0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=[
                pltpu.VMEM((NB, RB, S, FLAT), jnp.int8),
                pltpu.VMEM((B, 1, FLAT), jnp.int8),
                pltpu.SemaphoreType.DMA((NB,)),
                pltpu.SemaphoreType.DMA((NB,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, 128), jnp.float32),
            jax.ShapeDtypeStruct((L, B, S, FLAT), jnp.int8),
        ],
        input_output_aliases={2: 1},  # kq (after scalar+x) -> ko
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(jnp.asarray([slot], jnp.int32), jnp.zeros((B, 128), jnp.float32), kq)
    return out, ko


def main():
    interpret = jax.default_backend() != "tpu"
    print("backend:", jax.default_backend(), "interpret:", interpret)
    B = NB * RB
    rng = np.random.default_rng(0)
    kq = rng.integers(-5, 6, (L, B, S, FLAT)).astype(np.int8)
    slot = 7
    out, ko = run(jnp.asarray(kq), slot, interpret=interpret)
    out = np.asarray(out)
    ko = np.asarray(ko)
    # expected accumulation: sum over (S, FLAT) per row per layer * (l+1)
    exp = sum(kq[l].astype(np.float64).sum((1, 2)) * (l + 1)
              for l in range(L))
    assert np.allclose(out[:, 0], exp, rtol=1e-5), (out[:, 0], exp)
    exp_ko = kq.copy()
    for l in range(L):
        exp_ko[l, :, slot, :] = 100 + l
    assert np.array_equal(ko, exp_ko), "slot write mismatch"
    print("PASS: cross-step DMA + in-place ANY-aliased slot write OK")


if __name__ == "__main__":
    main()
