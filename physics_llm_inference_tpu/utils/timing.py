"""Device timing harness.

TPU version of the reference's universal benchmark idiom — warmup, sync,
perf_counter loop, mean/std/min/max (ref: ch01/benchmark_ch01.py:15-38,
ch03/gemv_benchmark.py:37-54). `torch.cuda.synchronize` becomes
`jax.block_until_ready` on the function's outputs; results keep the same
schema so every bench report reads the same.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field


@dataclass
class BenchResult:
    name: str
    mean_ms: float
    std_ms: float
    min_ms: float
    max_ms: float
    iters: int
    extras: dict = field(default_factory=dict)

    def to_dict(self) -> dict:
        d = {
            "name": self.name,
            "mean_ms": self.mean_ms,
            "std_ms": self.std_ms,
            "min_ms": self.min_ms,
            "max_ms": self.max_ms,
            "iters": self.iters,
        }
        d.update(self.extras)
        return d

    def __str__(self) -> str:
        return (f"{self.name}: {self.mean_ms:.3f} ms "
                f"(±{self.std_ms:.3f}, min {self.min_ms:.3f}, max {self.max_ms:.3f})")


def _sync(out):
    import jax

    jax.block_until_ready(out)


_SYNC_OVERHEAD_S: float | None = None


def sync_overhead_s() -> float:
    """Fixed cost of one dispatch + VALUE READOUT on this backend, measured
    once and cached.

    On the tunneled TPU dev relay, `block_until_ready` early-acks one
    outstanding dispatch (it is not a fence), so honest timers must read a
    value back — but that readout costs a FIXED ~25 ms round-trip regardless
    of the work being timed (measured constant from 64 to 1024 scanned
    steps, docs/PERF.md). Timed regions that end with a readout subtract
    this. ~0 on local backends.
    """
    global _SYNC_OVERHEAD_S
    if _SYNC_OVERHEAD_S is None:
        import jax
        import jax.numpy as jnp

        x = jnp.zeros((8, 128), jnp.float32)
        f = jax.jit(lambda x, s: x + s)
        float(f(x, 0.0)[0, 0])  # compile
        ts = []
        for i in range(5):
            t0 = time.perf_counter()
            # fresh salt each call: identical dispatches get elided by the
            # relay and would measure ~0
            float(f(x, float(i + 1))[0, 0])
            ts.append(time.perf_counter() - t0)
        ts.sort()
        _SYNC_OVERHEAD_S = ts[len(ts) // 2]
    return _SYNC_OVERHEAD_S


def readout_timed(fn) -> tuple:
    """Run `fn()`, drain with a value readout, and return
    (result, honest_elapsed_s) with the fixed readout overhead subtracted."""
    import jax

    ovh = sync_overhead_s()  # calibrate OUTSIDE the timed region
    t0 = time.perf_counter()
    out = fn()
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jax.numpy.asarray(leaf).reshape(-1)[0].astype("float32"))
    return out, max(0.0, time.perf_counter() - t0 - ovh)


def benchmark_fn(fn, *args, warmup: int = 3, iters: int = 10,
                 name: str = "fn", **kwargs) -> BenchResult:
    """Time `fn(*args)` on-device: warmup (triggers compile), then `iters`
    timed runs, each synced with block_until_ready."""
    for _ in range(warmup):
        _sync(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args, **kwargs))
        times.append((time.perf_counter() - t0) * 1e3)
    n = len(times)
    mean = sum(times) / n
    var = sum((t - mean) ** 2 for t in times) / n
    return BenchResult(
        name=name,
        mean_ms=mean,
        std_ms=var**0.5,
        min_ms=min(times),
        max_ms=max(times),
        iters=n,
    )
