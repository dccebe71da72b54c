"""Benchmark harness (reference L7: per-chapter benches + ch10/benchmark.py)."""
from .harness import (
    BenchmarkConfig, BenchmarkResult, run_benchmark, percentile,
)
from .micro import (
    bench_gemm, bench_gemv, bench_attention, roofline_report,
)

__all__ = [
    "BenchmarkConfig", "BenchmarkResult", "run_benchmark", "percentile",
    "bench_gemm", "bench_gemv", "bench_attention", "roofline_report",
]
