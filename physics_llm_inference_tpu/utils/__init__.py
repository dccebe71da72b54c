from .timing import benchmark_fn, BenchResult

__all__ = ["benchmark_fn", "BenchResult"]
