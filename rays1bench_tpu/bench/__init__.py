from rays1bench_tpu.bench.harness import benchmark, BenchResult, log_results
from rays1bench_tpu.bench import report

__all__ = ["benchmark", "BenchResult", "log_results", "report"]
