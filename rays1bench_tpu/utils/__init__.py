from rays1bench_tpu.utils import profiling, metrics

__all__ = ["profiling", "metrics"]
