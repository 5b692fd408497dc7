from rays1bench_tpu.runtime import native

__all__ = ["native"]
