from rays1bench_tpu.core.config import RenderConfig, PRESETS
from rays1bench_tpu.core import rng, vecmath

__all__ = ["RenderConfig", "PRESETS", "rng", "vecmath"]
