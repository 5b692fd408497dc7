from rays1bench_tpu.parallel.mesh import make_mesh
from rays1bench_tpu.parallel.shard import render_image_sharded

__all__ = ["make_mesh", "render_image_sharded"]
