"""SPMD sharded rendering over a device mesh.

Replaces the reference's tile scheduler (rayweek1.cpp:785-842): primary rays
are statically split across the mesh's "rays" axis via `shard_map`; the sphere
SoA and camera are replicated (in_specs P()); the ray counter is psum-reduced
over ICI — the collective analog of the reference's thread-join reduction
(rayweek1.cpp:809-813). Because the RNG is stateless in the global ray id, the
sharded image is bit-identical to the single-device one.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from rays1bench_tpu.core.config import RenderConfig
from rays1bench_tpu.render.camera import Camera
from rays1bench_tpu.render.pipeline import _trace_chunk, _round_up
from rays1bench_tpu.scene.soa_spheres import SphereSOA
from rays1bench_tpu.scene.spheres import prepare


@partial(jax.jit, static_argnames=("cfg", "mesh", "axis_name"))
def render_image_sharded(spheres_soa: SphereSOA, camera: Camera,
                         cfg: RenderConfig, mesh: Mesh,
                         axis_name: str = "rays"
                         ) -> Tuple[jax.Array, jax.Array]:
    """Render with primary rays sharded over `mesh`'s `axis_name` axis.

    Returns (image float32[H, W, 3], num_rays uint32) — numerically identical
    to render_image() regardless of device count.
    """
    n_dev = mesh.shape[axis_name]
    n = cfg.num_primary_rays
    # Each device gets whole chunks; pad the ray stream to n_dev * chunk.
    chunk = min(cfg.ray_chunk, _round_up(-(-n // n_dev), 1024))
    per_dev = _round_up(-(-n // n_dev), chunk)
    padded = per_dev * n_dev
    num_chunks = per_dev // chunk

    ids = jnp.arange(padded, dtype=jnp.int32).reshape(n_dev, num_chunks, chunk)
    seed = jnp.uint32(cfg.seed)
    spheres = prepare(spheres_soa)

    def local(ids_local, spheres, camera):
        # ids_local: (1, num_chunks, chunk) block of this device's rays.
        def body(ray_id):
            return _trace_chunk(spheres, camera, ray_id, ray_id < n, seed, cfg)
        rr, rg, rb, counts = jax.lax.map(body, ids_local[0])
        count = jax.lax.psum(jnp.sum(counts), axis_name)
        return rr[None], rg[None], rb[None], count

    rr, rg, rb, count = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis_name), P(), P()),
        out_specs=(P(axis_name), P(axis_name), P(axis_name), P()),
    )(ids, spheres, camera)

    rad = jnp.stack([rr.reshape(-1)[:n], rg.reshape(-1)[:n],
                     rb.reshape(-1)[:n]], axis=-1)
    image = rad.reshape(cfg.height, cfg.width, cfg.spp, 3).mean(axis=2)
    return image, count
