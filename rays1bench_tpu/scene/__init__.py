from rays1bench_tpu.scene.soa_spheres import SphereSOA, SphereSOABuilder
from rays1bench_tpu.scene.spheres import PreparedSpheres, prepare, LAMBERTIAN, METAL, DIELECTRIC
from rays1bench_tpu.scene.builders import (
    Scene, create_small_scene, create_medium_scene, create_large_scene, SCENES,
)
from rays1bench_tpu.scene import tga

__all__ = [
    "SphereSOA", "SphereSOABuilder", "PreparedSpheres", "prepare",
    "LAMBERTIAN", "METAL", "DIELECTRIC",
    "Scene", "create_small_scene", "create_medium_scene", "create_large_scene",
    "SCENES", "tga",
]
