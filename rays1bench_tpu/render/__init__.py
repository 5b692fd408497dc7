from rays1bench_tpu.render.camera import CameraSpec, Camera
from rays1bench_tpu.render.pipeline import render_image, render_scene

__all__ = ["CameraSpec", "Camera", "render_image", "render_scene"]
