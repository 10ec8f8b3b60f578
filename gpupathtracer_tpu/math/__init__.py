from gpupathtracer_tpu.math import camera, sampling, vecmath

__all__ = ["camera", "sampling", "vecmath"]
