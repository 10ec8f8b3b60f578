from gpupathtracer_tpu.bvh.types import BinaryBVH, WideBVH, BuildStats, INVALID_ENTRY
from gpupathtracer_tpu.bvh.build import build_wide_bvh

__all__ = ["BinaryBVH", "WideBVH", "BuildStats", "INVALID_ENTRY", "build_wide_bvh"]
