from gpupathtracer_tpu.ops.intersect import mt_intersect, pack_tri_geom, brute_force_closest_hit
from gpupathtracer_tpu.ops.traverse import closest_hit, any_hit, Hit
from gpupathtracer_tpu.ops.tonemap import present, tonemap_uncharted2

__all__ = [
    "mt_intersect", "pack_tri_geom", "brute_force_closest_hit",
    "closest_hit", "any_hit", "Hit",
    "present", "tonemap_uncharted2",
]
