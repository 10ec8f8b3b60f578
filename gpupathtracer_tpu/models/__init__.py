from gpupathtracer_tpu.models.interaction import SurfaceInteraction, make_interaction, set_incoming
from gpupathtracer_tpu.models.materials import MaterialInstance, make_material_instance
from gpupathtracer_tpu.models.bsdf import compute_bsdf, mis_weight
from gpupathtracer_tpu.models.wavefront import render_sample, render_sample_impl
from gpupathtracer_tpu.models.reference import render_sample_reference
from gpupathtracer_tpu.models.ao import render_sample_ao

__all__ = [
    "SurfaceInteraction", "make_interaction", "set_incoming",
    "MaterialInstance", "make_material_instance",
    "compute_bsdf", "mis_weight",
    "render_sample", "render_sample_impl", "render_sample_reference",
    "render_sample_ao",
]
