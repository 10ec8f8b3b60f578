from gpupathtracer_tpu.models.interaction import SurfaceInteraction, make_interaction, set_incoming
from gpupathtracer_tpu.models.materials import MaterialInstance, make_material_instance
from gpupathtracer_tpu.models.bsdf import compute_bsdf
from gpupathtracer_tpu.models.wavefront import render_sample
from gpupathtracer_tpu.models.reference import render_sample_reference

__all__ = [
    "SurfaceInteraction", "make_interaction", "set_incoming",
    "MaterialInstance", "make_material_instance",
    "compute_bsdf", "render_sample", "render_sample_reference",
]
