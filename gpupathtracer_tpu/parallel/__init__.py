from gpupathtracer_tpu.parallel.mesh import (make_device_mesh,
                                             render_sample_sharded)

__all__ = ["make_device_mesh", "render_sample_sharded"]
