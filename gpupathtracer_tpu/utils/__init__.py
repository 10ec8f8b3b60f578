from gpupathtracer_tpu.utils import io, timing, morton

__all__ = ["io", "timing", "morton"]
