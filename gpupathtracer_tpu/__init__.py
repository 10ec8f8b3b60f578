"""gpupathtracer_tpu — a TPU-native progressive path tracer.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
saadam1n/GPUPathTracer ("OpenGL Light Transport"): scene ingest (OBJ/MTL,
glTF, procedural), SBVH construction flattened to a wide (8-ary) GPU^W TPU
layout, wavefront path tracing (thin-lens DoF, NEE + MIS, Cook-Torrance
microfacet BSDFs, Russian roulette), progressive accumulation, filmic
tonemapping, and multi-chip sample sharding over a `jax.sharding.Mesh`.

The reference is a single-GPU OpenGL compute megakernel; this package is a
TPU-first redesign: fixed-shape SoA wavefronts, `lax.while_loop` bounded
bounce loops, counter-based threefry RNG (bitwise-reproducible renders), and
`shard_map`/`psum` instead of atomics.
"""

__version__ = "0.1.0"

from gpupathtracer_tpu.config import RenderConfig, CameraConfig, load_scene_txt

__all__ = ["RenderConfig", "CameraConfig", "load_scene_txt", "__version__"]
