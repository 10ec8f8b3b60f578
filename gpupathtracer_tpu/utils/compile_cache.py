"""Persistent XLA compilation cache.

Role of the reference's instant startup (precompiled GLSL is cached by the
GL driver): first-frame jit compiles cost 4-400 s through the axon tunnel
(PERF.md), so every entry point enables JAX's persistent compilation cache
— the second run of any shape loads from disk in milliseconds.
"""

from __future__ import annotations

import hashlib
import os


def _host_tag() -> str:
    """Fingerprint of the host CPU feature set.

    XLA:CPU AOT artifacts embed the compile machine's feature flags; the
    build fleet rotates across machine generations, and loading an
    artifact compiled with features this host lacks SEGFAULTS (observed
    round 5: a cached treelet executable took down the whole test
    suite; cpu_aot_loader warns about exactly this). Keying the cache
    directory by the flags line makes cross-host reuse impossible while
    keeping same-host warm starts."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.md5(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform
    return hashlib.md5(platform.processor().encode()).hexdigest()[:10]


_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache",
                            "gpupathtracer_tpu",
                            "xla-" + _host_tag())
_enabled = False


def enable_compile_cache(cache_dir: str | None = None) -> str:
    """Enable the persistent compilation cache (idempotent).

    Honors GPT_TPU_COMPILE_CACHE (set to "0"/"off" to disable, or to a
    directory path to relocate)."""
    global _enabled
    env = os.environ.get("GPT_TPU_COMPILE_CACHE", "")
    if env.lower() in ("0", "off", "false"):
        return ""
    path = cache_dir or (env if env else _DEFAULT_DIR)
    if _enabled:
        return path
    os.makedirs(path, exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache everything, not just slow compiles: dispatch-heavy progressive
    # rendering re-jits many small shapes.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
    return path
