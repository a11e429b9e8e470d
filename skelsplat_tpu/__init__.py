"""skelsplat-tpu: TPU-native differentiable skeletal Gaussian splatting.

A from-scratch JAX/XLA/Pallas framework for per-frame multi-view 3D human pose
estimation by optimizing one 3D Gaussian per joint against 2D-detection-derived
heatmaps (capability parity with laurabragagnolo/SkelSplat; see SURVEY.md).

Layering (cf. SURVEY.md §1):
  core/      pure geometry + parameter pytrees (cameras, gaussians, EWA math)
  ops/       compute kernels: rasterizer (dense jnp + fused Pallas), heatmap
             synthesis, SSIM, kNN, soft-argmax
  losses     loss/consistency/early-stopping registries
  engine/    per-scene optimizer (Adam groups + expon LR) and scan-based trainer
  data/      dataset trees (npz), camera calibration IO, PLY codec
  config/    hydra-compatible YAML config system
  parallel/  device-mesh sharding of the scene axis / view axis
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA/Mosaic compilation cache: the fused scan programs take
# minutes to compile (especially through remote-compile TPU setups) but are
# identical across processes — cache them on disk unless the user overrides.
# CPU-only processes skip it: CPU compiles are fast and CPU AOT artifacts
# embed LLVM machine features, which risk SIGILL when a home dir is shared
# across heterogeneous hosts (observed live: "+prefer-no-scatter is not
# supported on the host machine" loads despite the cpuinfo keying below).
_cache_enabled = False


def ensure_compile_cache() -> bool:
    """Enable the persistent compilation cache for non-CPU backends.

    Called lazily (trainer/driver construction) so the gate consults the
    RESOLVED backend: a CPU backend must not fill the cache with CPU AOT
    artifacts (the cross-host SIGILL risk), and neither the env var nor
    import order can decide that reliably.
    """
    global _cache_enabled
    if _cache_enabled or _os.environ.get("SKELSPLAT_NO_COMPILE_CACHE"):
        return _cache_enabled
    import hashlib as _hashlib
    import platform as _platform

    import jax as _jax

    # the RESOLVED backend, not the env var: tests and scripts override the
    # platform via jax.config after import (conftest.py), and an env-only
    # gate then lets the CPU backend read/write the TPU cache dir (observed
    # live as cross-host "+prefer-no-scatter" AOT loads)
    if _jax.default_backend() == "cpu":
        return False

    # key the cache by the host CPU (CPU AOT artifacts embed machine
    # features; a home dir shared across heterogeneous hosts must not mix
    # them — mismatches risk SIGILL)
    try:
        with open("/proc/cpuinfo") as _f:
            _cpu_sig = _hashlib.sha1(_f.read().split("flags")[1][:2000]
                                     .encode()).hexdigest()[:10]
    except Exception:
        _cpu_sig = _platform.machine()
    _cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache",
                      f"skelsplat-jax-{_cpu_sig}"))
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        _cache_enabled = True
    except Exception:
        pass
    return _cache_enabled


# No import-time enable: resolving the backend here would either trust the
# env var (wrong once a script updates jax_platforms post-import) or force
# an early backend init (~85 s on remote-TPU setups for CPU-only users).
# Trainer/driver construction calls ensure_compile_cache() right before the
# first compile, when the backend is about to be initialized anyway.

from skelsplat_tpu.core import geometry  # noqa: F401
