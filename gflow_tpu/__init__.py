"""gflow-tpu: a TPU-native (JAX/XLA/Pallas) 4D-from-monocular-video framework.

Re-implements the full capability surface of GFlow ("GFlow: Recovering 4D World
from Monocular Video", AAAI 2025) as an idiomatic JAX framework:

- ``gflow_tpu.ops``       differentiable Gaussian rasterizer (XLA + Pallas)
- ``gflow_tpu.core``      camera model, Gaussian scene pytree, IO, init sampling
- ``gflow_tpu.opt``       jitted optimization step, losses, densification
- ``gflow_tpu.pipeline``  video-fitting driver + prior-preparation pipeline
- ``gflow_tpu.models``    MASt3R / UniMatch inference graphs (JAX)
- ``gflow_tpu.eval``      PSNR/SSIM/LPIPS, TAP-Vid, DAVIS J/F, ATE/RPE, benchmark CLIs
- ``gflow_tpu.parallel``  device-mesh sharding helpers (tile- and scene-parallel)
- ``gflow_tpu.viz``       trajectory visualizer, video writers, viewer
"""

__version__ = "0.1.0"


def _maybe_enable_compile_cache():
    """Opt-in persistent XLA compilation cache (GFLOW_COMPILE_CACHE=<dir>).

    Frame-0 of a fit is dominated by stage compilation (QUALITY_r03:
    201 s of a 408 s run); the JAX cache persists serialized executables
    keyed on HLO, so repeat runs at the same shapes skip it entirely.
    Opt-in because executable serialization support depends on the PJRT
    backend (the tunneled TPU plugin may decline it — JAX then falls back
    to compiling, so enabling is safe but not guaranteed to help)."""
    import os

    cache_dir = os.environ.get("GFLOW_COMPILE_CACHE")
    if not cache_dir:
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


_maybe_enable_compile_cache()
