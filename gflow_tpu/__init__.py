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
    if not cache_dir or cache_dir.lower() in ("0", "off", "none"):
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def enable_default_compile_cache():
    """Default-on persistent compile cache for the long-lived CLIs.

    The prior models' cold compiles are the dominant first-run cost
    (MODEL_SCALE r4: GMFlow 454 s, MASt3R 63 s before the first pair),
    and fit_video's frame-0 stage compile is the same story — so the CLI
    entry points call this to cache executables under ~/.cache unless the
    user opted out with GFLOW_COMPILE_CACHE=off (or chose their own dir,
    which _maybe_enable_compile_cache already honored at import)."""
    import os

    if os.environ.get("GFLOW_COMPILE_CACHE"):
        return  # explicit dir or explicit off — already handled
    import jax

    cache_dir = os.path.join(
        os.path.expanduser("~"), ".cache", "gflow_tpu", "xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


_maybe_enable_compile_cache()
