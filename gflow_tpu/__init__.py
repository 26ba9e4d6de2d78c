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
