from .projection import project_gaussians, compute_cov3d
from .render import render, render_scene, render_traj, render2img, RenderConfig
