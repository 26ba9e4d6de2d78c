from .state import (
    Params,
    FrameState,
    Targets,
    OptState,
    init_opt_state,
    init_frame_state,
    adam_update,
)
from .losses import ssim, compute_losses, LossWeights
from .train import StageConfig, StageDynamics, train_stage, propagate_moving_points
from .densify import densify_by_pixels
