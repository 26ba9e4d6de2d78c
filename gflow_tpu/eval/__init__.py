from .metrics import psnr, ssim_metric, lpips
from .tapvid import compute_tapvid_metrics
from .davis import jaccard_iou, boundary_f_measure
from .camera_eval import umeyama_alignment, ate_rmse, rpe
