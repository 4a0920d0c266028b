from .metrics import (calculate_psnr, calculate_ssim, psnr_device, ssim,
                      ssim_device)
from .export import (export_prediction, landmarks_7, read_obj, read_ply, write_obj,
                     write_ply)

__all__ = [
    "calculate_psnr", "calculate_ssim", "psnr_device", "ssim", "ssim_device",
    "export_prediction", "landmarks_7", "read_obj", "read_ply", "write_obj", "write_ply",
]
