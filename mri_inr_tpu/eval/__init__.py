from mri_inr_tpu.eval.metrics import nrmse, psnr, ssim, image_metrics

__all__ = ["nrmse", "psnr", "ssim", "image_metrics"]
