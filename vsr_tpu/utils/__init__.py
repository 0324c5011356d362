from vsr_tpu.utils.metrics import psnr, ssim, psnr_and_ssim, flow_epe

__all__ = ["psnr", "ssim", "psnr_and_ssim", "flow_epe"]
