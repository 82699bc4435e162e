from .losses import loss_dict, mse_loss, sm_loss, opacity_loss
from .metrics import mse, psnr, ssim

__all__ = ["loss_dict", "mse_loss", "sm_loss", "opacity_loss", "mse", "psnr", "ssim"]
