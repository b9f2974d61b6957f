from gptst_tpu.train.loss import build_loss, kl_div_sum, make_scaler_mae_loss
from gptst_tpu.train.trainer import Trainer, make_lr_schedule, make_optimizer

__all__ = [
    "build_loss", "kl_div_sum", "make_scaler_mae_loss", "Trainer",
    "make_lr_schedule", "make_optimizer",
]
