from mri_inr_tpu.train import checkpoint, losses
from mri_inr_tpu.train.trainer import Trainer, TrainState, make_train_step

__all__ = ["checkpoint", "losses", "Trainer", "TrainState", "make_train_step"]
