from vsr_tpu.train.losses import adversarial_loss
from vsr_tpu.train.sttn_trainer import STTNTrainer, TrainConfig, make_train_step

__all__ = ["adversarial_loss", "STTNTrainer", "TrainConfig", "make_train_step"]
