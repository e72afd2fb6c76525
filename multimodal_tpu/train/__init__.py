from multimodal_tpu.train.engine import TrainState, make_loss_fn, make_train_step
from multimodal_tpu.train.optimizer import make_optimizer, wd_mask
from multimodal_tpu.train.schedules import const_lr, const_lr_cooldown, cosine_lr, make_schedule
from multimodal_tpu.train.checkpoints import CheckpointManager
