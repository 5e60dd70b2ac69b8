from versband_tpu.train.lr_schedules import (
    LambdaLinearScheduler,
    LambdaWarmUpCosineScheduler,
    LambdaWarmUpCosineScheduler2,
    scale_base_lr,
)
from versband_tpu.train.state import (
    TrainState, EmaState, ema_scope, make_adam, make_adamw, make_radam,
)
from versband_tpu.train.gan_losses import VAEGANLoss
from versband_tpu.train.checkpoints import CheckpointManager, load_model_checkpoint
