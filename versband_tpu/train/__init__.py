from versband_tpu.train.lr_schedules import (
    LambdaLinearScheduler,
    LambdaWarmUpCosineScheduler,
    LambdaWarmUpCosineScheduler2,
    scale_base_lr,
)
from versband_tpu.train.state import TrainState, EmaState
