from .logging import Logger, AverageMeter, progress_bar, get_wandb
from .schedules import (
    lr_schedule,
    cosine_ramp,
    dino_teacher_temp,
    dino_weight_decay,
    warmup_cosine,
)
