from .optimizer import build_optimizer, build_lr_schedule
