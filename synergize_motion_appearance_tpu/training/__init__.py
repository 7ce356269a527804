from .trainer import (
    Trainer,
    TrainState,
    multistep_lr,
    multistep_restart_lr,
    cosine_annealing_restart_lr,
)
