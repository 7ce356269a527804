from .trainer import (
    Trainer,
    TrainState,
    multistep_lr,
    cosine_annealing_restart_lr,
)
