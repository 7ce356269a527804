from .trainer import Trainer, TrainState, multistep_lr
