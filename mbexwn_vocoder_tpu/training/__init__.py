from .schedules import ParamSchedule
from .losses import SpectLossComponents, f0_prediction_loss, stft_coherence_loss
from .trainer import Trainer, TrainState
