from .mbexwn import MBExWN
from .pan_wavenet import PaNWaveNet, NormMelComponents
from .factory import create_model
