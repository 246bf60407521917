from .core import Module, Sequential
from .layers import (
    Activation,
    Conv1DWeightNorm,
    Conv1DUpDownSample,
    LinInterpLayer,
    Pad1d,
    PReLU,
    LeakyReLU,
)
from .wavenet import WaveNetAE, WaveNetAEBlock
from .subnet import generate_subnet_from_specs
