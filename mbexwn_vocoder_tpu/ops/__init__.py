from .padding import pad1d
from .conv import conv1d, same_pads, causal_pads, fold_weight_norm
from .interp import linear_interp_upsample
from .oscillator import stable_cumsum_and_wrap, wavetable_lookup
from .stft_ops import stft, istft, inverse_stft_window
from .pqmf_ops import pqmf_analysis, pqmf_synthesis
