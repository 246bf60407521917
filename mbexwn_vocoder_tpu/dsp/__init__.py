from .windows import window, get_stft_window, mhanning
from .db import lin2db, db2lin, log_to_db
from .mel import hz_to_mel, mel_to_hz, mel_frequencies, mel_filter
from .utils import nextpow2, nextpow2_val
