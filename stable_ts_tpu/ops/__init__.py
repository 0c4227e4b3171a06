"""TPU compute ops: mel spectrogram, median filter, DTW alignment."""
from .mel import log_mel_spectrogram, mel_filterbank
from .median import median_filter
from .dtw import dtw, dtw_cost_jax, dtw_numpy

__all__ = ['log_mel_spectrogram', 'mel_filterbank', 'median_filter',
           'dtw', 'dtw_cost_jax', 'dtw_numpy']
