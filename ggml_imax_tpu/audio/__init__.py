"""Audio frontend: WAV IO + log-mel spectrogram (whisper)."""
from .wav import read_wav, write_wav, vad_simple, SAMPLE_RATE
from .mel import log_mel_spectrogram, mel_filterbank, N_FFT, HOP_LENGTH, N_MEL, N_SAMPLES
