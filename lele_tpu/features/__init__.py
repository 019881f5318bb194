"""On-device audio front-end: framing, FFT, mel, LFR, CMVN.

Rebuilds /root/reference/src/features/ (SURVEY.md §2.3) as pure jnp so the
whole waveform→features pipeline fuses into the same XLA program as the
model (the "no host round-trips" north star in BASELINE.json). Where the
reference processes frame-by-frame with a hand-written radix-2 FFT
(pipeline.rs:85-190, fft.rs), this implementation is batched over all
frames: one gather (framing), one rFFT over the frame axis (XLA FFT), and
one dense [n_freqs, n_mels] matmul — on TPU the MXU makes the dense mel
product faster than the reference's sparse row scheme (mel.rs:55).
"""

from .fbank import FbankConfig, FbankFrontend, fbank_features  # noqa: F401
from .filters import hann_window, hz_to_mel_htk, mel_filterbank, mel_to_hz_htk  # noqa: F401
from .lfr import lfr_stack  # noqa: F401
from .cmvn import apply_cmvn_stats, cmvn  # noqa: F401
