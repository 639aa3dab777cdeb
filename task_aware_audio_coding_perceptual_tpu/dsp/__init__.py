"""Core DSP library (pure JAX): STFT/ISTFT, spectrogram transforms, mel.

Everything else in the framework consumes this module. Semantics follow the
reference's two STFT configurations:

- outer project: ``n_fft=2048, hop=512, hann, center=True`` (librosa in data
  prep, ``torch.istft`` in training; reference
  ``train_pkl_file_task_aware.py:174-208``),
- SGMSE: ``n_fft=510, hop=128, hann, center=True`` for 256 frequency bins
  (reference ``sgmse/sgmse/data_module.py:109-112,190-218``).
"""

from task_aware_audio_coding_perceptual_tpu.dsp.stft import (  # noqa: F401
    hann_window,
    sqrt_hann_window,
    get_window,
    frame_signal,
    overlap_add,
    stft,
    istft,
    griffin_lim,
)
from task_aware_audio_coding_perceptual_tpu.dsp.spec import (  # noqa: F401
    spec_fwd,
    spec_back,
    pad_spec,
    mel_filterbank,
    mel_spectrogram,
    magnitude_phase,
    polar_to_complex,
)
