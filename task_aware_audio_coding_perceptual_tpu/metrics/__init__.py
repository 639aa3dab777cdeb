"""Evaluation metrics suite.

Covers the reference's metric surface:

- SI-SDR and SI-SDR/SI-SIR/SI-SAR energy-ratio decomposition
  (``sgmse/sgmse/util/other.py:11-32,64-68``),
- segmental SNR / PSNR / spectral SNR used by the outer model zoo
  (``pkl_file_models.py:36-42,406,424-425``),
- ESTOI (extended short-time objective intelligibility) as a pure
  numpy/scipy implementation (the reference calls the ``pystoi`` package,
  which is not available in this environment),
- PESQ: the real ``pesq`` package is used when importable; ``pesq_p862`` is
  a pure-numpy port of the P.862 perceptual model (bark loudness,
  asymmetric disturbance, P.862.1/.2 MOS mappings — see ``pesq_p862.py``
  for its fidelity scoping) used for offline scoring; the older
  ``pesq_proxy`` (fwSNRseg MOS estimate) remains for cheap smoke checks,
- a real-time-factor (RTF) benchmark harness (reference only computes RTF
  ad hoc in ``ScoreModel.enhance``, ``model.py:461-463``).
"""

from task_aware_audio_coding_perceptual_tpu.metrics.sdr import (  # noqa: F401
    si_sdr,
    si_sdr_jax,
    si_sdr_components,
    energy_ratios,
    snr_db,
    psnr,
    spectral_snr,
    mean_conf_int,
    mean_std,
    print_mean_std,
)
from task_aware_audio_coding_perceptual_tpu.metrics.stoi import estoi, stoi  # noqa: F401
from task_aware_audio_coding_perceptual_tpu.metrics.pesq_metric import (  # noqa: F401
    pesq,
    pesq_proxy,
    HAVE_PESQ,
)
from task_aware_audio_coding_perceptual_tpu.metrics.pesq_p862 import (  # noqa: F401
    pesq_p862,
)
from task_aware_audio_coding_perceptual_tpu.metrics.rtf import (  # noqa: F401
    measure_rtf,
    RtfResult,
)
