"""TPU-native task-aware audio coding framework.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
repository `ahmd-mohsin/Task-Aware-audio-coding-perceptual`:

- a neural audio codec (strided conv encoder -> residual vector quantization ->
  conv decoder) with streaming/causal inference expressed as chunked scans,
- the reference's distributed-source-coding spectral model zoo
  (``SpectralResE{1,2,4}D{1,2}``) with private/shared, top-variance and DPCA
  bottlenecks (reference ``pkl_file_models.py``, ``pkl_file_model_updated.py``),
- the EnCodec-style multi-scale STFT discriminator (reference ``msstftd.py``),
- a score-based diffusion speech-enhancement module equivalent to the vendored
  SGMSE framework (OUVE/SBVE SDEs, PC/ODE/SB samplers, NCSN++/DCUNet backbones,
  Pallas ``upfirdn2d``/``fused_bias_act`` kernels),
- task-aware training losses scoring decoded audio through frozen downstream
  heads, PESQ/ESTOI/SI-SDR evaluation, EMA/checkpoint/resume, and data-parallel
  training over a TPU mesh.

The short import alias ``tacp`` is provided at the repository root.
"""

__version__ = "0.1.0"

from task_aware_audio_coding_perceptual_tpu.registry import Registry  # noqa: F401
