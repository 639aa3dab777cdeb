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

import os as _os


def _enable_compile_cache():
    """Persistent XLA compilation cache (opt out: TACP_COMPILE_CACHE=0).

    First compiles through the TPU relay take minutes (a GAN train-step scan
    ~10 min); caching compiled executables across processes makes every
    restart/resume pay that only once. Tests point this at their own dir via
    ``tests/conftest.py``.
    """
    if _os.environ.get("TACP_COMPILE_CACHE", "1") == "0":
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            cache = _os.environ.get(
                "TACP_COMPILE_CACHE_DIR",
                _os.path.join(_os.path.expanduser("~"), ".cache", "tacp_jax"),
            )
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is an optimization only
        pass


_enable_compile_cache()

from task_aware_audio_coding_perceptual_tpu.registry import Registry  # noqa: F401
