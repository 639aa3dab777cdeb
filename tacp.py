"""Short import alias: ``import tacp`` == the TPU task-aware audio coding
framework (``task_aware_audio_coding_perceptual_tpu``), with submodule
aliasing so ``import tacp.dsp`` etc. work too."""

import importlib
import sys

_pkg = importlib.import_module("task_aware_audio_coding_perceptual_tpu")
sys.modules[__name__] = _pkg
