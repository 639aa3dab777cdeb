from task_aware_audio_coding_perceptual_tpu.utils.profiling import (  # noqa: F401
    trace,
    annotate,
)
