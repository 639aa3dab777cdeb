"""Loss library: latent regularizers, spectral, multi-resolution, adversarial."""

from task_aware_audio_coding_perceptual_tpu.losses.pesq_loss import (  # noqa: F401
    pesq_style_loss,
    pesq_style_mos,
)
from task_aware_audio_coding_perceptual_tpu.losses.audio import (  # noqa: F401
    nuclear_norm_loss,
    cosine_similarity_loss,
    spectral_mse_dict,
    multi_resolution_stft_loss,
    multi_resolution_mel_loss,
    l1_time_loss,
    l2_time_loss,
)
