"""Score-based generative speech enhancement (SGMSE-equivalent) module.

TPU-native re-design of the reference's vendored ``sgmse/`` framework:
NCSN++ / DCUNet score networks, OUVE / SBVE SDEs, PC / ODE / SB samplers,
and a ScoreModel training/inference wrapper with EMA and ``enhance()``.
"""

from task_aware_audio_coding_perceptual_tpu.models.sgmse.shared import (  # noqa: F401
    BackboneRegistry,
)
# importing the backbone modules registers them
from task_aware_audio_coding_perceptual_tpu.models.sgmse import ncsnpp as _ncsnpp  # noqa: F401,E402
from task_aware_audio_coding_perceptual_tpu.models.sgmse import dcunet as _dcunet  # noqa: F401,E402
from task_aware_audio_coding_perceptual_tpu.models.sgmse.sdes import (  # noqa: F401
    SDERegistry,
    OUVESDE,
    SBVESDE,
)
