"""Parallelism: device mesh, shardings, gradient accumulation, sharded eval."""

from task_aware_audio_coding_perceptual_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    shard_params,
)
from task_aware_audio_coding_perceptual_tpu.parallel.grad_accum import (  # noqa: F401
    accumulate_gradients,
)
