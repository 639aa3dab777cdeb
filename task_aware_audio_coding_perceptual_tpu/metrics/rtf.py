"""Real-time-factor benchmark harness.

The reference only measures RTF ad hoc (``ScoreModel.enhance(..., timeit=True)``,
``sgmse/sgmse/model.py:461-463``). Here the harness is a first-class utility
used by ``bench.py``: it compiles a jitted function once, then times steady-
state executions with proper device synchronization and reports both RTF
(wall seconds per audio second) and its inverse (faster-than-real-time
streams per chip) — the north-star metric of BASELINE.json.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import jax


@dataclasses.dataclass
class RtfResult:
    rtf: float  # wall seconds per second of audio (lower is better)
    streams_per_chip: float  # 1/rtf: concurrent real-time streams sustained
    wall_s_per_call: float
    audio_s_per_call: float
    iters: int

    def __str__(self) -> str:
        return (
            f"RTF={self.rtf:.3e} ({self.streams_per_chip:,.0f}x real-time), "
            f"{self.wall_s_per_call * 1e3:.3f} ms/call for "
            f"{self.audio_s_per_call:.2f}s audio"
        )


def measure_rtf(
    fn: Callable[[], jax.Array],
    audio_seconds_per_call: float,
    warmup: int = 3,
    iters: int = 20,
) -> RtfResult:
    """Time ``fn`` (a zero-arg jitted closure returning a jax array/pytree).

    ``fn`` must return its outputs so ``block_until_ready`` can synchronize.
    """
    for _ in range(warmup):
        jax.block_until_ready(fn())

    # Block after every call: on some backends (axon relay),
    # block_until_ready on the last output does NOT imply earlier dispatches
    # finished, which inflates throughput by orders of magnitude.
    start = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn())
    wall = (time.perf_counter() - start) / iters

    rtf = wall / audio_seconds_per_call
    return RtfResult(
        rtf=rtf,
        streams_per_chip=1.0 / rtf,
        wall_s_per_call=wall,
        audio_s_per_call=audio_seconds_per_call,
        iters=iters,
    )
