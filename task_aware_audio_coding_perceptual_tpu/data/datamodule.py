"""Data module: batching/shuffling loaders over the datasets.

TPU-native equivalent of the reference's ``SpecsDataModule``
(``sgmse/sgmse/data_module.py:103-236``) without torch DataLoader workers:
batches are assembled host-side as stacked numpy arrays and shipped to
device in one transfer (a single large H2D copy beats many small ones on
TPU). Deterministic, seeded shuffling per epoch; ``--dummy`` 1/200 subset
supported via the dataset.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional

import numpy as np

from task_aware_audio_coding_perceptual_tpu.data.datasets import Specs, SpectralDataset
from task_aware_audio_coding_perceptual_tpu.models.sgmse.score_model import SpecTransforms


def batch_iterator(
    dataset,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = True,
    epoch: int = 0,
) -> Iterator:
    """Yield stacked-numpy batches; deterministic per (seed, epoch)."""
    n = len(dataset)
    idx = np.arange(n)
    if shuffle:
        np.random.default_rng(seed + epoch).shuffle(idx)
    stop = n - (n % batch_size) if drop_last else n
    for s in range(0, stop, batch_size):
        items = [dataset[int(i)] for i in idx[s : s + batch_size]]
        yield _stack(items)


def _stack(items):
    first = items[0]
    if isinstance(first, dict):
        return {k: _stack([it[k] for it in items]) for k in first if k != "params"}
    if isinstance(first, tuple):
        return tuple(_stack([it[j] for it in items]) for j in range(len(first)))
    return np.stack([np.asarray(it) for it in items])


@dataclasses.dataclass
class SpecsDataModule:
    """SGMSE data module (reference ``data_module.py:103-236``)."""

    base_dir: str
    format: str = "default"
    batch_size: int = 8
    n_fft: int = 510
    hop_length: int = 128
    num_frames: int = 256
    window: str = "hann"
    dummy: bool = False
    spec_factor: float = 0.15
    spec_abs_exponent: float = 0.5
    normalize: str = "noisy"
    transform_type: str = "exponent"
    seed: int = 0

    def __post_init__(self):
        self.transforms = SpecTransforms(
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            window=self.window,
            spec_factor=self.spec_factor,
            spec_abs_exponent=self.spec_abs_exponent,
            transform_type=self.transform_type,
            num_frames=self.num_frames,
        )

    def _specs(self, subset: str, shuffle_spec: bool) -> Specs:
        return Specs(
            data_dir=self.base_dir,
            subset=subset,
            dummy=self.dummy,
            shuffle_spec=shuffle_spec,
            num_frames=self.num_frames,
            format=self.format,
            normalize=self.normalize,
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            window=self.window,
            spec_factor=self.spec_factor,
            spec_abs_exponent=self.spec_abs_exponent,
            transform_type=self.transform_type,
            seed=self.seed,
        )

    def setup(self, stage: Optional[str] = None):
        if stage in ("fit", None):
            self.train_set = self._specs("train", shuffle_spec=True)
            self.valid_set = self._specs("valid", shuffle_spec=False)
        if stage in ("test", None):
            self.test_set = self._specs("test", shuffle_spec=False)

    def train_dataloader(self, epoch: int = 0):
        return batch_iterator(
            self.train_set, self.batch_size, shuffle=True, seed=self.seed, epoch=epoch
        )

    def val_dataloader(self):
        return batch_iterator(self.valid_set, self.batch_size, shuffle=False)

    def test_dataloader(self):
        return batch_iterator(self.test_set, self.batch_size, shuffle=False)
